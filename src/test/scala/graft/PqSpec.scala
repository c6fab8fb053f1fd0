package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization pipeline on planted structure: codebooks train
  * per subspace, encoding is deterministic, and ADC search keeps
  * separable clusters separate.
  */
class PqSpec extends AnyFunSuite with SparkFixture {

  // 3 well-separated blobs in 16-dim space, 8 points each, deterministic
  // jitter. Blob b lives at coordinate 10·b on every dimension. Ids
  // INTERLEAVE the blobs (id % 3 = blob) so the first-k deterministic
  // seeds cover all blobs — the same property a shuffled real corpus has.
  private def blobs = {
    val sp = spark
    import sp.implicits._
    val rows = for {
      b <- 0 until 3
      i <- 0 until 8
    } yield {
      val id = (i * 3 + b).toLong
      val v = (0 until 16).map(d => 10.0 * b + ((id * 31 + d * 7) % 5) * 0.1)
      (id, b, v)
    }
    rows.toDF("id", "blob", "v")
  }

  test("pqCodebooks: shape [m][k][dim/m], trained values finite") {
    val cb = api.Similarity.pqCodebooks(
      blobs, col("id"), col("v"), m = 4, k = 4, iterations = 2)
    assert(cb.length == 4)
    assert(cb.forall(_.length == 4))
    assert(cb.forall(_.forall(_.length == 4)))
    assert(cb.flatten.flatten.forall(d => !d.isNaN && !d.isInfinite))
  }

  test("pqEncode is deterministic and gives same-blob points same codes") {
    val cb = api.Similarity.pqCodebooks(
      blobs, col("id"), col("v"), m = 4, k = 4, iterations = 2)
    val enc1 = api.Similarity.pqEncode(blobs, col("id"), col("v"), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val enc2 = api.Similarity.pqEncode(blobs, col("id"), col("v"), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc1 == enc2)
    assert(enc1.values.forall(codes =>
      codes.length == 4 && codes.forall(c => c >= 1 && c <= 4)))
    // Blob separation (10 units) dwarfs jitter (0.4): a centroid can
    // split a blob but never straddle two, so each code TUPLE maps to
    // exactly one blob.
    val tupleBlobs = enc1.toSeq
      .groupBy(_._2).map { case (codes, xs) => codes -> xs.map(_._1 % 3).toSet }
    tupleBlobs.values.foreach(bs => assert(bs.size == 1))
  }

  test("ADC top-k stays inside the query's blob") {
    val cb = api.Similarity.pqCodebooks(
      blobs, col("id"), col("v"), m = 4, k = 4, iterations = 2)
    val enc = api.Similarity.pqEncode(blobs, col("id"), col("v"), cb)
    val q = blobs.filter(col("id").isin(0L, 1L, 2L))
      .select(col("id").as("qid"), col("v").as("qv"))
    val top = api.Similarity.pqTopK(enc, q, col("qid"), col("qv"), cb,
        topK = 3, excludeSelf = true)
      .collect()
    assert(top.length == 9)
    top.foreach { r =>
      assert(r.getLong(1) % 3 == r.getLong(0) % 3,
        s"query ${r.getLong(0)} matched cross-blob cand ${r.getLong(1)}")
    }
  }

  test("sim_ann_pq registry query returns ranked rows per query") {
    val rows = SparkEntry.queries("sim_ann_pq")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      assert(rs.forall(r => r.getLong(2) != r.getLong(0)))
    }
  }
}
