package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The KMV (bottom-k) sketch: exact-regime completeness, partitioning-
  * invariant merge, and the truncated-regime intersection estimator's
  * error envelope (relative error ~1/sqrt(k−2) ≈ 6.3% at k=256; assert
  * a loose 15% — the hash is seedless, so the measured error is one
  * deterministic number, not a distribution).
  */
class KmvSpec extends AnyFunSuite with SparkFixture {

  private val K = 256
  private val M = graft.api.Sketches.KmvRange

  test("exact regime: sketch of n < k distinct values has size n") {
    val sk = udaf(new KmvSketch(K))
    val arr = spark.range(100).select(sk(col("id")).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(arr.length == 100)
    assert(arr == arr.sorted, "sketch must be sorted")
    assert(arr.distinct.length == 100, "sketch must be distinct")
  }

  test("sketch is partitioning-invariant (merge correctness)") {
    val sk = udaf(new KmvSketch(K))
    val base = spark.range(5000)
    val a = base.repartition(1).select(sk(col("id")))
      .collect()(0).getSeq[Long](0)
    val b = base.repartition(13).select(sk(col("id")))
      .collect()(0).getSeq[Long](0)
    assert(a == b, "sketches must be bit-identical across layouts")
  }

  test("truncated regime: intersection estimate within 15% of truth") {
    val sp = spark
    import sp.implicits._
    // A = [0, 5000), B = [2500, 7500): |A∩B| = 2500, both ndv >> k.
    val df = sp.range(5000).select(lit("a").as("g"), col("id"))
      .unionAll(sp.range(2500, 7500).select(lit("b").as("g"), col("id")))
    val sk = udaf(new KmvSketch(K))
    val rows = df.groupBy("g").agg(sk(col("id")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val (sa, sb) = (rows("a"), rows("b"))
    assert(sa.length == K && sb.length == K, "both must be truncated")
    val theta = math.min(sa(K - 1), sb(K - 1))
    val shared = sa.toSet.intersect(sb.toSet).count(_ < theta)
    val est = shared * M / theta
    assert(math.abs(est - 2500.0) / 2500.0 < 0.15,
      s"est=$est truth=2500 shared=$shared theta=$theta")
  }

  test("udaf_kmv_intersect: exact_mode at sf0.001 and sane overlaps") {
    val rows = SparkEntry.queries("udaf_kmv_intersect")(spark, sf001)
      .collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      assert(r.getAs[Boolean]("exact_mode"),
        "sf0.001 ndv (15) < k must be the exact regime")
      val est = r.getAs[Long]("est_common")
      val cap = math.min(r.getAs[Long]("sk_a_n"), r.getAs[Long]("sk_b_n"))
      assert(est >= 0 && est <= cap,
        s"exact-regime overlap must be within [0, $cap], got $est")
    }
  }
}
