package graft

import graft.functions.Codecs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Decode-side statistics over real BMP pixels: the grayscale histogram
  * API and the mm_pixel_entropy key built on it.
  */
class PixelEntropySpec extends AnyFunSuite with SparkFixture {

  test("gray histogram: flat image = one level; checkerboard = ln 2 entropy") {
    val sp = spark
    import sp.implicits._
    val flat = Codecs.encodeBmp(4, 4, (_, _) => (9, 9, 9))
    val checker = Codecs.encodeBmp(4, 4, (x, y) =>
      if ((x + y) % 2 == 0) (0, 0, 0) else (200, 200, 200))
    val df = Seq((1L, flat), (2L, checker)).toDF("id", "p")
    val h = graft.api.Multimodal.bmpGrayHistogram(df, col("id"), col("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(h.toSeq == Seq((1L, 9, 16L), (2L, 0, 8L), (2L, 200, 8L)),
      h.mkString(","))
    // entropy arithmetic on the histogram mirrors the key's formula:
    // flat → H_q = lnq(16) − 16·lnq(16) div 16 = 0;
    // checker → lnq(16) − lnq(8) = exactly the quantized ln 2.
    def lnq(k: Long) = math.round(math.log(k.toDouble) * 1e6)
    assert(lnq(16) - (16 * lnq(16)) / 16 == 0L)
    assert(lnq(16) - (2 * 8 * lnq(8)) / 16 == 693147L)
  }

  test("mm_pixel_entropy: corpus images are sized right and non-degenerate") {
    val out = SparkEntry.queries("mm_pixel_entropy")(spark, sf001)
      .collect()
    assert(out.length == 100)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (id % 16 + 4) * (id % 12 + 4), r.toString)
      val hq = r.getLong(3)
      assert(hq >= 0 && hq <= 5545178, r.toString) // ≤ ln(256)·1e6
      assert(r.getLong(4) >= 1000 / r.getLong(2), r.toString)
    }
    // the sweep formula is textured: most images must carry real entropy
    assert(out.count(_.getLong(3) > 1000000) > 80)
  }
}
