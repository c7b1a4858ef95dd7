package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport
import graft.operators.Multimodal

/** m11's PNG decode contract: the encoder→decoder round trip equals
  * the pixel formula for ids covering every filter type, split-IDAT
  * and ancillary-chunk paths; hostile inputs NULL, never throw. */
class PngPixelsSpec extends AnyFunSuite with SparkTestSupport {

  private def stats(bytes: Array[Byte]) =
    Option(PngPixels.statsImpl(bytes)).map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getLong(5))
    }

  private def formula(id: Long) = {
    val w = (8 + id % 9).toInt
    val h = (8 + (id * 3) % 9).toInt
    val px = Array.tabulate(w * h)(k => ((id * 31 + (k / w) * w + (k % w) * 7) % 256).toInt)
    (w, h, px.map(_.toLong).sum, px.min, px.max,
      px.zipWithIndex.map { case (v, k) => v.toLong * (1L + k % 97) }.sum)
  }

  test("round trip equals the pixel formula (all filters, split IDAT, tEXt)") {
    // ids cover: %3==0 (split IDAT), %5==0 (tEXt), heights >= 5 rows so
    // every y%5 filter type appears
    for (id <- Seq(0L, 1L, 3L, 5L, 7L, 15L, 22L, 100L, 1234L)) {
      assert(stats(Multimodal.pngEncode(id)) === Some(formula(id)), s"id $id")
    }
  }

  test("hostile inputs yield NULL, never a throw") {
    val good = Multimodal.pngEncode(7L)
    assert(stats(null) === None)
    assert(stats(Array.empty[Byte]) === None)
    assert(stats("not a png at all, just bytes".getBytes) === None)
    assert(stats(good.dropRight(20)) === None) // truncated IDAT/IEND
    // corrupt the zlib stream body (well past IHDR)
    val corrupt = good.clone()
    corrupt(50) = (corrupt(50) ^ 0x5a).toByte
    // either inflate fails or unfiltering hits a bad filter byte (a
    // bit flip may also survive to wrong pixels) — the contract here
    // is only no-throw; exactness is the round-trip test
    stats(corrupt)
    // zip-bomb guard: a declared 100k x 100k IHDR stops at the size cap
    val bomb = good.clone()
    // IHDR width/height fields sit at offsets 16..23
    for (i <- 16 until 24) bomb(i) = 0x7f.toByte
    assert(stats(bomb) === None)
    // color type != 0 (truecolor) refused
    val rgb = good.clone(); rgb(25) = 2
    assert(stats(rgb) === None)
  }

  test("kernel works through the Column API with null rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Multimodal.pngEncode(1L)),
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val rows = df.select(col("id"), PngPixels.pngStats(col("payload")).as("st"))
      .select(col("id"), col("st.px_sum"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L) === Some(formula(1L)._3))
    assert(rows(2L) === None)
  }
}
