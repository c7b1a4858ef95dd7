package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Binary-column multimodal plumbing: format sniffing from real magic
  * bytes, metadata, frame sampling byte-math, and the feature-extraction
  * stub's contract. */
class MultimodalSpec extends AnyFunSuite with SparkTestSupport {

  private def bin(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  private lazy val payloads = {
    import spark.implicits._
    Seq(
      (1L, bin(0xFF, 0xD8, 0xFF, 0xE0) ++ "jpegdata".getBytes),
      (2L, bin(0x89, 0x50, 0x4E, 0x47) ++ "pngdata".getBytes),
      (3L, bin(0x52, 0x49, 0x46, 0x46) ++ "wavdata".getBytes),
      (4L, "plain text bytes".getBytes.map(identity)),
      (5L, Array.empty[Byte])
    ).toDF("id", "payload")
  }

  test("sniffFormat detects standard magics, bin otherwise") {
    val fmts = payloads.select(col("id"), Multimodal.sniffFormat(col("payload")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fmts(1L) === "jpeg")
    assert(fmts(2L) === "png")
    assert(fmts(3L) === "riff")
    assert(fmts(4L) === "bin")
  }

  test("binaryMeta: byte lengths and deterministic fingerprints") {
    val meta = Multimodal.binaryMeta(payloads, col("payload"), col("id"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("byte_len"), r.getAs[String]("fingerprint"))).toMap
    assert(meta(1L)._1 === 12)
    assert(meta(5L)._1 === 0)
    assert(meta(1L)._2.length === 32)
    // fingerprint is md5 over the uppercase hex rendering
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("FFD8FFE0" .getBytes ++ "jpegdata".getBytes.flatMap(b => "%02X".format(b).getBytes))
      .map("%02x".format(_)).mkString
    assert(meta(1L)._2 === expected)
  }

  test("frameSample emits every `every`-th frame with correct offsets and bytes") {
    import spark.implicits._
    // 300 bytes → frames of 64 at offsets 0,64,128,192,256; every 2nd → 0,128,256
    val big = Seq((9L, Array.tabulate(300)(i => (i % 251).toByte))).toDF("id", "payload")
    val frames = Multimodal.frameSample(big, col("payload"), col("id"), frameBytes = 64, every = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4))
    val f0 = frames(0).getAs[Array[Byte]]("frame")
    assert(f0.length === 64 && f0(0) === 0.toByte && f0(63) === 63.toByte)
    // last frame truncated: 300 - 256 = 44 bytes
    assert(frames(2).getAs[Array[Byte]]("frame").length === 44)
    // empty payloads emit no frames
    assert(Multimodal.frameSample(payloads.filter(col("id") === 5L),
      col("payload"), col("id")).count() === 0)
  }

  test("extractFeatures: dim-wide, in [-1,1], NULL for empty, deterministic") {
    val rows = payloads.select(col("id"),
        Multimodal.extractFeatures(col("payload"), dim = 8).as("f"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Seq[Double]]("f"))).toMap
    assert(rows(5L).isEmpty)
    assert(rows(1L).get.length === 8)
    assert(rows(1L).get.forall(v => v >= -1.0 && v <= 1.0))
    // identical payloads → identical features; distinct → distinct
    assert(rows(1L) !== rows(2L))
  }

  test("decodeImageStub + resizeStub metadata arithmetic") {
    val m = payloads.filter(col("id") === 1L)
      .select(Multimodal.decodeImageStub(col("payload")).as("meta"))
      .select(col("meta.width"), col("meta.height"), col("meta.channels"))
      .head()
    // len = 12 → width 16+12=28, height 16+(12/7=1)=17, channels 1+0=1
    assert((m.getInt(0), m.getInt(1), m.getInt(2)) === (28, 17, 1))
    val r = payloads.filter(col("id") === 1L)
      .select(Multimodal.resizeStub(
        Multimodal.decodeImageStub(col("payload")), 224, 224).as("r"))
      .select(col("r.width"), col("r.est_bytes")).head()
    assert(r.getInt(0) === 224 && r.getInt(1) === 224 * 224 * 1)
  }
}
