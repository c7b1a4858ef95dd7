package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

/** PCM16 decode kernel (m10): features verified against hand-built
  * WAV bytes, and the NULL-never-throw contract on hostile input
  * (truncated body, non-PCM format, 8-bit samples, near-2³¹ declared
  * chunk sizes, frame misalignment). */
class AudioPcmSpec extends AnyFunSuite with SparkTestSupport {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** A well-formed PCM16 WAV with the given samples (interleaved). */
  private def wav(samples: Seq[Int], channels: Int = 1, rate: Int = 8000,
      fmtCode: Int = 1, bits: Int = 16, listChunk: Boolean = false,
      truncateBody: Int = 0, declaredExtra: Long = 0L): Array[Byte] = {
    val body = samples.flatMap(s => le16(s & 0xffff)).toArray
    val db = body.length + declaredExtra
    val list = if (listChunk)
      "LIST".getBytes ++ le32(5) ++ Array.fill(5)(0x4a.toByte) ++ Array(0.toByte)
    else Array.empty[Byte]
    "RIFF".getBytes ++ le32(36 + db) ++ "WAVE".getBytes ++
      list ++
      "fmt ".getBytes ++ le32(16) ++ le16(fmtCode) ++ le16(channels) ++
      le32(rate) ++ le32(8000) ++ le16(4) ++ le16(bits) ++
      "data".getBytes ++ le32(db) ++ body.dropRight(truncateBody)
  }

  private def stats(bytes: Array[Byte]) =
    Option(AudioPcm.statsImpl(bytes)).map { r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }

  test("features match hand computation, LIST chunk walked, negatives decode") {
    val samples = Seq(100, -200, 300, 0, -1, 1, 32767, -32768)
    val got = stats(wav(samples, channels = 2, rate = 16000, listChunk = true))
    val sumSq = samples.map(s => s.toLong * s.toLong).sum
    val zc = samples.sliding(2).count(p => p.head.toLong * p(1).toLong < 0)
    assert(got === Some((2, 16000, 8L, 32768L, zc.toLong, sumSq)))
  }

  test("hostile inputs yield NULL, never a throw") {
    assert(stats(null) === None)
    assert(stats(Array.empty[Byte]) === None)
    assert(stats("RIFFxxxxWAVE".getBytes) === None) // no chunks
    assert(stats(wav(Seq(1, 2), fmtCode = 3)) === None) // IEEE-float, not PCM
    assert(stats(wav(Seq(1, 2), bits = 8)) === None) // not 16-bit
    assert(stats(wav(Seq(1, 2, 3, 4), truncateBody = 2)) === None) // body short
    assert(stats(wav(Seq(1, 2), declaredExtra = 0x7ffffff0L)) === None) // near-2^31
    assert(stats(wav(Seq(1, 2, 3), channels = 2)) === None) // frame misalignment
  }

  test("kernel and interpreted paths agree through the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, wav(Seq(5, -5, 5, -5))),
      (2L, wav(Seq(1, 2), bits = 8)), // NULL row
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val rows = df.select(col("id"), AudioPcm.pcmStats(col("payload")).as("st"))
      .select(col("id"), col("st.zero_cross"), col("st.sum_sq"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(rows(1L) === Some((3L, 100L)))
    assert(rows(2L) === None)
    assert(rows(3L) === None)
  }
}
