package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._

/** IMA/DVI ADPCM decode (m13) — the COMPRESSED-audio rung above m10's
  * raw PCM16: 4-bit nibbles expand to int16 through the public-spec
  * state machine (89-entry step-size table, per-nibble index walk,
  * predictor clamp), pure integer arithmetic, no codec library. Format
  * tag 0x0011 in a RIFF/WAVE container; each `blockAlign`-sized block
  * restarts from its own 4-byte header (predictor int16 LE, step index
  * u8, reserved), carries (blockAlign−4)·2 nibbles low-nibble-first,
  * and the `fact` chunk's sample count says where decoding stops
  * (trailing pad nibbles in the last block are never decoded).
  *
  * Scope: MONO (the channel-interleave of multi-channel IMA blocks is
  * a layout concern, not a decode one). NULL — never a throw — on
  * anything malformed: wrong tags, non-0x11 format, bits ≠ 4, a
  * samples-per-block extension disagreeing with blockAlign, a data
  * body that is truncated or not block-aligned, or a fact count the
  * blocks cannot hold. Position arithmetic in LONG (the wavMeta
  * adversarial-size discipline).
  *
  * Features (exact integers, oracle-solid — the DuckDB oracle replays
  * the same state machine as a recursive CTE): sample_rate, n_samples,
  * peak_abs, zero_cross (strict sign flips across the concatenated
  * blocks), sum_sq, and the position-weighted checksum
  * Σ s(k)·(1 + k mod 97) that catches block-order or off-by-one
  * decode errors a plain sum would miss.
  */
object AudioAdpcm {

  def adpcmStats(payload: Column): Column =
    graftx.column(AdpcmStatsExpr(graftx.expr(payload)))

  val adpcmType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false),
    StructField("zero_cross", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** The IMA step-size table (89 entries, public spec). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per nibble (depends on the magnitude bits only). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** ONE state transition: (valpred, index) + nibble → (valpred',
    * index'). Exactly the IMA reference arithmetic — vpdiff built from
    * the CURRENT step by bit shifts, predictor clamped to int16, index
    * clamped to the table. */
  def step(valpred: Int, index: Int, nibble: Int): (Int, Int) = {
    val st = StepTable(index)
    var vpdiff = st >> 3
    if ((nibble & 4) != 0) vpdiff += st
    if ((nibble & 2) != 0) vpdiff += st >> 1
    if ((nibble & 1) != 0) vpdiff += st >> 2
    var v = if ((nibble & 8) != 0) valpred - vpdiff else valpred + vpdiff
    if (v > 32767) v = 32767 else if (v < -32768) v = -32768
    var i = index + IndexTable(nibble & 7)
    if (i < 0) i = 0 else if (i > 88) i = 88
    (v, i)
  }

  @inline private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  @inline private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  @inline private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  def statsImpl(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 12) return null
    if (!tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return null
    val n = bytes.length
    var pos = 12L
    var fmtCode = -1; var channels = -1; var rate = -1L; var bits = -1
    var blockAlign = -1; var spbExt = -1
    var factSamples = -1L
    var dataOff = -1L; var dataBytes = -1L
    while (pos + 8 <= n && (fmtCode < 0 || dataOff < 0 || factSamples < 0)) {
      val p = pos.toInt
      val size = le32(bytes, p + 4)
      if (tag(bytes, p, "fmt ")) {
        if (size < 16 || pos + 8 + 16 > n) return null
        fmtCode = le16(bytes, p + 8)
        channels = le16(bytes, p + 10)
        rate = le32(bytes, p + 12)
        blockAlign = le16(bytes, p + 20)
        bits = le16(bytes, p + 22)
        // the IMA extension (cbSize=2, samplesPerBlock) when present
        if (size >= 20 && pos + 8 + 20 <= n && le16(bytes, p + 24) >= 2)
          spbExt = le16(bytes, p + 26)
      } else if (tag(bytes, p, "fact")) {
        if (size < 4 || pos + 8 + 4 > n) return null
        factSamples = le32(bytes, p + 8)
      } else if (tag(bytes, p, "data")) {
        dataOff = pos + 8
        dataBytes = size
      }
      pos += 8L + size + (size & 1L)
    }
    if (fmtCode != 0x11 || bits != 4 || channels != 1 ||
      rate <= 0 || rate > Int.MaxValue) return null
    if (blockAlign < 8 || blockAlign > (1 << 20)) return null
    val spb = (blockAlign - 4) * 2 + 1 // header sample + 2 nibbles/byte
    if (spbExt >= 0 && spbExt != spb) return null // lying extension
    if (factSamples <= 0 || factSamples > (1L << 31)) return null
    if (dataOff < 0 || dataBytes <= 0 || dataOff + dataBytes > n) return null
    if (dataBytes % blockAlign != 0) return null
    val nBlocks = dataBytes / blockAlign
    if ((factSamples + spb - 1) / spb != nBlocks) return null
    val off = dataOff.toInt
    var peak = 0L; var zeroCross = 0L; var sumSq = 0L; var chk = 0L
    var prev = 0
    var k = 0L
    var b = 0
    while (b < nBlocks) {
      val bo = off + b * blockAlign
      var valpred = le16(bytes, bo).toShort.toInt
      var index = bytes(bo + 2) & 0xff
      if (index > 88) return null
      var r = 0
      val inBlock = math.min(spb.toLong, factSamples - k)
      while (r < inBlock) {
        val s =
          if (r == 0) valpred
          else {
            val byte = bytes(bo + 4 + (r - 1) / 2) & 0xff
            val nib = if ((r - 1) % 2 == 0) byte & 0xf else (byte >> 4) & 0xf
            val (v2, i2) = step(valpred, index, nib)
            valpred = v2; index = i2
            v2
          }
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        sumSq += s.toLong * s.toLong
        if (k >= 1 && prev.toLong * s.toLong < 0L) zeroCross += 1
        chk += s.toLong * (1L + k % 97)
        prev = s
        r += 1; k += 1
      }
      b += 1
    }
    InternalRow(rate.toInt, factSamples, peak, zeroCross, sumSq, chk)
  }
}

case class AdpcmStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioAdpcm.adpcmType
  override def nullable: Boolean = true
  override def prettyName: String = "adpcm_stats"

  override protected def nullSafeEval(input: Any): Any =
    AudioAdpcm.statsImpl(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.AudioAdpcm.statsImpl($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): AdpcmStatsExpr =
    copy(child = newChild)
}
