package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the unigram-LM tokenizer
  * ([[graft.operators.UnigramLm]]): per-word Viterbi segmentation under
  * integer-quantized piece costs, as one static call per row inside
  * whole-stage codegen. The vocabulary (piece → cost) rides the plan as
  * a reference object, the centroid-broadcast idiom.
  *
  * Determinism contract (the DuckDB oracle replays it exactly):
  * segmentation minimizes (Σ piece costs, space-joined piece string) —
  * integer costs, then LEXICOGRAPHIC tie-break on the joined rendering.
  * The tuple order is append-monotone (two distinct prefixes of the
  * same word position can never be string-prefixes of each other, so
  * appending a common suffix preserves their order), which makes the
  * left-to-right DP's per-position argmin globally optimal.
  */
object UnigramOps {

  /** Max trained piece length; words longer than [[MaxWord]] fall back
    * to single-char pieces (SentencePiece's max_sentencepiece_length /
    * rare-long-word discipline, kept tiny so the oracle's enumeration
    * CTE stays bounded: ≤ tetranacci(12) paths per word). */
  val MaxPiece = 4
  val MaxWord = 12

  /** Cost for a single char absent from the vocab (can only occur when
    * serving text disjoint from the training corpus). ≈ −ln(2e-9)·1e6. */
  val UnkCost = 20000000L

  /** `unigram_seg(word)` → the space-joined best segmentation of ONE
    * word (the training E-step over the distinct-word table). */
  def unigramSeg(word: Column, vocab: java.util.HashMap[String, java.lang.Long]): Column =
    graftx.column(UnigramSegExpr(graftx.expr(word), vocab))

  /** `unigram_stats(text)` → struct(n_words, n_pieces) over the whole
    * normalized text — the shuffle-free serving kernel (words repeat
    * across a doc; re-segmenting a 12-char word is a ≤48-candidate DP,
    * cheaper than any join). */
  def unigramStats(text: Column, vocab: java.util.HashMap[String, java.lang.Long]): Column =
    graftx.column(UnigramStatsExpr(graftx.expr(text), vocab))

  /** Viterbi over word positions; returns the joined best segmentation.
    * Words longer than [[MaxWord]] segment as single chars. */
  def segImpl(word: UTF8String, vocab: java.util.HashMap[String, java.lang.Long]): UTF8String =
    UTF8String.fromString(segString(word.toString, vocab))

  private[graft] def segString(w: String, vocab: java.util.HashMap[String, java.lang.Long]): String = {
    val n = w.length
    if (n == 0) return ""
    if (n > MaxWord) {
      val sb = new java.lang.StringBuilder(2 * n)
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.append(w.charAt(i))
        i += 1
      }
      return sb.toString
    }
    val cost = new Array[Long](n + 1)
    val seg = new Array[String](n + 1)
    seg(0) = ""
    var i = 1
    while (i <= n) {
      var bestC = Long.MaxValue
      var bestS: String = null
      var l = 1
      val lMax = math.min(MaxPiece, i)
      while (l <= lMax) {
        if (seg(i - l) != null) {
          val piece = w.substring(i - l, i)
          val pc = vocab.get(piece)
          val c: Long =
            if (pc != null) pc.longValue()
            else if (l == 1) UnkCost
            else -1L
          if (c >= 0L) {
            val cand = cost(i - l) + c
            if (cand < bestC) {
              bestC = cand
              bestS = if (seg(i - l).isEmpty) piece else seg(i - l) + " " + piece
            } else if (cand == bestC) {
              val s = if (seg(i - l).isEmpty) piece else seg(i - l) + " " + piece
              if (s.compareTo(bestS) < 0) bestS = s
            }
          }
        }
        l += 1
      }
      cost(i) = bestC
      seg(i) = bestS
      i += 1
    }
    seg(n)
  }

  /** Piece count of the best segmentation of one word. */
  private def pieceCount(w: String, vocab: java.util.HashMap[String, java.lang.Long]): Int = {
    if (w.isEmpty) return 0
    if (w.length > MaxWord) return w.length
    val s = segString(w, vocab)
    var count = 1
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') count += 1
      i += 1
    }
    count
  }

  /** (n_words, n_pieces) over the normalized text. */
  def statsImpl(text: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Long]): org.apache.spark.sql.catalyst.InternalRow = {
    val norm = TextHashImpl.normalize(text).toString
    var nWords = 0
    var nPieces = 0
    var start = 0
    while (start <= norm.length) {
      val sp = norm.indexOf(' ', start)
      val end = if (sp < 0) norm.length else sp
      if (end > start) {
        nWords += 1
        nPieces += pieceCount(norm.substring(start, end), vocab)
      }
      start = end + 1
    }
    org.apache.spark.sql.catalyst.InternalRow(nWords, nPieces)
  }
}

case class UnigramSegExpr(child: Expression, vocab: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unigram_seg"

  override protected def nullSafeEval(input: Any): Any =
    UnigramOps.segImpl(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnigramOps.segImpl($c, $vRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegExpr =
    copy(child = newChild)
}

case class UnigramStatsExpr(child: Expression, vocab: java.util.HashMap[String, java.lang.Long])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false)))
  override def prettyName: String = "unigram_stats"

  override protected def nullSafeEval(input: Any): Any =
    UnigramOps.statsImpl(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("unigramVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnigramOps.statsImpl($c, $vRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramStatsExpr =
    copy(child = newChild)
}
