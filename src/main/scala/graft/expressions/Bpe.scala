package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization against a fixed merges table — the
  * REAL token count the pipeline's token-denominated numbers (t13's
  * estimate, t22 packing budgets, t24 mixture weights, t26 surprisal)
  * stand in for.
  *
  * Algorithm (the standard BPE encode, Sennrich et al. 2016): each
  * word of the normalized text starts as its character sequence;
  * merges apply IN RANK ORDER, each exhaustively leftmost-first. With
  * a WELL-FORMED merges table (every operand is a single character or
  * the output of an earlier merge — validated at class load) this is
  * provably identical to the lowest-rank-first priority loop real
  * encoders run: merging (x,y)→xy never makes two PRE-EXISTING tokens
  * adjacent, so no instance of an earlier-rank pair can ever appear
  * after that rank was exhausted, and xy itself only participates in
  * strictly later-ranked merges.
  *
  * The merges table is a compile-time constant — a plan constant, like
  * the LSH hyperplanes — and the single source of truth for BOTH the
  * kernel and the generated DuckDB oracle stages
  * ([[Bpe.oracleMergeStages]]), so the two engines can never drift.
  *
  * Output encoding: all tokens of all words, in document order, joined
  * with '|' (tokens are [a-z0-9]+ post-normalization, so '|' cannot
  * collide); empty normalized text encodes to "". Token count and
  * fingerprint derive from this one string.
  */
object Bpe {

  /** Merge ranks, highest priority first. Well-formed: every operand
    * is a single char or a previous rank's output. */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"), ("in", "g"),
    ("a", "l"), ("o", "f"), ("t", "o"), ("s", "t"), ("i", "s"),
    ("a", "r"), ("l", "e"), ("m", "e"), ("c", "o"), ("d", "e"),
    ("0", "0"), ("1", "9"), ("2", "0"), ("th", "is"), ("er", "s"),
    ("on", "e"), ("c", "h"))

  // well-formedness check — the rank-order == priority-loop proof
  // above depends on it, so a malformed table must fail fast, not
  // silently change tokenizations
  locally {
    val available = scala.collection.mutable.Set[String]()
    for (((x, y), i) <- Merges.zipWithIndex) {
      def ok(s: String) = s.length == 1 || available.contains(s)
      require(ok(x) && ok(y),
        s"Bpe.Merges rank $i ($x,$y): operands must be single chars or earlier outputs")
      available += (x + y)
    }
  }

  /** `bpe_encode(text)` → '|'-joined BPE tokens of the normalized
    * text; "" for empty/whitespace-only input. */
  def encode(text: Column): Column = graftx.column(BpeEncode(graftx.expr(text)))

  // flattened operand arrays so the hot loop does no tuple unboxing
  private val mx: Array[String] = Merges.map(_._1).toArray
  private val my: Array[String] = Merges.map(_._2).toArray
  private val mxy: Array[String] = Merges.map(p => p._1 + p._2).toArray

  /** Kernel entry (static for codegen): normalize, split to words,
    * encode each word by the rank-order merge loop, join everything
    * with '|'. */
  def encodeImpl(text: UTF8String): UTF8String = {
    val norm = TextHashImpl.normalize(text).toString
    if (norm.isEmpty) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(norm.length * 2)
    var start = 0
    while (start <= norm.length) {
      val sp = norm.indexOf(' ', start)
      val end = if (sp < 0) norm.length else sp
      if (end > start) {
        encodeWordInto(norm, start, end, sb)
      }
      start = end + 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** One word [start, end) of `norm` → tokens appended to `sb`
    * ('|'-separated, with a leading '|' unless `sb` is empty). */
  private def encodeWordInto(norm: String, start: Int, end: Int,
      sb: java.lang.StringBuilder): Unit = {
    val toks = new Array[String](end - start)
    var n = 0
    var i = start
    while (i < end) { toks(n) = String.valueOf(norm.charAt(i)); n += 1; i += 1 }
    var m = 0
    while (m < mx.length && n > 1) {
      // leftmost-first exhaustive fold for merge m: compare the output
      // list's LAST token with the incoming one — after a merge the
      // combined token is xy, which never re-matches x (y is
      // non-empty), so overlapping runs resolve leftmost exactly like
      // the canonical scan
      val x = mx(m); val y = my(m)
      var out = 0 // write cursor into toks (in-place fold)
      var r = 0
      while (r < n) {
        if (out > 0 && toks(out - 1) == x && toks(r) == y) toks(out - 1) = mxy(m)
        else { toks(out) = toks(r); out += 1 }
        r += 1
      }
      n = out
      m += 1
    }
    var t = 0
    while (t < n) {
      if (sb.length > 0) sb.append('|')
      sb.append(toks(t))
      t += 1
    }
  }

  /** The DuckDB twin of one merge application over the '|'-encoded
    * token string `enc`: the identical leftmost-first fold, expressed
    * as a list_reduce whose accumulator is the re-encoded prefix. */
  private def applyMergeSql(enc: String, x: String, y: String): String = {
    val xy = x + y
    s"""CASE WHEN $enc NOT LIKE '%|%' THEN $enc ELSE
       |list_reduce(string_split($enc, '|'), (acc, t) ->
       |  CASE WHEN t = '$y' AND regexp_extract(acc, '[^|]*${"$"}') = '$x'
       |       THEN left(acc, length(acc) - ${x.length}) || '$xy'
       |       ELSE acc || '|' || t END) END""".stripMargin
  }

  /** CTE stages e1..eN applying every merge in rank order to CTE `e0`
    * carrying (doc_id, widx, enc) — generated from [[Merges]] so the
    * oracle replays the exact table the kernel compiled in. */
  def oracleMergeStages: Seq[String] =
    Merges.zipWithIndex.map { case ((x, y), i) =>
      s"e${i + 1} AS (SELECT doc_id, widx, ${applyMergeSql("enc", x, y)} AS enc FROM e$i)"
    }

  def lastStage: String = s"e${Merges.length}"
}

case class BpeEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.encodeImpl($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
