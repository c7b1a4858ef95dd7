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

  /** A compiled merges table: flattened operand arrays so the hot loop
    * does no tuple unboxing. Compilation validates well-formedness —
    * the rank-order == priority-loop proof above depends on it, so a
    * malformed table must fail fast, not silently change
    * tokenizations. (A table LEARNED by [[graft.operators.BpeTrain]]
    * is well-formed by construction: every token present in an
    * encoding is a single char or an applied earlier merge's output.) */
  final class MergeTable(merges: Seq[(String, String)]) extends Serializable {
    locally {
      val available = scala.collection.mutable.Set[String]()
      for (((x, y), i) <- merges.zipWithIndex) {
        def ok(s: String) = s.length == 1 || available.contains(s)
        require(ok(x) && ok(y),
          s"Bpe merges rank $i ($x,$y): operands must be single chars or earlier outputs")
        available += (x + y)
      }
    }
    val mx: Array[String] = merges.map(_._1).toArray
    val my: Array[String] = merges.map(_._2).toArray
    val mxy: Array[String] = merges.map(p => p._1 + p._2).toArray
  }

  private val StaticTable = new MergeTable(Merges)

  /** `bpe_encode(text)` → '|'-joined BPE tokens of the normalized
    * text; "" for empty/whitespace-only input. */
  def encode(text: Column): Column = graftx.column(BpeEncode(graftx.expr(text)))

  /** [[encode]] against a LEARNED merges table (rank order) instead of
    * the compiled-in [[Merges]] constant — the serve half of
    * [[graft.operators.BpeTrain]]. */
  def encodeWith(text: Column, merges: Seq[(String, String)]): Column =
    graftx.column(BpeEncodeWith(graftx.expr(text), merges))

  /** One merge (x,y)→xy applied exhaustively leftmost-first to a
    * '|'-joined token string — the per-round re-encode step of BPE
    * TRAINING (the encode kernel's inner fold, exposed as its own
    * column so the training loop can run it distributed per round). */
  def applyMerge(enc: Column, x: String, y: String): Column =
    graftx.column(BpeApplyMerge(graftx.expr(enc), x, y))

  /** Kernel entry (static for codegen): normalize, split to words,
    * encode each word by the rank-order merge loop, join everything
    * with '|'. */
  def encodeImpl(text: UTF8String): UTF8String = encodeImplWith(text, StaticTable)

  /** [[encodeImpl]] against an arbitrary compiled table (codegen
    * entry for [[BpeEncodeWith]] — the table rides along as a plan
    * reference object). */
  def encodeImplWith(text: UTF8String, table: MergeTable): UTF8String = {
    val norm = TextHashImpl.normalize(text).toString
    if (norm.isEmpty) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(norm.length * 2)
    var start = 0
    while (start <= norm.length) {
      val sp = norm.indexOf(' ', start)
      val end = if (sp < 0) norm.length else sp
      if (end > start) {
        encodeWordInto(norm, start, end, table, sb)
      }
      start = end + 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** One word [start, end) of `norm` → tokens appended to `sb`
    * ('|'-separated, with a leading '|' unless `sb` is empty). */
  private def encodeWordInto(norm: String, start: Int, end: Int,
      table: MergeTable, sb: java.lang.StringBuilder): Unit = {
    val toks = new Array[String](end - start)
    var n = 0
    var i = start
    while (i < end) { toks(n) = String.valueOf(norm.charAt(i)); n += 1; i += 1 }
    var m = 0
    while (m < table.mx.length && n > 1) {
      // leftmost-first exhaustive fold for merge m: compare the output
      // list's LAST token with the incoming one — after a merge the
      // combined token is xy, which never re-matches x (y is
      // non-empty), so overlapping runs resolve leftmost exactly like
      // the canonical scan
      val x = table.mx(m); val y = table.my(m)
      n = foldMerge(toks, n, x, y, table.mxy(m))
      m += 1
    }
    var t = 0
    while (t < n) {
      if (sb.length > 0) sb.append('|')
      sb.append(toks(t))
      t += 1
    }
  }

  /** In-place leftmost-first exhaustive fold of ONE merge over
    * `toks[0, n)`; returns the new length. */
  private def foldMerge(toks: Array[String], n: Int, x: String, y: String,
      xy: String): Int = {
    var out = 0 // write cursor into toks (in-place fold)
    var r = 0
    while (r < n) {
      if (out > 0 && toks(out - 1) == x && toks(r) == y) toks(out - 1) = xy
      else { toks(out) = toks(r); out += 1 }
      r += 1
    }
    out
  }

  /** [[applyMerge]]'s kernel: one merge over a '|'-joined token string
    * (one word per row in the training table, so there is no word
    * boundary to respect here). */
  def applyMergeImpl(enc: UTF8String, x: String, y: String): UTF8String = {
    val s = enc.toString
    if (s.indexOf('|') < 0) return enc // single token: nothing adjacent
    val toks = s.split("\\|")
    val n = foldMerge(toks, toks.length, x, y, x + y)
    if (n == toks.length) return enc
    val sb = new java.lang.StringBuilder(s.length)
    var t = 0
    while (t < n) {
      if (t > 0) sb.append('|')
      sb.append(toks(t))
      t += 1
    }
    UTF8String.fromString(sb.toString)
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

/** [[BpeEncode]] with a LEARNED merges table: the table compiles once
  * per plan (well-formedness validated) and rides into codegen as a
  * reference object — same hot loop as the static kernel. */
case class BpeEncodeWith(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode_with"

  @transient private lazy val table = new Bpe.MergeTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeImplWith(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.MergeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.encodeImplWith($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWith =
    copy(child = newChild)
}

/** One training-round merge applied to a '|'-joined token string. */
case class BpeApplyMerge(child: Expression, x: String, y: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply_merge"

  override protected def nullSafeEval(input: Any): Any =
    Bpe.applyMergeImpl(input.asInstanceOf[UTF8String], x, y)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rx = ctx.addReferenceObj("bpeX", x, "java.lang.String")
    val ry = ctx.addReferenceObj("bpeY", y, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.applyMergeImpl($c, $rx, $ry)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerge =
    copy(child = newChild)
}
