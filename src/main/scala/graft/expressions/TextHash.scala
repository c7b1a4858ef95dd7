package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash pipeline (MinHash /
  * SimHash / shingle Jaccard), replacing the round-1 chains of
  * interpreted higher-order functions (the old `Dedup.minHashArray`
  * evaluated `transform(shingles, ...)` 16× per row, re-deriving the
  * token and shingle arrays for every hash family — 157 s for 5 000
  * docs at sf0.1).
  *
  * Each expression evaluates one [[TextHashImpl]] kernel: a single
  * fused pass over the string. `doGenCode` emits a static call into
  * the kernel, so the expressions participate in whole-stage codegen —
  * no interpreted-eval island, no UDF serde boundary.
  *
  * Re-expresses (Spark-first) the hashing the reference computes with
  * Breeze-side Scala (distance-based assignment aside, the reference
  * has no text ops — these are the training-data-pipeline extensions
  * from SURVEY.md §7.2.5).
  */
object TextHash {

  /** `minhash_sig(text, n, k)` → array<bigint> signature; NULL for docs
    * with fewer than n tokens (empty shingle set matches nothing). */
  def minHashSig(text: Column, n: Int = 3, k: Int = 16): Column =
    graftx.column(MinHashSig(graftx.expr(text), n, k))

  /** `minhash_bands(text, n, k, rowsPerBand)` → array<bigint> of per-band
    * hashes (LSH banding fused with signature computation); NULL for
    * short docs — `posexplode` then emits no rows, which is exactly the
    * "empty set joins nothing" semantics.
    *
    * Contract: `rowsPerBand` must divide `k` evenly — every signature
    * lane belongs to exactly one band. A non-divisible width throws
    * `IllegalArgumentException` (at expression construction here, and
    * again in the kernel for the stored-signature path) rather than
    * silently dropping the trailing lanes. */
  def minHashBands(text: Column, n: Int = 3, k: Int = 16, rowsPerBand: Int = 4): Column =
    graftx.column(MinHashBands(graftx.expr(text), n, k, rowsPerBand))

  /** `band_hashes(sig, rowsPerBand)` → per-band hashes of an
    * already-computed signature column — the stored-index path:
    * identical buckets to [[minHashBands]] without re-running the text
    * kernel (band_hashes(minhash_sig(t)) ≡ minhash_bands(t)). */
  def bandHashes(sig: Column, rowsPerBand: Int = 4): Column =
    graftx.column(BandHashes(graftx.expr(sig), rowsPerBand))

  /** Fraction of agreeing positions of two equal-width signatures — the
    * unbiased MinHash estimate of Jaccard similarity. */
  def sigAgreement(a: Column, b: Column): Column =
    graftx.column(SigAgreement(graftx.expr(a), graftx.expr(b)))

  /** Exact Jaccard similarity of the two texts' distinct word-n-gram
    * shingle sets. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    graftx.column(NgramJaccard(graftx.expr(a), graftx.expr(b), n))

  /** `lang_id(text)` → language code by stopword-token argmax ("und"
    * when no hits) — one tokenize pass, no regex. */
  def langId(text: Column): Column =
    graftx.column(LangIdExpr(graftx.expr(text)))

  /** `stopword_hits(text, langIdx)` → count of tokens in that
    * language's stopword list. */
  def stopwordHits(text: Column, langIdx: Int): Column =
    graftx.column(StopwordHitsExpr(graftx.expr(text), langIdx))

  /** `rolling_fingerprint(text)` → md5-token polynomial fold in one
    * pass. */
  def rollingFingerprint(text: Column): Column =
    graftx.column(RollingFingerprintExpr(graftx.expr(text)))

  /** `ws_token_count(text)` → whitespace-run token count (the `\S+`
    * count) in one pass. */
  def wsTokenCount(text: Column): Column =
    graftx.column(WsTokenCountExpr(graftx.expr(text)))

  /** `quality_score(text)` → the fused one-pass quality heuristic. */
  def qualityScore(text: Column): Column =
    graftx.column(QualityScoreExpr(graftx.expr(text)))

  /** `repetition_stats(text)` → array<double>
    * [dup_token_frac, top_bigram_frac] in one tokenize pass — the
    * Gopher/C4-style intra-document repetition quality signals. */
  def repetitionStats(text: Column): Column =
    graftx.column(RepetitionStatsExpr(graftx.expr(text)))

  /** `quality_stats(text)` → array<double> [chars, punct, toks] — the
    * quality scan's raw counts in one pass, for learned weightings
    * (t53) instead of the fixed [[qualityScore]] heuristic. */
  def qualityStats(text: Column): Column =
    graftx.column(QualityStatsExpr(graftx.expr(text)))

  /** `shingle_hashes(text, n)` → array<bigint> of the 64-bit word-n-gram
    * shingle hashes, in document order (duplicates kept — apply
    * `array_distinct` for set semantics). Empty array for docs with
    * fewer than n tokens. The building block for decontamination and
    * overlap analyses that need the shingles themselves rather than a
    * fixed-width signature. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graftx.column(ShingleHashes(graftx.expr(text), n))

  /** `char_shingle_hashes(text, L)` → array<bigint> of 64-bit hashes of
    * every L-char window (stride 1), in document order — the
    * character-granularity building block for exact-substring dedup
    * (SpanDedup.duplicateCharSpans). Feed NORMALIZED text so positions
    * replay in the SQL oracle. Empty array below L chars. */
  def charShingleHashes(text: Column, L: Int): Column =
    graftx.column(CharShingleHashes(graftx.expr(text), L))

  /** 64-bit SimHash over the normalized tokens. */
  def simHash64(text: Column): Column =
    graftx.column(SimHash64(graftx.expr(text)))

  /** Canonical text normalization (lowercase, collapse non-alnum runs,
    * trim) — single-pass kernel replacing the regexp_replace chain. */
  def normalizeText(text: Column): Column =
    graftx.column(NormalizeText(graftx.expr(text)))
}

case class NormalizeText(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.minHash(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.TextHashImpl.minHash($c, $n, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class BandHashes(child: Expression, rowsPerBand: Int)
    extends UnaryExpression {
  require(rowsPerBand > 0, s"band_hashes: rowsPerBand must be positive, got $rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.bandHashes(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextHashImpl.bandHashes($c, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

case class StopwordHitsExpr(child: Expression, langIdx: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "stopword_hits"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.stopwordHits(input.asInstanceOf[UTF8String], langIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.stopwordHits($c, $langIdx)")

  override protected def withNewChildInternal(newChild: Expression): StopwordHitsExpr =
    copy(child = newChild)
}

case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.rollingFingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.rollingFingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

case class WsTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.wsTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)
}

case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.qualityScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.qualityScore($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

case class QualityStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quality_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.qualityStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.qualityStats($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.shingleHashesData(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.shingleHashesData($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

case class CharShingleHashes(child: Expression, L: Int)
    extends UnaryExpression {
  require(L >= 2, s"char shingle width must be >= 2, got $L")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.charShingleHashesData(input.asInstanceOf[UTF8String], L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.charShingleHashesData($c, $L)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

case class MinHashBands(child: Expression, n: Int, k: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(k % rowsPerBand == 0, s"k=$k must be a multiple of rowsPerBand=$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.minHashBands(input.asInstanceOf[UTF8String], n, k, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.TextHashImpl.minHashBands($c, $n, $k, $rowsPerBand);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "minhash_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashImpl.sigAgreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextHashImpl.sigAgreement($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHashImpl.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.TextHashImpl.ngramJaccard($a, $b, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.simHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashImpl.simHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
