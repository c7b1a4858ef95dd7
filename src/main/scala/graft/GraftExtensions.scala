package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions._

/** Spark session extension registering the engine's native expressions
  * as SQL functions, so the custom kernels are first-class in
  * `spark.sql(...)` (not just the Scala DSL):
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT vec_cosine(a, b), minhash_sig(text, 3, 16) FROM t")
  * }}}
  *
  * Or via config (no code change):
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  /** Register the same functions on an already-built session (for
    * notebooks/REPLs where the builder is out of reach). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }

  private def intArg(e: Expression, name: String, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  /** A foldable `array<array<double>>` argument (e.g.
    * `array(array(1.0, 2.0), array(3.0, 4.0))`) evaluated at plan-build
    * time into the plain matrix the kernel wants. */
  private def matrixArg(e: Expression, name: String, fn: String): Array[Array[Double]] = {
    require(e.foldable, s"$fn: $name must be a foldable array<array<double>> literal")
    val ad = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(ad != null, s"$fn: $name must not be null")
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  /** A foldable `array<double>` argument evaluated at plan-build time. */
  private def vectorArg(e: Expression, name: String, fn: String): Array[Double] = {
    require(e.foldable, s"$fn: $name must be a foldable array<double> literal")
    val ad = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(ad != null, s"$fn: $name must not be null")
    ad.toDoubleArray()
  }

  /** (name, info, builder) for every native kernel expression. */
  val registrations: Seq[(String, ExpressionInfo, FunctionBuilder)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("vec_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    ("vec_squared_distance",
      new ExpressionInfo(classOf[SquaredDistance].getName, "vec_squared_distance"),
      (args: Seq[Expression]) => SquaredDistance(args(0), args(1))),
    ("vec_norm2",
      new ExpressionInfo(classOf[L2Norm].getName, "vec_norm2"),
      (args: Seq[Expression]) => L2Norm(args(0))),
    ("nearest_centroid",
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (args: Seq[Expression]) => NearestCentroid(args(0),
        matrixArg(args(1), "centroids", "nearest_centroid"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        intArg(args(1), "n", "minhash_sig"), intArg(args(2), "k", "minhash_sig"))),
    ("minhash_bands",
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinHashBands(args(0),
        intArg(args(1), "n", "minhash_bands"), intArg(args(2), "k", "minhash_bands"),
        intArg(args(3), "rowsPerBand", "minhash_bands"))),
    ("minhash_agreement",
      new ExpressionInfo(classOf[SigAgreement].getName, "minhash_agreement"),
      (args: Seq[Expression]) => SigAgreement(args(0), args(1))),
    ("ngram_jaccard",
      new ExpressionInfo(classOf[NgramJaccard].getName, "ngram_jaccard"),
      (args: Seq[Expression]) => NgramJaccard(args(0), args(1),
        intArg(args(2), "n", "ngram_jaccard"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("vec_sum",
      new ExpressionInfo(classOf[VectorSum].getName, "vec_sum"),
      (args: Seq[Expression]) => VectorSum(args(0)).toAggregateExpression()),
    ("lsh_bands",
      new ExpressionInfo(classOf[LshBandSignatures].getName, "lsh_bands"),
      (args: Seq[Expression]) => LshBandSignatures(args(0),
        matrixArg(args(1), "planes", "lsh_bands"),
        vectorArg(args(2), "offsets", "lsh_bands"),
        intArg(args(3), "nbits", "lsh_bands"))),
    ("binary_features",
      new ExpressionInfo(classOf[BinaryFeaturesExpr].getName, "binary_features"),
      (args: Seq[Expression]) => BinaryFeaturesExpr(args(0),
        intArg(args(1), "dim", "binary_features"))),
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args(0),
        intArg(args(1), "n", "shingle_hashes"))),
    ("lang_id",
      new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
      (args: Seq[Expression]) => LangIdExpr(args(0))),
    ("stopword_hits",
      new ExpressionInfo(classOf[StopwordHitsExpr].getName, "stopword_hits"),
      (args: Seq[Expression]) => StopwordHitsExpr(args(0),
        intArg(args(1), "langIdx", "stopword_hits"))),
    ("quality_score",
      new ExpressionInfo(classOf[QualityScoreExpr].getName, "quality_score"),
      (args: Seq[Expression]) => QualityScoreExpr(args(0))),
    ("ws_token_count",
      new ExpressionInfo(classOf[WsTokenCountExpr].getName, "ws_token_count"),
      (args: Seq[Expression]) => WsTokenCountExpr(args(0))),
    ("rolling_fingerprint",
      new ExpressionInfo(classOf[RollingFingerprintExpr].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) => RollingFingerprintExpr(args(0))),
    ("repetition_stats",
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "repetition_stats"),
      (args: Seq[Expression]) => RepetitionStatsExpr(args(0))),
    ("vec_min_max",
      new ExpressionInfo(classOf[VectorMinMax].getName, "vec_min_max"),
      (args: Seq[Expression]) => VectorMinMax(args(0)).toAggregateExpression()),
    ("sq_encode",
      new ExpressionInfo(classOf[SqEncode].getName, "sq_encode"),
      (args: Seq[Expression]) => SqEncode(args(0),
        vectorArg(args(1), "mins", "sq_encode"),
        vectorArg(args(2), "scales", "sq_encode"))),
    ("sq_adc",
      new ExpressionInfo(classOf[SqAdc].getName, "sq_adc"),
      (args: Seq[Expression]) => SqAdc(args(0),
        vectorArg(args(1), "query", "sq_adc"),
        vectorArg(args(2), "mins", "sq_adc"),
        vectorArg(args(3), "scales", "sq_adc"))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalizeExpr(args(0)))
  )
}
