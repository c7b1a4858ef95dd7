package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The SQL surface of the native kernels: the GraftExtensions
  * registrations applied to the shared test session (the builder path —
  * `withExtensions` / `spark.sql.extensions` — runs the identical
  * registration list at session build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("vector kernels callable from SQL") {
    val row = spark.sql(
      """SELECT vec_dot(array(1d,2d,3d), array(4d,5d,6d)) AS d,
        |  round(vec_cosine(array(1d,0d), array(1d,0d)), 4) AS c,
        |  vec_squared_distance(array(3d,4d), array(0d,0d)) AS sq,
        |  vec_norm2(array(3d,4d)) AS n""".stripMargin).head()
    assert(row.getDouble(0) === 32.0)
    assert(row.getDouble(1) === 1.0)
    assert(row.getDouble(2) === 25.0)
    assert(row.getDouble(3) === 5.0)
  }

  test("text-hash kernels callable from SQL") {
    val row = spark.sql(
      """SELECT size(minhash_sig('a b c d e', 3, 16)) AS sig_len,
        |  minhash_sig('hi', 3, 16) AS null_sig,
        |  ngram_jaccard('a b c d', 'b c d e', 3) AS j,
        |  simhash64('alpha beta gamma') AS sh,
        |  size(binary_features(CAST('some payload bytes' AS BINARY), 8)) AS bf""".stripMargin)
      .head()
    assert(row.getInt(0) === 16)
    assert(row.isNullAt(1))
    assert(math.abs(row.getDouble(2) - 1.0 / 3.0) < 1e-9)
    assert(row.getLong(3) !== 0L)
    assert(row.getInt(4) === 8)
  }

  test("text-stat kernels callable from SQL") {
    val row = spark.sql(
      """SELECT lang_id('the cat and the dog is here') AS lang,
        |  stopword_hits('the cat and the dog', 0) AS hits,
        |  quality_score('a decent little sentence, with the usual shape.') AS q,
        |  ws_token_count('  a b   c ') AS n,
        |  rolling_fingerprint('alpha beta') AS rfp,
        |  size(shingle_hashes('a b c d e', 3)) AS nsh,
        |  repetition_stats('go go go stop') AS rep""".stripMargin)
      .head()
    assert(row.getString(0) === "en")
    assert(row.getInt(1) === 3)
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) <= 1.0)
    assert(row.getInt(3) === 3)
    assert(row.getLong(4) > 0L)
    assert(row.getInt(5) === 3)
    // "go go go stop": 4 tokens 2 distinct → dup 0.5; "go go" twice of 3 bigrams
    val rep = row.getSeq[Double](6)
    assert(rep === Seq(0.5, 2.0 / 3))
  }

  test("nearest_centroid callable from SQL with a literal centroid matrix") {
    val row = spark.sql(
      """SELECT nearest_centroid(array(4d,4d), array(array(0d,0d), array(5d,5d))) AS a,
        |  nearest_centroid(array(0d,1d), array(array(0d,0d), array(5d,5d))) AS b""".stripMargin)
      .head()
    assert(row.getInt(0) === 1)
    assert(row.getInt(1) === 0)
  }

  test("SQ8 kernels and vec_min_max callable from SQL") {
    // 2-d toy: dim0 range [0,10] → scale 10/255; dim1 constant → scale 0
    val row = spark.sql(
      """SELECT sq_adc(
        |    sq_encode(array(5d, 7d), array(0d, 7d), array(0.0392156862745098d, 0d)),
        |    array(5d, 7d), array(0d, 7d), array(0.0392156862745098d, 0d)) AS selfd""".stripMargin)
      .head()
    // self-distance bounded by (scale/2)^2 on the one quantized dim
    assert(row.getDouble(0) <= math.pow(0.0392156862745098 / 2, 2) + 1e-12)
    val mm = spark.sql(
      """SELECT vec_min_max(v) AS mm FROM VALUES (array(1d, 5d)), (array(3d, 2d)) AS t(v)""")
      .head().getSeq[Double](0)
    assert(mm === Seq(1.0, 2.0, 3.0, 5.0)) // [mins ++ maxes]
  }

  test("non-literal config args are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig('a b c', 1 + 2, 16)").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
