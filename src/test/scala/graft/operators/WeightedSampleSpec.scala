package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport

/** t76's A-ES weighted-sampling property checks (the key arithmetic
  * itself is pinned cross-engine by the t76 oracle at three SFs):
  * heavy-weight rows dominate the sample, the sample is deterministic
  * and partitioning-invariant, and zero/low weights still never crash
  * (w floors at 1). */
class WeightedSampleSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def keyed(df: org.apache.spark.sql.DataFrame) = {
    val w = greatest(col("n_chars"), lit(1L))
    val u = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13),
      16, 10).cast("long") + lit(1.0)) / lit(4503599627370497.0)
    df.select(col("doc_id"), w.cast("long").as("w"),
      round(log(u) / w + lit(1e-15), 12).as("k"))
  }

  // 200 docs: ids 0-99 heavy (w=5000), 100-199 light (w=50)
  private def corpus = (0L until 200L).map(i =>
    (i, if (i < 100) 5000L else 50L)).toDF("doc_id", "n_chars")

  test("heavy-weight rows dominate the sample (100x weight ratio)") {
    val top = keyed(corpus).orderBy(col("k").desc, col("doc_id")).limit(40)
      .collect().map(_.getLong(0))
    val heavy = top.count(_ < 100L)
    assert(heavy >= 35, s"expected heavy dominance at 100x weights, got $heavy/40")
    assert(heavy < 40 || top.length < 40 == false, "sample size must be 40")
  }

  test("sample is deterministic and partitioning-invariant") {
    val a = keyed(corpus).orderBy(col("k").desc, col("doc_id")).limit(40)
      .collect().map(_.getLong(0)).toSeq
    val b = keyed(corpus.repartition(13)).orderBy(col("k").desc, col("doc_id")).limit(40)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("zero and null-ish weights floor at 1 and never produce NULL keys") {
    val edge = Seq((1L, 0L), (2L, 1L), (3L, 7L)).toDF("doc_id", "n_chars")
    val rows = keyed(edge).collect()
    assert(rows.length === 3)
    assert(rows.forall(!_.isNullAt(2)), "keys must never be NULL")
  }
}
