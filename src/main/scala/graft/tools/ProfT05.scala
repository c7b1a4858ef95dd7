package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.queries.Tables

/** One-off profiler for the BENCH r5 t05_lang_id anomaly (1.95 s min-of-3
  * vs 0.22–0.36 s for the structurally identical t02/t06/t07). Runs the
  * t05 plan and dissected variants back-to-back with per-rep wall times
  * and GC deltas, so the cost can be attributed to the kernel, the
  * coalesce wrapper, the sort, or JVM state. Findings recorded in
  * PROFILE_T05.md.
  */
object ProfT05 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm file index

    def run(name: String, reps: Int)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val g0 = graft.util.JvmStats.gcMs(); val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, graft.util.JvmStats.gcMs() - g0)
      }
      println(f"$name%-28s reps=${times.map { case (t, g) => f"$t%.3fs(gc=${g}ms)" }.mkString(" ")}")
    }

    val reps = 3
    // the real t05 plan
    run("t05_full", reps)(docs
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id")))
    // without the coalesce wrapper
    run("t05_no_coalesce", reps)(docs
      .select(col("doc_id"), graft.expressions.TextHash.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id")))
    // without the sort
    run("t05_no_sort", reps)(docs
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred")))
    // kernel only, no doc_id
    run("t05_kernel_only", reps)(docs
      .select(TextFunctions.langId(col("text")).as("lang_pred")))
    // sibling t02 for reference
    run("t02_fingerprint", reps)(docs
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id")))
    // sort only, no kernel
    run("sort_only", reps)(docs.select(col("doc_id"), col("text")).orderBy(col("doc_id")))
    // t05 again at the END (order sensitivity / JVM-state check)
    run("t05_full_again", reps)(docs
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id")))
    spark.stop()
  }
}
