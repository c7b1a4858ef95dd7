package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspection: prints `explain("formatted")` for selected
  * queries (all, when no names are given) so scan pruning
  * (`ReadSchema`), predicate pushdown (`PushedFilters`), join strategy
  * (BroadcastHashJoin vs SortMergeJoin) and codegen spans
  * (`WholeStageCodegen`) can be audited per query.
  *
  * Usage: runMain graft.Plans <sfDir> [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.util.GraftSession.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n===================== $n =====================")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"  [plan failed: ${e.getMessage}]") }
    }
    spark.stop()
  }
}
