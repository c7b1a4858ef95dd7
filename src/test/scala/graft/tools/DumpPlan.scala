package graft.tools

object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val p = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), p)
    spark.stop()
  }
}
