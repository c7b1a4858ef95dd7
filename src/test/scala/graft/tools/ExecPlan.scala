package graft.tools

object ExecPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val df = graft.SparkEntry.queries(args(0))(spark, args.lift(2).getOrElse("/root/testdata/sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), p)
    println("ReusedExchange=" + "ReusedExchange".r.findAllIn(p).size +
      " Exchange=" + "Exchange".r.findAllIn(p).size +
      " ScanParquet=" + "Scan parquet".r.findAllIn(p).size)
    spark.stop()
  }
}
