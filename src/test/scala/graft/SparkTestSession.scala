package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Test / fork := true →
  * single JVM): small parallelism and shuffle width keep the specs fast. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.util.GraftSession.tuned(SparkSession.builder())
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // static conf: saveAsTable specs need a throwaway warehouse
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTestSupport {
  lazy val spark: SparkSession = SparkTestSession.spark
}
