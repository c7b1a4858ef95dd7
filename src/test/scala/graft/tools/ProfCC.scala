package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object ProfCC {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // drive the REAL star rounds (package-private on Dedup), not a copy
    import graft.operators.Dedup.{largeStar, smallStar}
    val pairs = (0 until 200).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
      .persist(); pairs.count()
    val edges0 = pairs.select($"id_a".as("src"), $"id_b".as("dst")).distinct().persist(mem)
    var edges = edges0
    t("initial count")(edges.count())
    for (round <- 1 to 3) {
      val next = t(s"r$round build+persist")(smallStar(largeStar(edges)).persist(mem))
      t(s"r$round count")(println("n=" + next.count()))
      t(s"r$round exceptAll")(println("same=" + next.exceptAll(edges).isEmpty))
      if (edges ne edges0) edges.unpersist(blocking = false)
      edges = next
    }
    spark.stop()
  }
}
