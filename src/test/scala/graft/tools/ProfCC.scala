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
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      val mins = sym.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src", least($"mn", $"src").as("m"))
      sym.join(mins, "src").filter($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
        .filter($"src" =!= $"dst")
      val mins = dir.groupBy($"src").agg(min($"dst").as("m"))
      dir.join(mins, "src").select($"dst".as("src"), $"m".as("dst"))
        .filter($"src" =!= $"dst")
        .union(mins.select($"src", $"m".as("dst"))).distinct()
    }
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
