package graft.tools

import org.apache.spark.sql.functions._

object ProfT21 {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val d = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      val pairs = t(s"rep$rep pairs plan")(graft.operators.Dedup.minHashPairsVerified(
        graft.queries.Tables.documents(spark, d), col("text"), col("doc_id"), threshold = 0.5))
      val cached = t(s"rep$rep pairs materialize")(
        { val c = pairs.persist(); println("pairs=" + c.count()); c })
      t(s"rep$rep CC")(
        println("labels=" + graft.operators.Dedup.connectedComponents(
          cached.select(col("id_a"), col("id_b"))).count()))
      cached.unpersist()
    }
    spark.stop()
  }
}
