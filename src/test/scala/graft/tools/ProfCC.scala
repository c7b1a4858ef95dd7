package graft.tools

import org.apache.spark.sql.functions._

/** Round-14 optimization dissection for the star-contraction kernel:
  * times `Dedup.connectedComponents` on the REAL pair inputs of its
  * two heaviest batch consumers (t21's MinHash pairs, v24's cosine
  * pairs) and steps the large/small-star loop manually to report how
  * many rounds run and where the time goes (per-round contraction vs
  * the convergence check). Run before and after the early fixed-point
  * detection change to attribute the delta.
  *
  * Usage: sbt "Test/runMain graft.tools.ProfCC"
  */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.Dedup

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    def dissect(tag: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
      println(s"[prof] $tag: pairs=${p.count()}")
      // end-to-end, 2 reps
      for (rep <- 1 to 2) {
        val (n, t) = time(Dedup.connectedComponents(p).count())
        println(f"[prof] $tag rep$rep CC end-to-end: $t%.3f s ($n labels)")
      }
      // manual loop: per-round contraction + check cost
      var edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
        .distinct().localCheckpoint(true)
      var round = 0
      var done = false
      while (!done && round < 50) {
        val (next, tRound) = time(
          Dedup.smallStar(Dedup.largeStar(edges)).localCheckpoint(true))
        val (star, tCheck) = time(Dedup.isStarForest(next))
        println(f"[prof] $tag round ${round + 1}: contraction $tRound%.3f s " +
          f"(edges=${next.count()}), isStarForest=$star $tCheck%.3f s")
        edges = next; done = star; round += 1
      }
    }

    val docs = graft.queries.Tables.documents(spark, d)
    docs.count()
    dissect("t21", Dedup.minHashPairsVerified(
      docs, col("text"), col("doc_id"), threshold = 0.5)
      .select(col("id_a"), col("id_b")))
    val emb = graft.queries.Tables.embeddings(spark, d)
    emb.count()
    dissect("v24", graft.operators.Similarity.cosineNearDupPairs(
      emb, col("embedding"), col("vec_id"),
      threshold = 0.2, nBits = 3, nBands = 1, centered = false)
      .select(col("id_a"), col("id_b")))
    spark.stop()
  }
}
