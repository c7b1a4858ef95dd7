package graft.tools

import org.apache.spark.sql.functions._

/** Round-14 dissection of the s20-family per-batch fold cost:
  * times each mergeComponents fold step over the REAL s20 inputs
  * (stored components + pair slices at sf0.1), so the per-micro-batch
  * cost of the incremental maintenance path is attributable to its
  * pieces (pair distinct, contraction, star rounds, relabel).
  *
  * Usage: sbt "Test/runMain graft.tools.ProfS20"
  */
object ProfS20 {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.Dedup
    import graft.queries.Tables

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.documents(spark, d)
    docs.count()
    // the s20 fixture: stored components over doc_id % 5 != 0, pair
    // increments for the % 5 == 0 docs in 3 slices (mirrors the query)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val stored0 = Dedup.connectedComponents(
      Dedup.minHashPairsVerified(old, col("text"), col("doc_id"), threshold = 0.5)
        .select(col("id_a"), col("id_b"))).localCheckpoint(true)
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val incr = Dedup.incrementalNearDups(
      newDocs, col("text"), col("doc_id"),
      Dedup.minHashIndex(old, col("text"), col("doc_id")))
      .select(col("new_id").as("id_a"), col("dup_of").as("id_b"))
    val nn = Dedup.minHashPairsVerified(newDocs, col("text"), col("doc_id"),
      threshold = 0.5).select(col("id_a"), col("id_b"))
    val pairs = incr.unionByName(nn).localCheckpoint(true)
    println(s"[prof] stored=${stored0.count()} pairs=${pairs.count()}")

    for (rep <- 1 to 2) {
      var state = stored0
      for (slice <- 0 until 3) {
        val batch = pairs.filter(pmod(col("id_a"), lit(3)) === slice)
          .localCheckpoint(true)
        val (next, t) = time(
          Dedup.mergeComponents(state, batch).localCheckpoint(true))
        println(f"[prof] rep$rep slice$slice mergeComponents: $t%.3f s " +
          s"(batch=${batch.count()}, state=${next.count()})")
        state = next
      }
    }
    spark.stop()
  }
}
