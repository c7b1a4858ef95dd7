package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given SF dir and
  * prints one JSON line. Queries run in sorted-name order (stable
  * across rounds); a warm-up pass reads each table once so the first
  * measured query doesn't absorb file-index building and JIT warm-up. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.GraftSession.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: file listing + parquet footer reads + codegen JIT
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    try graft.queries.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }
    // min of `reps` runs per query: a single measurement is dominated by
    // JVM/GC state left by whatever ran before it (round-3 observed ±5×
    // swings on sub-second queries), so round-over-round deltas were
    // noise. The min is the stable "how fast can this plan go" number.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional comma-separated name filter for one-off re-measurement
    // of a suspect query without paying for the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val measured = (1 to reps).map { _ =>
        val g0 = graft.util.JvmStats.gcMs()
        val t0 = System.nanoTime()
        // noop write, not count(): count() lets the optimizer PRUNE the
        // projections and drop the sorts, so per-row kernels (hashes,
        // signatures, scores) were benched as never-evaluated. The noop
        // sink forces full materialization of every output column —
        // what a real consumer of the query pays.
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => () }
        ((System.nanoTime() - t0) / 1e9, graft.util.JvmStats.gcMs() - g0)
      }
      (name, measured.map(_._1).min, measured)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-rep wall times + GC-time deltas: a min-of-N hides JVM state that
    // persists across all N reps (the BENCH_r05 t05 anomaly — see
    // PROFILE_T05.md), so the artifact carries enough to attribute any
    // outlier without a re-run.
    val detail = results.map { case (k, _, m) =>
      // Locale.ROOT: the f-interpolator uses the JVM default locale — a
      // comma-decimal locale would emit "1,2345" and corrupt the JSON
      val repsJson = m.map { case (t, _) =>
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(t))
      }.mkString("[", ",", "]")
      val gcJson = m.map(_._2).mkString("[", ",", "]")
      "\"" + k + "\":{\"reps\":" + repsJson + ",\"gc_ms\":" + gcJson + "}"
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"detail":$detail,"sf":"$sfDir"}"""
    println(line)
    // also persist the line to a file: the stdout capture only keeps the
    // sbt tail, so the full per-query map would otherwise be truncated
    // out of the round artifact
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    spark.stop()
  }
}
