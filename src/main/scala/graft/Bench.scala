package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given SF dir and
  * prints one JSON line. Queries run in sorted-name order (stable
  * across rounds); a warm-up pass reads each table once so the first
  * measured query doesn't absorb file-index building and JIT warm-up.
  *
  * Harness guarantees (round-7 hardening):
  *  - a query that THROWS is recorded (`errors` map + its name in the
  *    detail entry) and the process exits nonzero — a broken query can
  *    never be "measured" at near-zero and look green;
  *  - outlier policy: any query whose min-of-reps exceeds its value in
  *    the previous run's artifact (BENCH_LAST.json, or
  *    `SPARK_GRAFT_BENCH_BASELINE`) by >2× is automatically re-measured
  *    at the end of the suite (queue empty, post-GC) and BOTH numbers
  *    land in the artifact — committed environment noise can't cry
  *    wolf;
  *  - the LAST stdout line is a compact self-contained JSON (per-query
  *    seconds, errors, outliers) small enough to survive a log-tail
  *    capture; the full per-rep/GC detail goes to BENCH_LAST.json.
  */
object Bench {

  /** One query's measurement: per-rep (wall sec, gc ms), first error if
    * any rep threw, and — when the outlier policy fired — the re-run's
    * reps plus the baseline that triggered it. */
  final case class Measurement(
      name: String,
      reps: Seq[(Double, Long)],
      err: Option[String],
      rerunReps: Seq[(Double, Long)] = Nil,
      baseline: Option[Double] = None) {
    /** Best estimate: min over all successful reps, initial + re-run. */
    def value: Double = {
      val all = reps ++ rerunReps
      if (err.isDefined || all.isEmpty) -1.0 else all.map(_._1).min
    }
    def isOutlier: Boolean = rerunReps.nonEmpty
  }

  /** Time one query `reps` times; the noop write (not count()) forces
    * full materialization of every output column — count() lets the
    * optimizer prune the projections, so per-row kernels would bench as
    * never-evaluated. An exception is RECORDED, never swallowed. */
  def measure(spark: SparkSession, sfDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      reps: Int): Measurement = {
    var err: Option[String] = None
    // stop after the first failing rep: the query's value is -1 either
    // way, and a SLOW failure (OOM, timeout) re-run for every remaining
    // rep would multiply its cost by reps before the suite can move on
    val measured = (1 to reps).iterator.takeWhile(_ => err.isEmpty).map { _ =>
      val g0 = graft.util.JvmStats.gcMs()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        err = Some(s"${e.getClass.getName}: ${e.getMessage}")
      }
      ((System.nanoTime() - t0) / 1e9, graft.util.JvmStats.gcMs() - g0)
    }.toSeq
    Measurement(name, measured, err)
  }

  /** Run the whole suite with the outlier policy applied: queries whose
    * min-of-reps regressed >2× vs `baselines` re-measure after the
    * suite finishes (min over a few JVM/GC states is exactly what the
    * round-6 q12–q19 noise adjudication had to do by hand). */
  def measureAll(spark: SparkSession, sfDir: String,
      queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      reps: Int, baselines: Map[String, Double]): Seq[Measurement] = {
    val first = queries.map { case (name, fn) => measure(spark, sfDir, name, fn, reps) }
    first.map { m =>
      val base = baselines.get(m.name)
      val suspect = m.err.isEmpty && base.exists(b => b > 0 && m.value > 2 * b)
      if (!suspect) m
      else {
        System.gc() // the re-run answers "is it the plan or the JVM state"
        val fn = queries.collectFirst { case (n, f) if n == m.name => f }.get
        val again = measure(spark, sfDir, m.name, fn, reps)
        m.copy(rerunReps = again.reps, err = m.err.orElse(again.err), baseline = base)
      }
    }
  }

  private def fmt(t: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(t))

  /** The full artifact line: per-query values + per-rep wall/GC detail
    * (+ re-run reps and trigger baseline for outliers) + errors. */
  def detailJson(results: Seq[Measurement], sfDir: String): String = {
    val qs = results.map(m => "\"" + m.name + "\":" + m.value).mkString("{", ",", "}")
    val detail = results.map { m =>
      val repsJson = m.reps.map(r => fmt(r._1)).mkString("[", ",", "]")
      val gcJson = m.reps.map(_._2).mkString("[", ",", "]")
      val extra = new StringBuilder
      if (m.isOutlier) {
        extra ++= ",\"rerun_reps\":" + m.rerunReps.map(r => fmt(r._1)).mkString("[", ",", "]")
        extra ++= ",\"rerun_gc_ms\":" + m.rerunReps.map(_._2).mkString("[", ",", "]")
        m.baseline.foreach(b => extra ++= ",\"baseline\":" + fmt(b))
      }
      m.err.foreach(e => extra ++= ",\"err\":" + quote(e))
      "\"" + m.name + "\":{\"reps\":" + repsJson + ",\"gc_ms\":" + gcJson + extra + "}"
    }.mkString("{", ",", "}")
    val errs = errorsJson(results)
    val total = results.filter(_.err.isEmpty).map(_.value).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"detail":$detail,"errors":$errs,"sf":"$sfDir"}"""
  }

  /** The stdout line: same totals/queries/errors, NO per-rep detail —
    * compact enough that a tail capture of the process log still holds
    * the whole line (the round-6 artifact lost its map to truncation). */
  def compactJson(results: Seq[Measurement], sfDir: String): String = {
    val qs = results.map(m => "\"" + m.name + "\":" + m.value).mkString("{", ",", "}")
    val outliers = results.filter(_.isOutlier)
      .map(m => "\"" + m.name + "\":{\"first_min\":" + fmt(m.reps.map(_._1).min) +
        ",\"rerun_min\":" + fmt(m.rerunReps.map(_._1).min) +
        m.baseline.map(b => ",\"baseline\":" + fmt(b)).getOrElse("") + "}")
      .mkString("{", ",", "}")
    val errs = errorsJson(results)
    val total = results.filter(_.err.isEmpty).map(_.value).sum
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"outliers":$outliers,"errors":$errs,"sf":"$sfDir"}"""
  }

  private def errorsJson(results: Seq[Measurement]): String =
    results.flatMap(m => m.err.map(e => "\"" + m.name + "\":" + quote(e)))
      .mkString("{", ",", "}")

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  /** Previous run's per-query values, from its persisted artifact (the
    * baseline the outlier policy compares against). Absent/unreadable
    * file → no baselines → no re-runs, never a failure. A baseline
    * from a DIFFERENT SF dir is ignored too — comparing an sf0.1 run
    * against sf0.001 numbers would flag all 90 queries as outliers and
    * double the suite. */
  def readBaselines(path: String, sfDir: String): Map[String, Double] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      val qs = node.get("queries")
      if (qs == null || node.get("sf") == null || node.get("sf").asText() != sfDir) Map.empty
      else {
        val it = qs.fieldNames()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val n = it.next(); b += n -> qs.get(n).asDouble() }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }

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
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    val baselines = readBaselines(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", outFile), sfDir)

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = measureAll(spark, sfDir, queries, reps, baselines)

    // persist the FULL line first (per-rep wall + GC + re-runs), then
    // print the compact line LAST so a stdout tail capture gets a
    // complete parseable artifact
    val full = detailJson(results, sfDir)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    println(compactJson(results, sfDir))
    spark.stop()
    val failed = results.filter(_.err.isDefined)
    if (failed.nonEmpty) {
      failed.foreach(m => System.err.println(s"[bench] FAILED ${m.name}: ${m.err.get}"))
      sys.exit(1)
    }
  }
}
