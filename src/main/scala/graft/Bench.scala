package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given SF dir and
  * prints one JSON line. Queries run in sorted-name order (stable
  * across rounds); a warm-up pass reads each table once so the first
  * measured query doesn't absorb file-index building and JIT warm-up.
  *
  * Harness guarantees (round-7/8 hardening):
  *  - a query that THROWS is recorded (`errors` map + its name in the
  *    detail entry) and the process exits nonzero — a broken query can
  *    never be "measured" at near-zero and look green;
  *  - outlier policy: any query whose min-of-reps exceeds its baseline
  *    (per-query MIN over the last TWO runs' artifacts, from
  *    BENCH_HISTORY.json) by the noise threshold — value >
  *    max(1.5×base, base+0.3 s) — is automatically re-measured at the
  *    end of the suite (queue empty, post-GC), and the 5 SLOWEST
  *    non-measurement queries re-run unconditionally (r7's t21 slipped
  *    a 2×-only policy exactly there), so committed environment noise
  *    can't cry wolf and the expensive tail always carries proof;
  *  - the LAST stdout line is a compact self-contained JSON small
  *    enough to survive the driver's ~2000-char log-tail capture even
  *    at 120+ queries: SHORT query keys (the unique `q01`/`t30`/`v17`
  *    prefix; full name where there is no numbered prefix) and
  *    3-decimal values. The IDENTICAL line with FULL query names is
  *    written to BENCH_COMPACT.json (committed, driver-readable
  *    verbatim), and the full per-rep/GC detail goes to
  *    BENCH_LAST.json. At 114 full names × full-precision doubles the
  *    old line measured ~4 KB — truncation was structural, not a
  *    formatting accident (r6/r7 artifacts lost their maps to it).
  */
object Bench {

  /** One query's measurement: per-rep (wall sec, gc ms), first error if
    * any rep threw, and — when the outlier policy fired — the re-run's
    * reps plus the baseline that triggered it (None for the
    * unconditional slowest-5 re-runs). */
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

  /** Queries that TRAIN for ~100 micro-batches by design — their cost
    * is the measurement, not a query plan; the unconditional
    * slowest-5 re-run skips them (they'd always occupy the top slots
    * and re-training doubles a multi-second measurement for nothing). */
  val measurementQueries: Set[String] = Set("gng_throughput", "gng_scale")

  /** Noise threshold vs baseline: 1.5× relative with a +0.3 s absolute
    * floor — sub-0.2 s queries jitter ±0.1 s on JVM state alone, so a
    * pure ratio would re-run half the suite, and a pure delta would
    * never catch a 10× regression on a fast query. */
  def isSuspect(value: Double, base: Double): Boolean =
    base > 0 && value > math.max(1.5 * base, base + 0.3)

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

  /** Run the whole suite with the outlier policy applied: after the
    * suite finishes (queue empty, post-GC — min over a few JVM/GC
    * states is exactly what the round-6 q12–q19 noise adjudication had
    * to do by hand), re-measure (a) every query whose min-of-reps is
    * suspect vs its baseline ([[isSuspect]]) and (b) the
    * `alwaysRerunSlowest` slowest successful non-measurement queries
    * unconditionally. */
  def measureAll(spark: SparkSession, sfDir: String,
      queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      reps: Int, baselines: Map[String, Double],
      alwaysRerunSlowest: Int = 0): Seq[Measurement] = {
    val first = queries.map { case (name, fn) => measure(spark, sfDir, name, fn, reps) }
    val slowest: Set[String] = first
      .filter(m => m.err.isEmpty && !measurementQueries.contains(m.name))
      .sortBy(-_.value).take(alwaysRerunSlowest).map(_.name).toSet
    first.map { m =>
      val base = baselines.get(m.name)
      val suspect = m.err.isEmpty && base.exists(b => isSuspect(m.value, b))
      if (!suspect && !slowest.contains(m.name)) m
      else {
        System.gc() // the re-run answers "is it the plan or the JVM state"
        val fn = queries.collectFirst { case (n, f) if n == m.name => f }.get
        val again = measure(spark, sfDir, m.name, fn, reps)
        m.copy(rerunReps = again.reps, err = m.err.orElse(again.err),
          baseline = if (suspect) base else None)
      }
    }
  }

  private def fmt(t: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(t))

  /** 3-decimal render for the compact lines (±0.5 ms — far below
    * run-to-run noise); -1 error sentinels stay integral. */
  private def fmt3(t: Double): String =
    if (t == -1.0) "-1"
    else String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))

  /** Integer-millisecond render for the stdout tail line (full-precision
    * seconds live in the committed artifacts); -1 error sentinels stay. */
  private def fmtMs(t: Double): String =
    if (t == -1.0) "-1" else math.round(t * 1000.0).toString

  /** The short artifact key for a query name: the `q01`/`t30`/`v17`
    * letters+digits prefix before the first underscore, which is unique
    * across the suite by naming convention; names without such a prefix
    * (gng_*) compress to first-token + initials (`gng_throughput` →
    * `gng_t`). Collisions (two names sharing a key) fall back to full
    * names for the colliding set — the line gets longer but never
    * ambiguous (`gng_purity`/`gng_prototypes` both propose `gng_p` and
    * both stay full). */
  def shortKeys(names: Seq[String]): Map[String, String] = {
    val Pref = "^([a-z]+[0-9]+)_.+$".r
    def compress(n: String, tailLetters: Int): String = n.split('_') match {
      case toks if toks.length >= 2 =>
        toks.head + "_" + toks.tail.map(_.take(tailLetters)).mkString
      case _ => n
    }
    val proposed = names.map {
      case n @ Pref(p) => n -> p
      case n => n -> compress(n, 1)
    }
    val clash1 = proposed.groupBy(_._2).filter(_._2.size > 1).keySet
    // initials collision → widen the colliding set to 2 letters per
    // token before surrendering to full names
    val retried = proposed.map {
      case (n, p) if clash1.contains(p) && !n.matches("^[a-z]+[0-9]+_.+$") =>
        n -> compress(n, 2)
      case np => np
    }
    // zero-strip the numeric suffix ("q01" → "q1"): saves ~1 char on
    // most of the suite, keeping the stdout line inside the driver's
    // 2000-char tail capture as the suite grows. Collision-free by
    // construction — distinct padded numbers stay distinct unpadded —
    // but the clash pass below still guards it.
    val stripped = retried.map { case (n, p) =>
      n -> p.replaceAll("^([a-z]+)0+(?=[0-9])", "$1")
    }
    val clash2 = stripped.groupBy(_._2).filter(_._2.size > 1).keySet
    stripped.map { case (n, p) => n -> (if (clash2.contains(p)) n else p) }.toMap
  }

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

  /** One compact line: totals + per-query values at 3 decimals, NO
    * per-rep detail. `keyFor` chooses the query-key rendering — full
    * names for the committed BENCH_COMPACT.json, [[shortKeys]] for the
    * stdout tail line. Outliers carry first/rerun minima (the proof the
    * number converged); errors carry the message. */
  def compactJson(results: Seq[Measurement], sfDir: String,
      keyFor: String => String = identity): String = {
    val qs = results.map(m => "\"" + keyFor(m.name) + "\":" + fmt3(m.value))
      .mkString("{", ",", "}")
    val outliers = results.filter(_.isOutlier)
      .map(m => "\"" + keyFor(m.name) + "\":{\"f\":" + fmt3(m.reps.map(_._1).min) +
        ",\"r\":" + fmt3(m.rerunReps.map(_._1).min) +
        m.baseline.map(b => ",\"b\":" + fmt3(b)).getOrElse("") + "}")
      .mkString("{", ",", "}")
    val errs = errorsJson(results, keyFor)
    val total = results.filter(_.err.isEmpty).map(_.value).sum
    s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs,"outliers":$outliers,"errors":$errs,"sf":"$sfDir"}"""
  }

  /** Split a short key into (group, member) for the prefix-grouped
    * stdout map: `q12` → ("q","12"), `gng_t` → ("gng","t"). The join
    * rule is recoverable from the member's first char (digit → direct
    * concat, else '_' join); a key that can't split, or whose split
    * would collide with another key's inside the same group, becomes
    * its own group with an empty member — longer but never ambiguous. */
  def groupKey(k: String): (String, String) = {
    val LetterDigit = "^([a-z]+)([0-9]+)$".r
    k match {
      case LetterDigit(g, d) => (g, d)
      case _ if k.contains('_') =>
        val i = k.indexOf('_')
        val mem = k.substring(i + 1)
        // a digit-first member ("gng_2a" → "2a") would read back as a
        // direct concat ("gng2a") under the join rule; empty members
        // ("gng_") can't reconstruct at all — both degrade to own groups
        if (mem.isEmpty || mem.head.isDigit) (k, "")
        else (k.substring(0, i), mem)
      case _ => (k, "")
    }
  }

  /** The stdout tail line — the one artifact that must survive the
    * driver's 2000-char tail capture WITH sbt's closing banner behind
    * it (r6/r7 shipped truncated lines; budget ≈ 1920 chars). Round-9
    * grouped the per-query map by short-key letter prefix; round-10
    * (VERDICT r9 #4 — the line hit ~1800/1920 at 169 queries) adds
    * ARRAY encoding for the dominant case: a group whose members are
    * all numeric and form a consecutive run renders as
    * `"q":[1,412,388,…]` — first element the STARTING member number,
    * the rest the ms values in member order (member i = start + i-1).
    * That drops `"NN":` from every numbered query (~5 chars × 160
    * queries ≈ 800 chars). Non-numeric or gapped groups keep the
    * round-9 object form `"gng":{"t":4868,…}` — the reader
    * distinguishes by JSON type. Values stay INTEGER MILLISECONDS
    * (`"qunit":"ms"`), outliers a COUNT, errors truncated, sf a
    * basename. `"full"` points to BENCH_COMPACT.json (full names,
    * decimal seconds, complete outlier/re-run detail). Total `value`
    * stays decimal SECONDS (the driver contract). */
  /** Compact correctness summary for the stdout tail (round-11 verdict
    * #8: the driver-side CORRECTNESS artifact arrived empty two rounds
    * running — the bench log tail must carry enough to diagnose that
    * loss alone): `{"pass":N,"q":N,"oracled":N,"fail":"name"}` read
    * from the committed CORRECTNESS_SELF.json (the builder's own
    * check_oracle artifact). Unreadable/absent file → None (the field
    * is omitted, never a bench failure). ~45 chars — well inside the
    * line budget. */
  def correctnessSummary(path: String = "CORRECTNESS_SELF.json"): Option[String] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      val qs = node.get("queries")
      val names = qs.fieldNames()
      var firstFail: String = null
      while (names.hasNext && firstFail == null) {
        val n = names.next()
        val q = qs.get(n)
        val rowsOnly = q.has("rows_only") && q.get("rows_only").asBoolean()
        val ok = (!q.has("err") || q.get("err").isNull) &&
          (if (rowsOnly) q.get("rows_match").asBoolean()
           else q.get("rows_match").asBoolean() && q.get("schema_match").asBoolean() &&
             q.get("hash_match").asBoolean())
        if (!ok) firstFail = n
      }
      Some(s"""{"pass":${node.get("n_pass").asInt()},"q":${node.get("n_queries").asInt()},""" +
        s""""oracled":${node.get("n_oracled").asInt()},"fail":${quote(
          if (firstFail == null) "" else firstFail.take(30))}}""")
    } catch { case _: Throwable => None }

  /** The TWO-RUN triage rule (codifying the r11/r12 variance lesson):
    * a query is a CONFIRMED regression only when its value exceeds the
    * noise threshold vs the historical best in THIS run AND in the
    * previous stored run — a single-run flip is ambient (±10-15%
    * whole-suite envelope; r12's t68 flip reverted unprompted).
    * BENCH_NOTES.md documents the rule; the stdout/compact artifacts
    * carry the confirmed list so triage never starts from one run. */
  def confirmedFlags(results: Seq[Measurement],
      history: Seq[Map[String, Double]]): Seq[String] = {
    if (history.isEmpty) return Nil
    val base = baselinesFrom(history)
    val prev = history.last
    results.collect {
      case m if m.err.isEmpty &&
        base.get(m.name).exists(b => isSuspect(m.value, b)) &&
        prev.get(m.name).zip(base.get(m.name))
          .exists { case (p, b) => isSuspect(p, b) } => m.name
    }
  }

  def compactStdoutJson(results: Seq[Measurement], sfDir: String,
      corr: Option[String] = None, flags: Seq[String] = Nil): String = {
    val keys = shortKeys(results.map(_.name))
    val split0 = results.map(m => keys(m.name) -> groupKey(keys(m.name)))
    // a (group, member) claimed by two distinct short keys (e.g. "q1"
    // vs a pathological "q_1") is ambiguous under the join rule — every
    // claimant degrades to its own single-key group
    val clashed = split0.groupBy(_._2).filter(_._2.size > 1).keySet
    val split = split0.map { case (k, gm) =>
      k -> (if (clashed.contains(gm)) (k, "") else gm)
    }.toMap
    val ordered = results.map(m => (split(keys(m.name)), m))
    val groupOrder = ordered.map(_._1._1).distinct
    val byGroup = ordered.groupBy(_._1._1)
    val qs = groupOrder.map { g =>
      val entries = byGroup(g).map { case ((_, mem), m) => mem -> fmtMs(m.value) }
      // length cap: an all-digit member longer than 9 chars would
      // overflow toInt — degrade it to the object form instead
      val nums = entries.map(_._1).collect {
        case m if m.length <= 9 && m.matches("[0-9]+") => m.toInt
      }
      val body =
        if (nums.size == entries.size && nums.nonEmpty &&
            nums.sorted == (nums.min to nums.min + nums.size - 1).toSeq)
          // consecutive numeric run → positional array, start number first
          (nums.min.toString +: entries.sortBy(_._1.toInt).map(_._2))
            .mkString("[", ",", "]")
        else entries.map { case (mem, v) => "\"" + mem + "\":" + v }
          .mkString("{", ",", "}")
      "\"" + g + "\":" + body
    }.mkString("{", ",", "}")
    val errs = errorsJson(results, keys, maxLen = 60)
    val total = results.filter(_.err.isEmpty).map(_.value).sum
    val sf = java.nio.file.Paths.get(sfDir).getFileName.toString
    val totalStr = String.format(java.util.Locale.ROOT, "%.1f", Double.box(total))
    val corrField = corr.map(c => s""""corr":$c,""").getOrElse("")
    // flags (the two-run confirmed-regression list) rides the line only
    // when non-empty — the all-clear case pays zero tail-capture bytes
    val flagsField =
      if (flags.isEmpty) ""
      else s""""flags":${flags.map("\"" + _ + "\"").mkString("[", ",", "]")},"""
    // errors, like flags, rides only when non-empty — the all-green
    // line stays minimal (consumers treat a missing map as empty)
    val errsField = if (errs == "{}") "" else s""""errors":$errs,"""
    s"""{"qunit":"ms","full":"BENCH_COMPACT.json",$corrField"metric":"total","value":$totalStr,"unit":"sec","queries":$qs,"out":${results.count(_.isOutlier)},$flagsField$errsField"sf":"$sf"}"""
  }

  private def errorsJson(results: Seq[Measurement],
      keyFor: String => String = identity, maxLen: Int = Int.MaxValue): String =
    results.flatMap(m => m.err.map(e =>
      "\"" + keyFor(m.name) + "\":" + quote(e.take(maxLen))))
      .mkString("{", ",", "}")

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  /** Previous run's per-query values, from a persisted artifact
    * (detail or compact — both carry a `queries` map). Absent/
    * unreadable file → no baselines → no threshold re-runs, never a
    * failure. A baseline from a DIFFERENT SF dir is ignored too —
    * comparing an sf0.1 run against sf0.001 numbers would flag the
    * whole suite as outliers and double the suite. */
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

  /** Rolling per-query history: the last `keep` runs' value maps for
    * one SF dir, persisted as BENCH_HISTORY.json. The outlier baseline
    * is the per-query MIN across the stored runs — comparing against a
    * single prior run let r7's t21 slip through when THAT run was
    * itself noisy. A history recorded at a different SF dir is
    * discarded wholesale (same rationale as [[readBaselines]]). */
  /** Stored runs as (UTC timestamp, per-query seconds). Timestamps
    * exist so BENCH_NOTES can quote run totals ONLY from runs the
    * artifact still holds and say WHICH runs those are — round 13's
    * notes cited a 181.0 s total that a post-commit history rotation
    * had already evicted (r13 verdict item #3). Legacy stamp-less
    * files read back with "" stamps. */
  def readHistory(path: String, sfDir: String): Seq[(String, Map[String, Double])] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      if (node.get("sf") == null || node.get("sf").asText() != sfDir) Nil
      else {
        val runs = node.get("runs")
        val stamps = node.get("stamps")
        (0 until runs.size()).map { i =>
          val q = runs.get(i)
          val it = q.fieldNames()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val n = it.next(); b += n -> q.get(n).asDouble() }
          val st = if (stamps != null && i < stamps.size()) stamps.get(i).asText() else ""
          st -> b.result()
        }
      }
    } catch { case _: Throwable => Nil }

  /** Per-query min across history runs — the outlier baseline. Error
    * sentinels (-1) never become baselines. */
  def baselinesFrom(history: Seq[Map[String, Double]]): Map[String, Double] =
    history.flatten.filter(_._2 > 0).groupMapReduce(_._1)(_._2)(math.min)

  def writeHistory(path: String, sfDir: String,
      history: Seq[(String, Map[String, Double])], keep: Int = 2): Unit = {
    val kept = history.takeRight(keep)
    val runsJson = kept.map { case (_, run) =>
      run.toSeq.sortBy(_._1).map { case (n, v) => "\"" + n + "\":" + fmt3(v) }
        .mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val stampsJson = kept.map(s => "\"" + s._1 + "\"").mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      s"""{"sf":"$sfDir","stamps":$stampsJson,"runs":$runsJson}""" + "\n")
  }

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
    val compactFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_COMPACT", "BENCH_COMPACT.json")
    val historyFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH_HISTORY.json")
    // baselines: per-query min over the last two runs (BENCH_HISTORY),
    // falling back to the single prior artifact when no history exists
    val history = readHistory(historyFile, sfDir)
    val baselines =
      if (history.nonEmpty) baselinesFrom(history.map(_._2))
      else readBaselines(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", outFile), sfDir)

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = measureAll(spark, sfDir, queries, reps, baselines,
      alwaysRerunSlowest = 5)

    // persist the FULL detail line and the full-name compact line
    // first, roll the history, then print the short-key compact line
    // LAST so a stdout tail capture gets a complete parseable artifact
    val full = detailJson(results, sfDir)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(compactFile),
      compactJson(results, sfDir) + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $compactFile: $e") }
    // partial runs (SPARK_GRAFT_BENCH_ONLY) don't enter history — a
    // 3-query run would otherwise erase the suite-wide baselines
    if (only.isEmpty)
      try writeHistory(historyFile, sfDir,
        history :+ (java.time.Instant.now().toString.take(19) + "Z" ->
          results.filter(_.err.isEmpty).map(m => m.name -> m.value).toMap))
      catch { case e: Throwable => System.err.println(s"[bench] could not write $historyFile: $e") }
    println(compactStdoutJson(results, sfDir, correctnessSummary(),
      confirmedFlags(results, history.map(_._2))))
    spark.stop()
    val failed = results.filter(_.err.isDefined)
    if (failed.nonEmpty) {
      failed.foreach(m => System.err.println(s"[bench] FAILED ${m.name}: ${m.err.get}"))
      sys.exit(1)
    }
  }
}
