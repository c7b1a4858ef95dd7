package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.GraftSession.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // oracle_sql.json is written LAST (dump-time oracles need the
    // queries to have run) — so a crash mid-dump must not leave a
    // PREVIOUS run's file behind, or the compare would grade this
    // run's parquet against stale SQL and could pass falsely. But a
    // SUBSET run (SPARK_GRAFT_VERIFY_ONLY, or any JVM where a
    // dump-time-oracle family didn't execute) must NOT shrink the
    // file either — round 11's regression: a piecewise run rewrote
    // oracle_sql.json without the 17 trained-model oracles (which
    // only exist after the gng family runs; GngQueries
    // .soleTrainedCentroids is None in a JVM that never trained),
    // silently downgrading hash-verified queries to rows-only in the
    // closing gate. So: move the previous file ASIDE (crash mid-dump
    // leaves no live oracle_sql.json → the compare fails loud, never
    // falsely passes), and merge it back at write time for queries
    // NOT re-run in this invocation — their parquet dumps are also
    // from the previous run, so previous SQL is the matching SQL.
    val livePath = Paths.get(s"$outDir/oracle_sql.json")
    val prevPath = Paths.get(s"$outDir/oracle_sql.prev.json")
    if (Files.exists(livePath)) {
      Files.deleteIfExists(prevPath)
      Files.move(livePath, prevPath)
    }
    // Local iteration aid: restrict the dump to a comma-separated query
    // subset. The driver never sets this — full sweep by default.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ran = scala.collection.mutable.Set[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      ran += name
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Merge-preserve: previous-run oracles for queries NOT re-run in
    // this invocation survive (their dumps are the previous run's
    // too); queries that RAN always take this run's oracle — including
    // "ran but now un-oracled", which would be a real regression the
    // gate must see, not paper over. Keys no longer in the contract
    // are dropped (stale SQL must not grade orphan dumps).
    val prev: Map[String, String] =
      if (Files.exists(prevPath))
        try parseStringMap(Files.readString(prevPath))
        catch { case e: Exception =>
          System.err.println(s"[verify] previous oracle_sql.json unparseable, " +
            s"ignoring: ${e.getMessage}")
          Map.empty
        }
      else Map.empty
    val fresh = SparkEntry.oracleSql
    val merged = mergeOracles(prev, fresh, ran.toSet, SparkEntry.queries.keySet)
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(livePath, json)
    Files.deleteIfExists(prevPath)
    println(s"[verify] oracle_sql.json: ${fresh.size} from this run" +
      s" + ${merged.size - fresh.size} preserved = ${merged.size} total")
    spark.stop()
  }

  /** Merge-preserve rule (see [[main]]): previous-run oracles survive
    * for known queries not re-run; anything that ran takes this run's
    * oracle status (including "ran but un-oracled" — a real
    * regression); unknown keys drop. */
  private[graft] def mergeOracles(prev: Map[String, String],
      fresh: Map[String, String], ran: Set[String],
      known: Set[String]): Map[String, String] =
    prev.view.filterKeys(k => known(k) && !ran(k)).toMap ++ fresh

  /** Parse the flat `{"k":"v",...}` shape this object itself writes
    * (string keys/values only, escapes per [[main]]'s `q`). Throws on
    * anything else — the caller treats that as "no previous file". */
  private[graft] def parseStringMap(s: String): Map[String, String] = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      require(i < s.length && s(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"'  => b += '"'
            case '\\' => b += '\\'
            case '/'  => b += '/'
            case 'n'  => b += '\n'
            case 'r'  => b += '\r'
            case 't'  => b += '\t'
            case 'b'  => b += '\b'
            case 'f'  => b += '\f'
            case 'u'  =>
              b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => throw new IllegalArgumentException(s"bad escape \\$c at $i")
          }
        } else b += s(i)
        i += 1
      }
      i += 1
      b.result()
    }
    val out = Map.newBuilder[String, String]
    expect('{')
    skipWs()
    if (i < s.length && s(i) != '}') {
      var more = true
      while (more) {
        skipWs()
        val k = str()
        expect(':')
        skipWs()
        out += k -> str()
        skipWs()
        if (i < s.length && s(i) == ',') { i += 1 } else more = false
      }
    }
    expect('}')
    out.result()
  }
}
