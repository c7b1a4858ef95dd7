package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSupport

/** q58's ingestion contract: a PERMISSIVE JSONL read with an explicit
  * schema + corrupt-record column must parse every well-formed line,
  * quarantine every malformed one (carrying the raw bytes), and NEVER
  * fail the job — a real crawl always contains garbage. */
class CorruptIngestSpec extends AnyFunSuite with SparkTestSupport {

  test("malformed JSON, type clashes, and garbage lines quarantine; the job survives") {
    val dir = java.nio.file.Files.createTempDirectory("corrupt-jsonl-spec")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      Seq(
        """{"doc_id":1,"lang":"en","n_chars":10}""", // good
        """{"doc_id":2,"lang":"fr","n_chars":""",    // truncated
        "not json at all \u0000 garbage",        // garbage
        """{"doc_id":"abc","lang":"de","n_chars":5}""", // type clash on doc_id
        """{"doc_id":3,"lang":"de","n_chars":7}"""   // good
      ).mkString("\n"))
    val parsed = spark.read
      .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir.toString)
      .localCheckpoint(true)
    val good = parsed.filter(parsed("_corrupt").isNull).collect()
    val bad = parsed.filter(parsed("_corrupt").isNotNull).collect()
    assert(good.map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    assert(bad.length === 3)
    // quarantined rows carry the raw line for audit/replay
    assert(bad.map(_.getAs[String]("_corrupt")).exists(_.contains("garbage")))
    // the type-clash row must NOT leak its parseable fields into the
    // good set (the q58 branch-on-corrupt-only discipline)
    assert(!good.map(_.getString(1)).contains("de") ||
      good.count(_.getString(1) == "de") === 1)
    graft.streaming.StreamingRelational.deleteRecursively(dir)
  }

  test("parquetWithQuarantine: truncated/junk/empty files quarantine with an exact audit; intact files read") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corrupt-parquet-spec")
    // two intact files
    for (b <- 0 to 1) {
      val tmp = java.nio.file.Files.createTempDirectory(s"cps-b$b")
      (0 until 20).map(i => (b * 100L + i, s"row$i")).toDF("id", "s")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, dir.resolve(s"good$b.parquet"))
      graft.streaming.StreamingRelational.deleteRecursively(tmp)
    }
    // one truncated (interrupted upload), one junk, one zero-byte
    val tmp2 = java.nio.file.Files.createTempDirectory("cps-bad")
    (0 until 20).map(i => (900L + i, s"bad$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val badPart = java.nio.file.Files.list(tmp2)
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(badPart, dir.resolve("truncated.parquet"))
    graft.streaming.StreamingRelational.deleteRecursively(tmp2)
    val ch = java.nio.channels.FileChannel.open(
      dir.resolve("truncated.parquet"), java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(ch.size() - 50) finally ch.close()
    java.nio.file.Files.writeString(dir.resolve("junk.parquet"), "nope")
    java.nio.file.Files.write(dir.resolve("empty.parquet"), Array.emptyByteArray)

    val (data, audit) = RobustIngest.parquetWithQuarantine(spark, dir.toString)
    val byFile = audit.collect()
      .map(r => java.nio.file.Paths.get(new java.net.URI(r.getAs[String]("file")))
        .getFileName.toString -> r.getAs[Boolean]("ok")).toMap
    assert(byFile === Map(
      "good0.parquet" -> true, "good1.parquet" -> true,
      "truncated.parquet" -> false, "junk.parquet" -> false,
      "empty.parquet" -> false))
    // every quarantine here is PROVEN corrupt (bytes read cleanly and
    // failed the envelope) — the probe-error column stays null
    assert(audit.collect().forall(_.getAs[String]("err") == null))
    // the data frame reads exactly the intact files' rows — nothing
    // dropped, nothing from the quarantined ones
    val ids = data.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids === ((0 until 20).map(_.toLong) ++ (0 until 20).map(100L + _)).toSet)
    // an all-bad directory still succeeds; with emptySchema the zero-row
    // frame keeps resolvable columns so downstream aggs don't throw
    val badOnly = java.nio.file.Files.createTempDirectory("cps-allbad")
    java.nio.file.Files.writeString(badOnly.resolve("a.parquet"), "x")
    val (none, audit2) = RobustIngest.parquetWithQuarantine(spark, badOnly.toString,
      emptySchema = "id BIGINT, s STRING")
    assert(none.agg(sum(col("id"))).collect().head.isNullAt(0))
    assert(none.count() === 0 && audit2.collect().forall(!_.getAs[Boolean]("ok")))
    graft.streaming.StreamingRelational.deleteRecursively(badOnly)
    graft.streaming.StreamingRelational.deleteRecursively(dir)
  }

  test("parquetWithQuarantine: partitioned layouts (subdirectories) are probed and read, hidden dirs skipped") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cps-partitioned")
    // a partition-style delivery: dir/lang=xx/part.parquet — the layout
    // spark.read.parquet(dir) reads fine and a flat listing would DROP
    for ((lang, base) <- Seq(("en", 0L), ("de", 100L))) {
      val sub = java.nio.file.Files.createDirectories(dir.resolve(s"lang=$lang"))
      val tmp = java.nio.file.Files.createTempDirectory(s"cps-p-$lang")
      (0 until 10).map(i => base + i).toDF("id")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = {
        val listing = java.nio.file.Files.list(tmp)
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      }
      java.nio.file.Files.move(part, sub.resolve("part.parquet"))
      graft.streaming.StreamingRelational.deleteRecursively(tmp)
    }
    // corrupt file INSIDE a partition dir must still quarantine; hidden
    // directories (_temporary debris) must stay invisible
    java.nio.file.Files.writeString(
      dir.resolve("lang=de").resolve("bad.parquet"), "nope")
    val hidden = java.nio.file.Files.createDirectories(dir.resolve("_temporary"))
    java.nio.file.Files.writeString(hidden.resolve("x.parquet"), "junk")
    val (data, audit) = RobustIngest.parquetWithQuarantine(spark, dir.toString)
    val byFile = audit.collect()
      .map(r => java.nio.file.Paths.get(new java.net.URI(r.getAs[String]("file")))
        .getFileName.toString -> r.getAs[Boolean]("ok")).toMap
    assert(byFile === Map("part.parquet" -> true, "bad.parquet" -> false))
    assert(byFile.size === 2) // one 'part.parquet' key per partition collapses — check rows
    assert(audit.count() === 3)
    val ids = data.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids === ((0 until 10).map(_.toLong) ++ (0 until 10).map(100L + _)).toSet)
    graft.streaming.StreamingRelational.deleteRecursively(dir)
  }

  test("csvWithQuarantine: malformed lines carry raw bytes; good lines parse; job survives") {
    val dir = java.nio.file.Files.createTempDirectory("corrupt-csv-spec")
    java.nio.file.Files.writeString(dir.resolve("part-0.csv"),
      Seq(
        "1,en,10",        // good
        "2,fr",           // missing column
        "abc,de,5",       // type clash on id
        "3,de,7"          // good
      ).mkString("\n"))
    val parsed = RobustIngest.csvWithQuarantine(spark, dir.toString,
        "doc_id LONG, lang STRING, n_chars LONG")
      .localCheckpoint(true)
    val good = parsed.filter(parsed("_corrupt").isNull).collect()
    val bad = parsed.filter(parsed("_corrupt").isNotNull).collect()
    assert(good.map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    assert(bad.length === 2)
    assert(bad.map(_.getAs[String]("_corrupt")).toSet === Set("2,fr", "abc,de,5"))
    graft.streaming.StreamingRelational.deleteRecursively(dir)
  }
}
