package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class RangeLayoutSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-rlay").toString + "/t"

  private def rows(ids: Range) =
    ids.map(i => (i.toLong, (i * 7919L) % 100000L, s"p$i"))
      .toDF("id", "k", "payload")

  test("write + append + prunedScan == plain filter, and footer stats prune files") {
    val dir = freshDir()
    val base = rows(1 to 800)
    val inc = rows(801 to 1200)
    RangeLayout.write(base, "k", n = 8, dir = dir)
    RangeLayout.append(inc, "k", dir = dir)
    val all = base.union(inc)
    for ((lo, hi) <- Seq((0L, 10000L), (40000L, 55000L), (90000L, 100001L))) {
      val (got, read, total) = RangeLayout.prunedScan(spark, dir, "k", lo, hi)
      val want = all.filter($"k" >= lo && $"k" < hi)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(got.select($"id").as[Long].collect().sorted.toSeq === want,
        s"range [$lo,$hi) diverged")
      assert(read < total, s"range [$lo,$hi): no files pruned ($read of $total)")
      assert(total === 16, "8 buckets x (create + append) should be 16 files")
    }
    // the full domain keeps everything — pruning must never drop data
    val (gotAll, readAll, totalAll) = RangeLayout.prunedScan(spark, dir, "k", 0L, 100001L)
    assert(gotAll.count() === all.count())
    assert(readAll === totalAll)
  }

  test("empty range reads zero files and returns a schema-preserving empty frame") {
    val dir = freshDir()
    RangeLayout.write(rows(1 to 200), "k", n = 4, dir = dir)
    val (got, read, _) = RangeLayout.prunedScan(spark, dir, "k", 200000L, 300000L)
    assert(read === 0)
    assert(got.count() === 0L)
    assert(got.columns.toSet === Set("id", "k", "payload"))
  }

  test("timestamp sort key: bounds in epoch micros, pruning on INT64 footer stats") {
    val dir = freshDir()
    val df = (1 to 500).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 3600L)))
    }.toDF("id", "ts")
    RangeLayout.write(df, "ts", n = 8, dir = dir)
    val lo = java.time.Instant.parse("2024-01-05T00:00:00Z").toEpochMilli * 1000L
    val hi = java.time.Instant.parse("2024-01-08T00:00:00Z").toEpochMilli * 1000L
    val (got, read, total) = RangeLayout.prunedScan(spark, dir, "ts", lo, hi)
    val want = df.filter(unix_micros($"ts") >= lo && unix_micros($"ts") < hi)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got.select($"id").as[Long].collect().sorted.toSeq === want)
    assert(read < total, s"no files pruned ($read of $total)")
  }

  test("bounds are deterministic (md5 sample, no rand) and append uses stored bounds") {
    val b1 = RangeLayout.trainBounds(rows(1 to 500), "k", 8)
    val b2 = RangeLayout.trainBounds(rows(1 to 500).repartition(7), "k", 8)
    assert(b1.toSeq === b2.toSeq, "bounds must not depend on input partitioning")
    val dir = freshDir()
    RangeLayout.write(rows(1 to 500), "k", n = 8, dir = dir)
    assert(RangeLayout.readBounds(dir).bounds.toSeq === b1.toSeq)
  }

  test("append refuses a drifted schema and a different sort column") {
    val dir = freshDir()
    RangeLayout.write(rows(1 to 100), "k", n = 4, dir = dir)
    val drifted = rows(101 to 110).withColumn("extra", lit(1))
    val e = intercept[IllegalArgumentException] {
      RangeLayout.append(drifted, "k", dir)
    }
    assert(e.getMessage.contains("fingerprint"))
    val e2 = intercept[IllegalArgumentException] {
      RangeLayout.append(rows(101 to 110), "id", dir)
    }
    assert(e2.getMessage.contains("keyed on"))
  }

  test("compact: multi-file buckets rewrite to one sorted file; rows and pruning unchanged") {
    val dir = freshDir()
    RangeLayout.write(rows(1 to 800), "k", n = 8, dir = dir)
    RangeLayout.append(rows(801 to 1200), "k", dir = dir)
    val before = RangeLayout.prunedScan(spark, dir, "k", 0L, 100001L)._1
      .select($"id").as[Long].collect().sorted.toSeq
    val rewritten = RangeLayout.compact(spark, dir, "k")
    assert(rewritten === 8, "every bucket had 2 files")
    val (got, read, total) = RangeLayout.prunedScan(spark, dir, "k", 0L, 100001L)
    assert(total === 8, "compaction halves the file count")
    assert(read === 8)
    assert(got.select($"id").as[Long].collect().sorted.toSeq === before,
      "compaction must not change a row")
    // narrow range still prunes, and each surviving file is sorted
    val (_, read2, total2) = RangeLayout.prunedScan(spark, dir, "k", 40000L, 55000L)
    assert(read2 < total2)
    // idempotent: nothing left to rewrite
    assert(RangeLayout.compact(spark, dir, "k") === 0)
  }

  test("sample depth auto-deepens: collected sample stays O(100*n) at any table size") {
    import org.apache.spark.sql.functions.col
    // The depth/threshold decision is analytic — assert the expected
    // sample stays within 2x of target from 10^4 to 10^13 rows (a
    // 40k-row probe can't measure a 2/16^7 keep fraction empirically).
    for (exp <- 4 to 13; total = math.pow(10, exp).toLong;
        target <- Seq(800L, 1000L, 5000L)) {
      RangeLayout.sampleDepth(total, target) match {
        case None =>
          assert(total <= target, s"total=$total: decision missing")
        case Some((depth, thrIdx)) =>
          val expectedSample = total.toDouble * (thrIdx + 1) / math.pow(16.0, depth)
          assert(expectedSample <= 2.0 * target,
            s"total=$total target=$target: expected sample $expectedSample > 2x")
          assert(expectedSample >= target / 2.0,
            s"total=$total target=$target: expected sample $expectedSample < half")
      }
    }
    // and the predicate's empirical keep fraction matches the decision
    // at a measurable depth (total=10*probe → ~10% keep)
    val probe = spark.range(40000).toDF("k")
    val kept = probe.filter(
      RangeLayout.samplePredicate(col("k").cast("long"), 400000L, 40000L).get).count()
    assert(kept > 2000 && kept < 8000, s"10%-ish keep fraction, got $kept/40000")
    // the default target is O(100*n): bounds still train fine and stay
    // deterministic with the auto depth
    val b1 = RangeLayout.trainBounds(rows(1 to 5000), "k", 8)
    val b2 = RangeLayout.trainBounds(rows(1 to 5000).repartition(11), "k", 8)
    assert(b1.toSeq === b2.toSeq)
    assert(b1.length === 7 && b1.toSeq === b1.sorted.toSeq)
  }

  test("compact crash windows: scans heal and never lose rows") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids(dir: String): Seq[Long] =
      RangeLayout.prunedScan(spark, dir, "k", 0L, 100001L)._1
        .select($"id").as[Long].collect().sorted.toSeq
    val want = rows(1 to 400).union(rows(401 to 600))
      .select($"id").as[Long].collect().sorted.toSeq

    // window A: crash after the temp was written, before any rename —
    // live bucket intact, orphan .compact-* must be swept
    val dirA = freshDir()
    RangeLayout.write(rows(1 to 400), "k", n = 4, dir = dirA)
    RangeLayout.append(rows(401 to 600), "k", dirA)
    val bucketA = fs.listStatus(new Path(dirA))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("rbucket="))
      .head.getPath
    val tmpA = new Path(dirA, s".compact-${bucketA.getName}")
    spark.read.parquet(bucketA.toString).write.parquet(tmpA.toString)
    assert(ids(dirA) === want, "orphan temp must not change a scan")
    assert(!fs.exists(tmpA), "fileStats must sweep the orphan temp")

    // window B: crash between retire and swap — live bucket MISSING,
    // rows only under .retired-* (the round-11 silent-loss window)
    val dirB = freshDir()
    RangeLayout.write(rows(1 to 400), "k", n = 4, dir = dirB)
    RangeLayout.append(rows(401 to 600), "k", dirB)
    val bucketB = fs.listStatus(new Path(dirB))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("rbucket="))
      .head.getPath
    val tmpB = new Path(dirB, s".compact-${bucketB.getName}")
    spark.read.parquet(bucketB.toString).coalesce(1).write.parquet(tmpB.toString)
    assert(fs.rename(bucketB, new Path(dirB, s".retired-${bucketB.getName}")))
    assert(ids(dirB) === want, "retired-but-unswapped bucket rows must survive")
    assert(fs.exists(bucketB), "recovery must restore the live bucket dir")

    // window C: crash after the swap, before the retired copy dropped —
    // live bucket has the new file, .retired-* is a stale duplicate
    val dirC = freshDir()
    RangeLayout.write(rows(1 to 400), "k", n = 4, dir = dirC)
    RangeLayout.append(rows(401 to 600), "k", dirC)
    val bucketC = fs.listStatus(new Path(dirC))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("rbucket="))
      .head.getPath
    val retiredC = new Path(dirC, s".retired-${bucketC.getName}")
    // simulate: copy-as-retire (old content), live keeps the real rows
    org.apache.hadoop.fs.FileUtil.copy(fs, bucketC, fs, retiredC, false, true,
      spark.sparkContext.hadoopConfiguration)
    assert(ids(dirC) === want, "stale retired copy must not double rows")
    assert(!fs.exists(retiredC), "recovery must drop the completed swap's retired copy")

    // and a fresh compact over healed state still works end-to-end
    assert(RangeLayout.compact(spark, dirB, "k") >= 1)
    assert(ids(dirB) === want)
  }

  test("bloom sidecar: lookup == plain IN filter, prunes files, survives staleness") {
    val dir = freshDir()
    RangeLayout.write(rows(1 to 800), "k", n = 8, dir = dir)
    val indexed = RangeLayout.writeBloomIndex(spark, dir, "id")
    assert(indexed === 8)
    // point lookup: ids live in few of the 8 range buckets (id and k
    // are correlated through the fixture's k = id*7919 % 100000)
    val keys = Seq(5L, 6L, 7L)
    val (got, read, total) = RangeLayout.bloomLookup(spark, dir, "id", keys)
    val gotIds = got.select($"id").as[Long].collect().sorted.toSeq
    assert(gotIds === keys, "lookup must equal the plain IN filter")
    assert(read < total, s"blooms pruned nothing ($read of $total)")
    // absent keys: zero rows, and typically zero files read
    val (none, _, _) = RangeLayout.bloomLookup(spark, dir, "id", Seq(999999L))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("id", "k", "payload"),
      "empty result must preserve the schema")
    // STALE sidecar: an append adds files the sidecar does not name —
    // those must be read conservatively, never skipped
    RangeLayout.append(rows(801 to 900), "k", dir = dir)
    val (stale, readS, totalS) = RangeLayout.bloomLookup(spark, dir, "id", Seq(850L))
    assert(stale.select($"id").as[Long].collect().toSeq === Seq(850L),
      "a key only in un-indexed files must still be found")
    assert(totalS === 16 && readS >= 8,
      "all appended (un-indexed) files must be candidates")
    // rebuild heals pruning
    assert(RangeLayout.writeBloomIndex(spark, dir, "id") === 16)
    val (_, readR, _) = RangeLayout.bloomLookup(spark, dir, "id", Seq(850L))
    assert(readR < readS, "rebuilt sidecar must prune the appended files again")
  }

  test("bloom sidecar: never-built index reads conservatively; null keys don't break the build") {
    val dir = freshDir()
    RangeLayout.write(rows(1 to 200), "k", n = 4, dir = dir)
    // lookup BEFORE any writeBloomIndex: the fully-missing sidecar is
    // the degenerate stale case — every file read, rows identical
    val (got, read, total) = RangeLayout.bloomLookup(spark, dir, "id", Seq(5L, 6L))
    assert(got.select($"id").as[Long].collect().sorted.toSeq === Seq(5L, 6L))
    assert(read === total, "missing sidecar must read every file (conservative)")

    // null / non-castable keys can never match an IN lookup — the index
    // build must skip them, not NPE
    val dirN = freshDir()
    val withNulls = rows(1 to 100)
      .withColumn("id", when($"id" % 10 === 0, lit(null)).otherwise($"id"))
    RangeLayout.write(withNulls, "k", n = 2, dir = dirN)
    assert(RangeLayout.writeBloomIndex(spark, dirN, "id") === 2)
    val (gotN, _, _) = RangeLayout.bloomLookup(spark, dirN, "id", Seq(7L))
    assert(gotN.select($"id").as[Long].collect().toSeq === Seq(7L))
  }

  test("each bucket directory holds one sorted file per write") {
    val dir = freshDir()
    RangeLayout.write(rows(1 to 400), "k", n = 4, dir = dir)
    val stats = RangeLayout.fileStats(spark, dir, "k").collect()
    assert(stats.length === 4)
    // bucket files cover near-disjoint key ranges: sorted by min, each
    // file's min must not precede the previous file's max (strict
    // layout — the property that makes narrow ranges cheap)
    val sorted = stats.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    for (Seq((_, aMax), (bMin, _)) <- sorted.toSeq.sliding(2))
      assert(bMin > aMax, "bucket key ranges overlap")
  }
}
