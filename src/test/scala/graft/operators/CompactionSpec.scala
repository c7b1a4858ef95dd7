package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class CompactionSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-compact-$tag").toString

  /** A fresh, NOT-yet-created output path — compact() insists on
    * writing a new directory. */
  private def freshOut(tag: String): String =
    s"${tmp(tag)}/out"

  private def fragmented(n: Int): String = {
    val dir = tmp("in")
    (1L to 5000L).map(i => (i, s"payload-$i", i * 0.5)).toDF("id", "s", "v")
      .repartition(n).write.mode("overwrite").parquet(dir)
    dir
  }

  test("compaction shrinks file count and preserves the exact row multiset") {
    val in = fragmented(64)
    val out = freshOut("out")
    val r = Compaction.compact(spark, in, out, targetBytes = 512 * 1024)
    assert(r.filesBefore === 64)
    assert(r.filesAfter === r.targetFiles)
    assert(r.filesAfter < r.filesBefore)
    val a = spark.read.parquet(in).orderBy($"id").collect().toSeq
    val b = spark.read.parquet(out).orderBy($"id").collect().toSeq
    assert(b === a)
  }

  test("compaction plan is shuffle-free (coalesce, not repartition)") {
    val in = fragmented(16)
    val out = freshOut("out2")
    // capture the write plan's shape via the equivalent read+coalesce
    val plan = spark.read.parquet(in).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce must stay narrow:\n$plan")
    val r = Compaction.compact(spark, in, out, targetBytes = Long.MaxValue / 2)
    assert(r.filesAfter === 1, "target above total bytes → one file")
  }

  test("byte budget is honored even when scan file-packing would merge everything") {
    // 64 tiny files: the DEFAULT openCostInBytes (4 MB/file) would pack
    // the whole directory into ~3 scan partitions, silently capping
    // coalesce() far below the requested file count — compact() must
    // pin the split size so the budget governs
    val in = fragmented(64)
    val out = freshOut("budget")
    val total = Compaction.dataFiles(in).map(java.nio.file.Files.size).sum
    val targetBytes = total / 10 // ask for ~10 output files
    val r = Compaction.compact(spark, in, out, targetBytes)
    assert(r.targetFiles >= 10)
    assert(r.filesAfter === r.targetFiles,
      s"coalesce was capped by scan packing: ${r.filesAfter} < ${r.targetFiles}")
    // and the session confs were restored
    assert(spark.conf.get("spark.sql.files.openCostInBytes") !== "0")
  }

  test("empty input fails loud; bad target refused") {
    val empty = tmp("empty")
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, empty, freshOut("o"), 1024)
    }
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, fragmented(2), freshOut("o2"), 0)
    }
  }

  test("output directory is fresh — refuses to rewrite in place") {
    val in = fragmented(4)
    intercept[Exception] {
      Compaction.compact(spark, in, in, 1024 * 1024)
    }
  }
}
