package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance operator every
  * streaming/incremental ingest needs: micro-batches and per-executor
  * writers leave thousands of KB-sized parquet files per partition, and
  * at 100 TB the resulting footer-read + task-scheduling overhead
  * dominates scans long before the data does (a 100k-file directory is
  * 100k scan tasks of which 99% are open/close).
  *
  * Mechanics: size the output by BYTES, not file count — target file
  * count = ceil(totalBytes / targetBytes) — and rewrite through
  * `coalesce(n)`, a NARROW dependency: tasks concatenate input files
  * without any shuffle, so compaction costs one read+write pass and
  * zero exchange. (When the table also needs clustering, that is a
  * different operator — ZOrder.cluster — which pays its range shuffle
  * for data-skipping, not for file sizing.)
  *
  * At cluster scale compaction runs per partition directory (each
  * date/source partition compacts independently, embarrassingly
  * parallel across jobs) and swaps in atomically: write to a fresh
  * directory, then rename over — never rewrite in place. This
  * operator keeps that discipline: output is always a NEW directory.
  *
  * Content preservation is the q43 oracle's claim: the compacted table
  * hash-matches aggregates of the original (row count and two
  * checksums), and the spec proves the full row multiset survives.
  */
object Compaction {

  final case class Report(
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long,
      targetFiles: Int)

  /** Parquet data files directly under `dir` (visible part files — the
    * layout this engine's writers produce; partitioned tables compact
    * per leaf directory). */
  private[graft] def dataFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(f => Files.isRegularFile(f))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .filterNot(_.getFileName.toString.startsWith("."))
        .toSeq.sortBy(_.toString)
      finally s.close() // Files.list holds a directory handle until closed
    }
  }

  /** Compact `inputDir`'s parquet files into `outputDir`, sized so each
    * output file carries ~`targetBytes` of input. Returns the
    * before/after report. Fails loud on an empty input directory —
    * "compacted nothing" silently would hide a path typo. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
      targetBytes: Long): Report = {
    require(targetBytes > 0, s"compact: targetBytes must be positive, got $targetBytes")
    val before = dataFiles(inputDir)
    require(before.nonEmpty, s"compact: no parquet data files under $inputDir")
    val bytesBefore = before.map(Files.size).sum
    val target = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    // coalesce(n) can only MERGE scan partitions, never split them — if
    // the scan's file-packing (maxPartitionBytes + openCostInBytes,
    // which charges ~4 MB per file by default) lands BELOW `target`
    // partitions, coalesce is a silent no-op above that count and the
    // byte budget is blown by however much a scan partition packed. Pin
    // the scan split size to the output budget for THIS read
    // (runOneShot's set-and-restore discipline) so scan partitions ≈
    // ceil(bytes/targetBytes) ≥ target and the coalesce really governs.
    val mpbKey = "spark.sql.files.maxPartitionBytes"
    val ocKey = "spark.sql.files.openCostInBytes"
    val prevMpb = spark.conf.get(mpbKey)
    val prevOc = spark.conf.get(ocKey)
    try {
      spark.conf.set(mpbKey, targetBytes.toString)
      spark.conf.set(ocKey, "0")
      spark.read.parquet(inputDir)
        .coalesce(target)
        .write.mode("errorifexists").parquet(outputDir)
    } finally {
      spark.conf.set(mpbKey, prevMpb)
      spark.conf.set(ocKey, prevOc)
    }
    val after = dataFiles(outputDir)
    Report(before.size, after.size, bytesBefore, after.map(Files.size).sum, target)
  }
}
