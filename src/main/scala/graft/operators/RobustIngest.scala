package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-LEVEL ingestion robustness — the q58 class (PERMISSIVE
  * row-level quarantine) extended to whole corrupt FILES: a 100 TB
  * crawl delivery always contains a few truncated uploads, zero-byte
  * markers, and misnamed junk, and `spark.read.parquet` over such a
  * directory fails the entire job on the first bad footer.
  *
  * [[parquetWithQuarantine]] probes every file's parquet envelope
  * DISTRIBUTEDLY — head magic `PAR1`, tail magic `PAR1`, and a sane
  * footer length, read via ranged requests touching ~12 bytes per
  * file, never the content — then reads only the files that passed,
  * returning the data alongside a complete (file, bytes, ok) AUDIT
  * frame. Nothing is silently dropped: quarantined files are rows in
  * the audit, and a file that passes the probe but fails decode still
  * fails loudly (swallowing mid-file corruption with
  * `ignoreCorruptFiles` would un-count rows with no audit trail —
  * the opposite of the quarantine contract).
  *
  * Scale shape: the probe is a mapPartitions over the FILE LISTING
  * (the same driver-side listing every Spark scan performs), so the
  * probe cost is one ranged read per file across the cluster —
  * independent of data volume. The audit frame is file-count-sized. */
object RobustIngest {

  /** (file, bytes, ok) for every regular file under `dir`: ok ⇔ the
    * parquet envelope is intact (head/tail magic + footer length that
    * fits the file). Directories are listed non-recursively, matching
    * `spark.read.parquet(dir)`. */
  def probeParquet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    val files = fs.listStatus(path).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.toString, st.getLen))
    files.toDF("file", "bytes").as[(String, Long)]
      .mapPartitions { it =>
        // executors build their own FS handle (object-store creds come
        // from the cluster conf there, same as any task's reader)
        val econf = new org.apache.hadoop.conf.Configuration()
        it.map { case (p, len) => (p, len, envelopeOk(econf, p, len)) }
      }
      .toDF("file", "bytes", "ok")
  }

  /** Ranged-read envelope check — any I/O error counts as corrupt. */
  private def envelopeOk(conf: org.apache.hadoop.conf.Configuration,
      file: String, len: Long): Boolean =
    try {
      // minimal parquet file: 4 (head magic) + 4 (footer len) + 4
      // (tail magic) + a non-empty footer
      if (len < 12L) false
      else {
        val p = new Path(file)
        val in = p.getFileSystem(conf).open(p)
        try {
          val head = new Array[Byte](4)
          in.readFully(0L, head)
          val tail = new Array[Byte](8)
          in.readFully(len - 8L, tail)
          // footer length is little-endian int32 just before the tail
          // magic; LONG arithmetic so a hostile value can't wrap (the
          // wavMeta discipline)
          val footerLen = (tail(0) & 0xffL) | ((tail(1) & 0xffL) << 8) |
            ((tail(2) & 0xffL) << 16) | ((tail(3) & 0xffL) << 24)
          head(0) == 'P' && head(1) == 'A' && head(2) == 'R' && head(3) == '1' &&
            tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1' &&
            footerLen > 0L && footerLen + 12L <= len
        } finally in.close()
      }
    } catch { case _: java.io.IOException => false }

  /** Read a parquet directory that may contain corrupt files:
    * (data over the intact files only, full audit). The good-file
    * list crossing the driver is the file listing itself —
    * file-count-sized, the same scale as scan planning. */
  def parquetWithQuarantine(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val audit = probeParquet(spark, dir).localCheckpoint(true)
    val good = audit.filter(col("ok")).select("file")
      .collect().map(_.getString(0)).sorted
    val data =
      if (good.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(good.toIndexedSeq: _*)
    (data, audit)
  }

  /** q58's row-level PERMISSIVE quarantine for CSV: every malformed
    * line surfaces as a row carrying the raw bytes in `_corrupt`,
    * well-formed lines parse to `schema` — the job never fails.
    * Callers must branch on `_corrupt` ONLY (a half-parsed row may
    * carry plausible fields). `schema` must NOT include the corrupt
    * column; it is appended here so the contract is uniform. */
  def csvWithQuarantine(spark: SparkSession, dir: String, schema: String,
      header: Boolean = false): DataFrame =
    spark.read
      .schema(schema + ", _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", header.toString)
      .csv(dir)
}
