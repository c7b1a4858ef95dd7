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

  /** (file, bytes, ok, err) for every data file under `dir`: ok ⇔ the
    * parquet envelope is intact (head/tail magic + footer length that
    * fits the file); `err` is null unless the PROBE itself failed
    * (auth/endpoint/transient I/O) — a probe failure is quarantined
    * like corruption (never read blind) but stays distinguishable, so
    * a misconfigured cluster can't silently masquerade as a fully
    * corrupt delivery. The listing RECURSES through visible
    * subdirectories exactly like Spark's file index (hidden `_`/`.`
    * names skipped at every level), so partitioned layouts
    * (`dir/k=v/part-*.parquet`) are probed, not dropped. */
  def probeParquet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    def visible(p: Path): Boolean = {
      val n = p.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[(String, Long)] =
      if (st.isFile) Seq((st.getPath.toString, st.getLen))
      else fs.listStatus(st.getPath).toSeq
        .filter(s => visible(s.getPath)).flatMap(walk)
    val files = fs.listStatus(root).toSeq
      .filter(s => visible(s.getPath)).flatMap(walk)
    // the driver's hadoop conf rides a broadcast to the probe tasks —
    // spark.hadoop.* / programmatic settings (object-store creds,
    // endpoints) must reach the executor-side FileSystem the same way
    // every scan task's reader receives them
    val bconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    files.toDF("file", "bytes").as[(String, Long)]
      .mapPartitions { it =>
        val econf = bconf.value.value
        it.map { case (p, len) =>
          val (ok, err) = envelopeCheck(econf, p, len)
          (p, len, ok, err)
        }
      }
      .toDF("file", "bytes", "ok", "err")
  }

  /** Ranged-read envelope check → (intact, probeError). A clean read
    * of bad bytes is (false, null) — proven corrupt; an I/O failure is
    * (false, message) — unproven, surfaced for the caller to alert on
    * rather than folded into the corrupt count. */
  private def envelopeCheck(conf: org.apache.hadoop.conf.Configuration,
      file: String, len: Long): (Boolean, String) =
    try {
      // minimal parquet file: 4 (head magic) + 4 (footer len) + 4
      // (tail magic) + a non-empty footer
      if (len < 12L) (false, null)
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
          val ok =
            head(0) == 'P' && head(1) == 'A' && head(2) == 'R' && head(3) == '1' &&
              tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1' &&
              footerLen > 0L && footerLen + 12L <= len
          (ok, null)
        } finally in.close()
      }
    } catch {
      // NonFatal, not just IOException: object-store clients surface
      // auth/endpoint failures as RuntimeExceptions — those must land
      // in the audit as probe errors, not fail the whole probe job
      case scala.util.control.NonFatal(e) =>
        (false, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** Read a parquet directory that may contain corrupt files:
    * (data over the intact files only, full audit). The good-file
    * list crossing the driver is the file listing itself —
    * file-count-sized, the same scale as scan planning. When EVERY
    * file quarantines, the data frame is empty under `emptySchema`
    * (DDL) if given — downstream column references keep resolving and
    * the audit stays reportable — or zero-column if not. */
  def parquetWithQuarantine(spark: SparkSession, dir: String,
      emptySchema: String = ""): (DataFrame, DataFrame) = {
    val audit = probeParquet(spark, dir).localCheckpoint(true)
    val good = audit.filter(col("ok")).select("file")
      .collect().map(_.getString(0)).sorted
    val data =
      if (good.nonEmpty) spark.read.parquet(good.toIndexedSeq: _*)
      else if (emptySchema.nonEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(emptySchema))
      else spark.emptyDataFrame
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
