package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{GngModel, GngParams, Point}
import graft.operators.GngOps

/** G-Stream: micro-batching Growing Neural Gas over Spark.
  *
  * Batch and streaming entry points share one update path:
  * distributed assign+aggregate ([[GngOps.assignAggregate]]) feeding the
  * driver-side graph update ([[GngModel.update]]) — the Structured
  * Streaming re-expression of the reference's DStream `foreachRDD` loop
  * (batchStream.scala:82-118; SURVEY §2.9 T1/T2).
  */
object GStream {

  /** Project a dense-row DataFrame (features array, label, id) into
    * `Dataset[Point]` — the reference's `pointToObjet` projection
    * (batchStreamModel.scala:46-51). */
  def toPoints(df: DataFrame, featuresCol: String, labelCol: String, idCol: String): Dataset[Point] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(featuresCol).cast("array<double>").as("features"),
        col(labelCol).cast("int").as("label"),
        col(idCol).cast("long").as("id"))
      .as[Point]
  }

  /** Parse the reference's CSV shape — doubles with the last two columns
    * label and id (batchStreamRun.scala:37-45, labId=2) — into Points. */
  def csvToPoints(df: DataFrame, separator: String = ","): Dataset[Point] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(split(col("value"), java.util.regex.Pattern.quote(separator))
        .cast("array<double>").as("arr"))
      .select(
        expr("slice(arr, 1, size(arr) - 2)").as("features"),
        element_at(col("arr"), -2).cast("int").as("label"),
        element_at(col("arr"), -1).cast("long").as("id"))
      .as[Point]
  }

  /** Bootstrap a model from the first two points (by ascending id) —
    * the reference's `initModelObj` (batchStream.scala:72-78). */
  def bootstrap(points: Dataset[Point], params: GngParams): GngModel = {
    val first2 = points.orderBy(col("id")).limit(2).collect()
    require(first2.length == 2, "need at least 2 points to bootstrap")
    val dim = first2(0).features.length
    new GngModel(params, dim).init2Nodes(first2(0), first2(1))
  }

  /** Deterministic batch-mode training: chunk `points` into `nChunks`
    * micro-batches by `id % nChunks` and run the full update per chunk.
    * Faithful to the streaming loop (kk = 1-based non-empty batch
    * counter) but reproducible — used by tests, Verify and Bench. */
  def fitChunked(points: Dataset[Point], params: GngParams, nChunks: Int): GngModel = {
    // One parquet read for the whole loop: each of the nChunks passes
    // filters the cached points instead of re-scanning the source.
    val cached = points.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = bootstrap(cached, params)
      var kk = 0
      for (c <- 0 until nChunks) {
        val chunk = cached.filter(col("id") % nChunks === c)
        val stats = GngOps.assignAggregate(chunk, model.centroids)
        if (stats.nonEmpty) { // P4 empty-batch guard (batchStream.scala:87)
          kk += 1
          model.update(stats, kk)
        }
      }
      model
    } finally cached.unpersist(blocking = false)
  }

  /** Streaming training: file-source text stream of the reference's CSV
    * shape → foreachBatch update → optional snapshots.
    * Mirrors batchStreamRun wiring: 100 ms trigger, snapshot dirs
    * `Prototypes-kk`/`Edges-kk`/`Weights-kk` under `outDir`. */
  def trainStreaming(
      spark: SparkSession,
      inputDir: String,
      model: GngModel,
      separator: String = ",",
      outDir: Option[String] = None,
      snapshotEvery: Int = 10,
      triggerMs: Long = 100L,
      modelCheckpoint: Option[String] = None,
      excludeFiles: Seq[String] = Nil): StreamingQuery = {
    import spark.implicits._
    // excludeFiles keeps bootstrap/seed files out of the stream (the
    // reference's textFileStream only saw files created after start —
    // batchStreamRun.scala:40; the structured file source reads
    // pre-existing files too, so the seed is excluded by name)
    var raw = spark.readStream.option("maxFilesPerTrigger", 1).text(inputDir)
    if (excludeFiles.nonEmpty) {
      val fn = input_file_name()
      raw = raw.filter(!excludeFiles.map(e => fn.endsWith(e)).reduce(_ || _))
    }
    val sepRe = java.util.regex.Pattern.quote(separator)
    val pts = raw
      .select(split(col("value"), sepRe).cast("array<double>").as("arr"))
      .select(
        expr("slice(arr, 1, size(arr) - 2)").as("features"),
        element_at(col("arr"), -2).cast("int").as("label"),
        element_at(col("arr"), -1).cast("long").as("id"))
      .as[Point]

    var kk = 0
    pts.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: Dataset[Point], _: Long) =>
        val stats = GngOps.assignAggregate(batch, model.centroids)
        if (stats.nonEmpty) {
          kk += 1
          model.update(stats, kk)
          outDir.foreach { dir =>
            if (kk == 1 || kk % snapshotEvery == 0) writeSnapshots(spark, dir, model, kk)
          }
          // §7.4.7: model recovery point per completed batch (write tmp,
          // atomic move, so a crash never leaves a torn checkpoint)
          modelCheckpoint.foreach { dir =>
            val d = java.nio.file.Paths.get(dir)
            java.nio.file.Files.createDirectories(d)
            val tmp = d.resolve(s"model-$kk.bin.tmp")
            model.save(tmp)
            java.nio.file.Files.move(tmp, d.resolve("model-latest.bin"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        }
      }
      .start()
  }

  /** Snapshot sink — reference on-disk layout (batchStream.scala:97-101):
    * one directory per structure per checkpoint. */
  def writeSnapshots(spark: SparkSession, dir: String, model: GngModel, kk: Int): Unit = {
    import spark.implicits._
    def write(lines: Seq[String], name: String): Unit =
      (if (lines.isEmpty) Seq("") else lines).toDF("value")
        .coalesce(1).write.mode("overwrite").text(s"$dir/$name-$kk")
    write(model.prototypeLines, "Prototypes")
    write(model.outdatedLines, "OutdatedProtos")
    write(model.edgeLines, "Edges")
    write(model.weightLines, "Weights")
  }
}
