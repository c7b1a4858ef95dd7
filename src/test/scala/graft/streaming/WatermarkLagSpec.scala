package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

/** Pins the watermark semantics s09's oracle encodes (round-11 verdict
  * #2): in micro-batch N, EVICTION uses the watermark derived from
  * data through batch N-1, but the LATE-RECORD filter uses the
  * eviction watermark OF batch N-1 — i.e. data through batch N-2, a
  * TWO-batch lag. A late row whose window end lies BETWEEN the two
  * values is therefore KEPT (and immediately evicted+emitted), while
  * a row behind even the lagged value drops. sf0.001 exposed exactly
  * this window (max(p1) trailed max(ts) by ~4h); sf0.01+ masked it
  * because both candidates fell in the same hour.
  */
class WatermarkLagSpec extends AnyFunSuite with SparkTestSupport {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Three one-file micro-batches (increasing mtimes, maxFilesPerTrigger=1,
    * AvailableNow), hourly windows, 1h watermark delay, append mode. */
  private def run(batches: Seq[Seq[java.sql.Timestamp]]): Map[java.sql.Timestamp, Long] = {
    import spark.implicits._
    val base: Path = Files.createTempDirectory("wm-lag")
    val in = Files.createDirectories(base.resolve("in"))
    val t0 = System.currentTimeMillis() - 60000
    batches.zipWithIndex.foreach { case (rows, k) =>
      val tmp = base.resolve(s"tmp$k").toString
      rows.toDF("ts").coalesce(1).write.parquet(tmp)
      import scala.jdk.CollectionConverters._
      val listing = Files.list(base.resolve(s"tmp$k"))
      val part =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
        finally listing.close()
      val dest = in.resolve(f"${k + 1}%04d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(t0 + 10000L * k))
    }
    val stream = spark.readStream.schema("ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(in.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("n"))
    val name = s"wm_lag_${System.nanoTime()}"
    val ckpt = Files.createTempDirectory("wm-lag-ckpt")
    val q = stream.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
  }

  test("late filter lags eviction by one batch: between-the-watermarks row is kept") {
    // batch 0: 10:30 → eviction wm for batch 1 becomes 09:30
    // batch 1: 14:30 → eviction wm for batch 2 becomes 13:30,
    //                  but batch 2's LATE filter still uses 09:30
    // batch 2: 11:30 (window end 12:00 — late vs 13:30, alive vs 09:30)
    //          and 07:30 (window end 08:00 — late even vs 09:30)
    val out = run(Seq(
      Seq(ts("2024-01-01 10:30:00")),
      Seq(ts("2024-01-01 14:30:00")),
      Seq(ts("2024-01-01 11:30:00"), ts("2024-01-01 07:30:00")),
      // far-future sentinel flushes every real window into the append sink
      Seq(ts("2024-06-01 00:00:00"))))
    assert(out.get(ts("2024-01-01 11:00:00")) === Some(1L),
      "row between lagged-late-filter and eviction watermarks must be KEPT")
    assert(!out.contains(ts("2024-01-01 07:00:00")),
      "row behind even the lagged watermark must drop")
    assert(out.get(ts("2024-01-01 10:00:00")) === Some(1L))
    assert(out.get(ts("2024-01-01 14:00:00")) === Some(1L))
    assert(!out.contains(ts("2024-06-01 00:00:00")), "sentinel window never closes")
  }

  test("kept-late windows cannot collide with already-evicted ones") {
    // batch 1's eviction (wm 09:30) closes the 08:00 window; batch 2's
    // late filter uses the SAME 09:30 — so a batch-2 row for the
    // evicted 08:00 window is dropped, never double-emitted: one
    // output row per window even under this arrival.
    val out = run(Seq(
      Seq(ts("2024-01-01 08:15:00"), ts("2024-01-01 10:30:00")),
      Seq(ts("2024-01-01 14:30:00")), // evicts [08:00,09:00) (end 09:00 <= 09:30)
      Seq(ts("2024-01-01 08:45:00")), // late for the already-closed window
      Seq(ts("2024-06-01 00:00:00"))))
    assert(out.get(ts("2024-01-01 08:00:00")) === Some(1L),
      "evicted window emitted once, late re-open filtered by the shared value")
  }
}
