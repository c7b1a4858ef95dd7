package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips: the engine reads and writes every mainstream
  * format with schema fidelity (SURVEY §2.1 — the reference only had
  * text; Spark gives the rest, verified here). */
class SinksSpec extends AnyFunSuite with SparkTestSupport {

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "alpha", 1.5, Seq(1.0, 2.0)), (2L, "beta", -0.25, Seq(3.0)))
      .toDF("id", "name", "score", "vec")
  }

  private def tmp(name: String) =
    Files.createTempDirectory(s"sink-$name").toString + "/out"

  test("parquet round-trip preserves names/types and values (incl. arrays)") {
    val p = tmp("parquet")
    df.write.parquet(p)
    val back = spark.read.parquet(p)
    // parquet read-back is nullable-relaxed; names and types must hold
    assert(back.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("csv round-trip with header and explicit schema (no arrays)") {
    val p = tmp("csv")
    val flat = df.drop("vec")
    flat.write.option("header", "true").csv(p)
    val back = spark.read.option("header", "true").schema(flat.schema).csv(p)
    assert(back.orderBy("id").collect().toSeq === flat.orderBy("id").collect().toSeq)
  }

  test("json round-trip preserves nested arrays") {
    val p = tmp("json")
    df.write.json(p)
    val back = spark.read.schema(df.schema).json(p)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("streaming parquet sink at sf0.01: finalized windows equal the batch aggregation") {
    // the production append path (toParquetSink + durable checkpoint)
    // against real table data — the one-shot memory-sink harness tests
    // the same transform, but this exercises the actual file sink:
    // finalized watermarked windows land in parquet exactly once
    import graft.streaming.StreamingRelational
    val sf = "/root/testdata/sf0.01"
    val outDir = tmp("stream-parquet")
    val ckpt = tmp("stream-ckpt")
    val q = StreamingRelational.toParquetSink(
      StreamingRelational.hourlyTypeCounts(
        StreamingRelational.eventsStreamWithSentinel(spark, sf)),
      outDir, ckpt)
    q.awaitTermination()
    val streamed = spark.read.parquet(outDir)
      .orderBy(col("hour"), col("event_type"))
    val batch = graft.queries.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
    assert(streamed.collect().toSeq === batch.collect().toSeq)

    // restart with the same checkpoint: everything is already
    // committed, so nothing is appended twice (exactly-once)
    val before = streamed.count()
    val q2 = StreamingRelational.toParquetSink(
      StreamingRelational.hourlyTypeCounts(
        StreamingRelational.eventsStreamWithSentinel(spark, sf)),
      outDir, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(outDir).count() === before)
  }

  test("partitioned parquet write prunes partitions on read") {
    import spark.implicits._
    val p = tmp("part")
    val events = (1 to 100).map(i => (i.toLong, s"t${i % 4}", i * 1.0))
      .toDF("id", "etype", "v")
    events.write.partitionBy("etype").parquet(p)
    val one = spark.read.parquet(p).filter($"etype" === "t1")
    assert(one.count() === 25)
    // partition pruning: the filter lands in PartitionFilters (listing-
    // time pruning), not a post-scan Filter over all partitions
    val scan = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty)
    assert(scan.get.partitionFilters.exists(_.references.exists(_.name == "etype")))
    // the formatted plan shows the pruning (PartitionFilters on etype)
    val planStr = one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(planStr.contains("PartitionFilters"))
  }
}
