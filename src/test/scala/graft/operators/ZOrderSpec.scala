package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Z-order clustering: interleave correctness, box enumeration, and the
  * end-to-end layout claim — a 2-d range box over the z-partitioned
  * table prunes partitions at listing time and returns exactly the
  * rows a plain filter returns. */
class ZOrderSpec extends AnyFunSuite with SparkTestSupport {

  test("zValue (engine) == zValueLocal (reference) over the full 5-bit grid") {
    import spark.implicits._
    val grid = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val out = grid.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 5).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) === ZOrder.zValueLocal(r.getLong(0), r.getLong(1), 5))
    }
    // the interleave is a bijection on the grid
    assert(out.map(_.getLong(2)).distinct.length === 32 * 32)
  }

  test("quantize: exact integer cells, degenerate range collapses to 0") {
    import spark.implicits._
    val df = Seq(0L, 1L, 999L, 1999L).toDF("x")
      .select(ZOrder.quantize(col("x"), lit(0L), lit(1999L), 3).as("q"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 3L, 7L))
    val deg = Seq(5L).toDF("x")
      .select(ZOrder.quantize(col("x"), lit(5L), lit(5L), 3).as("q"))
    assert(deg.collect().head.getLong(0) === 0L)
  }

  test("cellsForBox equals brute-force membership") {
    val bits = 3
    val cells = ZOrder.cellsForBox(2, 5, 1, 3, bits).toSet
    val brute = (for {
      a <- 0L until 8L; b <- 0L until 8L
      if a >= 2 && a <= 5 && b >= 1 && b <= 3
    } yield ZOrder.zValueLocal(a, b, bits)).toSet
    assert(cells === brute)
    assert(cells.size === 4 * 3)
  }

  test("z-partitioned layout: a 2-d box prunes at listing time, answers exactly") {
    val sf = "/root/testdata/sf0.001"
    val bits = 3
    val li = graft.queries.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val Array(pMin, pMax, sMin, sMax) = li
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val dir = java.nio.file.Files.createTempDirectory(
      graft.streaming.StreamingRelational.scratchBase, "zorder")
    try {
      li.withColumn("zcell", ZOrder.zValue(
          ZOrder.quantize(col("l_partkey"), lit(pMin), lit(pMax), bits),
          ZOrder.quantize(col("l_suppkey"), lit(sMin), lit(sMax), bits), bits))
        .write.mode("overwrite").partitionBy("zcell").parquet(dir.toString)
      // query box: lowest quarter of partkey × lowest quarter of suppkey
      val (pLo, pHi) = (pMin, pMin + (pMax - pMin) / 4)
      val (sLo, sHi) = (sMin, sMin + (sMax - sMin) / 4)
      def q(v: Long, lo: Long, hi: Long) =
        if (hi == lo) 0L else (v - lo) * ((1L << bits) - 1) / (hi - lo)
      val cells = ZOrder.cellsForBox(
        q(pLo, pMin, pMax), q(pHi, pMin, pMax),
        q(sLo, sMin, sMax), q(sHi, sMin, sMax), bits)
      val boxPred = col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi)
      val served = spark.read.parquet(dir.toString)
        .filter(col("zcell").isin(cells: _*) && boxPred)
      // pruning: the IN-list lands in PartitionFilters and bites
      val scan = served.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "zcell")),
        s"zcell IN-list must prune partitions: ${scan.partitionFilters}")
      val total = spark.read.parquet(dir.toString).select("zcell").distinct().count()
      val scanned = scan.selectedPartitions.partitionCount
      assert(scanned < total / 2,
        s"quarter×quarter box should prune most cells ($scanned of $total scanned)")
      // exactness: same rows as a plain filter over the unpartitioned table
      val expect = li.filter(boxPred)
        .select(col("l_orderkey"), col("l_linenumber"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val got = served.select(col("l_orderkey"), col("l_linenumber"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got === expect && got.nonEmpty)
    } finally graft.streaming.StreamingRelational.deleteRecursively(dir)
  }
}
