package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class ZOrderTableSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def rows(ids: Range, f: Int => (Long, Long)) = {
    ids.map { i => val (a, b) = f(i); (i.toLong, a, b) }
      .toDF("id", "a", "b")
  }

  private def freshDir(): String =
    Files.createTempDirectory("graft-ztab").toString + "/t"

  test("create + append + boxQuery == plain filter, for random boxes (seeded)") {
    val dir = freshDir()
    val base = rows(1 to 600, i => ((i * 37 % 500).toLong, (i * 91 % 200).toLong))
    val inc = rows(601 to 900, i => ((i * 53 % 500).toLong, (i * 17 % 200).toLong))
    ZOrderTable.create(base, "a", "b", bits = 3, dir = dir)
    ZOrderTable.append(inc, "a", "b", dir = dir)
    val all = base.union(inc)
    val rng = new scala.util.Random(4242L)
    for (_ <- 1 to 8) {
      val (a1, a2) = (rng.nextInt(500).toLong, rng.nextInt(500).toLong)
      val (b1, b2) = (rng.nextInt(200).toLong, rng.nextInt(200).toLong)
      val (aLo, aHi) = (math.min(a1, a2), math.max(a1, a2))
      val (bLo, bHi) = (math.min(b1, b2), math.max(b1, b2))
      val got = ZOrderTable.boxQuery(spark, dir, "a", "b", aLo, aHi, bLo, bHi)
        .select($"id").as[Long].collect().sorted.toSeq
      val want = all.filter($"a".between(aLo, aHi) && $"b".between(bLo, bHi))
        .select($"id").as[Long].collect().sorted.toSeq
      assert(got === want, s"box [$aLo,$aHi]x[$bLo,$bHi] diverged")
    }
  }

  test("out-of-range increment values clamp into edge cells and stay findable") {
    val dir = freshDir()
    ZOrderTable.create(rows(1 to 100, i => (i.toLong, i.toLong)),
      "a", "b", bits = 2, dir = dir)
    // values far beyond the trained [1,100] range
    ZOrderTable.append(rows(101 to 105, i => (i * 1000L, -50L)), "a", "b", dir)
    val got = ZOrderTable.boxQuery(spark, dir, "a", "b",
      aLo = 90L, aHi = 200000L, bLo = -100L, bHi = 5L)
      .select($"id").as[Long].collect().toSet
    assert(got === (101 to 105).map(_.toLong).toSet)
  }

  test("append refuses a drifted schema; boxQuery refuses an uninitialized dir") {
    val dir = freshDir()
    ZOrderTable.create(rows(1 to 50, i => (i.toLong, i.toLong)),
      "a", "b", bits = 2, dir = dir)
    val drifted = rows(51 to 60, i => (i.toLong, i.toLong))
      .withColumn("extra", lit(1))
    val e = intercept[IllegalArgumentException] {
      ZOrderTable.append(drifted, "a", "b", dir)
    }
    assert(e.getMessage.contains("fingerprint"))
    intercept[IllegalArgumentException] {
      ZOrderTable.boxQuery(spark, freshDir(), "a", "b", 0, 1, 0, 1)
    }
    intercept[IllegalArgumentException] {
      ZOrderTable.create(rows(1 to 5, i => (i.toLong, i.toLong)), "a", "b", 2, dir)
    }
  }

  test("box scan prunes to the enumerated cells (PartitionFilters)") {
    val dir = freshDir()
    ZOrderTable.create(rows(1 to 400, i => ((i % 256).toLong, (i % 256).toLong)),
      "a", "b", bits = 3, dir = dir)
    val df = ZOrderTable.boxQuery(spark, dir, "a", "b", 0L, 40L, 0L, 40L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zcell"),
      s"cell pruning must reach the scan:\n$plan")
    // a ~1/6 x 1/6 box in an 8x8 grid touches 4 cells, not 64
    assert("zcell.* IN \\(([^)]*)\\)".r.findFirstMatchIn(plan).exists(
      m => m.group(1).split(",").length <= 8),
      s"cell list must be the small box enumeration:\n$plan")
  }
}
