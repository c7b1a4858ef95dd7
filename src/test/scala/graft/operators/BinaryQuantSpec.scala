package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport
import graft.expressions.BitPack

/** Binary-quantization ANN contract (v33): thresholds equal a brute
  * recount, the pack kernel equals the driver-side packer bit for bit,
  * hamming behaves (self-distance 0, orthogonal-ish vectors far), the
  * shortlist+rerank recovers exact neighbors on a planted fixture, and
  * the plan never shuffles. Cross-engine: the v33 oracle. */
class BinaryQuantSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  // 3 clusters around distinct sign patterns + noise
  private def corpus = (0 until 90).map { i =>
    val c = i % 3
    val base = Array.tabulate(8)(j =>
      (if ((j + c) % 3 == 0) 1.0f else -1.0f) * (1.0f + (i % 5) * 0.01f))
    (i.toLong, base.toSeq)
  }.toDF("vec_id", "embedding")
    .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("thresholds equal the brute-force quantized-mean recount") {
    val thr = BinaryQuant.trainThresholds(corpus, col("embedding"))
    val rows = corpus.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val brute = Array.tabulate(8) { j =>
      val qs = rows.map(v => math.floor(v(j).toDouble * 10000.0 + 0.5).toLong)
      math.floor(qs.sum.toDouble / qs.length.toDouble + 0.5).toLong
    }
    assert(thr.toSeq === brute.toSeq)
  }

  test("the pack kernel equals the driver packer bit for bit") {
    val thr = BinaryQuant.trainThresholds(corpus, col("embedding"))
    val viaKernel = corpus
      .select(col("vec_id"), BitPack.signPack(col("embedding"), thr).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = corpus.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        BitPack.packVector(r.getSeq[Float](1).map(_.toDouble).toArray, thr)).toMap
    assert(viaKernel === viaDriver)
  }

  test("wider than 64 dims fails loud: the pack is one 64-bit word") {
    val wide = Seq((0L, Seq.fill(80)(1.0f)), (1L, Seq.fill(80)(-1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      BinaryQuant.trainThresholds(wide, col("embedding"))
    }
    assert(e.getMessage.contains("64"))
    val e2 = intercept[IllegalArgumentException] {
      BinaryQuant.knn(wide, col("embedding"), col("vec_id"),
        Array.fill(80)(1.0), Array.fill(80)(0L), shortlist = 2, k = 1)
    }
    assert(e2.getMessage.contains("64"))
  }

  test("shortlist + rerank recovers the planted nearest cluster") {
    val thr = BinaryQuant.trainThresholds(corpus, col("embedding"))
    val q = corpus.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val top = BinaryQuant.knn(corpus, col("embedding"), col("vec_id"), q, thr,
      shortlist = 30, k = 10).collect()
    assert(top.head.getLong(0) === 0L, "self must rank first")
    assert(top.head.getDouble(1) === 1.0)
    // all top-10 from cluster 0 (ids ≡ 0 mod 3): same sign pattern
    assert(top.forall(_.getLong(0) % 3 === 0L),
      s"cross-cluster leak: ${top.map(_.getLong(0)).mkString(",")}")
  }

  test("knn plan never shuffles (pack + xor + TakeOrdered)") {
    val thr = BinaryQuant.trainThresholds(corpus, col("embedding"))
    val q = Array.fill(8)(0.5)
    val plan = BinaryQuant.knn(corpus, col("embedding"), col("vec_id"), q, thr, 30, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BQ knn shuffled:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }
}
