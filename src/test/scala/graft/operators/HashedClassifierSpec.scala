package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSupport

/** Hashed-n-gram classifier contract: bucket determinism, fit
  * reproducibility (the bit-portability claim, JVM-side), separability
  * on a gram-mass label, and the score-grid/weight-arity guards. The
  * cross-engine half (DuckDB replaying the whole fit) is the t62
  * oracle. */
class HashedClassifierSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  private def corpus = (1 to 200).map { i =>
    val len = if (i % 2 == 0) 40 else 8
    (i.toLong, Seq.tabulate(len)(j => s"w${(i * 7 + j) % 23}").mkString(" "))
  }.toDF("id", "text")

  test("buckets are sorted, in range, and include uni+bigrams") {
    val bk = corpus.select(HashedClassifier.buckets(col("text")).as("bk"))
      .collect().map(_.getSeq[Int](0))
    for (b <- bk) {
      assert(b.forall(x => x >= 0 && x < HashedClassifier.D))
      assert(b === b.sorted)
    }
    // a doc with L tokens emits L unigrams + L−1 bigrams
    val one = Seq(("a b c")).toDF("text")
      .select(HashedClassifier.buckets(col("text")).as("bk"))
      .collect().head.getSeq[Int](0)
    assert(one.size === 5)
  }

  test("the fused kernels equal their HOF executable specs (buckets and z)") {
    val texts = corpus.union(Seq(
      (9001L, ""), (9002L, "   "), (9003L, "one"), (9004L, "Mixed CASE & punct!! 123"),
      (9005L, "repeat repeat repeat repeat")).toDF("id", "text"))
    val viaKernel = texts.select(col("id"),
        HashedClassifier.buckets(col("text")).as("bk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaHof = texts.select(col("id"),
        HashedClassifier.bucketsHof(col("text")).as("bk")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaKernel === viaHof, "bucket kernel diverged from its HOF spec")
    val w = Array.tabulate(HashedClassifier.D + 1)(i => (i % 7) * 0.125 - 0.25)
    val zk = texts.select(col("id"),
        graft.expressions.HashedOps.hashedZ(
          HashedClassifier.buckets(col("text")), w, HashedClassifier.X).as("z"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val zh = texts.select(col("id"),
        HashedClassifier.zOfHof(w, HashedClassifier.bucketsHof(col("text"))).as("z"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(zk === zh, "z kernel diverged bitwise from its HOF spec")
  }

  test("fit is deterministic across repartitionings (integer gradient sums)") {
    val label = length(col("text")) > 100
    val w1 = HashedClassifier.fit(corpus, col("text"), label, rounds = 5)
    val w2 = HashedClassifier.fit(corpus.repartition(7), col("text"), label, rounds = 5)
    assert(w1.toSeq === w2.toSeq, "weights must be bit-identical under any partitioning")
  }

  test("the model separates a gram-mass label and scores on the 1e-6 grid") {
    val label = length(col("text")) > 100 // even ids: 40 tokens; odd: 8
    val w = HashedClassifier.fit(corpus, col("text"), label)
    val scored = HashedClassifier.score(corpus, col("text"), col("id"), label, w)
    val acc = scored.agg(avg((col("y") === col("pred")).cast("double")))
      .collect().head.getDouble(0)
    assert(acc >= 0.98, s"separable corpus must classify: acc=$acc")
    val grid = scored.select((col("score") * 1000000.0).as("s")).collect()
      .forall(r => { val s = r.getDouble(0); math.abs(s - math.rint(s)) < 1e-6 })
    assert(grid, "scores must land on the 1e-6 grid")
  }

  test("weight-arity and empty-corpus guards refuse instead of NaN") {
    val label = length(col("text")) > 100
    intercept[IllegalArgumentException] {
      HashedClassifier.score(corpus, col("text"), col("id"), label, Array(1.0, 2.0))
    }
    intercept[IllegalArgumentException] {
      HashedClassifier.fit(corpus.filter(col("id") < 0), col("text"), label, rounds = 1)
    }
  }
}
