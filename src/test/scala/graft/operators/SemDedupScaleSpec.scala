package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** The SemDeDup scale contract (v32's blocking): k is a function of
  * the corpus count, the expected block size — and with it the
  * per-block quadratic candidate term — stays bounded at EVERY corpus
  * size, and the b>0 prefix-split path produces exactly the
  * ε-similar pairs an exhaustive local replay of the same blocking
  * finds. The b=0 path must equal plain within-cluster pairwise. */
class SemDedupScaleSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  test("deriveK scales with the corpus and clamps at both ends") {
    assert(KMeans.deriveK(0L) === 8)
    assert(KMeans.deriveK(500L) === 8, "bench-scale corpora keep the historical k=8")
    assert(KMeans.deriveK(8L * 1024L) === 8)
    assert(KMeans.deriveK(8L * 1024L + 1L) === 9, "first n past kMin*target grows k")
    assert(KMeans.deriveK(1000000L) === 977)
    assert(KMeans.deriveK(100000000L) === 4096, "seed budget caps k")
    assert(KMeans.deriveK(1L << 40) === 4096)
  }

  test("expected block size is bounded at every corpus size (two named + a sweep)") {
    def expectedBlockSize(n: Long): Double = {
      val k = KMeans.deriveK(n)
      val b = SemDedup.prefixBits(n, k)
      n.toDouble / k / (1L << b)
    }
    // the two corpus sizes the gate names: one inside the k-only
    // regime, one deep in the prefix-split regime
    assert(expectedBlockSize(1000000L) <= SemDedup.TargetClusterSize.toDouble)
    assert(expectedBlockSize(300000000000L) <= SemDedup.TargetClusterSize.toDouble,
      "100 TB-scale row count must still bound the per-block quadratic")
    // and the whole curve: expected per-block candidate pairs stay
    // ~target²/2 — linear-in-n total work — from 1e3 to 1e12 rows
    var n = 1000L
    while (n <= 1000000000000L) {
      val sz = expectedBlockSize(n)
      assert(sz <= SemDedup.TargetClusterSize.toDouble,
        s"n=$n: expected block size $sz exceeds target")
      n *= 10
    }
  }

  test("prefixBits is 0 exactly while k alone holds the target") {
    assert(SemDedup.prefixBits(500L, 8) === 0)
    assert(SemDedup.prefixBits(2000L, 8) === 0)
    assert(SemDedup.prefixBits(4096L * 1024L, 4096) === 0)
    assert(SemDedup.prefixBits(4096L * 1024L * 2L, 4096) === 1)
    assert(SemDedup.prefixBits(4096L * 1024L * 3L, 4096) === 2)
  }

  // deterministic 8-d fixture: two sign-pattern families with small
  // per-id jitter, so clusters are unambiguous but prefixes vary
  private def vec(i: Int): Array[Double] = {
    val c = i % 2
    Array.tabulate(8) { j =>
      val s = if ((j + c) % 2 == 0) 1.0 else -1.0
      s * (1.0 + 0.03 * ((i * 7 + j * 3) % 11))
    }
  }

  private def corpus = (0 until 120).map(i => (i.toLong, vec(i).toSeq))
    .toDF("vec_id", "v")
    .select(col("vec_id"), col("v").cast("array<double>").as("v"),
      (col("vec_id") % 2).cast("int").as("cluster"))

  /** Exhaustive local replay of the blocking + threshold. */
  private def localPairs(bits: Int): Set[(Long, Long)] = {
    val rows = (0 until 120).map(i => (i.toLong, vec(i), (i % 2).toLong))
    val planes = if (bits == 0) Array.empty[Array[Double]]
      else Similarity.hyperplanes(bits, 8)
    def block(v: Array[Double], cluster: Long): Long =
      if (bits == 0) cluster
      else {
        var sig = 0L
        for (i <- 0 until bits) {
          val d = planes(i).zip(v).map { case (a, b) => a * b }.sum
          if (d >= 0.0) sig |= (1L << i)
        }
        cluster * (1L << bits) + sig
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      d / (na * nb)
    }
    (for {
      (ia, va, ca) <- rows
      (ib, vb, cb) <- rows
      if ia < ib && block(va, ca) == block(vb, cb)
      if math.floor(cos(va, vb) * 10000 + 0.5) / 10000 >= 0.35
    } yield (ia, ib)).toSet
  }

  private def sparkPairs(bits: Int): Set[(Long, Long)] =
    SemDedup.withinBlockPairs(corpus, col("vec_id"), col("v"), col("cluster"),
      bits = bits, dim = 8, eps = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bits=0 equals exhaustive within-cluster pairwise (the paper-exact path)") {
    val got = sparkPairs(0)
    assert(got === localPairs(0))
    assert(got.nonEmpty, "fixture must produce within-cluster pairs")
  }

  test("bits>0 equals the exhaustive replay of the same prefix blocking, ⊆ bits=0") {
    val got = sparkPairs(3)
    val want = localPairs(3)
    assert(got === want)
    assert(got.nonEmpty, "prefix split must keep some pairs on this fixture")
    assert(got.subsetOf(sparkPairs(0)),
      "prefix split may only DROP candidate pairs, never invent them")
    assert(got.size < sparkPairs(0).size,
      "fixture must actually exercise the split (some pairs cross prefixes)")
  }
}
