package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSupport

class HeavyHittersSpec extends AnyFunSuite with SparkTestSupport {
  import spark.implicits._

  // zipf-ish: key k_i appears (101-i) times → known exact counts
  private lazy val keys = (1 to 100).flatMap(i => Seq.fill(101 - i)(s"k$i"))
    .toDF("key")

  test("distributed sketch never undercounts and respects the eps*N bound") {
    val cms = HeavyHitters.sketch(keys.repartition(8), "key", eps = 1e-3)
    val n = keys.count()
    for (i <- 1 to 100) {
      val exact = 101L - i
      val est = cms.estimateCount(s"k$i")
      assert(est >= exact, s"k$i undercounted: $est < $exact")
      assert(est <= exact + math.ceil(2 * 1e-3 * n).toLong,
        s"k$i overcounted beyond 2*eps*N: $est vs $exact")
    }
  }

  test("withEstimates probes engine-side and matches driver-side estimateCount") {
    val cms = HeavyHitters.sketch(keys, "key", eps = 1e-3)
    val cand = Seq("k1", "k50", "k100", "nope").toDF("key")
    val engine = HeavyHitters.withEstimates(cand, col("key"), cms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, est) <- engine)
      assert(est === cms.estimateCount(k), s"engine/driver probe drift on $k")
    assert(engine("nope") === 0L)
  }

  test("linearity: merging per-slice sketches == the single-pass sketch (s12's claim)") {
    val full = HeavyHitters.sketch(keys, "key", eps = 1e-3)
    val slices = (0 until 3).map(r =>
      HeavyHitters.sketch(keys.filter(expr(s"crc32(key) % 3 = $r")), "key", eps = 1e-3))
    val merged = slices.reduce { (a, b) => a.mergeInPlace(b); a }
    assert(merged.totalCount() === full.totalCount())
    for (i <- 1 to 100)
      assert(merged.estimateCount(s"k$i") === full.estimateCount(s"k$i"),
        s"k$i drifted under slicing")
  }

  test("sketch build is merge-consistent: partitioning does not change estimates") {
    val one = HeavyHitters.sketch(keys.coalesce(1), "key", eps = 1e-3)
    val many = HeavyHitters.sketch(keys.repartition(16), "key", eps = 1e-3)
    for (i <- 1 to 100 by 7)
      assert(one.estimateCount(s"k$i") === many.estimateCount(s"k$i"))
  }
}
