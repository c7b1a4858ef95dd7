package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSupport

/** Distributed Lloyd's: seeds, one-round stats, and the multi-round
  * fit loop checked against a hand-rolled local reference. */
class KMeansSpec extends AnyFunSuite with SparkTestSupport {

  // 2-d points in three obvious blobs; ids fix the seed choice.
  private val pts: Seq[(Long, Array[Double])] = Seq(
    0L -> Array(0.0, 0.0), 1L -> Array(10.0, 10.0), 2L -> Array(0.1, -0.1),
    3L -> Array(9.9, 10.2), 4L -> Array(0.05, 0.05), 5L -> Array(10.1, 9.8),
    6L -> Array(20.0, 0.0), 7L -> Array(20.2, 0.1), 8L -> Array(19.8, -0.1))

  private lazy val df = {
    import spark.implicits._
    pts.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  /** Local reference: same seeds, same strict-< lowest-index
    * assignment, same 4-decimal intermediate rounding. */
  private def localFit(k: Int, iters: Int): (Array[Array[Double]], Array[Long]) = {
    var cents = pts.sortBy(_._1).take(k).map(_._2.clone()).toArray
    var counts = new Array[Long](k)
    for (_ <- 1 to iters) {
      val sums = Array.fill(k, 2)(0.0)
      counts = new Array[Long](k)
      pts.foreach { case (_, v) =>
        var best = -1; var bd = Double.PositiveInfinity
        for (c <- 0 until k) {
          var d = 0.0
          for (t <- v.indices) { val x = v(t) - cents(c)(t); d += x * x }
          if (d < bd) { bd = d; best = c }
        }
        for (t <- v.indices) sums(best)(t) += v(t)
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(2)(t => KMeans.round4(sums(c)(t) / counts(c)))
      }
    }
    (cents, counts)
  }

  test("seeds are the k lowest-id vectors") {
    val s = KMeans.seeds(df, col("embedding"), col("vec_id"), 3)
    assert(s.map(_.toSeq).toSeq ===
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0), Seq(0.1, -0.1)))
    assertThrows[IllegalArgumentException](
      KMeans.seeds(df, col("embedding"), col("vec_id"), 100))
  }

  test("fit matches the local reference over multiple rounds; blobs separate") {
    for (iters <- 1 to 3) {
      val m = KMeans.fit(df, col("embedding"), col("vec_id"), k = 3, iters = iters)
      val (refC, refN) = localFit(3, iters)
      assert(m.counts.toSeq === refN.toSeq, s"iters=$iters counts")
      assert(m.centroids.map(_.toSeq).toSeq === refC.map(_.toSeq).toSeq,
        s"iters=$iters centroids")
    }
    // converged state: one centroid per blob, sizes 4/3/2 — seed 2
    // (0.1,-0.1) starts inside blob 0 and empties after round 1? No:
    // strict-< assignment sends blob-0 points to their nearest of the
    // three seeds; the converged counts come from the reference.
    val m = KMeans.fit(df, col("embedding"), col("vec_id"), k = 3, iters = 3)
    assert(m.counts.sum === pts.length)
  }

  test("empty clusters keep their previous centroid") {
    import spark.implicits._
    // Duplicate seeds: strict-< ties always pick the lower index, so
    // cluster 1 is empty after round 1 and must keep its seed.
    val dup = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 1.0))
    ).toDF("vec_id", "embedding")
    val r1 = KMeans.fit(dup, col("embedding"), col("vec_id"), k = 2, iters = 1)
    assert(r1.counts.toSeq === Seq(3L, 0L))
    assert(r1.centroids(1).toSeq === Seq(0.0, 0.0)) // kept, not zeroed/NaN
    // ...and because it was KEPT (not dropped), round 2 can re-win the
    // origin points from cluster 0's drifted centroid (0.3333, 0.3333):
    val r2 = KMeans.fit(dup, col("embedding"), col("vec_id"), k = 2, iters = 2)
    assert(r2.counts.toSeq === Seq(1L, 2L))
  }
}
