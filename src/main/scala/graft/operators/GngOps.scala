package graft.operators

import org.apache.spark.sql.Dataset
import scala.collection.mutable
import graft.model.{NodeStats, Point}

/** The distributed half of the G-Stream micro-batch update: nearest-
  * prototype assignment + per-winner statistics aggregation
  * (reference `findTwoNearestPointDist1L` + `aggregateByKey`,
  * batchStreamModel.scala:61-78), re-designed for scale:
  *
  *  - centroids are **broadcast** (the reference shipped them in every
  *    task closure — SURVEY §4.1 flags this as the inefficiency to fix);
  *  - assignment and partial aggregation are **fused in one pass** inside
  *    each partition (no per-point rows emitted, no shuffle at all —
  *    the reference paid a full `aggregateByKey` shuffle);
  *  - partials merge via `treeAggregate` (depth 2), so 10⁴ partitions
  *    on a real cluster funnel through executors, not the driver.
  *
  * Per batch this is exactly one narrow stage over the points + a
  * collect of ≤ numPartitions × N tiny stat buffers — the only part of
  * the pipeline that touches all 100 TB, and it is embarrassingly
  * parallel.
  */
object GngOps {

  /** Top-2 nearest centroids by squared Euclidean distance; ties broken
    * by lowest index (the reference's lexicographic (dist, idx) sort,
    * batchStreamModel.scala:117-119). Returns (bmu1, bmu2, dist1²). */
  def twoNearest(features: Array[Double], centroids: Array[Array[Double]]): (Int, Int, Double) = {
    var b1 = -1; var b2 = -1
    var d1 = Double.PositiveInfinity; var d2 = Double.PositiveInfinity
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var d = 0.0
      var k = 0
      while (k < c.length) { val t = features(k) - c(k); d += t * t; k += 1 }
      if (d < d1) { d2 = d1; b2 = b1; d1 = d; b1 = i }
      else if (d < d2) { d2 = d; b2 = i }
      i += 1
    }
    (b1, if (b2 >= 0) b2 else b1, d1)
  }

  /** Mutable per-partition accumulator keyed by winner node. */
  private final class Acc(nNodes: Int, dim: Int) extends Serializable {
    val map: mutable.HashMap[Int, (Array[Long], Array[Double], Array[Double], Array[Long], mutable.Set[Long])] =
      mutable.HashMap.empty
    // value = (votes, [errSum], vecSum, [count], ids) — boxed scalars in
    // single-cell arrays to keep everything mutable in place.
    def add(bmu1: Int, bmu2: Int, dsq: Double, features: Array[Double], id: Long): Unit = {
      val e = map.getOrElseUpdate(bmu1,
        (new Array[Long](nNodes), new Array[Double](1), new Array[Double](dim),
          new Array[Long](1), mutable.Set.empty[Long]))
      e._1(bmu2) += 1
      e._2(0) += dsq
      val vs = e._3
      var k = 0
      while (k < dim) { vs(k) += features(k); k += 1 }
      e._4(0) += 1
      e._5 += id
    }
    def merge(o: Acc): Acc = {
      for ((k, ov) <- o.map) {
        map.get(k) match {
          case None => map.put(k, ov)
          case Some(e) =>
            var i = 0
            while (i < e._1.length) { e._1(i) += ov._1(i); i += 1 }
            e._2(0) += ov._2(0)
            i = 0
            while (i < e._3.length) { e._3(i) += ov._3(i); i += 1 }
            e._4(0) += ov._4(0)
            e._5 ++= ov._5
        }
      }
      this
    }
    def result: Array[(Int, NodeStats)] =
      map.iterator.map { case (k, e) =>
        k -> NodeStats(e._1, e._2(0), e._3, e._4(0), e._5.toSet)
      }.toArray.sortBy(_._1)
  }

  /** Distributed assign + aggregate: one narrow pass, no shuffle.
    * Result: per-winner stats in canonical (ascending index) order. */
  def assignAggregate(points: Dataset[Point], centroids: Array[Array[Double]]): Array[(Int, NodeStats)] = {
    if (centroids.isEmpty) return Array.empty
    val dim = centroids(0).length
    val n = centroids.length
    val sc = points.sparkSession.sparkContext
    val bc = sc.broadcast(centroids)
    try {
      val rdd = points.rdd
      // the depth-2 funnel exists to keep 10⁴-partition clusters from
      // merging every partial on the driver — but it costs one extra
      // stage per micro-batch, which is pure overhead when there are
      // only a handful of partitions (local mode / small batches)
      val depth = if (rdd.getNumPartitions > 16) 2 else 1
      rdd
        .treeAggregate(new Acc(n, dim))(
          seqOp = (acc, p) => {
            val (b1, b2, d1) = twoNearest(p.features, bc.value)
            acc.add(b1, b2, d1, p.features, p.id)
            acc
          },
          combOp = (a, b) => a.merge(b),
          depth = depth)
        .result
    } finally bc.destroy()
  }

  /** Driver-local variant for tiny batches (no Spark job): identical
    * semantics, used by tests and the small-batch fast path. */
  def assignAggregateLocal(points: Iterable[Point], centroids: Array[Array[Double]]): Array[(Int, NodeStats)] = {
    if (centroids.isEmpty) return Array.empty
    val acc = new Acc(centroids.length, centroids(0).length)
    for (p <- points) {
      val (b1, b2, d1) = twoNearest(p.features, centroids)
      acc.add(b1, b2, d1, p.features, p.id)
    }
    acc.result
  }
}
