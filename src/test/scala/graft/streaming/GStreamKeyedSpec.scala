package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestSupport
import graft.model.{GngModel, GngParams, Point}
import graft.streaming.GStreamKeyed.{KeyedPoint, KeyedGngUpdate}

/** Keyed multi-model G-Stream: sharding by tenant key must never change
  * what any single tenant's model learns — every per-key model is
  * asserted bit-identical (prototypes, edges, weights, counter) to the
  * single-model update path run on that key's points alone. */
class GStreamKeyedSpec extends AnyFunSuite with SparkTestSupport {

  /** Deterministic per-key 2-D scatter: distinct centers per key so
    * each model grows its own structure; ids unique and ordered within
    * a key. */
  private def kp(key: Long, i: Int): KeyedPoint =
    KeyedPoint(key,
      Array(30.0 * key + 8 * math.sin(i * 0.37), 30.0 * key + 8 * math.cos(i * 0.53)),
      key.toInt, key * 100000L + i)

  private def fingerprint(m: GngModel): (Seq[String], Seq[String], Seq[String], Int) =
    (m.prototypeLines, m.edgeLines, m.weightLines, m.nodeCount)

  test("fitKeyed: each key's model == single-model local fit on that key's points; partitioning-invariant") {
    import spark.implicits._
    val params = GngParams()
    val pts = (for (key <- 0L to 2L; i <- 0 until 120) yield kp(key, i)).toSeq
    val keyed = GStreamKeyed.fitKeyed(spark.createDataset(pts).repartition(7), params, nChunks = 10)
    assert(keyed.keySet === Set(0L, 1L, 2L))
    for (key <- 0L to 2L) {
      val own = pts.filter(_.key == key)
        .map(p => Point(p.features, p.label, p.id)).toArray.sortBy(_.id)
      val solo = GStream.fitChunkedLocal(own, params, nChunks = 10)
      assert(fingerprint(keyed(key)) === fingerprint(solo), s"key=$key")
      // the models genuinely differ across keys (distinct scatter)
      assert(keyed(key).prototypeLines !==
        keyed((key + 1) % 3).prototypeLines, s"key=$key degenerate fixture")
    }
    // shuffle-order independence: a different partitioning must not
    // change any model (the ascending-id canonicalization at work)
    val again = GStreamKeyed.fitKeyed(spark.createDataset(pts).repartition(1), params, 10)
    for (key <- 0L to 2L)
      assert(fingerprint(again(key)) === fingerprint(keyed(key)), s"key=$key repartition")
  }

  test("fitKeyed: the driver-collect bound fails loud and points at fitKeyedTable") {
    import spark.implicits._
    val pts = (for (key <- 0L to 4L; i <- 0 until 4) yield kp(key, i)).toSeq
    val e = intercept[IllegalArgumentException] {
      GStreamKeyed.fitKeyed(spark.createDataset(pts), GngParams(), nChunks = 2,
        maxKeys = 4)
    }
    assert(e.getMessage.contains("fitKeyedTable"))
    // the default bound is the spec-pinned fixture-scale constant
    assert(GStreamKeyed.MaxCollectKeys === 1024)
  }

  test("trainKeyedStreaming: interleaved micro-batches == per-key manual update loop; late bootstrap buffers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val params = GngParams()
    // keys 0/1 have full batches from the start; key 2 is the
    // straggler: ONE point in batch 1 (below the 2-point bootstrap),
    // the rest arriving in batch 2
    val batch1 = (for (key <- 0L to 1L; i <- 0 until 40) yield kp(key, i)) :+ kp(2L, 0)
    val batch2 = (for (key <- 0L to 1L; i <- 40 until 80) yield kp(key, i)) ++
      (1 until 50).map(i => kp(2L, i))
    val mem = MemoryStream[KeyedPoint]
    val q = GStreamKeyed.trainKeyedStreaming(mem.toDS(), params)
      .writeStream.format("memory").queryName("kgng").outputMode("append").start()
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()
    val updates = spark.table("kgng").as[KeyedGngUpdate].collect().toSeq
    val got = GStreamKeyed.finalModels(updates)

    // manual twin per key: the documented semantics driven by hand
    // through the SAME single-model machinery
    def manual(key: Long): (GngModel, Int) = {
      val b1 = batch1.filter(_.key == key).map(p => Point(p.features, p.label, p.id))
        .toArray.sortBy(_.id)
      val b2 = batch2.filter(_.key == key).map(p => Point(p.features, p.label, p.id))
        .toArray.sortBy(_.id)
      if (b1.length >= 2) {
        val m = new GngModel(params, 2).init2Nodes(b1(0), b1(1))
        var kk = 0
        for (batch <- Seq(b1.drop(2), b2) if batch.nonEmpty) {
          val stats = graft.operators.GngOps.assignAggregateLocal(batch, m.centroids)
          if (stats.nonEmpty) { kk += 1; m.update(stats, kk) }
        }
        (m, kk)
      } else {
        // straggler: bootstrap happens when batch 2 arrives, from the
        // two lowest ids of everything seen; the rest is update 1
        val all = (b1 ++ b2).sortBy(_.id)
        val m = new GngModel(params, 2).init2Nodes(all(0), all(1))
        val stats = graft.operators.GngOps.assignAggregateLocal(all.drop(2), m.centroids)
        var kk = 0
        if (stats.nonEmpty) { kk = 1; m.update(stats, kk) }
        (m, kk)
      }
    }
    for (key <- 0L to 2L) {
      val (wantModel, wantKk) = manual(key)
      val (gotModel, gotKk) = got(key)
      assert(gotKk === wantKk, s"key=$key kk")
      assert(fingerprint(gotModel) === fingerprint(wantModel), s"key=$key")
    }
    // the straggler emitted nothing until it could bootstrap
    assert(updates.filter(_.key == 2L).map(_.kk) === Seq(1))
    // keys 0/1 emitted one update per micro-batch
    for (key <- 0L to 1L)
      assert(updates.filter(_.key == key).map(_.kk).sorted === Seq(1, 2), s"key=$key")
  }
}
