package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.model.{GngModel, GngParams, Point}

/** KEYED multi-model G-Stream: one independent GNG model per tenant/
  * source key — the sharding SURVEY §2.9 T2 names as the single-global-
  * state limitation of the reference's design (its DStream loop holds
  * exactly one model on the driver).
  *
  * The scale story INVERTS the single-model layout: a single GNG
  * trains with a distributed assign pass feeding one driver-side graph
  * update, while the keyed variant partitions BY KEY and runs the
  * ENTIRE existing single-model update path per key inside an
  * executor task ([[GStream.fitChunkedLocal]] — the same code the
  * single-model local path runs, proven equal to the distributed
  * path by GngOpsSpec). N tenants train N models in PARALLEL with
  * zero driver state and one shuffle (the groupByKey); each model is
  * a few hundred KB of prototypes, so the collected result is
  * dimension-sized. The fit for a single key must fit one task — a
  * tenant too large for that is exactly the case the single-model
  * distributed path exists for.
  *
  * DETERMINISM: shuffle delivery order inside a group is arbitrary, so
  * every per-key batch is canonicalized to ascending id before it
  * touches the model — FP accumulation order (and therefore the grown
  * graph) is then a pure function of (key's points, params, slicing),
  * independent of partitioning (spec-asserted by re-running under
  * different parallelism).
  */
object GStreamKeyed {

  /** A point tagged with its model key. */
  final case class KeyedPoint(key: Long, features: Array[Double], label: Int, id: Long)

  /** Per-trigger emission of the streaming path: the key's updated
    * model (serialized), its 1-based non-empty-batch counter, and the
    * node count — the last row per key (max kk) IS the final model. */
  final case class KeyedGngUpdate(key: Long, kk: Int, nodeCount: Int, model: Array[Byte])

  /** Streaming state per key: points buffered before the 2-point
    * bootstrap, then the serialized model + batch counter. */
  final case class KeyedGngState(pending: Array[Byte], model: Array[Byte], kk: Int)

  private[graft] def serialize(obj: AnyRef): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    try out.writeObject(obj) finally out.close()
    bos.toByteArray
  }

  private[graft] def deserialize[T](bytes: Array[Byte]): T = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readObject().asInstanceOf[T] finally in.close()
  }

  /** Tag a dense-row DataFrame into [[KeyedPoint]]s ([[GStream.toPoints]]
    * with a key column). */
  def toKeyedPoints(df: DataFrame, keyCol: String, featuresCol: String,
      labelCol: String, idCol: String): Dataset[KeyedPoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("long").as("key"),
        col(featuresCol).cast("array<double>").as("features"),
        col(labelCol).cast("int").as("label"),
        col(idCol).cast("long").as("id"))
      .as[KeyedPoint]
  }

  /** Deterministic keyed BATCH training: group by key, run the full
    * single-model chunked loop per key in its executor task, collect
    * the (small) models. Each key's result is BIT-IDENTICAL to
    * [[GStream.fitChunkedLocal]] over that key's id-sorted points with
    * the same params/chunking (spec-asserted) — sharding must never
    * change what any tenant's model learns. */
  def fitKeyed(points: Dataset[KeyedPoint], params: GngParams,
      nChunks: Int): Map[Long, GngModel] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.key)
      .mapGroups { (key, it) =>
        val pts = it.map(kp => Point(kp.features, kp.label, kp.id)).toArray
        require(pts.length >= 2, s"key $key: need at least 2 points to bootstrap")
        // canonical order — group iterators deliver in shuffle order
        (key, serialize(GStream.fitChunkedLocal(pts.sortBy(_.id), params, nChunks)))
      }
      .collect()
      .map { case (k, bytes) => k -> deserialize[GngModel](bytes) }
      .toMap
  }

  /** Keyed STREAMING training via flatMapGroupsWithState — one model
    * per key held in the state store, updated through the EXISTING
    * single-model path (assignAggregateLocal + GngModel.update) per
    * micro-batch:
    *
    *  - points buffer per key until two are available; the bootstrap
    *    takes the two LOWEST ids seen (GStream.bootstrap's rule), and
    *    any remaining buffered points form that key's first update
    *    batch (kk = 1);
    *  - each later non-empty per-key batch is one `model.update`
    *    (kk += 1), exactly the single-model foreachBatch loop —
    *    batches canonicalized to ascending id like [[fitKeyed]];
    *  - emission is (key, kk, nodeCount, serialized model) per
    *    updated key per trigger; the max-kk row per key is the final
    *    model ([[finalModels]]).
    *
    * State is per-key and bounded (one model ≈ prototypes + N² byte
    * matrices); the state store shards it across executors, so the
    * driver never holds ANY model — the opposite of the single-model
    * design, and the property that lets tenant count scale with the
    * cluster. Run with a checkpointLocation for restartability: the
    * state store versions per batch, so a restart resumes each key's
    * model exactly (the mechanism GStreamRestartSpec proves for the
    * single-model path via explicit saveState). */
  def trainKeyedStreaming(streamed: Dataset[KeyedPoint],
      params: GngParams): Dataset[KeyedGngUpdate] = {
    val spark = streamed.sparkSession
    import spark.implicits._
    streamed.groupByKey(_.key)
      .flatMapGroupsWithState[KeyedGngState, KeyedGngUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (key, it, state) =>
        val arrived = it.map(kp => Point(kp.features, kp.label, kp.id))
          .toArray.sortBy(_.id)
        if (arrived.isEmpty) Iterator.empty
        else {
          val prev = state.getOption
          val (pending, modelBytes, kk0) = prev match {
            case Some(s) => (Option(s.pending), Option(s.model), s.kk)
            case None => (None, None, 0)
          }
          modelBytes match {
            case Some(mb) =>
              // established model: this batch is one update
              val model = deserialize[GngModel](mb)
              val stats = graft.operators.GngOps.assignAggregateLocal(arrived, model.centroids)
              if (stats.isEmpty) Iterator.empty
              else {
                val kk = kk0 + 1
                model.update(stats, kk)
                state.update(KeyedGngState(Array.emptyByteArray, serialize(model), kk))
                Iterator.single(KeyedGngUpdate(key, kk, model.nodeCount, serialize(model)))
              }
            case None =>
              val all = (pending.map(deserialize[Array[Point]]).getOrElse(Array.empty[Point])
                ++ arrived).sortBy(_.id)
              if (all.length < 2) {
                // still too few to bootstrap: keep buffering
                state.update(KeyedGngState(serialize(all), null, 0))
                Iterator.empty
              } else {
                // bootstrap from the two lowest ids; the REST of the
                // accumulated points form the first update batch
                val model = new GngModel(params, all(0).features.length)
                  .init2Nodes(all(0), all(1))
                val rest = all.drop(2)
                val stats = graft.operators.GngOps.assignAggregateLocal(rest, model.centroids)
                val kk = if (stats.nonEmpty) { model.update(stats, 1); 1 } else 0
                state.update(KeyedGngState(Array.emptyByteArray, serialize(model), kk))
                Iterator.single(KeyedGngUpdate(key, kk, model.nodeCount, serialize(model)))
              }
          }
        }
      }
  }

  /** The final model per key from a collected [[trainKeyedStreaming]]
    * output: the max-kk row per key, deserialized. */
  def finalModels(updates: Seq[KeyedGngUpdate]): Map[Long, (GngModel, Int)] =
    updates.groupBy(_.key).map { case (k, rows) =>
      val last = rows.maxBy(_.kk)
      k -> ((deserialize[GngModel](last.model), last.kk))
    }
}
