package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply: fold a change batch of inserts / updates / DELETES into a
  * keyed snapshot — the missing third of the merge story ([[Upsert]]
  * has no delete arm; [[Scd2]] keeps history instead of removing it).
  * This is how a table tracking an upstream OLTP source (Debezium-style
  * change feeds) or honoring takedown requests stays current.
  *
  * Semantics: each change row carries an op ('I' insert, 'U' update,
  * 'D' delete) and a per-key ordering column `seq` (the change-log
  * position). Within a batch only each key's LATEST change takes
  * effect — "netting", exactly what applying the log row-by-row would
  * leave behind:
  *
  *   - latest op 'D'       → the key is absent from the result;
  *   - latest op 'I' / 'U' → the result row is that change's payload
  *     (an 'I' on an existing key and a 'U' on a missing key both
  *     degrade to upsert — change feeds routinely deliver them after
  *     snapshot/compaction races, and failing them would wedge the
  *     pipeline);
  *   - untouched keys      → carried from the snapshot unchanged.
  *
  * Netting makes per-batch application COMPOSE: slicing one change log
  * into any seq-contiguous batches and folding them (s14) leaves the
  * same state as one big apply (q51's oracle proves it end-to-end;
  * CdcSpec asserts the composition law directly).
  *
  * Scale shape (the q31/q42 discipline): the snapshot is never
  * content-shuffled — netting shuffles only the increment (window by
  * key over the batch), untouched rows leave via a LEFT ANTI join
  * against the increment-sized touched-key set (broadcast at real
  * increment:snapshot ratios), and the upserted rows union in. A
  * 100 TB snapshot pays one in-place read per applied batch.
  *
  * An op outside {I, U, D} fails the job loudly via `raise_error` —
  * a malformed feed must never silently drop or keep a key.
  */
object Cdc {

  /** Apply `changes` (snapshot schema + `opCol` + `seqCol`) to
    * `snapshot` (unique non-NULL `key`). Returns the new snapshot,
    * same schema. `(key, seqCol)` must be unique in the batch — equal
    * seqs for one key would make "latest" nondeterministic.
    *
    * `broadcastTouched` (default true) hints the touched-key anti join
    * to broadcast — correct at real increment:snapshot ratios, where
    * the batch's key set fits comfortably under the driver/executor
    * broadcast limits. A batch approaching snapshot scale (bulk
    * backfills, q51/s14-style half-table batches at large SF) can
    * exceed those limits and fail the job; pass false there to let the
    * planner fall back to a shuffled anti join — slower (the snapshot
    * shuffles once) but bounded. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op", seqCol: String = "seq",
      broadcastTouched: Boolean = true): DataFrame = {
    val payloadCols = snapshot.columns.toIndexedSeq
    require(payloadCols.contains(key), s"cdc: key '$key' missing from snapshot")
    val expected = payloadCols ++ Seq(opCol, seqCol)
    require(expected.forall(changes.columns.contains),
      s"cdc: changes must carry ${expected.mkString(",")}, " +
        s"got ${changes.columns.mkString(",")}")

    // coalesce: a NULL op must fail with a readable message, not a
    // NULL-propagated one (concat of NULL is NULL)
    val opOk = col(opCol).isin("I", "U", "D")
    val validated = changes.withColumn(opCol,
      when(opOk, col(opCol)).otherwise(raise_error(
        concat(lit(s"cdc: unknown op '"), coalesce(col(opCol), lit("NULL")),
          lit(s"' (want I/U/D)")))))

    // netting: the latest change per key is the batch's whole effect.
    // The validated op is a TRAILING sort key (never reached — (key,
    // seq) is unique) so the window's sort forces raise_error to
    // evaluate on EVERY change row, including ones a later seq
    // supersedes: "fails loudly on any bad op" must hold even when the
    // bad row would otherwise be netted away before its filter ran
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc, col(opCol))
    val net = validated
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    // the touched-key set is increment-sized — hint it explicitly so a
    // missing size estimate on the post-window subtree can never
    // degrade this into a SortMergeJoin that shuffles the snapshot
    // (the content-never-shuffles guarantee this operator is built on)
    val touched = net.select(col(key))
    val untouched = snapshot.join(
      if (broadcastTouched) broadcast(touched) else touched, Seq(key), "left_anti")
    val upserted = net.filter(col(opCol) =!= "D")
      .select(payloadCols.map(col): _*)
    untouched.unionByName(upserted)
  }
}
