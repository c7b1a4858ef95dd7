package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental equi-JOIN view maintenance (insert-only deltas) — the
  * join-side companion to [[IncrementalAgg]]: a stored view
  * `V = A ⋈ B` stays current under appends without ever re-joining
  * the full inputs. The classic delta rule:
  *
  *   ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * where A and B are the PRE-delta states — each new pair of rows
  * joins in exactly one of the three terms (old×old pairs are already
  * in V; the ΔA⋈ΔB term is the one naive implementations forget, and
  * dropping it silently loses every pair where BOTH sides arrived in
  * the same increment — spec-asserted).
  *
  * Scale shape: V is APPEND-ONLY under insert deltas — ΔV is computed
  * without reading V at all, so maintaining a 100 TB view costs the
  * increment joins plus an append, never a view scan. Each delta term
  * joins an increment-sized side against a stored side: the delta side
  * is explicitly broadcast (ΔA into B, ΔB into A), so neither stored
  * input is ever shuffled — the q42/q51 discipline. Deletes/updates
  * need keyed tombstones on V (the [[Cdc]] netting approach applied to
  * the view key); this operator states the insert-only contract
  * loudly rather than approximating the general case.
  */
object IncrementalJoin {

  /** The view delta for insert-only increments `dA`, `dB` against the
    * PRE-delta states `aOld`, `bOld`, equi-joining on `keys` (column
    * names shared by both sides). Returns ΔV; append it to the stored
    * view (`view.unionByName(delta)` or a parquet append). */
  def delta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame, dB: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "incrementalJoin: at least one join key")
    dA.hint("broadcast").join(bOld, keys)
      .unionByName(aOld.join(dB.hint("broadcast"), keys))
      .unionByName(dA.hint("broadcast").join(dB, keys))
  }

  /** Convenience: the maintained view after one increment —
    * `view ∪ delta(...)`. */
  def applyDelta(view: DataFrame, aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(delta(aOld, dA, bOld, dB, keys))
}
