package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-duplicate pre-collapse for the banded LSH self-joins — the
  * adversarial-skew defense.
  *
  * Mass-duplicated boilerplate (cookie banners, license headers, mirror
  * pages — routinely 20–30% of raw web crawl) puts m identical rows
  * into the SAME (band, signature) bucket of EVERY band: the bucket
  * self-join emits m²·nBands candidate rows and the per-pair verify
  * joins skew onto the hot ids — quadratic intermediate state the
  * moment one document is popular, regardless of corpus size. AQE's
  * skew-join splitting re-balances the shuffle partitions but cannot
  * reduce the pair count.
  *
  * The fix is algebraic, not a cap: identical inputs have identical
  * signatures AND identical pairwise scores, so each duplicate group
  * collapses to ONE representative (its min id) before banding;
  * rep-level pairs verify ONCE per group pair; member-level pairs
  * re-expand afterwards carrying the rep-level score. Every
  * intermediate stage — banding, bucket self-join, candidate dedup,
  * verify — is then bounded by the number of DISTINCT inputs; only the
  * final expansion is proportional to the true output pair count,
  * which no pair-listing contract can avoid (a top-k contract can:
  * see [[Similarity.knnJoin]], whose expansion is capped at k+1 rows
  * per group). Recall is untouched: the representative carries exactly
  * the signatures its members had, so the expanded pair set equals the
  * uncollapsed one row-for-row (SkewSpec asserts equality against
  * uncollapsed twins on a boilerplate-heavy fixture; the v05/v12/t09
  * oracles hash-match through the rewrite).
  */
private[operators] object Collapse {

  /** Collapse rows to one representative per fingerprint value.
    *
    * Returns (members, reps):
    *  - members — (id, rep): every input id mapped to its group's
    *    representative (the min id sharing the fingerprint);
    *  - reps — (rep, payload, cnt): one row per distinct fingerprint,
    *    carrying an arbitrary member's payload (members are
    *    fingerprint-identical, so any copy is THE value) and the group
    *    size.
    *
    * Scale shape: the groupBy's map-side partial aggregation collapses
    * duplicate payloads BEFORE the shuffle, so a boilerplate-heavy
    * corpus ships ~one payload copy per (distinct value × map
    * partition) — never per row — and the members map shuffles only
    * (id, fingerprint). The fingerprint must be injective on payloads
    * up to hash collision (md5 of the exact bytes: 2⁻⁶⁴ birthday bound
    * at 10¹⁰ docs — below hardware error rates). */
  def collapse(rows: DataFrame, fp: Column, id: Column, payload: Column)
      : (DataFrame, DataFrame) = {
    val keyed = rows.select(id.as("id"), payload.as("payload"), fp.as("fp"))
    // localCheckpoint: the consuming operators reference members
    // and reps 5-7 times (self-joins, verify, expansion); as plain
    // plans each reference re-scans the source and re-runs the
    // fingerprint kernel (column pruning specializes the subtrees, so
    // exchange reuse cannot dedup them — measured 14 scans in v12).
    // Materializing once into block-manager storage (disk-backed,
    // ContextCleaner-freed when unreferenced, unlike persist()'s
    // session-pinned cache; the t21 round-state precedent) makes every
    // reference a block read. At cluster scale this stores the
    // DISTINCT payloads + an (id, rep) map — the same order of data a
    // single shuffle of the operator would spill; a serving pipeline
    // would stage the same two tables to parquet.
    //
    // EAGER (true), deliberately, everywhere a checkpoint feeds a
    // broadcast: a LAZY checkpoint materializes inside whichever
    // thread first computes it — often a broadcast-exchange thread —
    // and Spark's RDDCheckpointData.checkpoint takes a GLOBAL class
    // lock while the DAG scheduler's getCacheLocs holds the RDD's own
    // monitor; two threads checkpointing concurrently deadlock the
    // scheduler (observed live in an sf0.1 verify run: the
    // broadcast-exchange thread held RDDCheckpointData$ while
    // dag-scheduler-event-loop held the RDD monitor, each waiting on
    // the other). Eager checkpoints run their materializing job from
    // the caller's thread, one at a time — the same single
    // materialization pass, with no concurrent-checkpoint window.
    val reps = keyed
      .groupBy(col("fp"))
      .agg(min(col("id")).as("rep"), first(col("payload")).as("payload"),
        count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val members = keyed.select(col("id"), col("fp"))
      .join(reps.select(col("fp"), col("rep")), "fp")
      .select(col("id"), col("rep"))
      .localCheckpoint(true)
    (members, reps.select(col("rep"), col("payload"), col("cnt")))
  }

  /** Expand rep-level scored pairs back to member-level pairs
    * (id_a < id_b, score).
    *
    *  - `cross` — (ra, rb, score) with ra < rb: pairs of DISTINCT
    *    groups. Groups are disjoint, so each member pair appears
    *    exactly once; least/greatest normalizes the id order (group
    *    min-ids do not order the member ids).
    *  - `self` — (ra, score): groups of ≥ 2 members, whose intra-group
    *    pairs all score the same; the diagonal and mirrored duplicates
    *    drop via ida < idb.
    *
    * Only this step scales with the OUTPUT pair count. The expansion
    * joins key on rep ids — a hot group is one build row meeting its
    * m member rows, so join output equals true output, and AQE
    * skew-splitting handles the partition imbalance. */
  def expandPairs(cross: DataFrame, self: DataFrame, members: DataFrame,
      score: String): DataFrame = {
    val ma = members.select(col("rep").as("ra"), col("id").as("ida"))
    val mb = members.select(col("rep").as("rb"), col("id").as("idb"))
    val crossOut = cross.join(ma, "ra").join(mb, "rb")
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"), col(score))
    val selfOut = self.join(ma, "ra")
      .join(members.select(col("rep").as("ra"), col("id").as("idb")), "ra")
      .filter(col("ida") < col("idb"))
      .select(col("ida").as("id_a"), col("idb").as("id_b"), col(score))
    crossOut.unionByName(selfOut)
  }
}
