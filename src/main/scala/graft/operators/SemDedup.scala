package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.VectorOps

/** SemDeDup blocking that stays sub-quadratic at ANY corpus size
  * (Abbas et al. 2023, arXiv:2303.09540). The paper's premise — "k
  * scales with the corpus so the within-cluster pairwise term is
  * bounded" — is enforced here by construction, in two rungs:
  *
  *  1. k itself is corpus-derived ([[KMeans.deriveK]] from a cheap
  *     `count()`): expected cluster size ≤ `targetClusterSize` (1024)
  *     up to kMax·target ≈ 4M rows, where the seed matrix hits its
  *     driver/plan-constant budget.
  *  2. Past that, [[prefixBits]] splits every cluster by the first `b`
  *     bits of a deterministic sign-random-projection signature
  *     ([[Similarity.hyperplanes]], fixed seed — the v24 LSH family),
  *     with b chosen so the EXPECTED block size n/(k·2^b) is back
  *     under the target. Pairwise cosine then runs within
  *     (cluster, prefix) blocks: total candidate work is
  *     O(n · targetClusterSize) — linear in n — at every scale.
  *
  * The prefix split trades recall the same way the paper's own
  * cluster restriction does (two ε-similar vectors in different
  * blocks are never compared; sign-LSH makes that unlikely in
  * proportion to their angle). At bench/test scales b = 0 and the
  * semantics are EXACTLY the paper's within-cluster pairwise — the
  * dump-time oracle replays that path verbatim; the b > 0 path is
  * pinned by SemDedupScaleSpec against an exhaustive local replay.
  */
object SemDedup {

  /** Expected-cluster-size target shared by [[KMeans.deriveK]]'s
    * default and [[prefixBits]] — O(10³), so a block's pairwise term
    * is ~10⁶ comparisons, a single-task cost. */
  val TargetClusterSize: Long = 1024L

  /** Extra blocking bits needed once k alone can no longer hold the
    * expected cluster size at `target`: smallest b with
    * n / (k·2^b) ≤ target. 0 at small n (the exact-paper path). */
  def prefixBits(n: Long, k: Int, target: Long = TargetClusterSize): Int = {
    require(n >= 0 && k > 0 && target > 0, s"prefixBits: bad args ($n, $k, $target)")
    var b = 0
    while ((n.toDouble / k / (1L << b)) > target && b < 48) b += 1
    b
  }

  /** The blocking key: the cluster id alone when `bits` == 0 (the
    * paper-exact path — no signature kernel in the plan), else
    * cluster·2^bits + the `bits`-bit sign-projection prefix. `dim`
    * sizes the hyperplane matrix (a plan constant). */
  def blockKey(vecCol: Column, clusterCol: Column, bits: Int, dim: Int): Column =
    if (bits == 0) clusterCol.cast("long")
    else {
      val planes = Similarity.hyperplanes(bits, dim)
      clusterCol.cast("long") * lit(1L << bits) +
        element_at(VectorOps.lshBandSignatures(vecCol, planes,
          Array.emptyDoubleArray, bits), 1)
    }

  /** ε-similar pairs within blocks: the SemDeDup candidate step.
    * `assigned` must carry (id, v, cluster); output (id_a, id_b) with
    * id_a < id_b and round(cosine, 4) ≥ eps. One shuffle of the corpus
    * by block key on each join side; per-block work is quadratic in
    * the BLOCK size, which [[prefixBits]] bounds at the target — so
    * total candidate work is linear in n. */
  def withinBlockPairs(assigned: DataFrame, idCol: Column, vecCol: Column,
      clusterCol: Column, bits: Int, dim: Int, eps: Double): DataFrame = {
    val blocked = assigned.select(idCol.as("id"), vecCol.as("v"),
      blockKey(vecCol, clusterCol, bits, dim).as("block"))
    blocked.select(col("block"), col("id").as("id_a"), col("v").as("va"))
      .join(blocked.select(col("block"), col("id").as("id_b"), col("v").as("vb")),
        Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(VectorOps.cosineSimilarity(col("va"), col("vb")), 4) >= eps)
      .select(col("id_a"), col("id_b"))
  }

  /** The STREAMING increment's candidate step: ε-similar pairs with at
    * least one side in the arriving batch — `newAssigned` × (stored ∪
    * batch), block-keyed. Every unordered corpus pair is discovered in
    * the batch where its LATER member arrives, so the union of all
    * increments' pairs equals [[withinBlockPairs]] over the full
    * corpus, whatever the slicing. Both inputs carry (vec_id, v,
    * cluster). Scale: the batch side is increment-sized; the stored
    * side streams through one block-keyed join (partition the member
    * store by block and the scan prunes to the batch's blocks). */
  def incrementPairs(newAssigned: DataFrame, allAssigned: DataFrame,
      bits: Int, dim: Int, eps: Double): DataFrame = {
    def blocked(df: DataFrame, side: String) = df.select(
      blockKey(col("v"), col("cluster"), bits, dim).as("block"),
      col("vec_id").as(s"id_$side"), col("v").as(s"v$side"))
    blocked(newAssigned, "a").join(blocked(allAssigned, "b"), Seq("block"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(round(VectorOps.cosineSimilarity(col("va"), col("vb")), 4) >= eps)
      // batch×batch pairs surface in both orders — canonicalize + dedup
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
  }

  /** One micro-batch of SemDeDup maintenance over the member state
    * (vec_id, v, cluster, rep): new members enter as singletons
    * (rep = self), [[incrementPairs]] finds every pair the batch
    * completes, and [[Dedup.mergeComponents]] folds them in (its
    * output satisfies its own input precondition, so the fold is
    * associative — the s20 law: any slicing lands on the same final
    * state, equal to the batch operator's one-shot clustering).
    * `batchAssigned` carries (vec_id, v, cluster). */
  def foldStep(state: DataFrame, batchAssigned: DataFrame,
      bits: Int, dim: Int, eps: Double): DataFrame = {
    val a = batchAssigned.select(col("vec_id"), col("v"), col("cluster"),
      col("vec_id").as("rep"))
    val all = state.select(col("vec_id"), col("v"), col("cluster"), col("rep"))
      .unionByName(a)
    val pairs = incrementPairs(a, all, bits, dim, eps)
    // Relabel the payload-bearing member state IN PLACE with the
    // increment-sized rep→rep map ([[Dedup.contractedMerge]] — the
    // exact machinery mergeComponents applies to a bare (id, rep)
    // table): every endpoint of `pairs` is a member of `all`, so
    // mergeComponents' "fresh" leg is empty here and its output row
    // for id is precisely coalesce(repMap[rep], rep). Applying that
    // map directly keeps (v, cluster) in place — the round-13 version
    // re-attached them with a corpus-sized state ⨝ merged-components
    // equi-join EVERY micro-batch, the one full-state shuffle in the
    // whole fold; now the state is only ever the streamed side of
    // broadcast joins, exactly the mergeComponents discipline.
    val cm = Dedup.contractedMerge(
      all.select(col("vec_id").as("id"), col("rep")), pairs)
    all.join(broadcast(cm.repMap), Seq("rep"), "left")
      .select(col("vec_id"), col("v"), col("cluster"),
        coalesce(col("new_rep"), col("rep")).as("rep"))
  }
}
