package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.util.sketch.BloomFilter

import graft.expressions.BloomOps

/** Bloom-filter semi-join reduction — prune the 100 TB probe side of a
  * shuffle join BEFORE the shuffle, using a compact membership sketch
  * of the build side's join keys.
  *
  * Why it exists: when the build side is too large to broadcast (so
  * the join must shuffle BOTH sides), a selective build-side predicate
  * — "suppliers in these nations", "docs in this crawl" — normally
  * does nothing for the probe side: every probe row still pays the
  * full shuffle write/read before the join can reject it. The classic
  * fix (Bloom join; Spark's own AQE runtime filter is the same idea)
  * is a two-step:
  *
  *   1. aggregate the build side's keys into a Bloom filter — a
  *      DISTRIBUTED partial+final sketch merge (`stat.bloomFilter`
  *      runs an RDD `treeAggregate`; each partition fills a local
  *      filter, merges are bit-ORs), so no key list ever concentrates
  *      anywhere — only the final ~MB bit array reaches the driver;
  *   2. probe rows test membership via [[graft.expressions.BloomMightContain]]
  *      (a codegen'd plan constant) and drop non-members BEFORE the
  *      Exchange — at 1% fpp and a 5% selective build predicate the
  *      probe shuffle shrinks ~95%.
  *
  * No false negatives ⇒ the subsequent real join returns exactly the
  * un-pruned result (false positives are dropped by the join itself) —
  * the property q40's oracle (the plain join in DuckDB) hash-proves.
  *
  * vs AQE's runtime bloom filter: same math, but explicit — it applies
  * when the build side is an arbitrary pre-computed DataFrame (not
  * just a scan-time filter AQE can see), the fpp/size are caller-
  * controlled, and the filter can be REUSED across many probe queries
  * (build once per increment, prune every downstream join).
  */
object BloomPrune {

  /** Distributed build: a Bloom filter over `dim`'s `key` column
    * (BIGINT). `expectedNumItems` sizes the bit array — overestimate
    * freely (size is linear, ~9.6 bits/key at 1% fpp); an
    * UNDERestimate degrades fpp, never correctness. */
  def keyBloom(dim: DataFrame, key: String, expectedNumItems: Long,
      fpp: Double = 0.01): BloomFilter =
    dim.stat.bloomFilter(key, expectedNumItems, fpp)

  /** Prune `fact` to rows whose `factKey` might be in the filter.
    * NULL keys drop (they cannot match an inner join either). */
  def prune(fact: DataFrame, factKey: Column, bloom: BloomFilter): DataFrame =
    fact.filter(BloomOps.bloomMightContain(factKey, bloom))

  /** [[keyBloom]] over a STRING key column (fingerprints, URLs) —
    * same distributed build (`stat.bloomFilter` adds whatever the
    * column holds); the separate name documents which PROBE expression
    * matches ([[graft.expressions.BloomMightContainString]]). */
  def keyBloomString(dim: DataFrame, key: String, expectedNumItems: Long,
      fpp: Double = 0.01): BloomFilter =
    keyBloom(dim, key, expectedNumItems, fpp)

  /** EXACT anti-join (blocklist subtraction) with a bloom pre-screen —
    * the decontamination/takedown shape when the blocklist is too big
    * to broadcast: rows the filter clears are DEFINITELY clean (no
    * false negatives) and skip the join entirely; only the flagged
    * sliver (true hits + ~fpp of the rest) joins the blocklist for the
    * exact verdict. The result is row-identical to the plain anti-join
    * at any fpp — false positives are exonerated by the join — which
    * is what s10's oracle proves. At 100 TB this turns an
    * every-row-shuffles anti-join into a ~MB broadcast test plus a
    * join over a fraction of the input. */
  def verifiedAntiJoinString(df: DataFrame, key: String,
      blocklist: DataFrame, blockKey: String, bloom: BloomFilter): DataFrame = {
    require(!df.columns.contains("__graft_bl"),
      "verifiedAntiJoinString: __graft_bl is a reserved marker column name")
    val flagged = df.withColumn("__graft_bl",
      BloomOps.bloomMightContainString(df(key), bloom))
    // NULL keys: mightContain is NULL → neither branch would keep the
    // row, but a NULL key cannot match any blocklist entry, so the
    // anti-join KEEPS it — route NULLs through the definitely-clean arm
    val clean = flagged.filter(!coalesce(col("__graft_bl"), lit(false)))
    val suspects = flagged.filter(col("__graft_bl"))
      .join(blocklist.select(col(blockKey)),
        flagged(key) === blocklist(blockKey), "left_anti")
    clean.union(suspects).drop("__graft_bl")
  }

  /** The fused form: build the filter from `dim.key`, prune `fact`,
    * and inner-join the pruned fact to `dim`. The join itself still
    * verifies every survivor, so the result is row-identical to the
    * un-pruned join at any fpp. `dimJoinHint` (e.g. "merge") applies to
    * the dim side of the JOIN only — not to the bloom-build job, where
    * a join hint would be meaningless noise. */
  def bloomJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedNumItems: Long, fpp: Double = 0.01,
      dimJoinHint: Option[String] = None): DataFrame = {
    val bloom = keyBloom(dim, dimKey, expectedNumItems, fpp)
    val joinDim = dimJoinHint.fold(dim)(dim.hint(_))
    prune(fact, fact(factKey), bloom)
      .join(joinDim, fact(factKey) === dim(dimKey))
  }
}
