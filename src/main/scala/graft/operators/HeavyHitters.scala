package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.CountMinSketch

import graft.expressions.SketchOps

/** Heavy-hitter frequency estimation over an unbounded, skewed key
  * domain (tokens, URLs, user agents) via a count-min sketch.
  *
  * Why not just groupBy().count()? At 100 TB the token domain is
  * billions of keys — an exact global count is a full shuffle of every
  * occurrence and a result nobody can hold; the questions actually
  * asked ("how frequent are THESE keys", "is anything above X%") need
  * only point estimates. The CMS answers them from a fixed ~MB state:
  *
  *   - build: `stat.countMinSketch` is a distributed treeAggregate —
  *     each partition fills a local depth×width counter array, merges
  *     are elementwise adds, and only the final sketch (d·w·8 bytes,
  *     independent of N and of the key cardinality) reaches the driver;
  *   - probe: [[graft.expressions.CmsEstimate]] carries the sketch as
  *     a plan constant, so any candidate DataFrame gets estimates in a
  *     narrow codegen'd pass — no join against a count table, no
  *     shuffle.
  *
  * Guarantee (the t33 oracle's in-band flag): est >= true count always
  * (collisions only ADD); est <= true + eps·N with prob 1-delta, where
  * N = total occurrences. Both sides are checked against exact counts
  * for the exact top-k, which IS feasible at test scale.
  */
object HeavyHitters {

  /** Distributed CMS build over string column `key`. eps bounds the
    * overcount (eps·N), delta its failure probability; width =
    * ceil(2/eps), depth = ceil(log2(1/delta)) counters (Spark sizes
    * depth base-2: delta=0.001 -> depth 10, not ln's 7). Fixed seed ⇒
    * deterministic estimates for a given dataset. (Spark's API takes
    * CONFIDENCE = 1-delta; passing delta raw would collapse the sketch
    * to depth 1.) */
  def sketch(df: DataFrame, key: String, eps: Double = 1e-4,
      delta: Double = 0.001, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(key, eps, 1.0 - delta, seed)

  /** Attach estimated counts to a candidate set — a narrow plan-constant
    * probe, usable on any DataFrame with a string key column. */
  def withEstimates(candidates: DataFrame, key: Column,
      cms: CountMinSketch, as: String = "cms_est"): DataFrame =
    candidates.withColumn(as, SketchOps.cmsEstimate(key, cms))
}
