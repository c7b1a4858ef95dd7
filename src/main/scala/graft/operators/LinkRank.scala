package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative LINK ANALYSIS (PageRank with dangling-mass handling) —
  * the crawl-prioritization stage: which pages/domains are worth
  * fetching and keeping is decided by link centrality (CommonCrawl
  * publishes exactly such rankings), and the engine's graph surface so
  * far (connected components, t21/t40/t41) only answers reachability,
  * not importance.
  *
  * The classic synchronous iteration, each round a bounded Spark job
  * (the v19 k-means / t42 BPE rounds shape):
  *
  *   rank'(v) = (1−d)/N + d · ( in(v) + dangling/N )
  *
  * where in(v) sums rank(u)/outdeg(u) over edges u→v and `dangling` is
  * the rank mass parked on nodes with no out-edges (redistributed
  * uniformly — dropping it would leak mass and ranks would no longer
  * sum to 1).
  *
  * Bit-portability (the t53/t62 discipline, applied to a graph
  * iteration): each edge's contribution and each dangling node's mass
  * QUANTIZE to 1e-9 INTEGERS before summation — the cross-edge sums
  * are exact integer arithmetic, order-independent under any
  * partitioning — and every scalar expression keeps one shared shape
  * (mirrored verbatim by [[oracleSql]]'s per-round CTEs), so ranks are
  * bit-identical functions of the graph in both engines, round by
  * round. No convergence-threshold nondeterminism: fixed rounds.
  *
  * Scale shape, per round: ONE join of the rank table against the
  * (pre-outdegreed) edge table shuffled by src, one partial+final sum
  * by dst, and a 1-row dangling aggregate that rides a broadcast —
  * nothing but (id, rank) pairs ever moves, and the edge table's
  * partitioning is reusable across all rounds. Per-round state is
  * eagerly localCheckpoint'ed (the connectedComponents lineage cut).
  */
object LinkRank {

  /** Quantization grid: contributions round to 1e-9 (ranks are ≤ 1, so
    * a billion-node graph's smallest meaningful mass still lands on
    * the grid). */
  private val Q = 1.0e9

  /** `rounds` synchronous PageRank iterations over `edges` (src, dst)
    * across the node universe `nodes` (id) — nodes absent from the
    * edge list still rank (they hold and receive the uniform terms).
    * Returns (id, rank) with rank on the 1e-9 grid. */
  def pagerank(nodes: DataFrame, edges: DataFrame, d: Double = 0.85,
      rounds: Int = 8): DataFrame =
    run(nodes, edges, d, rounds, init = None)

  /** CONTINUE from a stored rank table (the incremental path: a crawl
    * delta adds edges; re-ranking from scratch re-pays every round
    * over the full graph, while the iteration is memoryless beyond its
    * rank vector — so K continuation rounds from the PUBLISHED table
    * converge against the new graph at K-round cost). `stored` is
    * (id, rank) exactly as [[pagerank]] emitted it (1e-9 grid — the
    * grid IS the phase boundary contract, so a replay from the stored
    * artifact is bit-identical to the run that wrote it). */
  def continueFrom(nodes: DataFrame, edges: DataFrame, stored: DataFrame,
      d: Double = 0.85, rounds: Int = 4): DataFrame =
    run(nodes, edges, d, rounds,
      init = Some(stored.select(col("id"), col("rank").as("r"))))

  private def run(nodes: DataFrame, edges: DataFrame, d: Double,
      rounds: Int, init: Option[DataFrame]): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val n = nodes.select(col("id")).distinct().localCheckpoint(true)
    val nN = n.count()
    require(nN > 0, "pagerank: empty node set")
    // out-degrees once; edges ride with their src's outdeg for the
    // whole run
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src").localCheckpoint(true)
    // Danglingness is a property of the GRAPH, not the round: flag it
    // once on the node table and let the flag ride the rank vector, so
    // each round's dangling mass is a bare filter+sum SCAN of the rank
    // table instead of the round-13 `ranks LEFT ANTI JOIN srcs` — one
    // whole join (two exchanges) per round, off the hot loop. The
    // summed row set is identical: ranks covers exactly the node
    // universe every round, and dang=true ⟺ id ∉ deg's src set.
    val nFlag = n
      .join(deg.select(col("src").as("id"), lit(false).as("dang")), Seq("id"), "left")
      .select(col("id"), coalesce(col("dang"), lit(true)).as("dang"))
      .localCheckpoint(true)
    // shared scalar shapes (mirrored by the oracle): base = (1−d)/N
    val base = (lit(1.0) - lit(d)) / lit(nN.toDouble)
    var ranks = init
      .map(_.join(nFlag, Seq("id")).select(col("id"), col("r"), col("dang")))
      .getOrElse(nFlag.select(col("id"), (lit(1.0) / lit(nN.toDouble)).as("r"),
        col("dang")))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val contrib = ranks.join(e, ranks("id") === e("src"))
        .select(col("dst"),
          floor((col("r") / col("outdeg")) * lit(Q) + lit(0.5)).cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inq"))
      val dang = ranks.filter(col("dang"))
        .agg(coalesce(sum(floor(col("r") * lit(Q) + lit(0.5)).cast("long")), lit(0L))
          .as("dq"))
      ranks = nFlag
        .join(contrib, nFlag("id") === contrib("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(nFlag("id"),
          (base + lit(d) *
            ((coalesce(col("inq"), lit(0L)).cast("double") / lit(Q)) +
              (col("dq").cast("double") / (lit(Q) * lit(nN.toDouble))))).as("r"),
          nFlag("dang"))
        .localCheckpoint(true)
    }
    ranks.select(col("id"),
      (floor(col("r") * lit(Q) + lit(0.5)).cast("long") / lit(Q)).as("rank"))
  }

  /** DuckDB twin: the full iteration as one static SQL — `nodesSql`
    * and `edgesSql` are subqueries yielding (id) and (src, dst); each
    * round is two MATERIALIZED CTEs (quantized in-mass by dst, the
    * 1-row dangling aggregate) plus the rank map, every expression
    * shape mirroring [[pagerank]] verbatim. */
  def oracleSql(nodesSql: String, edgesSql: String, d: Double = 0.85,
      rounds: Int = 8): String =
    oracleSqlPhased(nodesSql, Seq(edgesSql -> rounds), d)

  /** The PHASED twin ([[continueFrom]]'s replay): one edge set + round
    * count per phase, ranks chained across phases THROUGH the 1e-9
    * grid (the stored-artifact boundary — exactly what a continuation
    * run reads back). Emits a CTE chain ending in `prf(id, rank)`. */
  def oracleSqlPhased(nodesSql: String, phases: Seq[(String, Int)],
      d: Double = 0.85): String = {
    require(phases.nonEmpty)
    def fmt(x: Double): String =
      if (x == math.floor(x) && math.abs(x) < 1e15) s"${x.toLong}.0" else x.toString
    val qS = fmt(Q)
    val dS = fmt(d)
    val ctes = Seq.newBuilder[String]
    ctes += s"prn AS MATERIALIZED (SELECT DISTINCT id FROM ($nodesSql))"
    ctes += s"prnn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nn FROM prn)"
    ctes += "prr0 AS MATERIALIZED (SELECT id, (1.0 / nn) AS r FROM prn, prnn)"
    var cur = "prr0"
    var r = 0
    for (((edgesSql, rounds), p) <- phases.zipWithIndex) {
      ctes += s"pre${p}0 AS MATERIALIZED (SELECT src, dst FROM ($edgesSql))"
      ctes += s"prdeg$p AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM pre${p}0 GROUP BY src)"
      ctes += s"pre$p AS MATERIALIZED (SELECT e.src, e.dst, g.outdeg FROM pre${p}0 e JOIN prdeg$p g USING (src))"
      if (p > 0) {
        // phase boundary: the continuation reads the PUBLISHED grid
        // table, so the replay must floor here too
        ctes += s"prg$p AS MATERIALIZED (SELECT id, " +
          s"CAST(floor(r * $qS + 0.5) AS BIGINT) / $qS AS r FROM $cur)"
        cur = s"prg$p"
      }
      for (_ <- 1 to rounds) {
        r += 1
        ctes += s"prc$r AS MATERIALIZED (SELECT dst, sum(CAST(floor((r / outdeg) * $qS + 0.5) AS BIGINT)) AS inq " +
          s"FROM $cur JOIN pre$p ON id = src GROUP BY dst)"
        ctes += s"prd$r AS MATERIALIZED (SELECT coalesce(sum(CAST(floor(r * $qS + 0.5) AS BIGINT)), 0) AS dq " +
          s"FROM $cur WHERE id NOT IN (SELECT src FROM prdeg$p))"
        ctes += s"prr$r AS MATERIALIZED (SELECT n.id, " +
          s"((1.0 - $dS) / nn) + $dS * ((CAST(coalesce(c.inq, 0) AS DOUBLE) / $qS) + " +
          s"(CAST(d.dq AS DOUBLE) / ($qS * nn))) AS r " +
          s"FROM prn n LEFT JOIN prc$r c ON n.id = c.dst, prd$r d, prnn)"
        cur = s"prr$r"
      }
    }
    s"""${ctes.result().mkString(",\n")},
       |prf AS (SELECT id, CAST(floor(r * $qS + 0.5) AS BIGINT) / $qS AS rank FROM $cur)""".stripMargin
  }
}
