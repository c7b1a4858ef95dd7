package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by LABEL PROPAGATION (Raghavan et al. 2007,
  * synchronous deterministic variant) — the third graph operator next
  * to connected components (t21: reachability) and PageRank (t66:
  * importance). Communities answer a different crawl question: which
  * pages form densely-linked clusters (site sections, mirror farms,
  * topic hubs) — the unit a training-data pipeline samples or caps BY,
  * where components are too coarse (the web is one component) and
  * rank is per-page.
  *
  * Algorithm, made deterministic (the published algorithm breaks ties
  * randomly and updates asynchronously — neither replays in SQL):
  * labels start as node ids; each synchronous round every node adopts
  * the MODE of its neighbors' labels plus its own self-vote, ties
  * broken by the SMALLEST label. Parallel edges vote with their
  * multiplicity (a multigraph edge is a stronger tie). A fixed round
  * count R, not convergence detection — everything is exact integer
  * arithmetic, so the oracle replays the whole iteration and the
  * result is bit-identical under any partitioning.
  *
  * Scale shape, per round: ONE labels⋈edges shuffle join (both sides
  * keyed — the Pregel message exchange), a partial+final (node, label)
  * count, and a partial+final per-node arg-max (`max_by` over the
  * (count, −label) struct — no window, no global sort). State is one
  * (id, lbl) row per node, localCheckpoint'd between rounds (the
  * star-contraction memory model; at cluster scale: persist or write
  * per round). Nothing node- or edge-proportional crosses the driver.
  */
object Communities {

  /** `nodes(id)`, `edges(src, dst)` — treated as UNDIRECTED (votes
    * flow both ways); isolated nodes keep their own label via the
    * self-vote. Returns (id, lbl) after `rounds` synchronous rounds. */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("v"), col("lbl"))
        .unionByName(labels.select(col("id").as("v"), col("lbl")))
      labels = votes
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("v")).agg(expr("max_by(lbl, struct(c, -lbl))").as("lbl"))
        .withColumnRenamed("v", "id")
        .localCheckpoint()
    }
    labels
  }

  /** DuckDB replay of the ENTIRE iteration: `rounds` chained CTE
    * triples (votes → counts+argmax), ties by ORDER BY c DESC, lbl.
    * The final labels CTE is named `lp$rounds`. */
  def oracleSql(nodesSql: String, edgesSql: String, rounds: Int): String = {
    val base =
      s"""lpe AS MATERIALIZED (
         |  SELECT src, dst FROM ($edgesSql)
         |  UNION ALL SELECT dst AS src, src AS dst FROM ($edgesSql)),
         |lp0 AS MATERIALIZED (SELECT id, id AS lbl FROM ($nodesSql))""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""lpv$r AS (
         |  SELECT e.dst AS v, l.lbl FROM lpe e JOIN lp${r - 1} l ON l.id = e.src
         |  UNION ALL SELECT id AS v, lbl FROM lp${r - 1}),
         |lp$r AS MATERIALIZED (
         |  SELECT v AS id, lbl FROM (
         |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
         |    FROM (SELECT v, lbl, count(*) AS c FROM lpv$r GROUP BY 1, 2))
         |  WHERE rn = 1)""".stripMargin
    }
    (base +: rs).mkString(",\n")
  }
}
