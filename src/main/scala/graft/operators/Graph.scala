package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Materialize.MatOps

/** Iterative graph analytics over edge-list DataFrames.
  *
  * PageRank here complements [[Dedup.dupClusters]] (connected components):
  * components answer "which documents are the same", PageRank answers
  * "which nodes are central" — the standard curation signal for seed-site
  * quality weighting and co-occurrence importance (the reference's star
  * schema has no graph operator, so this is extension surface like the
  * dedup family; cf. 34_ETL_Gold_Fact_PySpark.py:61-77 for the closest
  * join-shaped analog).
  *
  * All arithmetic is BIGINT micro-units (rank scaled by 1e6, damping as a
  * 17/20 rational, integral `div`) — sums of longs are exact and
  * order-independent, so the result is bit-identical across engines and
  * partitionings; the DuckDB oracle replays it verbatim. This is the same
  * determinism device the BM25 and IVF operators use.
  *
  * Scale shape: each iteration is ONE shuffle (the contribution aggregation
  * on `dst`); the edge list and out-degrees materialize once up front and
  * are reused by every round. No driver-side collection, no per-iteration
  * action — the fixed-depth loop builds a single plan executed by the final
  * consumer, so Catalyst sees (and AQE re-plans) the whole chain.
  */
object Graph {

  /** Fixed-iteration PageRank in micro-units.
    *
    * rank_0 = `scale` for every node; each round
    * `rank' = base + (dampNum * Σ_in (rank div outdeg)) div dampDen` with
    * `base = scale - (dampNum * scale) div dampDen` (the teleport mass for
    * damping dampNum/dampDen). Nodes without in-edges keep the teleport
    * term via the left join. Dangling nodes (no out-edges) leak mass — the
    * standard "leaky" variant; deterministic either way.
    *
    * @param edges directed edge list; symmetrize before calling for an
    *              undirected graph
    * @return (id, pr) — pr in micro-units (BIGINT)
    */
  def pageRank(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
      iterations: Int = 3, scale: Long = 1000000L,
      dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    // distinct edges once; everything downstream reuses the materialized
    // blocks instead of re-running the (possibly expensive) edge derivation
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().materialized
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val eo = e.join(outdeg, "src").materialized // (src, dst, outdeg)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().materialized
    val base = scale - (dampNum * scale) / dampDen
    var ranks = nodes.select(col("id"), lit(scale).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = eo.join(ranks, eo("src") === ranks("id"))
        .select(eo("dst").as("dst"), expr("pr div outdeg").as("c"))
      val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(inSum, nodes("id") === inSum("dst"), "left_outer")
        .select(nodes("id"),
          expr(s"${base}L + (${dampNum}L * coalesce(s, 0L)) div ${dampDen}L").as("pr"))
    }
    ranks
  }
}
