package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation — the authority tier
  * above [[UrlOps]]' per-page gates: a crawl's link structure decides
  * which domains/pages are load-bearing (keep, crawl deeper) versus
  * parasitic (link farms the per-page gates can miss).
  *
  * House arithmetic rules apply: ranks are INTEGER micro-units end to
  * end — per-edge contributions are integer divisions and per-node
  * sums are order-free integer additions — so results are bit-identical
  * under any partitioning/aggregation order and replay exactly in an
  * external engine (the q132 oracle unrolls the iterations as CTE
  * stages). Floating-point PageRank would hash-diverge on the driver
  * gate the first time Spark reorders an addition.
  */
object Graphs {

  /** Fixed-iteration PageRank over an edge list: `(id, rank_micro)`
    * for every node appearing as a source or destination. Classic
    * update with damping `d` (per-mille):
    * `r'(v) = (1000-d)·1e6/1000 + d·Σ_{u→v} (r(u) div outdeg(u)) / 1000`
    * — every term an integer; flooring losses are deterministic.
    * Dangling-node mass is NOT redistributed (the simplified form —
    * documented, deterministic; real crawl graphs route it to a
    * teleport sink the same way).
    *
    * Shape for scale: out-degrees join the edge list ONCE (the
    * iteration-invariant relation, materialized); each iteration is a
    * rank-keyed equi-join plus one hash aggregation keyed by `dst` —
    * both shuffles on graph keys, nothing driver-side, no broadcast of
    * anything graph-sized. Per-iteration materialization truncates the
    * lineage exactly like [[Dedup.connectedComponents]]'s rounds;
    * `checkpointDir` upgrades it to a RELIABLE checkpoint for real
    * clusters.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPerMille: Int = 850,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && iters <= 100,
      s"iters must be in [1, 100], got $iters")
    require(dampingPerMille >= 0 && dampingPerMille <= 1000,
      s"dampingPerMille must be in [0, 1000], got $dampingPerMille")
    checkpointDir.foreach(
      Checkpoints.bindDir(edges.sparkSession.sparkContext, _))
    def mat(d: DataFrame): DataFrame =
      if (checkpointDir.isDefined) d.checkpoint() else d.localCheckpoint()
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = mat(e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct())
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("_od"))
    val e2 = mat(e.join(outDeg, Seq("src")))
    val base = (1000L - dampingPerMille) * 1000000L / 1000L
    var rank = nodes.withColumn("_r", lit(1000000L))
    var i = 0
    while (i < iters) {
      val sums = e2.join(rank, e2("src") === rank("id"))
        .select(col("dst"), expr("_r div _od").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_s"))
      rank = mat(nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select(col("id"),
          (lit(base) + expr(s"coalesce(_s, 0) * $dampingPerMille div 1000"))
            .as("_r")))
      i += 1
    }
    rank.select(col("id"), col("_r").as("rank_micro"))
  }

  /** In/out degree audit of an edge list: `(id, out_degree,
    * in_degree)` for every node — the cheap link-farm signal (huge
    * out-degree, tiny in-degree) and the crawl-frontier size estimate.
    * Two keyed aggregations, one outer merge.
    */
  def degreeStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val outD = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))
    val inD = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    outD.join(inD, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
