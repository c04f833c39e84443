package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic (incremental) algorithms over an all-pairs BFS state
  * (reference `distance/DynAPSP.hpp:22`,
  * `centrality/DynBetweennessOneNode.hpp:31`): the state is the keyed
  * `(source, id, dist[, sigma])` table the static kernels already
  * produce, and an edge-insertion batch updates only the AFFECTED
  * sources — the sources for which the new edge can lie on a shortest
  * path — while every other source's rows are carried over untouched.
  * That affected-region bound, not a per-update recompute, is what the
  * Dyn* family buys at scale.
  */
object DynAlgorithms {

  /** Initial APSP state: distances from every node (or the given
    * sources) — `(source, id, dist)`. */
  def apspInit(g: PropertyGraph, sources: DataFrame): DataFrame =
    ShortestPaths.bfs(g, sources)

  /** DynAPSP edge insertion (reference `distance/DynAPSP.hpp:22`):
    * distances only change for sources s with |d(s,u) − d(s,v)| ≥ 2 for
    * some inserted edge (u,v) (or an endpoint newly reached); those
    * sources' regions are relaxed via the affected-frontier update, the
    * rest of the state is reused as-is. `g2` is the post-insertion
    * graph. Result equals a from-scratch APSP on `g2`. */
  def apspInsert(g2: PropertyGraph, state: DataFrame, newEdges: DataFrame): DataFrame = {
    val ins = newEdges.select(col("src").as("u"), col("dst").as("v"))
    val insSym = ins.unionAll(ins.select(col("v").as("u"), col("u").as("v")))
    val du = state.select(col("source"), col("id").as("u"), col("dist").as("dU"))
    val dv = state.select(col("source"), col("id").as("v"), col("dist").as("dV"))
    val affected = insSym
      .join(du, Seq("u"), "inner").join(dv, Seq("source", "v"), "left")
      .filter(col("dV").isNull || abs(col("dU") - col("dV")) >= 2)
      .select("source").distinct().localCheckpoint(true)
    val untouched = state.join(affected, Seq("source"), "left_anti")
    val updated = ShortestPaths.updateBfsInsert(
      g2, state.join(affected, Seq("source"), "left_semi"), newEdges)
    untouched.unionByName(updated)
  }

  /** Betweenness of ONE focus node x from a counted APSP state
    * `(source, id, dist, sigma)` (reference
    * `centrality/DynBetweennessOneNode.hpp:31`, Bergamini et al.):
    * B(x) = Σ_{s≠x≠t} [d(s,x)+d(x,t)=d(s,t)] · σ(s,x)·σ(x,t)/σ(s,t).
    * One join against the x-slice per side + a single aggregate —
    * no driver materialization. Pair (s,t) is counted in both
    * orientations, so the undirected value is halved by the caller if
    * the reference's convention is wanted. */
  def betweennessOneNode(countedState: DataFrame, x: Long): Double = {
    val sx = countedState.filter(col("id") === x && col("source") =!= x)
      .select(col("source").as("s"), col("dist").as("dsx"),
        col("sigma").cast("double").as("ssx"))
    // undirected state is symmetric: (t,x) keyed by source t = d(x,t), σ(x,t)
    val tx = sx.select(col("s").as("t"), col("dsx").as("dxt"), col("ssx").as("sxt"))
    val st = countedState
      .filter(col("source") =!= x && col("id") =!= x && col("source") =!= col("id"))
      .select(col("source").as("s"), col("id").as("t"), col("dist").as("dst_"),
        col("sigma").cast("double").as("sst"))
    val total = st.join(sx, "s").join(tx, "t")
      .filter(col("dsx") + col("dxt") === col("dst_"))
      .agg(coalesce(sum(col("ssx") * col("sxt") / col("sst")), lit(0.0)))
      .head.getDouble(0)
    total / 2.0 // each unordered (s,t) pair appears in both orientations
  }

  /** Group betweenness of a node set S over the given sources (reference
    * `centrality/ApproxGroupBetweenness.hpp:24`): the fraction of s-t
    * shortest paths hitting S, summed over pairs with s,t ∉ S. Computed
    * from TWO counted-BFS states — the full graph and the graph with S's
    * nodes deleted: a pair's avoiding fraction is
    * σ^{G∖S}(s,t)/σ(s,t) when the detour keeps the same length, else 0.
    * Where the reference samples paths, this evaluates the exact DP on a
    * source sample — same estimator family, deterministic. */
  def groupBetweenness(g: PropertyGraph, group: Seq[Long], sources: DataFrame): Double = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val gDf = group.toDF("gid")
    val cut = g.edges
      .join(gDf.withColumnRenamed("gid", "src"), Seq("src"), "left_anti")
      .join(gDf.withColumnRenamed("gid", "dst"), Seq("dst"), "left_anti")
    val gMinus = PropertyGraph(cut, directed = false,
      Some(g.vertices.join(gDf.withColumnRenamed("gid", "id"), Seq("id"), "left_anti")))
    val srcs = sources.join(gDf.withColumnRenamed("gid", "source"), Seq("source"), "left_anti")
      .localCheckpoint(true)
    // Restrict targets to the SAME source set: every surviving unordered
    // (s,t) pair then appears in both orientations, making the /2 below
    // exact and the pair population identical to betweennessOneNode's
    // when both are driven from `sources`.
    val full = Paths.bfsCounted(g, srcs)
      .filter(!col("id").isin(group: _*))
      .join(srcs.select(col("source").as("id")), Seq("id"), "left_semi")
      .select(col("source"), col("id"), col("dist"), col("sigma").cast("double").as("sig"))
    val avoid = Paths.bfsCounted(gMinus, srcs)
      .select(col("source"), col("id"), col("dist").as("dA"),
        col("sigma").cast("double").as("sigA"))
    full.filter(col("source") =!= col("id"))
      .join(avoid, Seq("source", "id"), "left")
      .select(
        (lit(1.0) - when(col("dA") === col("dist"), col("sigA") / col("sig"))
          .otherwise(lit(0.0))).as("frac"))
      .agg(coalesce(sum("frac"), lit(0.0))).head.getDouble(0) / 2.0
  }

  /** Incremental Brandes state (reference `centrality/DynBetweenness.hpp`
    * / `DynApproxBetweenness.hpp:30`): a counted `(source, id, dist,
    * sigma)` state updated for an edge-insertion batch by recomputing
    * ONLY the σ-affected sources — those with |d(s,u) − d(s,v)| ≥ 1 for
    * an inserted (u,v) (equal-level edges lie on no shortest path, so
    * both d and σ are untouched). Result equals a from-scratch counted
    * BFS on the post-insertion graph. */
  def countedInsert(g2: PropertyGraph, state: DataFrame, newEdges: DataFrame): DataFrame = {
    val ins = newEdges.select(col("src").as("u"), col("dst").as("v"))
    val insSym = ins.unionAll(ins.select(col("v").as("u"), col("u").as("v")))
    val du = state.select(col("source"), col("id").as("u"), col("dist").as("dU"))
    val dv = state.select(col("source"), col("id").as("v"), col("dist").as("dV"))
    val affected = insSym
      .join(du, Seq("u"), "inner").join(dv, Seq("source", "v"), "left")
      .filter(col("dV").isNull || abs(col("dU") - col("dV")) >= 1)
      .select("source").distinct().localCheckpoint(true)
    val untouched = state.join(affected, Seq("source"), "left_anti")
    val sources = affected
    val recomputed = Paths.bfsCounted(g2, sources)
    untouched.unionByName(recomputed)
  }
}
