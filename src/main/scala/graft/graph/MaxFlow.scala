package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edmonds-Karp max-flow (reference `flow/EdmondsKarp.hpp:23`).
  *
  * The algorithm is inherently sequential (BFS augmenting paths over a
  * mutable residual graph — the reference is single-threaded too), so
  * the adjacency is grouped to arrays distributedly and collected once
  * (driver bound O(n + m), same discipline as [[Betweenness]]); the
  * returned artifacts are DataFrames:
  *   - the max-flow value,
  *   - the min-cut source side (the optimality certificate: cut
  *     capacity == flow value, checkable distributedly).
  */
object MaxFlow {

  /** `(flow_value, cut : Set[Long])` for s→t on the weighted graph
    * (undirected edges become two directed arcs of equal capacity). */
  def edmondsKarp(g: PropertyGraph, s: Long, t: Long): (Double, Set[Long]) = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val arcs = g.adjacency.select(col("src"), col("dst"), col("weight"))
      .groupBy("src", "dst").agg(sum("weight").as("cap"))
      .as[(Long, Long, Double)].collect()

    val cap = scala.collection.mutable.HashMap[(Long, Long), Double]()
    val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    def link(u: Long, v: Long): Unit =
      adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer()) += v
    arcs.foreach { case (u, v, c) =>
      if (u != v) {
        cap((u, v)) = cap.getOrElse((u, v), 0.0) + c
        if (!cap.contains((v, u))) { cap((v, u)) = 0.0; link(v, u) }
        link(u, v)
      }
    }
    adj.values.foreach(b => { val d = b.distinct.sorted; b.clear(); b ++= d })

    var flow = 0.0
    var augmenting = true
    while (augmenting) {
      // BFS for the shortest residual path
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      val q = scala.collection.mutable.Queue[Long](s)
      parent(s) = s
      while (q.nonEmpty && !parent.contains(t)) {
        val u = q.dequeue()
        for (v <- adj.getOrElse(u, Nil) if !parent.contains(v) && cap((u, v)) > 1e-12) {
          parent(v) = u
          q.enqueue(v)
        }
      }
      if (!parent.contains(t)) augmenting = false
      else {
        var bottleneck = Double.MaxValue
        var v = t
        while (v != s) { val u = parent(v); bottleneck = math.min(bottleneck, cap((u, v))); v = u }
        v = t
        while (v != s) {
          val u = parent(v)
          cap((u, v)) -= bottleneck
          cap((v, u)) += bottleneck
          v = u
        }
        flow += bottleneck
      }
    }
    // min cut = residual-reachable set from s
    val cut = scala.collection.mutable.Set[Long](s)
    val q2 = scala.collection.mutable.Queue[Long](s)
    while (q2.nonEmpty) {
      val u = q2.dequeue()
      for (v <- adj.getOrElse(u, Nil) if !cut.contains(v) && cap((u, v)) > 1e-12) {
        cut += v; q2.enqueue(v)
      }
    }
    (flow, cut.toSet)
  }

  /** Cut clustering (reference `community/CutClustering.hpp:13`, Flake
    * et al.): augment the graph with an artificial sink t connected to
    * every node with weight α, then each unassigned node's community is
    * the source side of its min v-t cut. α = 0 → one cluster;
    * α ≥ max edge weight → singletons. Driver-bounded like
    * [[edmondsKarp]] (the reference implementation is sequential
    * Edmonds-Karp too); one max-flow per discovered community, not per
    * node. Returns `(id, community)`. */
  def cutClustering(g: PropertyGraph, alpha: Double): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val arcs = g.adjacency.select(col("src"), col("dst"), col("weight"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(sum("weight").as("cap"))
      .as[(Long, Long, Double)].collect()
    val nodes = g.vertices.select("id").as[Long].collect().sorted
    val sink = nodes.max + 1

    // local EK on the augmented adjacency
    val cap = scala.collection.mutable.HashMap[(Long, Long), Double]()
    val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    def link(u: Long, v: Long): Unit =
      adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer()) += v
    def addArc(u: Long, v: Long, c: Double): Unit = {
      if (!cap.contains((u, v))) { cap((u, v)) = 0.0; link(u, v) }
      if (!cap.contains((v, u))) { cap((v, u)) = 0.0; link(v, u) }
      cap((u, v)) += c
    }
    arcs.foreach { case (u, v, c) => addArc(u, v, c) }
    nodes.foreach { v => addArc(v, sink, alpha); addArc(sink, v, alpha) }
    adj.values.foreach(b => { val d = b.distinct.sorted; b.clear(); b ++= d })
    val baseCap = cap.toMap // pristine capacities per community run

    val community = scala.collection.mutable.HashMap[Long, Long]()
    for (s <- nodes if !community.contains(s)) {
      // fresh residual capacities
      cap.clear(); baseCap.foreach { case (k, c) => cap(k) = c }
      var augmenting = true
      while (augmenting) {
        val parent = scala.collection.mutable.HashMap[Long, Long](s -> s)
        val q = scala.collection.mutable.Queue[Long](s)
        while (q.nonEmpty && !parent.contains(sink)) {
          val u = q.dequeue()
          for (v <- adj.getOrElse(u, Nil) if !parent.contains(v) && cap((u, v)) > 1e-12) {
            parent(v) = u; q.enqueue(v)
          }
        }
        if (!parent.contains(sink)) augmenting = false
        else {
          var bottleneck = Double.MaxValue
          var v = sink
          while (v != s) { val u = parent(v); bottleneck = math.min(bottleneck, cap((u, v))); v = u }
          v = sink
          while (v != s) {
            val u = parent(v); cap((u, v)) -= bottleneck; cap((v, u)) += bottleneck; v = u
          }
        }
      }
      // source side of the min cut = s's community
      val side = scala.collection.mutable.Set[Long](s)
      val q2 = scala.collection.mutable.Queue[Long](s)
      while (q2.nonEmpty) {
        val u = q2.dequeue()
        for (v <- adj.getOrElse(u, Nil)
             if v != sink && !side.contains(v) && cap((u, v)) > 1e-12) {
          side += v; q2.enqueue(v)
        }
      }
      side.foreach(v => if (!community.contains(v)) community(v) = s)
    }
    community.toSeq.toDF("id", "community")
  }

  /** Max-flow with its optimality certificate verified distributedly:
    * `(s, t, flow_value, cut_size, certificate_ok)` where
    * certificate_ok = 1 iff the capacity of the returned cut equals the
    * flow value (weak duality makes this a proof of optimality). */
  def maxFlowCertified(g: PropertyGraph, s: Long, t: Long): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val (flow, cut) = edmondsKarp(g, s, t)
    val cutDf = cut.toSeq.toDF("id")
    val cutCap = g.adjacency.select(col("src"), col("dst"), col("weight"))
      .join(cutDf.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(cutDf.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .agg(coalesce(sum("weight"), lit(0.0))).head.getDouble(0)
    val ok = if (math.abs(cutCap - flow) < 1e-6) 1L else 0L
    Seq((s, t, math.rint(flow * 100) / 100, cut.size.toLong, ok))
      .toDF("s", "t", "flow_value", "cut_size", "certificate_ok")
  }
}
