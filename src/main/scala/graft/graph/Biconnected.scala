package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Biconnected components, articulation points and bridges (reference
  * `components/BiconnectedComponents.hpp:26` — Hopcroft–Tarjan DFS,
  * inherently sequential there too; the reference runs it single-threaded
  * over CSR).
  *
  * Spark framing: DFS low-link has no distributed formulation (a BFS tree
  * does not satisfy the low-link invariants), so the decomposition runs
  * driver-side on the collected *deduplicated* edge list — size-bounded
  * like [[MaxFlow.edmondsKarp]], O(n+m) memory, documented for graphs
  * whose edge list fits the driver (the reference has the identical
  * bound: its graph lives in one address space).
  *
  * What IS distributed is the certificate: claimed bridges are verified
  * at scale by one distributed CC on G minus the bridges —
  * cc(G∖B) − cc(G) = |B| holds iff every claimed edge is a real bridge
  * (a non-bridge lies on a cycle, so removing it never splits a
  * component; bridges are never on cycles, so their removals are
  * independent and each splits exactly one).
  */
object Biconnected {

  /** Per-edge biconnected-component label `(src, dst, bicc)` plus the
    * node tables: articulation points and bridges. Returned as
    * (edgeLabels, articulationPoints, bridges). */
  def run(g: PropertyGraph): (DataFrame, DataFrame, DataFrame) = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val es = g.edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .as[(Long, Long)].collect()

    val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    es.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.ArrayBuffer()) += u
    }
    val nodes = adj.keys.toArray.sorted

    val depth = scala.collection.mutable.HashMap[Long, Int]()
    val low = scala.collection.mutable.HashMap[Long, Int]()
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    val artic = scala.collection.mutable.HashSet[Long]()
    val bridges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val edgeStack = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val biccOf = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var biccId = 0L

    // iterative Hopcroft–Tarjan: frame = (node, iterator index into adj)
    for (root <- nodes if !depth.contains(root)) {
      var rootChildren = 0
      val stack = scala.collection.mutable.ArrayBuffer[(Long, Int)]((root, 0))
      depth(root) = 0; low(root) = 0
      while (stack.nonEmpty) {
        val (u, idx) = stack.last
        val nbrs = adj(u)
        if (idx < nbrs.length) {
          stack(stack.length - 1) = (u, idx + 1)
          val w = nbrs(idx)
          if (!depth.contains(w)) {
            parent(w) = u
            depth(w) = depth(u) + 1; low(w) = depth(w)
            edgeStack += ((u, w))
            if (u == root) rootChildren += 1
            stack += ((w, 0))
          } else if (parent.get(u) != Some(w) && depth(w) < depth(u)) {
            edgeStack += ((u, w)) // back edge
            if (depth(w) < low(u)) low(u) = depth(w)
          }
        } else {
          stack.remove(stack.length - 1)
          parent.get(u).foreach { p =>
            if (low(u) < low(p)) low(p) = low(u)
            if (low(u) >= depth(p) && p != root) artic += p
            if (low(u) > depth(p))
              bridges += ((math.min(p, u), math.max(p, u)))
            if (low(u) >= depth(p)) {
              // pop the component whose top is the tree edge (p, u)
              var done = false
              while (!done && edgeStack.nonEmpty) {
                val (a, b) = edgeStack.last
                edgeStack.remove(edgeStack.length - 1)
                biccOf += ((math.min(a, b), math.max(a, b), biccId))
                done = (a == p && b == u)
              }
              biccId += 1
            }
          }
        }
      }
      if (rootChildren >= 2) artic += root
    }

    val edgeLabels = biccOf.toSeq.toDF("src", "dst", "bicc")
    val articDf = artic.toSeq.sorted.toDF("id")
    val bridgeDf = bridges.toSeq.sorted.toDF("src", "dst")
    (edgeLabels, articDf, bridgeDf)
  }

  /** Distributed bridge certificate: one row
    * `(n_bridges_ok, split_ok, separated_ok)` of 0/1 flags —
    * `n_bridges_ok`: cc(G∖B) − cc(G) = |B|; `separated_ok`: every claimed
    * bridge's endpoints land in different components of G∖B. Both 1 ⇒
    * every claimed bridge is a real bridge of G. */
  def bridgeCertificate(g: PropertyGraph, bridges: DataFrame): DataFrame = {
    val canon = g.edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("weight"))
      .filter(col("src") =!= col("dst")).distinct()
    val b = bridges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
    val nBridges = b.count()
    val remaining = canon.join(b, Seq("src", "dst"), "left_anti")
    // isolated endpoints must stay as vertices of G∖B
    val verts = g.vertices.select("id")
    val cc0 = ConnectedComponents.run(g).select("component").distinct().count()
    val comp = ConnectedComponents.run(
        PropertyGraph(remaining, directed = false, Some(verts)))
      .localCheckpoint(true)
    val cc1 = comp.select("component").distinct().count()
    val separated = b
      .join(comp.withColumnRenamed("id", "src").withColumnRenamed("component", "cs"), "src")
      .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("component", "cd"), "dst")
      .filter(col("cs") === col("cd")).count()
    val spark = g.edges.sparkSession
    import spark.implicits._
    Seq((
      if (cc1 - cc0 == nBridges) 1L else 0L,
      if (separated == 0L) 1L else 0L
    )).toDF("n_bridges_ok", "separated_ok")
  }
}
