package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Biconnected components, articulation points and bridges (reference
  * `components/BiconnectedComponents.hpp:26` — Hopcroft–Tarjan DFS,
  * inherently sequential there).
  *
  * The DEFAULT [[run]] is fully distributed, in the Tarjan–Vishkin
  * (1985) spirit: DFS low-links are replaced by the fundamental-cycle
  * structure of an arbitrary (here BFS) spanning forest. Two edges of G
  * are in the same biconnected component iff they are connected under
  * the transitive closure of "lie on a common fundamental cycle", so
  * the decomposition reduces to one distributed connected-components
  * run over an auxiliary graph whose nodes are the edges of G: each
  * non-tree edge links (star-wise) to every tree edge on its
  * fundamental cycle, enumerated by lifting both endpoints to their
  * LCA one level per round — joins and aggregations only, O(BFS depth)
  * rounds, no DFS and no driver-side adjacency. Bridges are the tree
  * edges on no fundamental cycle; articulation points are the vertices
  * incident to ≥ 2 blocks.
  *
  * [[runSequential]] keeps the Hopcroft–Tarjan driver-bounded twin
  * (O(n+m) driver memory, like the reference's single address space)
  * as a cross-check oracle for specs.
  *
  * Also distributed is the certificate: claimed bridges are verified
  * at scale by one distributed CC on G minus the bridges —
  * cc(G∖B) − cc(G) = |B| holds iff every claimed edge is a real bridge
  * (a non-bridge lies on a cycle, so removing it never splits a
  * component; bridges are never on cycles, so their removals are
  * independent and each splits exactly one).
  */
object Biconnected {

  /** Per-edge biconnected-component label `(src, dst, bicc)` plus the
    * node tables: articulation points and bridges, all computed
    * distributed (see object doc). Returned as
    * (edgeLabels, articulationPoints, bridges). */
  def run(g: PropertyGraph, maxIter: Int = 300): (DataFrame, DataFrame, DataFrame) = {
    val spark = g.edges.sparkSession
    // 1. deduplicated canonical edges with stable ids
    val canon = g.edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .withColumn("eid", monotonically_increasing_id())
      .localCheckpoint(true)
    val adj = canon.select("src", "dst")
      .unionAll(canon.select(col("dst").as("src"), col("src").as("dst")))

    // 2. BFS forest: multi-source from each component's min vertex,
    //    deterministic min-parent tie-break; O(diameter) rounds
    val comp = ConnectedComponents.run(g)
    var settled = comp.filter(col("id") === col("component"))
      .select(col("id"), lit(null).cast("long").as("parent"),
        lit(0).as("depth")).localCheckpoint(true)
    var frontier = settled.select("id")
    var nFrontier = frontier.count()
    var d = 0
    while (nFrontier > 0 && d < maxIter) {
      // expand only from the current frontier (settled at depth d),
      // deterministic min-parent per newly reached vertex
      val next = adj.select(col("src").as("parent"), col("dst").as("id"))
        .join(frontier.withColumnRenamed("id", "parent"), Seq("parent"), "left_semi")
        .join(settled.select("id"), Seq("id"), "left_anti")
        .groupBy("id").agg(min("parent").as("parent"))
        .withColumn("depth", lit(d + 1))
      settled = settled.unionAll(next).localCheckpoint(true)
      frontier = settled.filter(col("depth") === d + 1).select("id")
      nFrontier = frontier.count()
      d += 1
    }
    val par = settled.filter(col("parent").isNotNull)
      .select(col("id"), col("parent"), col("depth"))
    // tree edges keyed by their child endpoint
    val treeByChild = canon
      .join(par.select(
          least(col("id"), col("parent")).as("src"),
          greatest(col("id"), col("parent")).as("dst"),
          col("id").as("child")),
        Seq("src", "dst"), "inner")
      .select(col("eid").as("teid"), col("child"))
      .localCheckpoint(true)
    val treeEids = treeByChild.select(col("teid").as("eid"))
    val nonTree = canon.join(treeEids, Seq("eid"), "left_anti")

    // 3. fundamental-cycle covers: lift the deeper endpoint one level
    //    per round, emitting (non-tree eid, lifted child vertex); the
    //    lifted child names the tree edge (child, parent(child))
    val depths = settled.select(col("id"), col("depth"))
    var active = nonTree
      .join(depths.select(col("id").as("src"), col("depth").as("dsrc")), "src")
      .join(depths.select(col("id").as("dst"), col("depth").as("ddst")), "dst")
      .select(col("eid"),
        when(col("dsrc") >= col("ddst"), col("src")).otherwise(col("dst")).as("u"),
        when(col("dsrc") >= col("ddst"), col("dsrc")).otherwise(col("ddst")).as("du"),
        when(col("dsrc") >= col("ddst"), col("dst")).otherwise(col("src")).as("v"),
        when(col("dsrc") >= col("ddst"), col("ddst")).otherwise(col("dsrc")).as("dv"))
      .localCheckpoint(true)
    var nActive = active.count()
    val coverParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var iters = 0
    while (nActive > 0 && iters < maxIter) {
      val stepped = active
        .join(par.select(col("id").as("u"), col("parent").as("pu")), "u")
        .select(col("eid"), col("u").as("cov"), col("pu").as("u0"),
          (col("du") - 1).as("du0"), col("v"), col("dv"))
      val next = stepped.select(col("eid"), col("cov"),
          when(col("du0") >= col("dv"), col("u0")).otherwise(col("v")).as("u"),
          when(col("du0") >= col("dv"), col("du0")).otherwise(col("dv")).as("du"),
          when(col("du0") >= col("dv"), col("v")).otherwise(col("u0")).as("v"),
          when(col("du0") >= col("dv"), col("dv")).otherwise(col("du0")).as("dv"))
        .localCheckpoint(true)
      coverParts += next.select(col("eid"), col("cov"))
      active = next.filter(col("u") =!= col("v"))
        .select("eid", "u", "du", "v", "dv")
      nActive = active.count()
      iters += 1
    }
    val covers = coverParts.reduceOption(_ unionAll _)
      .getOrElse(canon.select(col("eid"), col("src").as("cov")).limit(0))

    // 4. auxiliary graph (nodes = eids) + distributed CC = blocks
    val auxEdges = covers
      .join(treeByChild.withColumnRenamed("child", "cov"), "cov")
      .select(col("eid").as("src"), col("teid").as("dst"))
      .withColumn("weight", lit(1.0))
    val blocks = ConnectedComponents.run(
        PropertyGraph(auxEdges, directed = false))
      .select(col("id").as("eid"), col("component").as("bicc"))
    // every edge gets a block; uncovered edges (bridges) are their own
    val edgeLabels = canon.join(blocks, Seq("eid"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("bicc"), col("eid")).as("bicc"))
      .localCheckpoint(true)
    val bridges = canon
      .join(covers.join(treeByChild.withColumnRenamed("child", "cov"), "cov")
          .select(col("teid").as("eid")).unionAll(covers.select("eid")),
        Seq("eid"), "left_anti")
      .select("src", "dst")
    // 5. articulation points: vertices incident to >= 2 distinct blocks
    val artic = edgeLabels.select(col("src").as("id"), col("bicc"))
      .unionAll(edgeLabels.select(col("dst").as("id"), col("bicc")))
      .distinct()
      .groupBy("id").agg(countDistinct(col("bicc")).as("nb"))
      .filter(col("nb") >= 2).select("id")
    (edgeLabels, artic, bridges)
  }

  /** Driver-bounded Hopcroft–Tarjan twin of [[run]] (kept as the
    * sequential cross-check oracle; the reference algorithm verbatim in
    * spirit — `components/BiconnectedComponents.hpp:26`). O(n+m) driver
    * memory; use [[run]] on anything large. */
  def runSequential(g: PropertyGraph): (DataFrame, DataFrame, DataFrame) = {
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
