package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Directed-graph operators (reference:
  * `components/StronglyConnectedComponents.hpp:22`,
  * `graph/TopologicalSort.hpp:22`, `distance/AlgebraicDistance.hpp:21`,
  * `simulation/EpidemicSimulationSEIR.hpp:21`).
  */
object Digraph {

  /** Strongly connected components by forward/backward reachability
    * intersection from a pivot, iterated over remaining vertices
    * (Fleischer–Hendrickson–Pinar divide-and-conquer, the standard
    * distributed SCC — Tarjan's stack DFS does not distribute).
    * `(id, component)` with component = pivot id. O(#SCC) pivot rounds
    * worst case; fine when SCCs are few/large (typical web/co-occurrence
    * digraphs). */
  def stronglyConnectedComponents(g: PropertyGraph, maxIter: Int = 100): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    require(g.directed, "SCC is defined on directed graphs")
    var remaining = g.vertices.select("id").localCheckpoint(true)
    var edges = g.edges.select("src", "dst").localCheckpoint(true)
    var acc = Seq.empty[(Long, Long)].toDF("id", "component")
    var rounds = 0

    // trim: a node with no in-edges or no out-edges is a singleton SCC;
    // peeling these first collapses DAG-like regions (e.g. bipartite
    // purchase graphs) in O(depth) rounds instead of one pivot per node
    var trimmed = true
    while (trimmed) {
      val hasIn = edges.select(col("dst").as("id")).distinct()
      val hasOut = edges.select(col("src").as("id")).distinct()
      val nontrivial = remaining
        .join(hasIn, Seq("id"), "left_semi")
        .join(hasOut, Seq("id"), "left_semi")
        .localCheckpoint(true)
      val single = remaining.join(nontrivial, Seq("id"), "left_anti")
        .localCheckpoint(true)
      trimmed = !single.isEmpty
      if (trimmed) {
        acc = acc.unionAll(single.select(col("id"), col("id").as("component")))
          .localCheckpoint(true)
        remaining = nontrivial
        edges = edges
          .join(single.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(single.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst").localCheckpoint(true)
      }
    }

    while (!remaining.isEmpty && rounds < maxIter) {
      val pivot = remaining.agg(min("id")).head.getLong(0)
      val fwd = reach(edges, pivot)
      val bwd = reach(edges.select(col("dst").as("src"), col("src").as("dst")), pivot)
      val scc = fwd.join(bwd, "id").select(col("id"), lit(pivot).as("component"))
        .localCheckpoint(true)
      acc = acc.unionAll(scc).localCheckpoint(true)
      remaining = remaining.join(scc.select("id"), Seq("id"), "left_anti")
        .localCheckpoint(true)
      edges = edges
        .join(scc.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(scc.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst").localCheckpoint(true)
      rounds += 1
    }
    // anything left (when maxIter hit) is its own singleton component
    acc.unionAll(remaining.select(col("id"), col("id").as("component")))
  }

  /** Reachable set from one source over an edge table. */
  private def reach(edges: DataFrame, source: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = Seq(source).toDF("id").localCheckpoint(true)
    var frontier = visited
    var n = 1L
    var newN = 1L
    do {
      n = newN
      val next = frontier.join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti").localCheckpoint(true)
      visited = visited.unionAll(next).localCheckpoint(true)
      frontier = next
      newN = visited.count()
    } while (newN > n)
    visited
  }

  /** Topological order of a DAG: iterative zero-in-degree peeling
    * (reference `graph/TopologicalSort.hpp:22`). `(id, level)` — level
    * = peel round; any linearization of levels is a valid topo order.
    * Throws if a cycle remains. */
  def topologicalSort(g: PropertyGraph, maxIter: Int = 10000): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    require(g.directed, "topological sort is defined on directed graphs")
    var edges = g.edges.select("src", "dst").localCheckpoint(true)
    var remaining = g.vertices.select("id").localCheckpoint(true)
    var acc = Seq.empty[(Long, Long)].toDF("id", "level")
    var level = 0L
    while (!remaining.isEmpty && level < maxIter) {
      val withIn = edges.select(col("dst").as("id")).distinct()
      val zeroIn = remaining.join(withIn, Seq("id"), "left_anti").localCheckpoint(true)
      if (zeroIn.isEmpty)
        throw new IllegalArgumentException("graph has a cycle; no topological order")
      acc = acc.unionAll(zeroIn.select(col("id"), lit(level).as("level")))
        .localCheckpoint(true)
      remaining = remaining.join(zeroIn, Seq("id"), "left_anti").localCheckpoint(true)
      edges = edges.join(zeroIn.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .localCheckpoint(true)
      level += 1
    }
    acc
  }

  /** Algebraic distance (reference `distance/AlgebraicDistance.hpp:21`):
    * `systems` random test vectors smoothed `iters` times by neighbor
    * averaging (ω=0.5); per-edge distance = Σ |x_u − x_v| over systems.
    * Returns `(src, dst, algdist)`. */
  def algebraicDistance(g: PropertyGraph, systems: Int = 4, iters: Int = 10,
      seed: Long = 42): DataFrame = {
    val adj = g.adjacency.persist()
    var x = g.vertices.select(
      col("id") +: (0 until systems).map(s =>
        (pmod(xxhash64(lit(seed + s), col("id")), lit(1L << 40)) /
          lit((1L << 40).toDouble)).as(s"x$s")): _*)
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val means = (0 until systems).map(s => avg(s"x$s").as(s"m$s"))
      val nbrMean = x.join(adj, x("id") === adj("dst"))
        .groupBy(col("src").as("id"))
        .agg(means.head, means.tail: _*)
      x = x.join(nbrMean, Seq("id"), "left")
        .select(col("id") +: (0 until systems).map(s =>
          (lit(0.5) * col(s"x$s") +
            lit(0.5) * coalesce(col(s"m$s"), col(s"x$s"))).as(s"x$s")): _*)
        .localCheckpoint(true)
    }
    val dist = (0 until systems).map(s =>
      abs(col(s"u_x$s") - col(s"v_x$s"))).reduce(_ + _)
    g.edges
      .join(x.select(col("id").as("src") +:
        (0 until systems).map(s => col(s"x$s").as(s"u_x$s")): _*), "src")
      .join(x.select(col("id").as("dst") +:
        (0 until systems).map(s => col(s"x$s").as(s"v_x$s")): _*), "dst")
      .select(col("src"), col("dst"), dist.as("algdist"))
  }

  /** SEIR epidemic simulation (reference
    * `simulation/EpidemicSimulationSEIR.hpp:21`): states S→E→I→R;
    * exposure is a per-(edge, step) deterministic coin against `beta`
    * when the neighbor is infectious; E→I after `incubation` steps,
    * I→R after `infectious` steps. Returns `(id, state, step)` final
    * states after `steps`. */
  def seir(g: PropertyGraph, patientZero: Long, steps: Int = 10,
      beta: Double = 0.3, incubation: Int = 2, infectious: Int = 3,
      seed: Long = 42): DataFrame = {
    val adj = g.adjacency.select("src", "dst").persist()
    // state: 0=S, 1=E, 2=I, 3=R; since = step when current state entered
    var st = g.vertices.select(col("id"),
      when(col("id") === patientZero, 2).otherwise(0).as("state"),
      lit(0).as("since")).localCheckpoint(true)
    for (step <- 1 to steps) {
      val infectious_ = st.filter(col("state") === 2).select(col("id").as("src"))
      val exposedNow = adj.join(infectious_, "src")
        .select(col("dst").as("id"))
        .filter(pmod(xxhash64(lit(seed), lit(step), col("id")), lit(1000L)) <
          (beta * 1000).toLong)
        .distinct()
      st = st.join(exposedNow.withColumn("hit", lit(1)), Seq("id"), "left")
        .select(col("id"),
          when(col("state") === 0 && col("hit").isNotNull, 1)
            .when(col("state") === 1 && lit(step) - col("since") >= incubation, 2)
            .when(col("state") === 2 && lit(step) - col("since") >= infectious, 3)
            .otherwise(col("state")).as("newState"),
          col("state"), col("since"))
        .select(col("id"), col("newState").as("state"),
          when(col("newState") =!= col("state"), step).otherwise(col("since")).as("since"))
        .localCheckpoint(true)
    }
    adj.unpersist(false)
    st.select(col("id"), col("state"), col("since").as("step"))
  }
}
