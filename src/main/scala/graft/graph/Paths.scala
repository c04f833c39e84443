package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Point-to-point and counted path queries (reference:
  * `distance/BidirectionalBFS.hpp:22`, `distance/AStar.hpp:18`,
  * `reachability/AllSimplePaths.hpp:21`, and the arbitrary-precision
  * shortest-path counts `distance/SSSP.hpp:66` `bigfloat numberOfPaths`).
  *
  * Same fixpoint discipline as [[ShortestPaths]]: every round's frontier
  * is `localCheckpoint`ed so plan size stays O(1) in the hop count.
  */
object Paths {

  /** BFS with shortest-path counting: `(source, id, dist, sigma)` where
    * `sigma` is the number of shortest source→id paths in DECIMAL(38,0)
    * — the Spark analogue of the reference's `bigfloat npaths`
    * (`distance/SSSP.hpp:66,168`): path counts grow exponentially with
    * depth, so 64-bit longs overflow on deep graphs while 38 digits
    * cover any graph whose diameter × log10(maxdeg) < 38.
    *
    * Unweighted BFS settles exactly one level per round, so the frontier
    * is the full set of nodes at depth d−1 and
    * σ(w) = Σ_{v ∈ frontier, v→w} σ(v) is exact per level. */
  def bfsCounted(g: PropertyGraph, sources: DataFrame, maxIter: Int = 200): DataFrame = {
    val adj = g.adjacency.select("src", "dst")
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()

    var dist = sources.select(col("source"), col("source").as("id"),
        lit(0L).as("dist"), lit(1L).cast("decimal(38,0)").as("sigma"))
      .localCheckpoint(true)
    var frontier = dist
    var i = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && i < maxIter) {
      val candidates = frontier.join(adj, frontier("id") === adj("src"))
        .select(col("source"), col("dst").as("id"),
          (col("dist") + 1).as("dist"), col("sigma"))
        .groupBy("source", "id")
        .agg(min("dist").as("dist"), sum("sigma").as("sigma"))
      val newFrontier = candidates
        .join(dist, Seq("source", "id"), "left_anti")
        .select(col("source"), col("id"), col("dist"),
          col("sigma").cast("decimal(38,0)").as("sigma"))
        .localCheckpoint(true)
      frontierSize = newFrontier.count()
      if (frontierSize > 0) {
        dist = dist.unionAll(newFrontier).localCheckpoint(true)
        frontier = newFrontier
      }
      i += 1
    }
    adj.unpersist(false)
    dist
  }

  /** Bidirectional BFS s→t hop distance: `(s, t, dist)` — empty when t
    * is unreachable from s (reference `distance/BidirectionalBFS.hpp:22`:
    * expand the smaller ball each round; when the balls touch, the
    * shortest path is min over settled meet nodes of d_s + d_t).
    *
    * Each ball grows O(b^(d/2)) instead of O(b^d) — at 100 TB this is
    * the difference between two small frontier joins and a full-graph
    * BFS. The first meet is already exact: any meet node v gives a valid
    * walk ds(v)+dt(v) ≥ d, and in the first round where the ball radii
    * sum to d the shortest path's midpoint is settled on both sides at
    * exactly ds+dt = d — so only the new frontier needs checking against
    * the other side's settled set. */
  def bidirectionalBfs(g: PropertyGraph, s: Long, t: Long, maxIter: Int = 200): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    if (s == t) return Seq((s, t, 0L)).toDF("s", "t", "dist")

    val fwd = g.adjacency.select("src", "dst")
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val bwd = g.inAdjacency.select(col("dst").as("src"), col("src").as("dst"))
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    fwd.count(); bwd.count()

    var distS = Seq((s, 0L)).toDF("id", "ds").localCheckpoint(true)
    var distT = Seq((t, 0L)).toDF("id", "dt").localCheckpoint(true)
    var frontS = distS
    var frontT = distT
    var sizeS = 1L
    var sizeT = 1L
    var best = Long.MaxValue
    var i = 0
    while (sizeS > 0 && sizeT > 0 && i < maxIter && best == Long.MaxValue) {
      val meet =
        if (sizeS <= sizeT) {
          val cand = frontS.join(fwd, frontS("id") === fwd("src"))
            .select(col("dst").as("id"), (col("ds") + 1).as("ds"))
            .groupBy("id").agg(min("ds").as("ds"))
          frontS = cand.join(distS, Seq("id"), "left_anti").localCheckpoint(true)
          sizeS = frontS.count()
          if (sizeS > 0) distS = distS.unionAll(frontS).localCheckpoint(true)
          frontS.join(distT, "id")
        } else {
          val cand = frontT.join(bwd, frontT("id") === bwd("src"))
            .select(col("dst").as("id"), (col("dt") + 1).as("dt"))
            .groupBy("id").agg(min("dt").as("dt"))
          frontT = cand.join(distT, Seq("id"), "left_anti").localCheckpoint(true)
          sizeT = frontT.count()
          if (sizeT > 0) distT = distT.unionAll(frontT).localCheckpoint(true)
          frontT.join(distS, "id")
        }
      meet.agg(min(col("ds") + col("dt"))).as[Option[Long]].head()
        .foreach(m => best = m)
      i += 1
    }
    fwd.unpersist(false); bwd.unpersist(false)
    if (best == Long.MaxValue) Seq.empty[(Long, Long, Long)].toDF("s", "t", "dist")
    else Seq((s, t, best)).toDF("s", "t", "dist")
  }

  /** A* s→t weighted distance with an admissible heuristic table
    * `(id, h)` — h(v) a lower bound on dist(v,t), h(t)=0 (reference
    * `distance/AStar.hpp:18`). Missing ids ⇒ h=0 (degenerates to
    * Dijkstra). `(s, t, dist)`, empty if unreachable.
    *
    * A distributed priority queue does not exist, so the heuristic is
    * applied as branch-and-bound pruning on Bellman-Ford relaxation:
    * once t is settled at UB, any candidate with dist + h(v) ≥ UB cannot
    * improve the s→t path and is dropped from the frontier. Same result
    * as sequential A*, and the pruning is exactly A*'s node-skipping
    * reformulated for frontier joins. */
  def aStar(g: PropertyGraph, s: Long, t: Long, heuristic: DataFrame,
            maxIter: Int = 200): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val adj = g.adjacency.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    val h = heuristic.select(col("id"), col("h").cast("double"))

    var dist = Seq((s, 0.0)).toDF("id", "dist").localCheckpoint(true)
    var frontier = dist
    var ub = Double.PositiveInfinity
    var i = 0
    var frontierSize = 1L
    while (frontierSize > 0 && i < maxIter) {
      val cand = frontier.join(adj, frontier("id") === adj("src"))
        .select(col("dst").as("id"), (col("dist") + col("weight")).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
      val improved = cand.join(dist, Seq("id"), "left")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("id"), col("nd").as("dist"))
        // branch-and-bound: f = g + h must beat the incumbent t-distance
        .join(h, Seq("id"), "left")
        .filter(col("dist") + coalesce(col("h"), lit(0.0)) < lit(ub))
        .select("id", "dist")
        .localCheckpoint(true)
      frontierSize = improved.count()
      if (frontierSize > 0) {
        dist = dist.unionAll(improved)
          .groupBy("id").agg(min("dist").as("dist"))
          .localCheckpoint(true)
        val tDist = dist.filter(col("id") === t).select("dist").as[Double].collect()
        if (tDist.nonEmpty && tDist.head < ub) ub = tDist.head
        frontier = improved
      }
      i += 1
    }
    adj.unpersist(false)
    if (ub.isInfinite) Seq.empty[(Long, Long, Double)].toDF("s", "t", "dist")
    else Seq((s, t, ub)).toDF("s", "t", "dist")
  }

  /** All simple s→t paths up to `cutoff` edges: `(path ARRAY<LONG>, len)`
    * (reference `reachability/AllSimplePaths.hpp:21` — exponential by
    * nature there too; bound the blast radius with `cutoff`).
    *
    * The frontier carries the visited path as an array column and
    * extends it one hop per round, dropping revisits — each round is one
    * shuffle keyed by the frontier head, so the work distributes even
    * though the output can be exponential in `cutoff`. */
  def allSimplePaths(g: PropertyGraph, s: Long, t: Long, cutoff: Int): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val adj = g.adjacency.select("src", "dst")
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()

    var frontier = Seq(s).toDF("head")
      .select(col("head"), array(col("head")).as("path"))
      .localCheckpoint(true)
    var found = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], frontier.schema)
    var i = 0
    var frontierSize = 1L
    while (frontierSize > 0 && i < cutoff) {
      val extended = frontier.filter(col("head") =!= t)
        .join(adj, col("head") === adj("src"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("head"),
          concat(col("path"), array(col("dst"))).as("path"))
        .localCheckpoint(true)
      found = found.unionAll(extended.filter(col("head") === t)).localCheckpoint(true)
      frontier = extended
      frontierSize = extended.count()
      i += 1
    }
    adj.unpersist(false)
    found.select(col("path"), (size(col("path")) - 1).cast("long").as("len"))
  }
}
