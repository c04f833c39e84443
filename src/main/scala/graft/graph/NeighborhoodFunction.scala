package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.FMSketch._

/** Approximate neighborhood function / effective diameter / hop plot
  * (reference: `distance/EffectiveDiameterApproximation.hpp:25-34`,
  * `NeighborhoodFunctionApproximation.hpp:26-34`,
  * `HopPlotApproximation.hpp:21` — ANF with k parallel Flajolet–Martin
  * bitmasks, merged over neighbors each hop).
  *
  * Per hop: sketch_h(v) = sketch_{h-1}(v) OR ⋃_{u∈N(v)} sketch_{h-1}(u)
  * — one join + one OR-aggregate (the custom [[graft.functions.FMSketch]]
  * TypedImperativeAggregate) per hop, lineage-truncated per round.
  */
object NeighborhoodFunction {

  /** `(h, nf)` for h = 0..maxH: estimated number of ordered pairs within
    * distance ≤ h. Stops early when the estimate stabilizes (all pairs
    * reached). */
  def approximate(g: PropertyGraph, maxH: Int = 30, k: Int = 64): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val adj = g.adjacency.select("src", "dst").persist()
    var sketches = g.vertices
      .select(col("id"), fmInit(col("id"), k).as("sk"))
      .localCheckpoint(true)

    val acc = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    acc += 0 -> sketches.agg(sum(fmEstimate(col("sk")))).head.getDouble(0)
    var h = 1
    var stable = false
    while (h <= maxH && !stable) {
      val viaNbr = sketches.join(adj, sketches("id") === adj("src"))
        .select(col("dst").as("id"), col("sk"))
      sketches = sketches.select(col("id"), col("sk")).unionAll(viaNbr)
        .groupBy("id").agg(fmMerge(col("sk")).as("sk"))
        .localCheckpoint(true)
      val nf = sketches.agg(sum(fmEstimate(col("sk")))).head.getDouble(0)
      stable = acc.last._2 == nf
      if (!stable) acc += h -> nf
      h += 1
    }
    adj.unpersist(false)
    acc.toSeq.toDF("h", "nf")
  }

  /** Effective diameter at `ratio` (default 0.9): smallest h whose
    * neighborhood function reaches ratio·nf(∞) (reference
    * `EffectiveDiameter.hpp:19` without interpolation — documented
    * deviation). */
  /** Sampled-BFS neighborhood function (reference
    * `distance/NeighborhoodFunctionHeuristic.hpp:24`, RANDOM strategy):
    * BFS from `nSamples` hash-picked sources, per-distance reach counts
    * scaled by n/nSamples and accumulated, with the reference's exact
    * anchors NF(1) = 2m and NF(diameter) = n(n−1). One keyed
    * multi-source BFS + one tiny per-distance aggregate — the sampled
    * alternative to the [[approximate]] ANF sketch. `(h, nf)`. */
  def heuristic(g: PropertyGraph, nSamples: Int = 32,
      seed: Long = 42, checkPreconditions: Boolean = true): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    // the reference's preconditions (NeighborhoodFunctionHeuristic.cpp:30):
    // the NF(diameter) = n(n−1) anchor and the n/k scaling are only valid
    // on an undirected single-component graph — reject anything else
    // rather than return misleading numbers. The connectivity check is a
    // full distributed CC run (can rival the heuristic's own cost on big
    // graphs) — callers that already know the graph is connected pass
    // checkPreconditions = false to skip it.
    require(!g.directed,
      "current implementation can only deal with undirected graphs")
    if (checkPreconditions) {
      val nComp = ConnectedComponents.run(g)
        .agg(countDistinct(col("component"))).head.getLong(0)
      require(nComp <= 1,
        "current implementation only runs on graphs with 1 connected component")
    }
    val n = g.vertices.count()
    val m = g.edges.filter(col("src") =!= col("dst")).count()
    val dia = graft.graph.DistanceTail.diameter(g)._1.toInt
    val srcs = g.vertices
      .orderBy(xxhash64(lit(seed), col("id")), col("id"))
      .limit(math.min(nSamples.toLong, n).toInt)
      .select(col("id").as("source"))
    val k = srcs.count().toDouble
    val perDist = ShortestPaths.bfs(g, srcs)
      .filter(col("dist") > 0)
      .groupBy("dist").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val scale = n / k
    // the reference's cumsum STARTS at the exact NF(1) = 2m anchor and
    // pins NF(diameter) = n(n−1)
    var cum = 2.0 * m
    val rows = (1 to dia).map { h =>
      if (h > 1) cum += math.round(perDist.getOrElse(h, 0L) * scale).toDouble
      val nf = if (h == dia && dia > 1) n.toDouble * (n - 1) else cum
      (h.toLong, nf)
    }
    rows.toDF("h", "nf")
  }

  def effectiveDiameter(g: PropertyGraph, ratio: Double = 0.9,
      maxH: Int = 30): Long = {
    val nf = approximate(g, maxH).collect().map(r => (r.getInt(0), r.getDouble(1)))
    val total = nf.last._2
    nf.find(_._2 >= ratio * total).map(_._1.toLong).getOrElse(nf.last._1.toLong)
  }

  /** Hop plot: fraction of reachable pairs per hop (reference
    * `HopPlotApproximation.hpp:21`). */
  def hopPlot(g: PropertyGraph, maxH: Int = 30): DataFrame = {
    val spark = g.edges.sparkSession
    val nf = approximate(g, maxH)
    val total = nf.agg(max("nf")).head.getDouble(0)
    nf.select(col("h"), (col("nf") / total).as("fraction"))
  }
}
