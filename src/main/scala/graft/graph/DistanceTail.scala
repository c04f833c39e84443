package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-module tail (reference `distance/Volume.hpp:20`,
  * `Diameter.hpp:32` (SumSweep/iFub bounds), `DynDijkstra.hpp`,
  * `centrality/DynTopHarmonicCloseness.hpp:26`): r-ball volume,
  * double-sweep diameter bounds with an exact all-sources check, a
  * weighted incremental SSSP update, and top-k harmonic closeness
  * maintained under edge insertions. All are compositions of the keyed
  * BFS / Dijkstra fixpoints — nothing materializes on the driver beyond
  * per-call scalars. */
object DistanceTail {

  /** Volume (Mocnik 2018; reference `distance/Volume.hpp:20`): average
    * number of nodes within distance `r` over `samples` hash-sampled
    * start nodes. One keyed BFS to depth r. */
  def volume(g: PropertyGraph, r: Int, samples: Int, seed: Long = 42): Double = {
    val starts = g.vertices
      .orderBy(xxhash64(lit(seed), col("id")).asc, col("id").asc)
      .limit(samples).select(col("id").as("source"))
    volumeFrom(g, starts, r)
  }

  /** Volume from an explicit `(source)` start set (SQL-replicable when
    * the starts are, e.g., the smallest ids). */
  def volumeFrom(g: PropertyGraph, starts: DataFrame, r: Int): Double = {
    val dist = ShortestPaths.bfs(g, starts, maxIter = r)
    // maxIter = r settles exactly depths 0..r
    val res = dist.filter(col("dist") <= r)
      .groupBy("source").agg(count(lit(1)).as("ball"))
      .agg(avg("ball").cast("double")).head
    if (res.isNullAt(0)) 0.0 else res.getDouble(0)
  }

  /** Double-sweep diameter lower bound + exact diameter (reference
    * `distance/Diameter.hpp:32`; the double sweep is the standard
    * SumSweep-style bound, the exact value comes from all-sources
    * eccentricity — distributed, no driver loops). Returns
    * (lowerBound, exact). */
  def diameter(g: PropertyGraph): (Long, Long) = {
    // sweep 1: from the max-degree node to its farthest node f
    val start = g.degrees.orderBy(col("degree").desc, col("id").asc)
      .limit(1).head.getLong(0)
    val d1 = ShortestPaths.bfs(g,
      ShortestPaths.sourcesOf(g, Seq(start)))
    val f = d1.orderBy(col("dist").desc, col("id").asc).limit(1)
      .head.getLong(1)
    // sweep 2: eccentricity of f is a diameter lower bound
    val d2 = ShortestPaths.bfs(g, ShortestPaths.sourcesOf(g, Seq(f)))
    val lb = d2.agg(max("dist")).head.getLong(0)
    // exact: max eccentricity over every source (one keyed BFS)
    val all = ShortestPaths.bfs(g, g.vertices.select(col("id").as("source")))
    val exact = all.agg(max("dist")).head.getLong(0)
    (lb, exact)
  }

  /** Incremental weighted SSSP update after an edge-insertion batch
    * (reference `distance/DynDijkstra.hpp` — the weighted sibling of
    * DynBFS): distances only shrink on insertion, so the relaxation is
    * seeded from the inserted edges' endpoints and propagates through
    * the affected region only. `g2` is the post-insertion graph; result
    * equals a from-scratch Dijkstra on it. `(source, id, dist)`. */
  def updateDijkstraInsert(g2: PropertyGraph, dist: DataFrame,
      newEdges: DataFrame, maxIter: Int = 200): DataFrame = {
    val adj = g2.adjacency.select("src", "dst", "weight")
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adj.count()
    val ins = newEdges.select(col("src").as("u"), col("dst").as("v"), col("weight"))
    val insSym = ins.unionAll(
      ins.select(col("v").as("u"), col("u").as("v"), col("weight")))
    var cur = dist.localCheckpoint(true)
    var frontier = insSym
      .join(cur, insSym("u") === cur("id"))
      .select(col("source"), col("v").as("id"), (col("dist") + col("weight")).as("dist"))
      .groupBy("source", "id").agg(min("dist").as("dist"))
      .join(cur.select(col("source"), col("id"), col("dist").as("old")),
        Seq("source", "id"), "left")
      .filter(col("old").isNull || col("dist") < col("old"))
      .select("source", "id", "dist")
      .localCheckpoint(true)
    var i = 0
    var n = frontier.count()
    while (n > 0 && i < maxIter) {
      cur = cur.unionAll(frontier)
        .groupBy("source", "id").agg(min("dist").as("dist"))
        .localCheckpoint(true)
      val cand = frontier.join(adj, frontier("id") === adj("src"))
        .select(col("source"), col("dst").as("id"),
          (col("dist") + col("weight")).as("dist"))
        .groupBy("source", "id").agg(min("dist").as("dist"))
      frontier = cand
        .join(cur.select(col("source"), col("id"), col("dist").as("old")),
          Seq("source", "id"), "left")
        .filter(col("old").isNull || col("dist") < col("old"))
        .select("source", "id", "dist")
        .localCheckpoint(true)
      n = frontier.count()
      i += 1
    }
    adj.unpersist(false)
    cur
  }

  /** Top-k harmonic closeness maintained under edge insertions
    * (reference `centrality/DynTopHarmonicCloseness.hpp:26`): exact
    * harmonic values for a candidate source set, updated after a batch
    * via the affected-region BFS update instead of a recompute.
    * Returns the post-update `(id, harmonic, rank)` top-k. */
  def dynTopHarmonic(g2: PropertyGraph, candidateState: DataFrame,
      newEdges: DataFrame, k: Int): DataFrame = {
    val updated = ShortestPaths.updateBfsInsert(g2, candidateState, newEdges)
    val harmonic = ShortestPaths.harmonicCloseness(updated)
    // distributed TakeOrdered for the top-k, then rank the k survivors
    // — the previous global window sorted ALL nodes through one task
    Ranks.zipRank(harmonic.orderBy(col("harmonic").desc, col("id").asc).limit(k),
      Seq(col("harmonic").desc, col("id").asc), "rank", base = 1L)
  }
}
