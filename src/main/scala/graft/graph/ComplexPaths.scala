package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Complex-contagion path analysis (reference
  * `centrality/ComplexPaths.cpp:126-210`, Guilbeault–Centola 2021):
  * bootstrap-percolation spread where a node adopts once `threshold` of
  * its neighbors lie in the growing complex graph, and the complex path
  * length PLci(u) = mean BFS distance inside u's complex graph / n.
  *
  * The reference's Mode::allNodes loops the percolation over every
  * start node; here the same fixpoint runs KEYED BY SOURCE — all
  * requested sources percolate together, one join per round, so a batch
  * of sources costs one distributed fixpoint instead of |sources|
  * sequential ones. Seed selection uses the (threshold−1) smallest-id
  * neighbors instead of the reference's uniform sample (documented
  * deviation — deterministic, oracle-replicable).
  */
object ComplexPaths {

  private def sym(g: PropertyGraph): DataFrame =
    g.adjacency.filter(col("src") =!= col("dst")).select("src", "dst").distinct()

  /** Adopters + complex-graph edges for each source in `sources` (an
    * `(s)` DataFrame), keyed by `s`. Returns
    * (adopters `(s, id, ord)`, complexEdges `(s, src, dst)`), where ord
    * is the activation round (0 = seeds). */
  def complexGraphs(g: PropertyGraph, sources: DataFrame, threshold: Int = 3,
      maxRounds: Int = 50): (DataFrame, DataFrame) = {
    val adj = sym(g).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    // seeds: the source + its (threshold-1) smallest-id neighbors
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy(col("dst").asc)
    val nbrSeeds = sources.join(adj, sources("s") === adj("src"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= threshold - 1)
      .select(col("s"), col("dst").as("id"))
    var adopters = sources.select(col("s"), col("s").as("id"), lit(0).as("ord"))
      .unionByName(nbrSeeds.withColumn("ord", lit(0)))
      .localCheckpoint(true)
    // complex edges: the g-adjacency of every adopter (both directions)
    def edgesOf(a: DataFrame): DataFrame =
      a.select(col("s"), col("id").as("src")).join(adj, "src")
        .select(col("s"), col("src"), col("dst"))
    var cedges = edgesOf(adopters)
      .unionByName(edgesOf(adopters).select(col("s"), col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var round = 0
    var spreading = true
    while (spreading && round < maxRounds) {
      round += 1
      // influence(v) = degree of v in the complex graph
      val influence = cedges.groupBy(col("s"), col("src").as("id"))
        .agg(count(lit(1)).as("influence"))
      val newAdopters = influence.filter(col("influence") >= threshold)
        .join(adopters.select(col("s"), col("id")), Seq("s", "id"), "left_anti")
        .select(col("s"), col("id"), lit(round).as("ord"))
        .localCheckpoint(true)
      if (newAdopters.isEmpty) spreading = false
      else {
        adopters = adopters.unionByName(newAdopters).localCheckpoint(true)
        val grown = edgesOf(newAdopters)
        cedges = cedges
          .unionByName(grown)
          .unionByName(grown.select(col("s"), col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint(true)
      }
    }
    adj.unpersist(false)
    (adopters, cedges)
  }

  /** PLci (complex path length) per source: mean BFS distance within the
    * source's complex graph (unreachable → 0), divided by n (reference
    * `ComplexPaths.cpp:186-210`). `(s, plci)`. */
  def complexPathLengths(g: PropertyGraph, sources: DataFrame,
      threshold: Int = 3, maxDepth: Int = 50): DataFrame = {
    val n = g.vertices.count()
    val (_, cedges) = complexGraphs(g, sources, threshold)
    val ce = cedges.persist(StorageLevel.MEMORY_AND_DISK)
    ce.count()
    // keyed BFS: frontier (s, id, dist) over each source's own edge set
    var settled = sources.select(col("s"), col("s").as("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = settled
    var depth = 0L
    var advancing = true
    while (advancing && depth < maxDepth) {
      depth += 1
      val next = frontier.withColumnRenamed("id", "src").drop("dist")
        .join(ce, Seq("s", "src"))
        .select(col("s"), col("dst").as("id"))
        .join(settled.select(col("s"), col("id")), Seq("s", "id"), "left_anti")
        .distinct()
        .withColumn("dist", lit(depth))
        .localCheckpoint(true)
      if (next.isEmpty) advancing = false
      else {
        settled = settled.unionByName(next).localCheckpoint(true)
        frontier = next
      }
    }
    ce.unpersist(false)
    settled.groupBy("s").agg((sum("dist") / n.toDouble).as("plci"))
  }
}
