package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** GraphTools analogs: projections, coercions, stats, sampling
  * (reference: `include/networkit/graph/GraphTools.hpp`,
  * `networkit/graphtools.pyx`). All pure `DataFrame => DataFrame`
  * transforms — Catalyst sees through them for pushdown/pruning.
  */
object GraphOps {

  /** Induced subgraph on a node set (reference `GraphTools.hpp:208`):
    * two semi-joins, broadcast when the node set is small. */
  def subgraphFromNodes(g: PropertyGraph, nodes: DataFrame): PropertyGraph = {
    val ids = nodes.select(col("id"))
    val e = g.edges
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst", "weight")
    PropertyGraph(e, g.directed, Some(ids))
  }

  /** Reverse all directed edges (reference `GraphTools.hpp:330`). */
  def transpose(g: PropertyGraph): PropertyGraph =
    g.copy(edges = g.edges.select(
      col("dst").as("src"), col("src").as("dst"), col("weight")))

  /** Direction coercion (reference `GraphTools.hpp:303`): canonical
    * undirected edge set, parallel edges collapsed. */
  def toUndirected(g: PropertyGraph): PropertyGraph =
    PropertyGraph(PropertyGraph.canonicalizeUndirected(g.edges), directed = false,
      g.verticesOpt)

  def toUnweighted(g: PropertyGraph): PropertyGraph =
    g.copy(edges = g.edges.select(col("src"), col("dst"), lit(1.0).as("weight")))

  /** Dense re-id 0..n-1 (reference `getContinuousNodeIds`,
    * `graphtools.pyx:578`): rank over sorted ids, join-remapped onto
    * both endpoints. Window over a single global ordering — fine for
    * id dictionaries (n rows), never applied to edges directly. */
  def compactIds(g: PropertyGraph): (PropertyGraph, DataFrame) = {
    val mapping = g.vertices.select("id")
      .withColumn("newId", row_number().over(Window.orderBy("id")).cast("long") - 1)
    val e = g.edges
      .join(mapping.withColumnRenamed("id", "src"), "src")
      .withColumnRenamed("newId", "newSrc")
      .join(mapping.withColumnRenamed("id", "dst"), "dst")
      .withColumnRenamed("newId", "newDst")
      .select(col("newSrc").as("src"), col("newDst").as("dst"), col("weight"))
    (PropertyGraph(e, g.directed, Some(mapping.select(col("newId").as("id")))), mapping)
  }

  /** Disjoint union with id shift (reference `append`, `graphtools.pyx:237`). */
  def append(g1: PropertyGraph, g2: PropertyGraph, offset: Long): PropertyGraph =
    g1.copy(edges = g1.edges.unionAll(g2.edges.select(
      (col("src") + offset).as("src"), (col("dst") + offset).as("dst"), col("weight"))))

  /** Union keeping ids (reference `merge`, `graphtools.pyx:255`). */
  def merge(g1: PropertyGraph, g2: PropertyGraph): PropertyGraph =
    g1.copy(edges = g1.edges.unionAll(g2.edges).dropDuplicates("src", "dst"))

  /** Graph scalar stats, 1-row: n, m, density, max degree, self-loops,
    * total weight (reference `GraphTools.hpp:141-160`, `Graph.hpp:122`). */
  def stats(g: PropertyGraph): DataFrame = {
    val n = g.vertices.agg(count(lit(1)).as("n_nodes"))
    val m = g.edges.agg(
      count(lit(1)).as("n_edges"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("self_loops"),
      round(sum("weight"), 6).as("total_weight"))
    val md = g.degrees.agg(max("degree").as("max_degree"))
    n.crossJoin(m).crossJoin(md)
      .withColumn("density",
        when(col("n_nodes") > 1,
          round((if (g.directed) col("n_edges") * lit(1.0) else col("n_edges") * lit(2.0)) /
            (col("n_nodes") * (col("n_nodes") - 1)), 8)).otherwise(lit(0.0)))
  }

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * the (symmetric) edge set (reference `correlation/Assortativity.hpp:23`). */
  def assortativity(g: PropertyGraph): DataFrame = {
    val deg = g.degrees
    g.adjacency
      .join(deg.select(col("id").as("src"), col("degree").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dd")), "dst")
      .agg(corr(col("ds").cast("double"), col("dd").cast("double")).as("assortativity"))
  }

  /** k-core subgraph: iteratively peel nodes with degree < k
    * (reference `centrality/CoreDecomposition.hpp:26`). */
  def kCore(g: PropertyGraph, k: Int, maxIter: Int = 100): PropertyGraph = {
    val start = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")
    // checkpointEvery = 1: the peel step references e three times
    val fin = Fixpoint.loopUntilStableScalar(start, maxIter,
      df => df.count().toDouble, checkpointEvery = 1) { (e, _) =>
      val deg = e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("id")
      e.join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
    }
    PropertyGraph(fin.withColumn("weight", lit(1.0)), directed = false)
  }

  /** Core number per node `(id, core)` — peels k = 1, 2, … until empty. */
  def coreDecomposition(g: PropertyGraph, maxK: Int = 1000): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    var remaining = PropertyGraph(
      PropertyGraph.canonicalizeUndirected(
        g.adjacency.filter(col("src") =!= col("dst"))), directed = false)
    var acc = g.vertices.select(col("id"), lit(0).as("core"))
    var k = 1
    var done = false
    while (!done && k <= maxK) {
      val core = kCore(remaining, k)
      val coreNodes = core.edges.select(col("src").as("id"))
        .unionAll(core.edges.select(col("dst").as("id"))).distinct()
        .persist()
      if (coreNodes.isEmpty) done = true
      else {
        acc = acc.join(coreNodes.select(col("id"), lit(k).as("k")), Seq("id"), "left")
          .select(col("id"), coalesce(col("k"), col("core")).as("core"))
          .localCheckpoint(true)
        remaining = core
        k += 1
      }
      coreNodes.unpersist(false)
    }
    acc
  }

  /** Seeded uniform sample of nodes (reference `randomNodes`,
    * `GraphTools.hpp:65`): deterministic under repartitioning via
    * xxhash64-ordering, not `rand()` (SURVEY.md §4.2.3). */
  def randomNodes(g: PropertyGraph, n: Int, seed: Long): DataFrame =
    g.vertices.orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(n)
}
