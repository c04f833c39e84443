package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting and clustering coefficients (reference:
  * `global/ClusteringCoefficient.hpp:18`,
  * `centrality/LocalClusteringCoefficient.hpp:18`,
  * `edgescores/TriangleEdgeScore.cpp`).
  *
  * Wedge-closing via two equi-joins on a canonically oriented edge set.
  * Edges are oriented low-degree → high-degree (ties by id), the standard
  * trick that bounds per-node wedge fan-out by O(√m) on skewed graphs —
  * on a 100 TB graph this, not the join itself, is what keeps the shuffle
  * volume survivable.
  */
object Triangles {

  /** Simple (dedup, loop-free) canonical undirected edges `(src, dst)`. */
  private def simpleEdges(g: PropertyGraph): DataFrame =
    PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")

  /** Degree over the simple undirected graph `(id, degree)`. */
  private def simpleDegrees(g: PropertyGraph): DataFrame = {
    val e = simpleEdges(g)
    e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
  }

  /** Degree-oriented canonical edges `(a, b)` with (deg,id) of a < b. */
  private def oriented(g: PropertyGraph): DataFrame =
    orientedFrom(g, simpleDegrees(g))

  /** [[oriented]] with the degree table supplied, so a caller that also
    * needs degrees (LCC) pays the aggregation once. */
  private def orientedFrom(g: PropertyGraph, deg: DataFrame): DataFrame = {
    val und = simpleEdges(g)
    und.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "ds"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dd"), "dst")
      .select(
        when(col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst")),
          col("src")).otherwise(col("dst")).as("a"),
        when(col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst")),
          col("dst")).otherwise(col("src")).as("b"))
  }

  /** All triangles, one row each: `(a, b, c)`.
    *
    * The oriented edge table is MATERIALIZED (eager persist + count)
    * before the wedge join: it is referenced three times (both wedge
    * sides + the closer), and an unmaterialized reference lets the three
    * concurrent stage subtrees race to compute it — the explain of the
    * former plan carried the whole canonicalize/degree/orient subtree in
    * triplicate (53 exchanges); now it runs once and the wedge query
    * reads the cached blocks. Spill-safe persist rather than
    * localCheckpoint: lineage survives executor loss at scale, and
    * `spark.catalog.clearCache()` (Bench/Verify housekeeping) reclaims
    * the blocks — a localCheckpoint's RDD blocks outlive clearCache. */
  def triangles(g: PropertyGraph): DataFrame = {
    val e = oriented(g).persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    wedgeClose(e)
  }

  /** Wedge join + closer over a MATERIALIZED oriented edge table. */
  private def wedgeClose(e: DataFrame): DataFrame = {
    val e1 = e.select(col("a").as("u"), col("b").as("v"))
    val e2 = e.select(col("a").as("v"), col("b").as("w"))
    val wedges = e1.join(e2, "v").select(col("u"), col("v"), col("w"))
    // close the wedge: (u,w) must be an oriented edge in either order
    val closer = e.select(col("a").as("u"), col("b").as("w"))
      .unionAll(e.select(col("b").as("u"), col("a").as("w")))
    wedges.join(closer, Seq("u", "w"), "left_semi")
      .select(col("u").as("a"), col("v").as("b"), col("w").as("c"))
  }

  /** Global triangle count as a 1-row DataFrame `(triangles)`. */
  def triangleCount(g: PropertyGraph): DataFrame =
    triangles(g).agg(count(lit(1)).as("triangles"))

  /** Triangles incident to each node `(id, triangles)`; nodes in no
    * triangle are absent. */
  def perNode(g: PropertyGraph): DataFrame = perNodeOver(triangles(g))

  private def perNodeOver(t: DataFrame): DataFrame =
    t.select(col("a").as("id"))
      .unionAll(t.select(col("b").as("id")))
      .unionAll(t.select(col("c").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))

  /** Local clustering coefficient `(id, lcc)`; 0 for degree < 2
    * (reference `LocalClusteringCoefficient.hpp:18`). The degree table
    * is computed ONCE (persisted) and feeds both the orientation and the
    * final per-node join — the former top-level `simpleDegrees` beside
    * `perNode` paid the whole degree aggregation (scan + exchange) a
    * second time. */
  def localClusteringCoefficient(g: PropertyGraph): DataFrame = {
    val deg = simpleDegrees(g).persist(StorageLevel.MEMORY_AND_DISK)
    val e = orientedFrom(g, deg).persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // materializes deg too (its cache fills while orienting)
    deg.join(perNodeOver(wedgeClose(e)), Seq("id"), "left")
      .select(col("id"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(coalesce(col("triangles"), lit(0L)) * lit(2.0) /
            (col("degree") * (col("degree") - lit(1)))).as("lcc"))
  }

  /** Average local clustering coefficient, 1-row `(avg_lcc)`. */
  def averageClusteringCoefficient(g: PropertyGraph): DataFrame =
    localClusteringCoefficient(g).agg(avg("lcc").as("avg_lcc"))

  /** Local square clustering coefficient `(id, sqcc)` (reference
    * `centrality/LocalSquareClusteringCoefficient.cpp:19-47`, exact
    * per-wedge recurrence): per unordered neighbor pair (v,w) of u,
    * squares += cn(v,w) − 1 and potential += deg(v) + deg(w) − cn(v,w)
    * − 1 − 2·[v~w]; score = squares / potential (0 when potential ≤ 0).
    * Wedge enumeration and the cn lookup are the same oriented joins as
    * triangle counting — one shuffle pipeline, no n² anywhere. */
  def localSquareClusteringCoefficient(g: PropertyGraph): DataFrame = {
    val e = simpleEdges(g)
    val adj = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = simpleDegrees(g)
    // all common-neighbor pair counts (v<w sharing ≥1 neighbor)
    val cn = adj.select(col("dst").as("v"), col("src").as("m"))
      .join(adj.select(col("src").as("m"), col("dst").as("w")), "m")
      .filter(col("v") < col("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("cn"))
    // wedges centered at u: (u, v, w), v < w both neighbors of u
    val wedges = adj.select(col("src").as("u"), col("dst").as("v"))
      .join(adj.select(col("src").as("u"), col("dst").as("w")), "u")
      .filter(col("v") < col("w"))
    val terms = wedges
      .join(cn, Seq("v", "w"), "left") // cn ≥ 1 always (u is common) but keep safe
      .join(e.select(col("src").as("v"), col("dst").as("w"))
          .withColumn("adjVW", lit(1)), Seq("v", "w"), "left")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .join(deg.select(col("id").as("w"), col("degree").as("dw")), "w")
      .select(col("u"),
        (coalesce(col("cn"), lit(1L)) - 1).as("sq"),
        (col("dv") + col("dw") - coalesce(col("cn"), lit(1L)) - 1
          - when(col("adjVW").isNotNull, 2).otherwise(0)).as("pot"))
    val agg0 = terms.groupBy(col("u").as("id"))
      .agg(sum("sq").as("squares"), sum("pot").as("potential"))
    g.vertices.select("id").join(agg0, Seq("id"), "left")
      .select(col("id"),
        when(coalesce(col("potential"), lit(0L)) > 0,
          col("squares").cast("double") / col("potential"))
          .otherwise(lit(0.0)).as("sqcc"))
  }

  /** Global clustering coefficient 3·triangles/wedges, 1-row `(gcc)`
    * (reference `global/GlobalClusteringCoefficient.hpp:17`). */
  def globalClusteringCoefficient(g: PropertyGraph): DataFrame = {
    val wedges = simpleDegrees(g)
      .agg(sum(col("degree") * (col("degree") - 1) / 2).as("wedges"))
    triangleCount(g).crossJoin(wedges)
      .select((col("triangles") * lit(3.0) / col("wedges")).as("gcc"))
  }
}
