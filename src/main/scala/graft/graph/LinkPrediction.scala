package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-prediction indices over candidate 2-hop pairs (reference:
  * `include/networkit/linkprediction/` headers — CommonNeighborsIndex,
  * JaccardIndex, AdamicAdarIndex, ResourceAllocationIndex,
  * PreferentialAttachmentIndex, TotalNeighborsIndex…).
  *
  * The candidate pair set is every unordered pair with ≥1 common
  * neighbor (the only pairs where intersection-based indices are
  * non-zero): one self-join of the adjacency on the shared middle node —
  * with degree-bounded fan-out this is the same shuffle shape as
  * triangle counting and survives skew the same way.
  */
object LinkPrediction {

  /** Simple symmetric adjacency (dedup, loop-free). */
  private def sym(g: PropertyGraph): DataFrame = {
    val e = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def degrees(g: PropertyGraph): DataFrame =
    sym(g).groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** `(u, v, cn)` for all pairs u < v with ≥1 common neighbor
    * (reference `CommonNeighborsIndex.hpp:22`). */
  def commonNeighbors(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val left = s.select(col("dst").as("u"), col("src").as("w"))
    val right = s.select(col("src").as("w"), col("dst").as("v"))
    left.join(right, "w").filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
  }

  /** Jaccard index cn/|N(u) ∪ N(v)| (reference `JaccardIndex.hpp`). */
  def jaccard(g: PropertyGraph): DataFrame = {
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .select(col("u"), col("v"),
        (col("cn") / (col("du") + col("dv") - col("cn"))).as("jaccard"))
  }

  /** Adamic-Adar Σ_w 1/ln(deg(w)) over common neighbors w
    * (reference `AdamicAdarIndex.hpp`). */
  def adamicAdar(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val deg = degrees(g)
    val left = s.select(col("dst").as("u"), col("src").as("w"))
    val right = s.select(col("src").as("w"), col("dst").as("v"))
    left.join(right, "w").filter(col("u") < col("v"))
      .join(deg.select(col("id").as("w"), col("degree").as("dw")), "w")
      .groupBy("u", "v").agg(sum(lit(1.0) / log(col("dw"))).as("adamic_adar"))
  }

  /** Resource allocation Σ_w 1/deg(w) (reference
    * `ResourceAllocationIndex.hpp`). */
  def resourceAllocation(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val deg = degrees(g)
    val left = s.select(col("dst").as("u"), col("src").as("w"))
    val right = s.select(col("src").as("w"), col("dst").as("v"))
    left.join(right, "w").filter(col("u") < col("v"))
      .join(deg.select(col("id").as("w"), col("degree").as("dw")), "w")
      .groupBy("u", "v").agg(sum(lit(1.0) / col("dw")).as("resource_allocation"))
  }

  /** Preferential attachment deg(u)·deg(v) over candidate pairs
    * (reference `PreferentialAttachmentIndex.hpp`). */
  def preferentialAttachment(g: PropertyGraph): DataFrame = {
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .select(col("u"), col("v"), (col("du") * col("dv")).as("pref_attach"))
  }

  /** The full per-pair index sheet over candidate pairs: common
    * neighbors, total neighbors |N(u) ∪ N(v)| (reference
    * `TotalNeighborsIndex.hpp:29`), U/V degrees (`UDegreeIndex.hpp:27`,
    * `VDegreeIndex.hpp:27`), neighborhood distance cn/√(du·dv)
    * (`NeighborhoodDistanceIndex.hpp` runImpl), preferential attachment
    * — one candidate-pair join feeding five one-line projections. */
  def indexSheet(g: PropertyGraph): DataFrame = {
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        (col("du") + col("dv") - col("cn")).as("total_nbrs"),
        col("du").as("u_degree"), col("dv").as("v_degree"),
        (col("cn") / sqrt(col("du") * col("dv"))).as("nbr_distance"),
        (col("du") * col("dv")).as("pref_attach"))
  }

  /** SameCommunityIndex (reference `SameCommunityIndex.hpp`,
    * `SameCommunityIndex.cpp:28`): 1 iff both endpoints share a label
    * under `partition (id, community)`. */
  def sameCommunity(pairs: DataFrame, partition: DataFrame): DataFrame =
    pairs
      .join(partition.select(col("id").as("u"), col("community").as("cu")), "u")
      .join(partition.select(col("id").as("v"), col("community").as("cv")), "v")
      .withColumn("same_community",
        when(col("cu") === col("cv"), 1L).otherwise(0L))
      .drop("cu", "cv")

  /** NeighborsMeasureIndex (reference `NeighborsMeasureIndex.hpp:29-40`):
    * number of (a ∈ N(u), b ∈ N(v)) pairs with a = b or (a,b) ∈ E —
    * i.e. common neighbors plus 3-paths u–a–b–v. The 3-path leg is the
    * triple adjacency join grouped on the endpoints, restricted to the
    * candidate pair set to bound the output. */
  def neighborsMeasure(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val cn = commonNeighbors(g)
    val threePaths = s.select(col("src").as("u"), col("dst").as("a"))
      .join(s.select(col("src").as("a"), col("dst").as("b")), "a")
      .join(s.select(col("src").as("b"), col("dst").as("v")), "b")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("p3"))
    cn.join(threePaths, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        (col("cn") + coalesce(col("p3"), lit(0L))).as("neighbors_measure"))
  }
}
