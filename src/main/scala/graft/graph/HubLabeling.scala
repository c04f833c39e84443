package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hub labeling for fast s–t distance queries (reference:
  * `distance/PrunedLandmarkLabeling.hpp:12` — 2-hop hub labels,
  * SURVEY.md §2.9: "precomputed label table (node, hub, dist); query =
  * join on hub + min(d1+d2)").
  *
  * Hubs are the top-`k` degree nodes; the label table is one
  * multi-source BFS keyed by hub. With k < n the labeling is an UPPER
  * bound (exact when every shortest path meets a hub — guaranteed at
  * k = n); the exact/approximate trade is the k knob, same as the
  * reference's pruning parameter. The offline cost is one fixpoint;
  * each online query is a broadcast-sized join — the point of the
  * structure at 100 TB.
  */
object HubLabeling {

  /** Label table `(hub, id, dist)` from the top-k degree hubs. */
  def build(g: PropertyGraph, k: Int): DataFrame = {
    val hubs = g.degrees
      .orderBy(desc("degree"), asc("id")).limit(k)
      .select(col("id").as("source"))
    ShortestPaths.bfs(g, hubs)
      .select(col("source").as("hub"), col("id"), col("dist"))
  }

  /** Label table from an EXPLICIT hub set `(source)` — the building
    * block the dynamic variant needs (hub set must stay fixed across
    * graph versions). */
  def buildFrom(g: PropertyGraph, hubs: DataFrame): DataFrame =
    ShortestPaths.bfs(g, hubs)
      .select(col("source").as("hub"), col("id"), col("dist"))

  /** DynPrunedLandmarkLabeling (reference
    * `distance/DynPrunedLandmarkLabeling.hpp:18`, D'Angelo et al., ACM
    * JEA 2019): update the label table after an edge-insertion batch
    * instead of rebuilding. Labels are per-hub BFS states, so the
    * affected-region relaxation of [[ShortestPaths.updateBfsInsert]]
    * applies verbatim — only hubs whose shortest-path tree the new
    * edges can shorten are touched. Result equals a rebuild from the
    * same hubs on the post-insertion graph. */
  def insert(g2: PropertyGraph, labels: DataFrame, newEdges: DataFrame): DataFrame =
    ShortestPaths.updateBfsInsert(g2,
      labels.select(col("hub").as("source"), col("id"), col("dist")), newEdges)
      .select(col("source").as("hub"), col("id"), col("dist"))

  /** Distances for query pairs `(u, v)` via the labels:
    * `(u, v, dist)` where dist = min over hubs of d(h,u)+d(h,v);
    * pairs with no common hub are absent (different components or
    * insufficient k). */
  def query(labels: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(labels.select(col("hub"), col("id").as("u"), col("dist").as("du")), "u")
      .join(labels.select(col("hub"), col("id").as("v"), col("dist").as("dv")),
        Seq("hub", "v"))
      .groupBy("u", "v")
      .agg(min(col("du") + col("dv")).as("dist"))
}
