package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge scoring + sparsification (reference:
  * `edgescores/TriangleEdgeScore.cpp`, `sparsification/
  * GlobalThresholdFilter.hpp:18`, `LocalDegreeScore`, `Sparsifiers.hpp`
  * composite pipelines; SURVEY.md §2.2/§2.8/§2.9).
  * Scores are plain columns on the edge table; a sparsifier is
  * score → filter — the canonical projection+filter pipeline, fully
  * Catalyst-visible.
  */
object Sparsification {

  /** Triangles per edge (reference `TriangleEdgeScore`): number of
    * common neighbors of the endpoints. `(src, dst, weight, score)` */
  def triangleScore(g: PropertyGraph): DataFrame = {
    // canonicalize the stored edges (NOT the doubled adjacency view —
    // that would double every weight)
    val e = PropertyGraph.canonicalizeUndirected(
      g.edges.filter(col("src") =!= col("dst")))
    val adj = e.select("src", "dst")
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val cn = adj.select(col("dst").as("u"), col("src").as("w"))
      .join(adj.select(col("src").as("w"), col("dst").as("v")), "w")
      .filter(col("u") < col("v"))
      .groupBy(col("u").as("src"), col("v").as("dst"))
      .agg(count(lit(1)).as("score"))
    e.join(cn, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), col("weight"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Jaccard similarity per edge (reference `SCANStructuralSimilarity`
    * family): |N(u)∩N(v)| / |N(u)∪N(v)|. */
  def jaccardScore(g: PropertyGraph): DataFrame = {
    val t = triangleScore(g)
    val deg = g.degrees
    t.join(deg.select(col("id").as("src"), col("degree").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dd")), "dst")
      .select(col("src"), col("dst"), col("weight"),
        (col("score") / (col("ds") + col("dd") - col("score"))).as("score"))
  }

  /** Random edge score, seed-deterministic (reference
    * `RandomEdgeScore`). */
  def randomScore(g: PropertyGraph, seed: Long = 42): DataFrame =
    g.edges.select(col("src"), col("dst"), col("weight"),
      (pmod(xxhash64(lit(seed), col("src"), col("dst")), lit(1L << 40)) /
        lit((1L << 40).toDouble)).as("score"))

  /** Keep edges with score ≥ (or >) threshold (reference
    * `GlobalThresholdFilter.hpp:18` — the canonical filter). */
  def globalThresholdFilter(scored: DataFrame, threshold: Double,
      above: Boolean = true): PropertyGraph = {
    val kept = scored.filter(
      if (above) col("score") >= threshold else col("score") <= threshold)
    PropertyGraph(kept.select("src", "dst", "weight"), directed = false)
  }

  /** Use a score column as the edge weight (reference
    * `EdgeScoreAsWeight.hpp:16`). */
  def scoreAsWeight(scored: DataFrame): PropertyGraph =
    PropertyGraph(scored.select(col("src"), col("dst"),
      col("score").cast("double").as("weight")), directed = false)

  /** Min-max normalize a score column to [lo, hi] (reference
    * `EdgeScoreNormalizer.hpp:17`). */
  def normalizeScore(scored: DataFrame, lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    val r = scored.agg(min("score"), max("score")).head
    val (mn, mx) = (r.getAs[Any](0).toString.toDouble, r.getAs[Any](1).toString.toDouble)
    val span = if (mx == mn) 1.0 else mx - mn
    scored.withColumn("score",
      lit(lo) + (col("score") - mn) / span * (hi - lo))
  }
}
