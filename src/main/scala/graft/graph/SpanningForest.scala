package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Minimum spanning forest via Borůvka rounds (reference:
  * `graph/KruskalMSF.hpp:21`, `PrimMSF.hpp:25`,
  * `graph/SpanningForest.hpp:20` — Kruskal's union-find is sequential;
  * Borůvka is the distributable formulation, SURVEY.md §2.9).
  *
  * Each round every component selects its minimum-weight outgoing edge
  * (ties broken on (weight, src, dst) for determinism), the selected
  * edges merge components (a small CC on the component graph), and at
  * most log₂(n) rounds remain.
  */
object SpanningForest {

  /** MSF edges `(src, dst, weight)` (canonical src < dst). */
  def boruvka(g: PropertyGraph, maxIter: Int = 40): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val base = PropertyGraph.canonicalizeUndirected(
      g.edges.filter(col("src") =!= col("dst")))
      .localCheckpoint(true)

    var labels = base.select(col("src").as("id"))
      .unionAll(base.select(col("dst").as("id"))).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var forest = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val lbl = base
        .join(labels.select(col("id").as("src"), col("comp").as("cs")), "src")
        .join(labels.select(col("id").as("dst"), col("comp").as("cd")), "dst")
        .filter(col("cs") =!= col("cd"))
      if (lbl.isEmpty) done = true
      else {
        // min outgoing edge per component (from either side)
        val out = lbl.select(col("cs").as("comp"), col("src"), col("dst"), col("weight"))
          .unionAll(lbl.select(col("cd").as("comp"), col("src"), col("dst"), col("weight")))
        val w = Window.partitionBy("comp")
          .orderBy(col("weight").asc, col("src").asc, col("dst").asc)
        val chosen = out.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("src"), col("dst"), col("weight"))
          .distinct()
          .localCheckpoint(true)
        forest = forest.unionAll(chosen).distinct().localCheckpoint(true)
        // merge components: CC over the contracted component graph
        val compEdges = chosen
          .join(labels.select(col("id").as("src"), col("comp").as("cs")), "src")
          .join(labels.select(col("id").as("dst"), col("comp").as("cd")), "dst")
          .select(col("cs").as("src"), col("cd").as("dst"))
          .withColumn("weight", lit(1.0))
        val merged = ConnectedComponents.run(
          PropertyGraph(compEdges, directed = false))
          .select(col("id").as("comp"), col("component").as("newComp"))
        labels = labels.join(merged, Seq("comp"), "left")
          .select(col("id"), coalesce(col("newComp"), col("comp")).as("comp"))
          .localCheckpoint(true)
        i += 1
      }
    }
    forest
  }

  /** Total MSF weight, 1-row `(msf_weight, n_edges)`. */
  def totalWeight(g: PropertyGraph): DataFrame =
    boruvka(g).agg(
      round(coalesce(sum("weight"), lit(0.0)), 6).as("msf_weight"),
      count(lit(1)).as("n_edges"))
}
