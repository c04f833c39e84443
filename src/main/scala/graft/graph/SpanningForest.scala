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

  /** Seeded random spanning forest (reference
    * `components/RandomSpanningForest.hpp:21`). The reference samples a
    * UNIFORM spanning tree via Wilson's loop-erased walks — inherently
    * sequential. Spark formulation (documented deviation): Borůvka over
    * i.i.d. hash weights, i.e. a random-MST draw. Every spanning forest
    * has positive probability and the draw is seed-deterministic, but
    * the distribution is not exactly uniform (random-MST ≠ UST). Same
    * O(log n) distributed rounds as [[boruvka]]. Returns the forest
    * edges with their ORIGINAL weights. */
  def randomSpanningForest(g: PropertyGraph, seed: Long = 42): DataFrame = {
    val base = PropertyGraph.canonicalizeUndirected(
      g.edges.filter(col("src") =!= col("dst")))
    val rnd = base.select(col("src"), col("dst"),
      (pmod(xxhash64(lit(seed), col("src"), col("dst")), lit(1L << 40))
        .cast("double") / (1L << 40).toDouble).as("weight"))
    boruvka(PropertyGraph(rnd, directed = false))
      .select("src", "dst")
      .join(base, Seq("src", "dst"))
      .select("src", "dst", "weight")
  }

  /** Maximum spanning forest: Borůvka on negated weights. */
  def maxSpanningForest(g: PropertyGraph, maxIter: Int = 40): DataFrame = {
    val neg = g.edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), (-col("weight")).as("weight"))
    boruvka(PropertyGraph(neg, directed = false), maxIter)
      .select(col("src"), col("dst"), (-col("weight")).as("weight"))
  }

  /** Random maximum-weight spanning forest (reference
    * `graph/RandomMaximumSpanningForest.hpp:18` — Kruskal with the
    * order of equal-weight edges randomized). Spark formulation:
    * replace each weight by its dense descending class rank plus a
    * seed-deterministic hash fraction in [0, 1), then run [[boruvka]]
    * on the composite — minimizing the composite processes classes
    * heaviest-first with a uniform-hash tie-break inside each class,
    * exactly Kruskal's randomized order. The class rank comes from a
    * distributed sortBy + zipWithIndex (no single-partition window).
    * Seed-deterministic; returns forest edges with ORIGINAL weights. */
  def randomMaximumSpanningForest(g: PropertyGraph, seed: Long = 42): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val base = PropertyGraph.canonicalizeUndirected(
      g.edges.filter(col("src") =!= col("dst"))).localCheckpoint(true)
    val wRank = spark.createDataFrame(
      base.select("weight").distinct().sort(desc("weight")).rdd.zipWithIndex
        .map { case (r, i) => (r.getDouble(0), i) }).toDF("weight", "wrank")
    val composite = base.join(wRank, "weight")
      .select(col("src"), col("dst"),
        (col("wrank") + Generators.u01(seed, col("src"), col("dst"))).as("weight"))
    boruvka(PropertyGraph(composite, directed = false))
      .select("src", "dst")
      .join(base, Seq("src", "dst"))
      .select("src", "dst", "weight")
  }

  /** Union of ALL maximum spanning forests (reference
    * `graph/UnionMaximumSpanningForest.hpp:15` — the sparsification
    * backbone). Cut-property characterization: an edge e=(u,v,w) lies in
    * some maximum spanning forest iff u and v are NOT connected by the
    * subgraph of STRICTLY heavier edges. Distributed plan: process
    * weight classes heaviest-first, maintaining CC labels of the
    * heavier-subgraph; a class edge whose endpoints' labels differ is in
    * the union, then the class merges into the labels (contracted CC,
    * the [[boruvka]] merge step). Rounds = #distinct weight classes —
    * the backbone use cases (co-occurrence counts, discretized
    * similarities) have few; continuous weights should be bucketed
    * upstream, as the loop is per class, not per edge. */
  def unionMaximumSpanningForest(g: PropertyGraph): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val base = PropertyGraph.canonicalizeUndirected(
      g.edges.filter(col("src") =!= col("dst")))
      .localCheckpoint(true)
    val weights = base.select("weight").distinct()
      .orderBy(desc("weight")).as[Double].collect()

    var labels = base.select(col("src").as("id"))
      .unionAll(base.select(col("dst").as("id"))).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var umsf = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    for (w <- weights) {
      val cls = base.filter(col("weight") === w)
      val lbl = cls
        .join(labels.select(col("id").as("src"), col("comp").as("cs")), "src")
        .join(labels.select(col("id").as("dst"), col("comp").as("cd")), "dst")
        .localCheckpoint(true)
      umsf = umsf.unionAll(
        lbl.filter(col("cs") =!= col("cd")).select("src", "dst", "weight"))
        .localCheckpoint(true)
      // merge the whole class into the heavier-subgraph labels
      val compEdges = lbl.filter(col("cs") =!= col("cd"))
        .select(col("cs").as("src"), col("cd").as("dst"))
        .withColumn("weight", lit(1.0))
      if (!compEdges.isEmpty) {
        val merged = ConnectedComponents.run(
          PropertyGraph(compEdges, directed = false))
          .select(col("id").as("comp"), col("component").as("newComp"))
        labels = labels.join(merged, Seq("comp"), "left")
          .select(col("id"), coalesce(col("newComp"), col("comp")).as("comp"))
          .localCheckpoint(true)
      }
    }
    umsf
  }
}
