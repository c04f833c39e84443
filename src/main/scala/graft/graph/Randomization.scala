package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Degree-preserving graph randomization (reference
  * `randomization/EdgeSwitching.hpp`, `GlobalCurveball.hpp:24` — both
  * sample the fixed-degree-sequence ensemble).
  *
  * Spark-first realization of edge switching: each round hash-pairs the
  * edges, proposes the double-edge swap (a,b)+(c,d) → (a,d)+(c,b), and
  * REJECTS any proposal that would create a self-loop, a duplicate of
  * an existing edge, or collide with another simultaneous proposal —
  * rejected pairs keep their original edges. Every accepted swap is a
  * local degree-preserving rewiring and rejections change nothing, so
  * the degree sequence is invariant by construction (the oracle checks
  * exactly that). All checks are joins/group-bys; no sequential swap
  * list (the documented deviation from the reference's sequential
  * Markov chain — same stationary ensemble, parallel-safe steps).
  */
object Randomization {

  private def round(edges: DataFrame, seed: Long): DataFrame = {
    // pair edges by hashed rank: 2k with 2k+1
    val ranked = edges.withColumn("r",
      row_number().over(Window.orderBy(
        xxhash64(lit(seed), col("src"), col("dst")), col("src"), col("dst")))
        .cast("long") - 1)
    val a = ranked.filter(col("r") % 2 === 0)
      .select(expr("r div 2").as("p"), col("src").as("a"), col("dst").as("b"))
    val bDf = ranked.filter(col("r") % 2 === 1)
      .select(expr("r div 2").as("p"), col("src").as("c"), col("dst").as("d"))
    val pairs = a.join(bDf, "p")
    val unpaired = a.join(bDf, Seq("p"), "left_anti")
      .select(col("a").as("src"), col("b").as("dst"))

    // proposal: swap targets, direction chosen by a hash bit
    val prop = pairs.withColumn("flip",
        pmod(xxhash64(lit(seed + 1), col("p")), lit(2)) === 0)
      .withColumn("n1s", when(col("flip"), col("a")).otherwise(col("a")))
      .withColumn("n1d", when(col("flip"), col("d")).otherwise(col("c")))
      .withColumn("n2s", when(col("flip"), col("c")).otherwise(col("b")))
      .withColumn("n2d", when(col("flip"), col("b")).otherwise(col("d")))
      .withColumn("e1s", least(col("n1s"), col("n1d")))
      .withColumn("e1d", greatest(col("n1s"), col("n1d")))
      .withColumn("e2s", least(col("n2s"), col("n2d")))
      .withColumn("e2d", greatest(col("n2s"), col("n2d")))
      // structural validity: 4 distinct endpoints, no self loops, and the
      // two proposed edges differ
      .withColumn("valid",
        col("n1s") =!= col("n1d") && col("n2s") =!= col("n2d") &&
          !(col("e1s") === col("e2s") && col("e1d") === col("e2d")) &&
          col("a") =!= col("c") && col("a") =!= col("d") &&
          col("b") =!= col("c") && col("b") =!= col("d"))

    // reject proposals whose new edges already exist in the graph
    val existing = edges.select(col("src").as("es"), col("dst").as("ed"))
    val hit1 = prop.join(existing,
      col("e1s") === col("es") && col("e1d") === col("ed"), "left_semi")
      .select(col("p")).withColumn("badExisting", lit(true))
    val hit2 = prop.join(existing,
      col("e2s") === col("es") && col("e2d") === col("ed"), "left_semi")
      .select(col("p")).withColumn("badExisting", lit(true))
    val badExisting = hit1.unionAll(hit2).distinct()

    // reject proposals whose new edges collide with other proposals
    val proposed = prop.filter(col("valid"))
      .select(col("p"), col("e1s").as("s"), col("e1d").as("d2"))
      .unionAll(prop.filter(col("valid"))
        .select(col("p"), col("e2s").as("s"), col("e2d").as("d2")))
    val collisions = proposed.groupBy("s", "d2").agg(collect_list("p").as("ps"))
      .filter(size(col("ps")) > 1)
      .select(explode(col("ps")).as("p")).distinct()

    val rejected = badExisting.select("p").unionAll(collisions).distinct()
    val accepted = prop.filter(col("valid"))
      .join(rejected, Seq("p"), "left_anti")
    val keptPairs = prop.join(accepted.select("p"), Seq("p"), "left_anti")
      .select(col("a").as("src"), col("b").as("dst"))
      .unionAll(prop.join(accepted.select("p"), Seq("p"), "left_anti")
        .select(col("c").as("src"), col("d").as("dst")))
    val swapped = accepted.select(col("e1s").as("src"), col("e1d").as("dst"))
      .unionAll(accepted.select(col("e2s").as("src"), col("e2d").as("dst")))
    swapped.unionAll(keptPairs).unionAll(unpaired)
  }

  /** `rounds` simultaneous edge-switching rounds; node set and degree
    * sequence preserved exactly. */
  def edgeSwitching(g: PropertyGraph, rounds: Int = 5,
      seed: Long = 42): PropertyGraph = {
    var edges = PropertyGraph.canonicalizeUndirected(
        g.edges.filter(col("src") =!= col("dst")))
      .select("src", "dst").distinct()
      .localCheckpoint(true)
    for (r <- 0 until rounds)
      edges = round(edges, seed + 1000L * r).localCheckpoint(true)
    PropertyGraph(edges.withColumn("weight", lit(1.0)),
      directed = false, g.verticesOpt)
  }
}
