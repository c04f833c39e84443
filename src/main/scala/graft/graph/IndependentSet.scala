package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Luby's maximal independent set (reference:
  * `independentset/Luby.hpp:20` — "textbook Spark-friendly",
  * SURVEY.md §2.9): each round active nodes draw a deterministic
  * priority `xxhash64(seed, round, id)`; local minima join the MIS,
  * they and their neighbors deactivate; O(log n) rounds w.h.p.
  */
object IndependentSet {

  /** MIS members `(id)`. */
  def luby(g: PropertyGraph, seed: Long = 42, maxIter: Int = 60): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    var active = g.vertices.select("id").localCheckpoint(true)
    var adj = g.adjacency.select("src", "dst")
      .filter(col("src") =!= col("dst")).localCheckpoint(true)
    var mis = Seq.empty[Long].toDF("id")
    var round = 0
    var done = false
    while (!done && round < maxIter) {
      if (active.isEmpty) done = true
      else {
        val prio = active.select(col("id"),
          xxhash64(lit(seed), lit(round), col("id")).as("p"))
        // a node wins if its priority beats every active neighbor's
        val nbrBest = adj
          .join(prio.select(col("id").as("dst"), col("p").as("pn")), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(struct(col("pn"), col("dst"))).as("best"))
          .select(col("id"), col("best.pn").as("minNbrP"), col("best.dst").as("minNbrId"))
        val winners = prio.join(nbrBest, Seq("id"), "left")
          .filter(col("minNbrP").isNull ||
            col("p") < col("minNbrP") ||
            (col("p") === col("minNbrP") && col("id") < col("minNbrId")))
          .select("id")
          .localCheckpoint(true)
        mis = mis.unionAll(winners).localCheckpoint(true)
        // deactivate winners and their neighbors
        val killed = winners.unionAll(
          adj.join(winners.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .select(col("dst").as("id")))
          .distinct()
        active = active.join(killed, Seq("id"), "left_anti").localCheckpoint(true)
        adj = adj
          .join(killed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(killed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst")
          .localCheckpoint(true)
        round += 1
      }
    }
    mis
  }

  /** Validity check: 1-row `(n_members, n_violations, is_maximal)`. */
  def validate(g: PropertyGraph, mis: DataFrame): DataFrame = {
    val adj = g.adjacency.select("src", "dst").filter(col("src") =!= col("dst"))
    val violations = adj
      .join(mis.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(mis.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .count()
    // maximal: every non-member has a member neighbor
    val uncovered = g.vertices.select("id")
      .join(mis, Seq("id"), "left_anti")
      .join(adj.join(mis.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select(col("src").as("id")).distinct(),
        Seq("id"), "left_anti")
      .count()
    val spark = g.edges.sparkSession
    import spark.implicits._
    Seq((mis.count(), violations, uncovered == 0)).toDF("n_members", "n_violations", "is_maximal")
  }
}
