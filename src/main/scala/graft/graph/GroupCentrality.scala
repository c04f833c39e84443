package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Group centralities (reference `centrality/GroupDegree.hpp:23`,
  * `GroupCloseness.hpp:24`, `GroupHarmonicCloseness.hpp` — greedy
  * submodular maximization). Each greedy step is a join + argmax over
  * the cluster; only the chosen member (one row) ever reaches the
  * driver, so the loops are k driver iterations of distributed work.
  */
object GroupCentrality {

  /** Greedy group degree: grow S one node at a time, each step adding
    * the node covering the most still-uncovered out-neighbors
    * (reference `GroupDegree.hpp:23`; `countGroupNodes = false`
    * semantics — score counts covered nodes outside S). Ties break on
    * smaller id. Returns the members `(rank, id, marginal_gain)`. */
  def groupDegree(g: PropertyGraph, k: Int): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val adj = g.adjacency.select("src", "dst")
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    var covered = spark.emptyDataset[Long].toDF("id") // N(S) ∪ S
    val chosen = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    for (rank <- 1 to k) {
      val taken = chosen.map(_._2)
      val gain = adj
        .join(covered.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("gain"))
        .filter(if (taken.isEmpty) lit(true) else !col("id").isin(taken.toList: _*))
      val best = gain.orderBy(col("gain").desc, col("id").asc).limit(1).collect()
      if (best.nonEmpty) {
        val (id, gv) = (best(0).getLong(0), best(0).getLong(1))
        chosen += ((rank, id, gv))
        val newCovered = adj.filter(col("src") === id).select(col("dst").as("id"))
          .unionAll(Seq(id).toDF("id"))
        covered = covered.unionAll(newCovered).distinct().localCheckpoint(true)
      }
    }
    adj.unpersist(blocking = false)
    chosen.toSeq.toDF("rank", "id", "marginal_gain")
  }

  /** Greedy group harmonic closeness over a candidate pool (reference
    * `GroupHarmonicCloseness.hpp` greedy): distances from every
    * candidate are computed once by one multi-source BFS; each greedy
    * step scores Σ_x 1/d(x, S ∪ {v}) per remaining candidate with a
    * join + aggregate and keeps the argmax. The candidate pool (top
    * `nCandidates` by degree, ties by id) is the documented deviation
    * from the reference's exhaustive pruned search. */
  def groupHarmonicCloseness(g: PropertyGraph, k: Int,
      nCandidates: Int = 16): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val cands = g.degrees.orderBy(col("degree").desc, col("id").asc)
      .limit(nCandidates).select(col("id").as("source"))
    val dist = ShortestPaths.bfs(g, cands) // (source, id, dist)
      .persist(StorageLevel.MEMORY_AND_DISK)
    dist.count()

    var dS = spark.emptyDataFrame // (id, d) distance to current S
    val chosen = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    var first = true
    for (rank <- 1 to k) {
      val taken = chosen.map(_._2)
      val remaining =
        if (taken.isEmpty) dist
        else dist.filter(!col("source").isin(taken.toList: _*))
      // score(v) = Σ_{x ≠ v, x ∉ S} 1 / min(dS(x), d_v(x)), d(x,x)=0 excluded
      val scored =
        if (first)
          remaining.filter(col("dist") > 0)
            .groupBy(col("source"))
            .agg(sum(lit(1.0) / col("dist")).as("score"))
        else {
          val j = remaining.join(dS.select(col("id"), col("d")), Seq("id"), "left")
          j.withColumn("dmin", least(coalesce(col("d"), lit(Long.MaxValue)), col("dist")))
            .filter(col("dmin") > 0)
            .groupBy(col("source"))
            .agg(sum(lit(1.0) / col("dmin")).as("score"))
        }
      val best = scored.orderBy(col("score").desc, col("source").asc).limit(1).collect()
      if (best.nonEmpty) {
        val (id, sc) = (best(0).getLong(0), best(0).getDouble(1))
        chosen += ((rank, id, sc))
        val dNew = dist.filter(col("source") === id).select(col("id"), col("dist"))
        dS =
          (if (first) dNew.select(col("id"), col("dist").as("d"))
           else dS.join(dNew, Seq("id"), "full")
             .select(col("id"),
               least(coalesce(col("d"), lit(Long.MaxValue)),
                 coalesce(col("dist"), lit(Long.MaxValue))).as("d")))
            .localCheckpoint(true)
        first = false
      }
    }
    dist.unpersist(blocking = false)
    chosen.toSeq.toDF("rank", "id", "group_score")
  }
}
