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

  /** Greedy group closeness (reference `GroupCloseness.hpp:24`,
    * Bergamini et al. greedy): grow S minimizing group farness
    * Σ_x d(x, S), where nodes unreachable from every member pay a fixed
    * `penalty`. Candidate pool = top `nCandidates` by degree (same
    * documented deviation as [[groupHarmonicCloseness]]). Farness of a
    * candidate v given the partial group S decomposes as
    * A(v) − C(v) + T(S) + penalty·(n − |R(v) ∪ R(S)|) with
    * A = Σ_{x∈R(v)} min(d_v, d_S), C = Σ_{x∈R(v)∩R(S)} d_S,
    * T = Σ_{x∈R(S)} d_S — all one grouped left join per step, so the
    * oracle can replay it verbatim in SQL. Returns
    * `(rank, id, farness)`. */
  def groupCloseness(g: PropertyGraph, k: Int,
      nCandidates: Int = 16, penalty: Long = 1000000L): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val n = g.vertices.count()
    val cands = g.degrees.orderBy(col("degree").desc, col("id").asc)
      .limit(nCandidates).select(col("id").as("source"))
    val dist = ShortestPaths.bfs(g, cands) // (source, id, dist)
      .persist(StorageLevel.MEMORY_AND_DISK)
    dist.count()

    var dS = spark.emptyDataFrame // (id, d): distance to current S
    var totalS = 0L // T(S)
    var reachedS = 0L // |R(S)|
    val chosen = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    var first = true
    for (rank <- 1 to k) {
      val taken = chosen.map(_._2)
      val remaining =
        if (taken.isEmpty) dist
        else dist.filter(!col("source").isin(taken.toList: _*))
      val scored =
        if (first)
          remaining.groupBy("source")
            .agg((sum("dist") + lit(penalty) * (lit(n) - count(lit(1))))
              .as("farness"))
        else {
          val j = remaining.join(dS, Seq("id"), "left")
          j.groupBy("source").agg(
            (sum(least(col("dist"), coalesce(col("d"), lit(penalty)))) // A
              - sum(when(col("d").isNotNull, col("d")).otherwise(0L)) // - C
              + lit(totalS)
              + lit(penalty) * (lit(n) - (count(lit(1)) + lit(reachedS)
                - sum(when(col("d").isNotNull, 1L).otherwise(0L)))))
              .as("farness"))
        }
      val best = scored.orderBy(col("farness").asc, col("source").asc).limit(1).collect()
      if (best.nonEmpty) {
        val (id, f) = (best(0).getLong(0), best(0).getLong(1))
        chosen += ((rank, id, f))
        val dNew = dist.filter(col("source") === id).select(col("id"), col("dist"))
        dS =
          (if (first) dNew.select(col("id"), col("dist").as("d"))
           else dS.join(dNew, Seq("id"), "full")
             .select(col("id"),
               least(coalesce(col("d"), lit(penalty)),
                 coalesce(col("dist"), lit(penalty))).as("d")))
            .localCheckpoint(true)
        val agg = dS.agg(sum("d"), count(lit(1))).head()
        totalS = agg.getLong(0); reachedS = agg.getLong(1)
        first = false
      }
    }
    dist.unpersist(blocking = false)
    chosen.toSeq.toDF("rank", "id", "farness")
  }

  /** GedWalk group centrality, greedy (reference
    * `centrality/GedWalk.hpp:19`): φ(S) = Σ_{ℓ≥1} α^ℓ · #(ℓ-walks that
    * touch S), computed exactly as total walks minus walks avoiding S,
    * truncated at `maxLen` (the geometric tail the reference bounds
    * with ε). Walks avoiding a set R satisfy the DP
    * x_ℓ(u) = Σ_{w∈N(u)∖R} x_{ℓ-1}(w) on u ∉ R — every greedy step runs
    * the DP once for S and once for ALL candidates simultaneously
    * (state keyed by candidate), so the step cost is 2·maxLen keyed
    * joins regardless of pool size. Candidate pool = top `nCandidates`
    * by degree. Returns `(rank, id, gain)`. */
  def gedWalk(g: PropertyGraph, k: Int, alpha: Double = 0.1,
      maxLen: Int = 4, nCandidates: Int = 8): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val adj = g.adjacency.select("src", "dst")
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    val nodes = g.vertices.select("id").localCheckpoint(true)
    val cands = g.degrees.orderBy(col("degree").desc, col("id").asc)
      .limit(nCandidates).select(col("id").as("cand")).localCheckpoint(true)

    // Σ_ℓ α^ℓ · #ℓ-walks avoiding R, for R = S (one scalar)
    def avoidScoreS(s: Seq[Long]): Double = {
      var x = nodes.filter(if (s.isEmpty) lit(true) else !col("id").isin(s: _*))
        .select(col("id"), lit(1.0).as("x"))
        .localCheckpoint(true)
      var acc = 0.0
      for (l <- 1 to maxLen) {
        x = x.join(adj, x("id") === adj("dst"))
          .filter(if (s.isEmpty) lit(true) else !col("src").isin(s: _*))
          .groupBy(col("src").as("id")).agg(sum("x").as("x"))
          .localCheckpoint(true)
        acc += math.pow(alpha, l) * x.agg(coalesce(sum("x"), lit(0.0))).as[Double].head()
      }
      acc
    }
    // same, keyed per candidate with R = S ∪ {cand}: (cand, score)
    def avoidScoreCands(s: Seq[Long], remaining: DataFrame): DataFrame = {
      var x = remaining.join(nodes, col("id") =!= col("cand"))
        .filter(if (s.isEmpty) lit(true) else !col("id").isin(s: _*))
        .select(col("cand"), col("id"), lit(1.0).as("x"))
        .localCheckpoint(true)
      var acc = remaining.select(col("cand"), lit(0.0).as("score"))
      for (l <- 1 to maxLen) {
        x = x.join(adj, x("id") === adj("dst"))
          .filter(col("src") =!= col("cand"))
          .filter(if (s.isEmpty) lit(true) else !col("src").isin(s: _*))
          .groupBy(col("cand"), col("src").as("id")).agg(sum("x").as("x"))
          .localCheckpoint(true)
        val lv = x.groupBy("cand").agg((sum("x") * math.pow(alpha, l)).as("lv"))
        acc = acc.join(lv, Seq("cand"), "left")
          .select(col("cand"), (col("score") + coalesce(col("lv"), lit(0.0))).as("score"))
          .localCheckpoint(true)
      }
      acc
    }

    val chosen = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    for (rank <- 1 to k) {
      val s = chosen.map(_._2).toSeq
      val base = avoidScoreS(s)
      val remaining = cands.filter(if (s.isEmpty) lit(true) else !col("cand").isin(s: _*))
      val gains = avoidScoreCands(s, remaining)
        .select(col("cand"), (lit(base) - col("score")).as("gain"))
      val best = gains.orderBy(col("gain").desc, col("cand").asc).limit(1).collect()
      if (best.nonEmpty)
        chosen += ((rank, best(0).getLong(0), best(0).getDouble(1)))
    }
    adj.unpersist(blocking = false)
    chosen.toSeq.toDF("rank", "id", "gain")
  }

  /** Multi-seed BFS keyed by an arbitrary group key: `seeds` is
    * `(source, id)` — every row a seed at distance 0 for its key.
    * Returns `(source, id, dist)`. All keys advance in one fixpoint. */
  def groupBfs(g: PropertyGraph, seeds: DataFrame, maxIter: Int = 200): DataFrame = {
    val adj = g.adjacency.select("src", "dst")
      .repartition(col("src")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adj.count()
    var dist = seeds.select(col("source"), col("id"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var i = 0
    var n = frontier.count()
    while (n > 0 && i < maxIter) {
      val cand = frontier.join(adj, frontier("id") === adj("src"))
        .select(col("source"), col("dst").as("id"), (col("dist") + 1).as("dist"))
        .groupBy("source", "id").agg(min("dist").as("dist"))
      val next = cand.join(dist, Seq("source", "id"), "left_anti").localCheckpoint(true)
      n = next.count()
      if (n > 0) { dist = dist.unionAll(next).localCheckpoint(true); frontier = next }
      i += 1
    }
    adj.unpersist(false)
    dist
  }

  /** Grow-Shrink group-closeness local search (reference
    * `centrality/GroupClosenessGrowShrink.hpp:26`, Angriman et al.
    * BigData 2019): starting from `init`, repeatedly try vertex
    * exchanges — remove one member, add one shell candidate — keeping
    * the swap that most decreases group farness Σ_w d(S,w). Every
    * round's candidate swaps are evaluated EXACTLY by one group-BFS
    * fixpoint keyed per swap (|S|·maxCand groups advance together);
    * stops at a local optimum like the reference. Returns `(id)` of the
    * improved group. */
  def growShrink(g: PropertyGraph, init: Seq[Long], maxRounds: Int = 4,
      maxCand: Int = 6): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    var group = init.distinct.sorted
    // Nodes a swap disconnects from the group must not shrink farness:
    // charge every unreached node a distance of nTotal (> any real
    // distance), so disconnecting swaps are never accepted as improvements.
    val nTotal = g.vertices.count()
    def farnessOf(members: Seq[Long]): Double = {
      val r = groupBfs(g, members.map(m => (0L, m)).toDF("source", "id"))
        .agg(sum("dist").cast("double"), count(lit(1))).head
      r.getDouble(0) + (nTotal - r.getLong(1)) * nTotal.toDouble
    }
    var curFarness = farnessOf(group)
    var round = 0
    var improved = true
    while (improved && round < maxRounds) {
      round += 1
      improved = false
      // shell candidates: highest-degree non-members adjacent to the group
      val gDf = group.toDF("id")
      val shell = g.adjacency.select(col("src"), col("dst"))
        .join(gDf.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(gDf.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select(col("dst").as("id")).distinct()
        .join(g.degrees, "id")
        .orderBy(col("degree").desc, col("id").asc).limit(maxCand)
        .select("id").as[Long].collect().toSeq
      val swaps = for {
        (u, ui) <- group.zipWithIndex
        (v, vi) <- shell.zipWithIndex
      } yield (ui.toLong * maxCand + vi, u, v)
      if (swaps.nonEmpty) {
        val seeds = swaps.flatMap { case (sid, u, v) =>
          (group.filterNot(_ == u) :+ v).map(m => (sid, m))
        }.toDF("source", "id")
        val farness = groupBfs(g, seeds)
          .groupBy("source").agg(
            (sum("dist").cast("double") +
              (lit(nTotal) - count(lit(1))) * lit(nTotal.toDouble)).as("f"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val best = swaps.map { case (sid, u, v) =>
          (sid, u, v, farness.getOrElse(sid, Double.MaxValue))
        }.sortBy { case (sid, _, _, f) => (f, sid) }.headOption
        best match {
          case Some((_, u, v, f)) if f < curFarness - 1e-12 =>
            group = (group.filterNot(_ == u) :+ v).sorted
            curFarness = f
            improved = true
          case _ =>
        }
      }
    }
    group.toDF("id")
  }
}
