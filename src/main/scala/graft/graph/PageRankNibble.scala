package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank-Nibble local community detection (reference
  * `scd/PageRankNibble.hpp:25` — Andersen–Chung–Lang personalized-
  * PageRank sweep, with `scd/ApproximatePageRank.hpp` supplying the PPR
  * vector).
  *
  * Spark realization: the PPR vector comes from `iters` fixed power
  * iterations of the personalized walk r ← (1−α)·e_s + α·Pᵀr (the
  * reference's push algorithm is an ε-early-exit of the same fixpoint;
  * fixed iterations make the result order-independent and exactly
  * replayable in SQL). The sweep orders nodes by r/deg — rounded to 9
  * digits with id tie-break so both engines sort identically (zipRank,
  * not a single-partition window) — and the conductance of every prefix
  * follows from two cumulative sums, vol(k) = Σ_{rank≤k} deg and
  * intw(k) = Σ_{edges, max(rank_u,rank_v)≤k} w: the |E|-sized
  * internal-mass aggregation stays distributed, while the cumsums over
  * the ≤ maxSweep ranked rows finish driver-side (k-row bounded; a
  * window version would plan a single-partition WindowExec).
  */
object PageRankNibble {

  /** Returns one row per sweep prefix `(k, id, conductance)` up to
    * `maxSweep`, plus the chosen best set is the prefix minimizing
    * conductance (ties → smallest k). Callers typically take
    * `bestPrefix` below. */
  def sweep(g: PropertyGraph, seed: Long, alpha: Double = 0.85,
      iters: Int = 20, maxSweep: Int = 50): DataFrame = {
    val spark = g.edges.sparkSession
    val adj = g.adjacency.select("src", "dst", "weight")
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val deg = adj.groupBy(col("src").as("id")).agg(sum("weight").as("d"))
      .localCheckpoint(true)
    val m2 = deg.agg(sum("d")).head.getDouble(0)

    // personalized PageRank by fixed power iteration
    var r = deg.select(col("id"),
      when(col("id") === seed, lit(1.0)).otherwise(lit(0.0)).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val push = r.join(deg, "id")
        .join(adj, r("id") === adj("src"))
        .select(col("dst").as("id"), (col("r") * col("weight") / col("d")).as("m"))
        .groupBy("id").agg(sum("m").as("inMass"))
      r = deg.select("id").join(push, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - alpha) * when(col("id") === seed, 1.0).otherwise(0.0)
            + lit(alpha) * coalesce(col("inMass"), lit(0.0))).as("r"))
        .localCheckpoint(true)
    }

    // sweep order: r/deg desc (rounded for cross-engine determinism).
    // The APR support is push-bounded (O(1/αε)) but rank it distributed
    // anyway — zipRank, not a single-partition window (the last survivor
    // of that family, retired round 10)
    val ranked = Ranks.zipRank(
        r.join(deg, "id").filter(col("r") > 0)
          .withColumn("key", round(col("r") / col("d"), 9)),
        Seq(col("key").desc, col("id").asc), "rank", base = 1L)
      .filter(col("rank") <= maxSweep)
      .localCheckpoint(true)

    val ranks = ranked.select(col("id"), col("rank"))
    // internal-edge mass per prefix boundary stays DISTRIBUTED (|E|-sized
    // join); only the ≤ maxSweep-row cumulative sweep finishes on the
    // driver — k-row bounded, and it removes the last unpartitioned
    // Window from this plan (the cumsums ran over ≤ maxSweep rows but
    // still planned a single-partition WindowExec)
    val internal = adj
      .join(ranks.withColumnRenamed("id", "src").withColumnRenamed("rank", "ru"), "src")
      .join(ranks.withColumnRenamed("id", "dst").withColumnRenamed("rank", "rv"), "dst")
      .filter(col("ru") < col("rv")) // each undirected edge once
      .groupBy(greatest(col("ru"), col("rv")).as("rank"))
      .agg(sum("weight").as("iw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = ranked.select(col("rank"), col("id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    var vol = 0.0
    var iwc = 0.0
    val sweepRows = rows.map { case (rank, id, d) =>
      vol += d
      iwc += internal.getOrElse(rank, 0.0)
      val cut = vol - 2.0 * iwc
      val denom = math.min(vol, m2 - vol)
      val cond = if (denom > 0) cut / denom else 1.0
      (rank, id, cond)
    }
    import spark.implicits._
    sweepRows.toSeq.toDF("k", "id", "conductance")
  }

  /** The best sweep prefix: `(members..., best_k, best_conductance)`
    * condensed to one row of summary stats for the oracle surface. */
  def bestPrefix(g: PropertyGraph, seed: Long, alpha: Double = 0.85,
      iters: Int = 20, maxSweep: Int = 50): DataFrame = {
    val sw = sweep(g, seed, alpha, iters, maxSweep).localCheckpoint(true)
    val best = sw.orderBy(col("conductance").asc, col("k").asc).limit(1)
      .select(col("k").as("best_k"), round(col("conductance"), 6).as("best_conductance"))
    best
  }
}
