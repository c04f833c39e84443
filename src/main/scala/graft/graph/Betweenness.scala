package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Betweenness centrality, Brandes' algorithm (reference:
  * `centrality/Betweenness.hpp:18`, approx variants
  * `ApproxBetweenness.hpp:21` / `EstimateBetweenness.hpp:23`).
  *
  * Strategy from SURVEY.md §2.9: distribute over SOURCES — the
  * adjacency is grouped to arrays *distributedly* (one shuffle), the
  * driver collects exactly one row per node (driver memory bound:
  * O(n + m) once, no intermediate pair array), the map is broadcast,
  * and each task runs the sequential per-source BFS + dependency
  * accumulation locally. Per-source partial dependency vectors meet in
  * one final groupBy-sum.
  *
  * Defaults are scale-safe: above `sampleSources` sources the
  * EstimateBetweenness variant runs (scores scaled n/|S|); pass
  * `sampleSources = None` for the exact algorithm on every source, or
  * `sourceIds` for a fixed, unscaled source set (oracle surface).
  */
object Betweenness {

  def run(g: PropertyGraph, normalized: Boolean = false,
      sampleSources: Option[Int] = Some(1024), seed: Long = 42,
      sourceIds: Option[Seq[Long]] = None): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._

    // group to adjacency arrays on the cluster; one collected row per node
    val adjRows = g.adjacency.select(col("src"), col("dst"))
      .groupBy("src").agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      .as[(Long, Seq[Long])].collect()
    val adjMap: Map[Long, Array[Long]] =
      adjRows.iterator.map { case (k, v) => k -> v.toArray }.toMap
    val nodes = g.vertices.select("id").as[Long].collect().sorted
    val n = nodes.length
    val bcAdj = spark.sparkContext.broadcast(adjMap)

    val sources = sourceIds match {
      case Some(ids) => ids.toArray
      case None => sampleSources match {
        case Some(s) if s < n =>
          nodes.sortBy(id => (scala.util.hashing.MurmurHash3.productHash((seed, id)), id)).take(s)
        case _ => nodes
      }
    }
    // fixed source sets report raw (unscaled) dependency sums
    val scale = if (sourceIds.isDefined) 1.0 else n.toDouble / sources.length

    val partials = spark.sparkContext.parallelize(sources.toSeq, math.min(sources.length, 64))
      .flatMap { s =>
        val adj = bcAdj.value
        // Brandes single-source: BFS orders, path counts, dependency back-prop
        val dist = scala.collection.mutable.HashMap[Long, Int](s -> 0)
        val sigma = scala.collection.mutable.HashMap[Long, Double](s -> 1.0)
        val preds = scala.collection.mutable.HashMap[Long, List[Long]]()
        val order = scala.collection.mutable.ArrayBuffer[Long]()
        val queue = scala.collection.mutable.Queue[Long](s)
        while (queue.nonEmpty) {
          val v = queue.dequeue()
          order += v
          for (w <- adj.getOrElse(v, Array.empty)) {
            if (!dist.contains(w)) {
              dist(w) = dist(v) + 1
              queue.enqueue(w)
            }
            if (dist(w) == dist(v) + 1) {
              sigma(w) = sigma.getOrElse(w, 0.0) + sigma(v)
              preds(w) = v :: preds.getOrElse(w, Nil)
            }
          }
        }
        val delta = scala.collection.mutable.HashMap[Long, Double]()
        order.reverseIterator.foreach { w =>
          for (v <- preds.getOrElse(w, Nil))
            delta(v) = delta.getOrElse(v, 0.0) +
              sigma(v) / sigma(w) * (1.0 + delta.getOrElse(w, 0.0))
        }
        delta.iterator.filter(_._1 != s).map { case (v, d) => (v, d) }
      }
      .toDF("id", "partial")

    val raw = partials.groupBy("id").agg(sum("partial").as("score"))
    val full = g.vertices.select("id").join(raw, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"), lit(0.0)).as("score"))
    // undirected graphs count each pair twice (reference divides by 2);
    // sampled variant scales up by n/|S|
    val div = (if (g.directed) 1.0 else 2.0) / scale
    val scaled = full.select(col("id"), (col("score") / div).as("score"))
    if (!normalized) scaled
    else {
      val norm = (n - 1).toDouble * (n - 2).toDouble / (if (g.directed) 1.0 else 2.0)
      scaled.select(col("id"), (col("score") / norm).as("score"))
    }
  }

  /** KADABRA-style sampled betweenness (reference
    * `centrality/KadabraBetweenness.hpp:82`): bc(v)/(n(n−1)) estimated
    * as the fraction of sampled (s,t) uniform shortest paths whose
    * interior contains v. The sample budget is KADABRA's worst-case
    * bound w = (log₂(diamGuess−2) + ln(2/δ)) / err² up front instead of
    * the reference's adaptive stopping schedule (deviation documented:
    * the bound dominates every adaptive stop, so the (err, δ) guarantee
    * holds a fortiori).
    *
    * Fully distributed, unlike [[run]]'s broadcast-adjacency design:
    * one multi-source COUNTED BFS from the distinct sampled sources
    * ([[Paths.bfsCounted]] — σ rides the frontier), then all samples
    * walk backward from t simultaneously; each hop picks every sample's
    * predecessor with probability σ_w/Σσ via a windowed cumulative sum.
    * Nothing graph-sized ever reaches the driver. `(id, kadabra)`. */
  def kadabra(g: PropertyGraph, err: Double = 0.1, delta: Double = 0.1,
      diamGuess: Int = 32, seed: Long = 42, maxHops: Int = 64): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val nSamples = math.ceil(
      (math.log(math.max(diamGuess - 2, 2).toDouble) / math.log(2.0)
        + math.log(2.0 / delta)) / (err * err)).toLong
    val n = g.vertices.count()

    // indexable node table for uniform draws
    val ranked = g.vertices.select("id").withColumn("r",
      row_number().over(Window.orderBy("id")).cast("long") - 1)
      .localCheckpoint(true)
    val draws = spark.range(nSamples)
      .select(col("id").as("i"),
        pmod(xxhash64(lit(seed), col("id")), lit(n)).as("rs"),
        pmod(xxhash64(lit(seed ^ 99), col("id")), lit(n)).as("rt"))
    val pairs = draws
      .join(ranked.select(col("r").as("rs"), col("id").as("s")), "rs")
      .join(ranked.select(col("r").as("rt"), col("id").as("t")), "rt")
      .filter(col("s") =!= col("t"))
      .select("i", "s", "t").localCheckpoint(true)
    val mEff = pairs.count() // uniform over ordered pairs with s ≠ t

    val sources = pairs.select(col("s").as("source")).distinct()
    val dist = Paths.bfsCounted(g, sources)
      .select(col("source"), col("id"), col("dist"),
        col("sigma").cast("double").as("sigma"))
      .repartition(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dist.count()
    val adj = g.adjacency.select(col("src"), col("dst"))
      .repartition(col("src")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adj.count()

    // live samples: t reachable at distance ≥ 2 (shorter paths have no interior)
    var state = pairs
      .join(dist.select(col("source").as("s"), col("id").as("t"), col("dist").as("dcur")),
        Seq("s", "t"))
      .filter(col("dcur") >= 2)
      .select(col("i"), col("s"), col("t").as("cur"), col("dcur"))
      .localCheckpoint(true)
    var hits = spark.emptyDataset[(Long, Long)].toDF("i", "v")
    var hop = 0
    var live = state.count()
    while (live > 0 && hop < maxHops) {
      val preds = state
        .join(adj, state("cur") === adj("src"))
        .join(dist,
          dist("source") === state("s") && dist("id") === adj("dst") &&
            dist("dist") === state("dcur") - 1)
        .select(col("i"), col("s"), col("id").as("w"),
          (col("dcur") - 1).as("dw"), col("sigma"))
      // weighted pick: first w in hash order whose cumulative σ crosses
      // r·total, r deterministic per (sample, hop)
      val ord = Window.partitionBy("i").orderBy(xxhash64(lit(seed + hop), col("w")), col("w"))
      val tot = Window.partitionBy("i")
      val picked = preds
        .withColumn("cum", sum("sigma").over(ord))
        .withColumn("total", sum("sigma").over(tot))
        .withColumn("r", pmod(xxhash64(lit(seed ^ 1234 + hop), col("i")), lit(1L << 40))
          .cast("double") / (1L << 40).toDouble)
        .filter(col("cum") >= col("r") * col("total"))
        .withColumn("rn", row_number().over(ord))
        .filter(col("rn") === 1)
        .select(col("i"), col("s"), col("w"), col("dw"))
        .localCheckpoint(true)
      hits = hits.unionAll(picked.select(col("i"), col("w").as("v"))).localCheckpoint(true)
      state = picked.filter(col("dw") >= 2)
        .select(col("i"), col("s"), col("w").as("cur"), col("dw").as("dcur"))
        .localCheckpoint(true)
      live = state.count()
      hop += 1
    }
    dist.unpersist(false); adj.unpersist(false)

    val counts = hits.groupBy(col("v").as("id")).agg(count(lit(1)).as("c"))
    g.vertices.select("id").join(counts, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("c"), lit(0L)).cast("double") / mEff.toDouble).as("kadabra"))
  }
}
