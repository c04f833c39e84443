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
}
