package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-prediction indices over candidate 2-hop pairs (reference:
  * `include/networkit/linkprediction/` headers — CommonNeighborsIndex,
  * JaccardIndex, AdamicAdarIndex, ResourceAllocationIndex,
  * PreferentialAttachmentIndex, TotalNeighborsIndex…).
  *
  * The candidate pair set is every unordered pair with ≥1 common
  * neighbor (the only pairs where intersection-based indices are
  * non-zero): one self-join of the adjacency on the shared middle node —
  * with degree-bounded fan-out this is the same shuffle shape as
  * triangle counting and survives skew the same way.
  */
object LinkPrediction {

  /** Simple symmetric adjacency (dedup, loop-free). */
  private def sym(g: PropertyGraph): DataFrame = {
    val e = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def degrees(g: PropertyGraph): DataFrame =
    sym(g).groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** `(u, v, cn)` for all pairs u < v with ≥1 common neighbor
    * (reference `CommonNeighborsIndex.hpp:22`). */
  def commonNeighbors(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val left = s.select(col("dst").as("u"), col("src").as("w"))
    val right = s.select(col("src").as("w"), col("dst").as("v"))
    left.join(right, "w").filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
  }

  /** Jaccard index cn/|N(u) ∪ N(v)| (reference `JaccardIndex.hpp`). */
  def jaccard(g: PropertyGraph): DataFrame = {
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .select(col("u"), col("v"),
        (col("cn") / (col("du") + col("dv") - col("cn"))).as("jaccard"))
  }

  /** Adamic-Adar Σ_w 1/ln(deg(w)) over common neighbors w
    * (reference `AdamicAdarIndex.hpp`). */
  def adamicAdar(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val deg = degrees(g)
    val left = s.select(col("dst").as("u"), col("src").as("w"))
    val right = s.select(col("src").as("w"), col("dst").as("v"))
    left.join(right, "w").filter(col("u") < col("v"))
      .join(deg.select(col("id").as("w"), col("degree").as("dw")), "w")
      .groupBy("u", "v").agg(sum(lit(1.0) / log(col("dw"))).as("adamic_adar"))
  }

  /** Resource allocation Σ_w 1/deg(w) (reference
    * `ResourceAllocationIndex.hpp`). */
  def resourceAllocation(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val deg = degrees(g)
    val left = s.select(col("dst").as("u"), col("src").as("w"))
    val right = s.select(col("src").as("w"), col("dst").as("v"))
    left.join(right, "w").filter(col("u") < col("v"))
      .join(deg.select(col("id").as("w"), col("degree").as("dw")), "w")
      .groupBy("u", "v").agg(sum(lit(1.0) / col("dw")).as("resource_allocation"))
  }

  /** Preferential attachment deg(u)·deg(v) over candidate pairs
    * (reference `PreferentialAttachmentIndex.hpp`). */
  def preferentialAttachment(g: PropertyGraph): DataFrame = {
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .select(col("u"), col("v"), (col("du") * col("dv")).as("pref_attach"))
  }

  /** The full per-pair index sheet over candidate pairs: common
    * neighbors, total neighbors |N(u) ∪ N(v)| (reference
    * `TotalNeighborsIndex.hpp:29`), U/V degrees (`UDegreeIndex.hpp:27`,
    * `VDegreeIndex.hpp:27`), neighborhood distance cn/√(du·dv)
    * (`NeighborhoodDistanceIndex.hpp` runImpl), preferential attachment
    * — one candidate-pair join feeding five one-line projections. */
  def indexSheet(g: PropertyGraph): DataFrame = {
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        (col("du") + col("dv") - col("cn")).as("total_nbrs"),
        col("du").as("u_degree"), col("dv").as("v_degree"),
        (col("cn") / sqrt(col("du") * col("dv"))).as("nbr_distance"),
        (col("du") * col("dv")).as("pref_attach"))
  }

  /** SameCommunityIndex (reference `SameCommunityIndex.hpp`,
    * `SameCommunityIndex.cpp:28`): 1 iff both endpoints share a label
    * under `partition (id, community)`. */
  def sameCommunity(pairs: DataFrame, partition: DataFrame): DataFrame =
    pairs
      .join(partition.select(col("id").as("u"), col("community").as("cu")), "u")
      .join(partition.select(col("id").as("v"), col("community").as("cv")), "v")
      .withColumn("same_community",
        when(col("cu") === col("cv"), 1L).otherwise(0L))
      .drop("cu", "cv")

  /** AdjustedRandIndex (reference `AdjustedRandIndex.cpp:14-41`). Note
    * the reference computes its `uDifference`/`vDifference` terms with
    * `std::set_union` (lines 27-32), so b = c = |N(u) ∪ N(v)| — we
    * replicate that behavior, not the textbook difference sets. With
    * a = cn, b = c = un, d = n − un the score is
    * 2(ad − un²) / (2a·un + 2ad + 2un² + 2un·d), 0 when the
    * denominator vanishes. */
  def adjustedRand(g: PropertyGraph): DataFrame = {
    val n = sym(g).select("src").distinct().count()
    val deg = degrees(g)
    commonNeighbors(g)
      .join(deg.select(col("id").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("degree").as("dv")), "v")
      .withColumn("un", col("du") + col("dv") - col("cn"))
      .withColumn("d2", lit(n.toDouble) - col("un"))
      .withColumn("den",
        lit(2.0) * col("cn") * col("un") + lit(2.0) * col("cn") * col("d2") +
          lit(2.0) * col("un") * col("un") + lit(2.0) * col("un") * col("d2"))
      .select(col("u"), col("v"),
        when(col("den") === 0.0, lit(0.0))
          .otherwise(lit(2.0) * (col("cn") * col("d2") - col("un") * col("un"))
            / col("den")).as("adjusted_rand"))
  }

  /** KatzIndex (reference `KatzIndex.cpp:34-60`, defaults
    * `KatzIndex.hpp:66`: maxPathLength 5, damping 0.005): iterated
    * frontier expansion from `sources`, scoring each reached node v by
    * Σ_l β^l · |{w ∈ F_{l−1} : w ~ v}| where F_l is the *set* of nodes
    * seen at level l — the reference collapses multiplicities between
    * levels (its `toProcess` holds distinct hit keys), and so do we.
    * Deviation: the reference starts each pair's walk at the
    * lower-degree endpoint; here every row scores from the source s.
    * Returns `(s, v, katz)`. */
  def katzIndex(g: PropertyGraph, sources: DataFrame,
      maxPathLength: Int = 5, dampingValue: Double = 0.005): DataFrame = {
    val adj = sym(g).localCheckpoint(true)
    var frontier = sources.select(col("id").as("s"), col("id").as("v"))
      .distinct().localCheckpoint(true)
    var acc: DataFrame = null
    for (l <- 1 to maxPathLength) {
      // math.pow, not a running product: the DuckDB oracle uses
      // power(β, l) and the two must agree bit-for-bit
      val factor = math.pow(dampingValue, l)
      val hits = frontier
        .join(adj.select(col("src").as("v"), col("dst").as("nv")), "v")
        .groupBy(col("s"), col("nv").as("v"))
        .agg((count(lit(1)) * factor).as("contrib"))
        .localCheckpoint(true)
      acc = if (acc == null) hits else acc.unionAll(hits)
      frontier = hits.select("s", "v")
    }
    acc.groupBy("s", "v").agg(sum("contrib").as("katz"))
  }

  /** Held-out-edge evaluation (reference `linkprediction/ROCMetric.hpp`,
    * `PrecisionRecallMetric.hpp`, `RandomLinkSampler.hpp`): remove a
    * deterministic ~10% of edges (arithmetic hash — SQL-replicable),
    * score the candidate pairs of the remaining graph by common
    * neighbors, and measure tie-averaged ROC AUC plus precision@k
    * (ties broken by (score desc, u, v)). Positives = held-out edges
    * that appear among the train graph's candidate pairs. Returns one
    * row `(n_pos, n_neg, auc, prec_at_k)`. */
  def rocEvaluation(g: PropertyGraph, k: Int = 100): DataFrame = {
    val e = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")
    val hashed = e.withColumn("h",
      pmod(pmod(col("src"), lit(100003L)) * 48271L +
        pmod(col("dst"), lit(100003L)) * 16807L, lit(100003L)))
    val test = hashed.filter(col("h") < 10000)
      .select(col("src").as("u"), col("dst").as("v"))
    val train = PropertyGraph.fromEdges(
      hashed.filter(col("h") >= 10000).select("src", "dst"),
      directed = false)
    // held-out edges with no common neighbor in train still count as
    // (score 0) positives — hence the full join, not a left join
    val labeled = commonNeighbors(train)
      .join(test.withColumn("pos", lit(1L)), Seq("u", "v"), "full")
      // candidate pairs that are still train edges are not predictions
      .join(hashed.filter(col("h") >= 10000)
        .select(col("src").as("u"), col("dst").as("v")), Seq("u", "v"),
        "left_anti")
      .select(col("u"), col("v"),
        coalesce(col("cn"), lit(0L)).cast("double").as("score"),
        coalesce(col("pos"), lit(0L)).as("pos"))
      .localCheckpoint(true)
    // tie-averaged Mann-Whitney AUC from score-group aggregates
    val groups = labeled.groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("npos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = groups.withColumn("below",
        coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("avg_rank", col("below") + (col("cnt") + 1.0) / 2.0)
    val tot = labeled.agg(count(lit(1)).as("n"), sum("pos").as("p")).head
    val (nAll, p) = (tot.getLong(0), tot.getLong(1))
    val nNeg = nAll - p
    val rankSum = ranked.agg(sum(col("npos") * col("avg_rank"))).head.getDouble(0)
    val auc = (rankSum - p.toDouble * (p + 1) / 2.0) / (p.toDouble * nNeg)
    val wTop = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("u").asc, col("v").asc)
    val precK = labeled.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .agg(sum("pos") / count(lit(1))).head.getDouble(0)
    val spark = g.edges.sparkSession
    spark.range(1).select(lit(p).as("n_pos"), lit(nNeg).as("n_neg"),
      round(lit(auc), 6).as("auc"), round(lit(precK), 6).as("prec_at_k"))
  }

  /** NeighborsMeasureIndex (reference `NeighborsMeasureIndex.hpp:29-40`):
    * number of (a ∈ N(u), b ∈ N(v)) pairs with a = b or (a,b) ∈ E —
    * i.e. common neighbors plus 3-paths u–a–b–v. The 3-path leg is the
    * triple adjacency join grouped on the endpoints, restricted to the
    * candidate pair set to bound the output. */
  def neighborsMeasure(g: PropertyGraph): DataFrame = {
    val s = sym(g)
    val cn = commonNeighbors(g)
    val threePaths = s.select(col("src").as("u"), col("dst").as("a"))
      .join(s.select(col("src").as("a"), col("dst").as("b")), "a")
      .join(s.select(col("src").as("b"), col("dst").as("v")), "b")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("p3"))
    cn.join(threePaths, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        (col("cn") + coalesce(col("p3"), lit(0L))).as("neighbors_measure"))
  }
}
