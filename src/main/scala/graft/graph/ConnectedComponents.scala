package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components → `(id, component)` with component = min node id
  * in the component (reference: `components/ConnectedComponents.hpp:24`,
  * `ParallelConnectedComponents.hpp:21`; the UnionFind there does not
  * distribute — SURVEY.md §1.1).
  *
  * Two algorithms:
  *   - [[labelProp]]: min-label propagation fixpoint — O(diameter) rounds,
  *     each one shuffle; simple and exact.
  *   - [[run]]: alternating large-star/small-star contractions (Kiveris et
  *     al., "Connected Components in MapReduce and Beyond") — O(log n)
  *     rounds regardless of diameter, the scale-path default for 100 TB
  *     graphs where diameter can be large.
  */
object ConnectedComponents {

  /** Min-label propagation. Convergence via an order-independent
    * (count, bit_xor(xxhash64)) fingerprint of the label assignment —
    * overflow-free under ANSI mode even for arbitrary 64-bit ids
    * (a plain `sum(component)` can overflow and throw). */
  def labelProp(g: PropertyGraph, maxIter: Int = 100): DataFrame = {
    val adj = g.adjacency.select("src", "dst")
    val init = g.vertices.select(col("id"), col("id").as("component"))
    Fixpoint.loopUntilStableFingerprint(init, maxIter,
      df => df.agg(bit_xor(xxhash64(col("id"), col("component"))))
        .head.getLong(0),
      checkpointEvery = 4) { (labels, _) =>
      val viaNbr = labels.join(adj, labels("id") === adj("src"))
        .select(col("dst").as("id"), col("component"))
      labels.select("id", "component").unionAll(viaNbr)
        .groupBy("id").agg(min("component").as("component"))
    }
  }

  /** Alternating large-star / small-star. State is a symmetric pair set;
    * at fixpoint it is a star forest rooted at each component's min id. */
  def run(g: PropertyGraph, maxIter: Int = 50): DataFrame = {
    val base = g.edges.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v"))

    // duplicates are harmless to the min-aggregations, so the symmetric
    // view skips its distinct and only each round's final output dedups
    // — 3 fewer shuffles per round
    def sym(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))

    // each star pays ONE exchange: the symmetric view is hash-partitioned
    // by u up front, so the min-aggregate AND the star join both reuse
    // that partitioning (groupBy needs only clustering on u; the join's
    // other side derives from the same exchange) — 3 exchanges per round
    // (largeStar, smallStar, dedup) instead of 5
    def symByU(e: DataFrame): DataFrame = sym(e).repartition(col("u"))

    // min(N(u) ∪ {u}) per node over a symmetric pair set
    def nbrMin(s: DataFrame): DataFrame =
      s.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val s = symByU(e)
      val m = nbrMin(s)
      s.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val s = symByU(e)
      val m = nbrMin(s)
      val moved = s.join(m, "u").filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = m.select(col("u"), col("m").as("v"))
      moved.unionAll(self).filter(col("u") =!= col("v")).distinct()
    }

    // order-independent, overflow-free edge-set fingerprint (ANSI mode
    // forbids a plain sum of xxhash64 values)
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // lineage cut every round: each round references its input ~16×
    // (sym, nbrMin, both stars), so the plan grows 16^k without
    // truncation. Fused loop: the (count, xor) checksum IS the
    // materializing action — one job per round.
    val stars = Fixpoint.loopFusedFingerprint(base, maxIter) {
      (e, i) =>
        val round = smallStar(largeStar(e))
        if (i > 0) Fixpoint.dumpLoopPlan("cc_star_round", round)
        round
    } { e => checksum(e) }

    // star forest: every non-root points at its root. Roots and isolated
    // vertices are covered by seeding EVERY vertex with itself as a
    // candidate label — min() then picks the root for members (the root
    // is the component minimum at the fixpoint) and the id itself for
    // roots/isolated. One union + one aggregate replaces the former
    // roots/isolated anti-join cascade (7 Exchanges + 3 sort-merge
    // anti-joins → 1 Exchange), identical output. When the vertex set
    // derives from endpoints its distinct is skipped too: the final
    // min-aggregate dedups.
    val selfSeed = g.verticesOpt match {
      case Some(v) => v.select(col("id"), col("id").as("component"))
      case None => g.edges.select(col("src").as("id"))
        .unionAll(g.edges.select(col("dst").as("id")))
        .select(col("id"), col("id").as("component"))
    }
    stars.select(col("u").as("id"), col("v").as("component"))
      .unionAll(selfSeed)
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Component sizes `(component, size)`. */
  def sizes(components: DataFrame): DataFrame =
    components.groupBy("component").agg(count(lit(1)).as("size"))
}
