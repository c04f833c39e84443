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

    // min(N(u) ∪ {u}) per node over a symmetric pair set
    def nbrMin(s: DataFrame): DataFrame =
      s.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))

    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = nbrMin(s)
      s.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
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
      (e, _) => smallStar(largeStar(e))
    } { e => checksum(e) }

    // star forest: every non-root points at its root; add the roots
    val members = stars.select(col("u").as("id"), col("v").as("component"))
    val roots = stars.select(col("v").as("id")).distinct()
      .join(stars.select(col("u").as("id")).distinct(), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    // isolated vertices (if a vertex table is attached) are their own component
    val isolated = g.vertices.select("id")
      .join(members.select("id").unionAll(roots.select("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    members.unionAll(roots).unionAll(isolated)
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Component sizes `(component, size)`. */
  def sizes(components: DataFrame): DataFrame =
    components.groupBy("component").agg(count(lit(1)).as("size"))
}
