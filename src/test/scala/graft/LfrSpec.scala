package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** LFR benchmark generator (reference `generators/LFRGenerator.hpp:28`)
  * — determinism, mixing behavior, and the ground-truth recovery test
  * the reference runs its community detectors through: at low mixing the
  * detected partition must align with the planted one (NMI threshold),
  * replacing the weaker "Q ≥ x" style assertions.
  */
class LfrSpec extends SparkSpec {

  test("lfr: deterministic per seed, expected size, planted partition covers all nodes") {
    val (g1, p1) = Generators.lfr(spark, 400, mu = 0.1)
    val (g2, p2) = Generators.lfr(spark, 400, mu = 0.1)
    val f1 = g1.edges.agg(sum(expr("hash(src, dst)"))).head.getLong(0)
    val f2 = g2.edges.agg(sum(expr("hash(src, dst)"))).head.getLong(0)
    assert(f1 == f2, "same seed must give identical edges")
    assert(p1.count() == 400 && p1.select("id").distinct().count() == 400)
    assert(math.abs(Community.nmi(p1, p2) - 1.0) < 1e-9)
    val m = g1.edges.count()
    assert(m > 400, s"too sparse: $m edges") // avg deg ≥ 2 at these params
  }

  test("lfr: low mixing has mostly-internal edges, high mixing does not") {
    def internalFraction(mu: Double): Double = {
      val (g, p) = Generators.lfr(spark, 400, mu = mu, seed = 7)
      val lbl = p.select(col("id"), col("community"))
      val tagged = g.edges
        .join(lbl.select(col("id").as("src"), col("community").as("cs")), "src")
        .join(lbl.select(col("id").as("dst"), col("community").as("cd")), "dst")
      tagged.filter(col("cs") === col("cd")).count().toDouble / tagged.count()
    }
    val lo = internalFraction(0.1)
    val hi = internalFraction(0.6)
    assert(lo > 0.75, s"mu=0.1 internal fraction $lo")
    assert(hi < lo - 0.2, s"mu=0.6 internal fraction $hi vs $lo")
  }

  test("lfr: per-node mixing compliance — realized internal degree ≈ (1−μ)·deg per node") {
    // the property the old Chung–Lu coupling could not guarantee: every
    // node's INTERNAL degree must individually match its (1−μ)·deg
    // target (stochastic rounding → within 1 of the real target; HH +
    // switching realize the drawn sequence exactly up to graphicality
    // caps), not merely in expectation over the graph
    val mu = 0.2
    val (g, p) = Generators.lfr(spark, 600, mu = mu, seed = 3)
    val lbl = p.select(col("id"), col("community"))
    val tagged = g.edges
      .join(lbl.select(col("id").as("src"), col("community").as("cs")), "src")
      .join(lbl.select(col("id").as("dst"), col("community").as("cd")), "dst")
    val intDeg = tagged.filter(col("cs") === col("cd"))
      .select(col("src").as("id")).unionAll(
        tagged.filter(col("cs") === col("cd")).select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("di"))
    val deg = g.adjacency.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("d"))
    val rows = deg.join(intDeg, Seq("id"), "left")
      .select(col("id"), col("d"),
        coalesce(col("di"), lit(0L)).as("di")).collect()
    // per-node: |di − (1−μ)·d| ≤ 1.5 for ≥ 90 % of nodes (stochastic
    // rounding is ±1; stub drops / graphicality caps explain a small tail)
    val devs = rows.map(r => math.abs(r.getLong(2) - (1 - mu) * r.getLong(1)))
    val within = devs.count(_ <= 1.5).toDouble / devs.length
    assert(within >= 0.9, s"only ${within * 100}%% of nodes within 1.5 of target")
    // and the mean per-node mixing tracks μ itself
    val mixing = rows.filter(_.getLong(1) > 0)
      .map(r => 1.0 - r.getLong(2).toDouble / r.getLong(1))
    val meanMix = mixing.sum / mixing.length
    assert(math.abs(meanMix - mu) < 0.08, s"mean per-node mixing $meanMix vs mu=$mu")
  }

  test("lfr recovery: louvain and leiden recover the planted partition at mu=0.1 (NMI ≥ 0.6)") {
    val (g, planted) = Generators.lfr(spark, 400, mu = 0.1, seed = 11)
    val louvain = Community.louvain(g)
    val leiden = Community.leiden(g)
    val nmiLouvain = Community.nmi(planted, louvain)
    val nmiLeiden = Community.nmi(planted, leiden)
    assert(nmiLouvain >= 0.6, s"louvain NMI $nmiLouvain")
    assert(nmiLeiden >= 0.6, s"leiden NMI $nmiLeiden")
  }
}
