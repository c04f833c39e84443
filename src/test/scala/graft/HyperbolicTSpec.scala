package graft

import org.apache.spark.sql.functions._
import graft.graph.Generators

/** Fermi–Dirac hyperbolic graphs (T > 0): determinism, sigmoid
  * direction (near pairs almost always connect, far pairs almost
  * never), and the T → 0 threshold limit. */
class HyperbolicTSpec extends SparkSpec {

  test("hyperbolicT: deterministic; acceptance follows the sigmoid") {
    val n = 400L; val radius = 5.0; val temp = 0.5
    val a = Generators.hyperbolicT(spark, n, radius, temp, seed = 9)
    val b = Generators.hyperbolicT(spark, n, radius, temp, seed = 9)
    assert(a.edges.except(b.edges).isEmpty && b.edges.except(a.edges).isEmpty)
    assert(a.edges.count() > 0)
    // threshold graph on the same coordinates (same seed → same coords)
    val thr = Generators.hyperbolic(spark, n, radius, seed = 9)
      .edges.select("src", "dst")
    val tEdges = a.edges.select("src", "dst")
    // edges WELL inside the threshold ball survive; count how many of
    // the threshold graph's edges the T-run keeps — p > 1/2 inside R,
    // so well over a third must be present even at this temperature
    val kept = tEdges.join(thr, Seq("src", "dst"), "left_semi").count()
    assert(kept.toDouble / thr.count() > 0.4,
      s"kept only $kept of ${thr.count()} threshold edges")
    // and T adds some beyond-threshold edges the T=0 graph cannot have
    val added = tEdges.join(thr, Seq("src", "dst"), "left_anti").count()
    assert(added > 0, "T > 0 must create beyond-threshold edges")
  }

  test("hyperbolicT: low temperature converges to the threshold graph") {
    val n = 300L; val radius = 4.5
    val thr = Generators.hyperbolic(spark, n, radius, seed = 3)
      .edges.select("src", "dst")
    val cold = Generators.hyperbolicT(spark, n, radius, temperature = 0.01,
      seed = 3).edges.select("src", "dst")
    val diff = cold.except(thr).count() + thr.except(cold).count()
    val m = thr.count()
    // at T = 0.01 only pairs within ~0.1 of the boundary can flip
    assert(diff.toDouble / m < 0.05, s"$diff of $m edges differ at T=0.01")
  }
}
