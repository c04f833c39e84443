package graft

import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.viz.MaxentLayout

/** Maxent-stress layout: known-distance construction has exact
  * closed-form counts, stress (ldme over S) must drop sharply from the
  * random init, the layout must respect topology, and runs must be
  * deterministic.
  */
class MaxentLayoutSpec extends SparkSpec {

  private def pathGraph(n: Int): PropertyGraph = {
    import spark.implicits._
    PropertyGraph.fromEdges(
      (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst"),
      directed = false)
  }

  private def ringGraph(n: Int): PropertyGraph = {
    import spark.implicits._
    PropertyGraph.fromEdges(
      (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("src", "dst"),
      directed = false)
  }

  test("knownDistances: exact counts and hop values on a path") {
    val n = 12
    val kd = MaxentLayout.knownDistances(pathGraph(n), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ordered pairs at |i-j| = h exist for h = 1..3 with d = h
    assert(kd.length == 2 * ((n - 1) + (n - 2) + (n - 3)))
    kd.foreach { case (i, j, d) =>
      assert(math.abs(i - j) == d.toLong, s"pair ($i,$j) labeled $d")
    }
  }

  test("ring: stress drops sharply and adjacent nodes sit at similar spacing") {
    val g = ringGraph(24)
    val res = MaxentLayout.maxentStress(g, k = 2,
      maxSolvesPerAlpha = 6, finalAlpha = 0.05)
    assert(res.ldmeFinal < 0.5 * res.ldmeInitial,
      s"ldme ${res.ldmeInitial} -> ${res.ldmeFinal}: no real improvement")
    val c = res.coords.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val gaps = (0 until 24).map { i =>
      val (x1, y1) = c(i.toLong); val (x2, y2) = c(((i + 1) % 24).toLong)
      math.hypot(x1 - x2, y1 - y2)
    }
    // a laid-out ring has near-uniform adjacent spacing
    assert(gaps.max / gaps.min < 3.0,
      s"ring spacing wildly uneven: min=${gaps.min} max=${gaps.max}")
  }

  test("path: endpoints land far apart relative to adjacent spacing") {
    val n = 16
    val res = MaxentLayout.maxentStress(pathGraph(n), k = 2,
      maxSolvesPerAlpha = 6, finalAlpha = 0.05)
    val c = res.coords.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def d(a: Int, b: Int): Double = {
      val (x1, y1) = c(a.toLong); val (x2, y2) = c(b.toLong)
      math.hypot(x1 - x2, y1 - y2)
    }
    val endToEnd = d(0, n - 1)
    val meanAdj = (0 until n - 1).map(i => d(i, i + 1)).sum / (n - 1)
    assert(endToEnd > 3 * meanAdj,
      s"path folded onto itself: endToEnd=$endToEnd meanAdj=$meanAdj")
  }

  test("deterministic across runs") {
    val g = ringGraph(12)
    val a = MaxentLayout.maxentStress(g, k = 2,
      maxSolvesPerAlpha = 3, finalAlpha = 0.3)
    val b = MaxentLayout.maxentStress(g, k = 2,
      maxSolvesPerAlpha = 3, finalAlpha = 0.3)
    assert(a.coords.orderBy("id").collect()
      .sameElements(b.coords.orderBy("id").collect()))
    assert(a.ldmeFinal == b.ldmeFinal && a.solves == b.solves)
  }
}
