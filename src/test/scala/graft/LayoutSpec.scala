package graft

import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.viz.Layout

/** PivotMDS layout: a path graph must embed monotonically along the
  * first axis (classical MDS of a line recovers the line), axes must be
  * orthogonal with descending variance, a barbell must separate its two
  * cliques along axis 0, and the run must be deterministic.
  */
class LayoutSpec extends SparkSpec {

  private def pathGraph(n: Int): PropertyGraph = {
    import spark.implicits._
    PropertyGraph.fromEdges(
      (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst"),
      directed = false)
  }

  test("path graph: axis 0 orders nodes monotonically (full pivots)") {
    val n = 40
    val g = pathGraph(n)
    val res = Layout.pivotMdsWithInfo(g, dim = 2, numPivots = n)
    val xs = res.coords.orderBy("id").collect().map(_.getDouble(1))
    assert(xs.length == n)
    val diffs = xs.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(_ > 0) || diffs.forall(_ < 0),
      s"axis 0 not monotone along the path: ${xs.take(8).mkString(",")}")
    assert(res.eigenvalues.head > res.eigenvalues(1),
      s"eigenvalues not descending: ${res.eigenvalues}")
  }

  test("axes are orthogonal with descending variance") {
    val g = pathGraph(60)
    val rows = Layout.pivotMds(g, dim = 2, numPivots = 16)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val dot = rows.map { case (x, y) => x * y }.sum
    val nx = math.sqrt(rows.map(r => r._1 * r._1).sum)
    val ny = math.sqrt(rows.map(r => r._2 * r._2).sum)
    // the power method stops at the reference's 1e-6 delta, so residual
    // cross-correlation of a few 1e-6 is expected
    assert(math.abs(dot) / (nx * ny) < 1e-4, s"axes not orthogonal: $dot")
    assert(nx >= ny, "axis-0 variance below axis-1")
  }

  test("barbell: the two cliques separate along axis 0") {
    import spark.implicits._
    val k = 8; val bridge = 10
    val c1 = for (i <- 0 until k; j <- i + 1 until k) yield (i.toLong, j.toLong)
    val off = k + bridge
    val c2 = c1.map { case (a, b) => (a + off, b + off) }
    val path = (k - 1 until k + bridge).map(i => (i.toLong, i.toLong + 1))
    val g = PropertyGraph.fromEdges(
      (c1 ++ c2 ++ path).toDF("src", "dst"), directed = false)
    val rows = Layout.pivotMds(g, dim = 2, numPivots = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m1 = (0 until k).map(i => rows(i.toLong)).sum / k
    val m2 = (0 until k).map(i => rows((i + off).toLong)).sum / k
    val spread1 = (0 until k).map(i => math.abs(rows(i.toLong) - m1)).max
    val spread2 = (0 until k).map(i => math.abs(rows((i + off).toLong) - m2)).max
    assert(math.abs(m1 - m2) > 4 * math.max(spread1, spread2),
      s"cliques not separated: centers $m1 vs $m2, spreads $spread1/$spread2")
  }

  test("deterministic across runs") {
    val g = pathGraph(30)
    val a = Layout.pivotMds(g, dim = 2, numPivots = 10).orderBy("id").collect()
    val b = Layout.pivotMds(g, dim = 2, numPivots = 10).orderBy("id").collect()
    assert(a.sameElements(b))
  }

  test("postscript writer: header, one line per edge, one dot per node") {
    import spark.implicits._
    val n = 10
    val g = pathGraph(n)
    val coords = Layout.pivotMds(g, dim = 2, numPivots = n)
      .select(col("id"), col("p0").as("c0"), col("p1").as("c1"))
    val cl = (0 until n).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "cluster")
    val dir = java.nio.file.Files.createTempDirectory("graft_ps").toString + "/out"
    graft.viz.PostscriptWriter.write(g, coords, dir, Some(cl))
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.head == "%!PS-Adobe-1.0")
    assert(lines.last == "grestore")
    assert(lines.count(_.contains(" l s")) == n - 1, "one segment per edge")
    assert(lines.count(_.contains("360.00 a s")) == n, "one dot per node")
    // clusters 0/1/2 → palette entries red / orange / yellow on nodes
    assert(lines.exists(l => l.startsWith("1.000 0.000 0.000 c p ") && l.contains("a s")))
    assert(lines.exists(l => l.startsWith("1.000 0.500 0.000 c p ") && l.contains("a s")))
    // adjacent path nodes differ in cluster → grey inter-cluster edges
    assert(lines.exists(_.startsWith("0.80 0.80 0.80 c 1.0 w p ")))
    // coordinates are inside the canvas
    val nums = lines.filter(_.contains(" m ")).flatMap(
      _.split(" ").flatMap(t => scala.util.Try(t.toDouble).toOption))
    assert(nums.forall(v => v >= -0.001 && v <= 1020.001))
  }
}
