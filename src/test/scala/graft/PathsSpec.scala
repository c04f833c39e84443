package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Point-to-point path operators: counted BFS (σ), bidirectional BFS,
  * A*, all-simple-paths, biconnected decomposition — validated on small
  * closed-form graphs plus the karate golden graph.
  */
class PathsSpec extends SparkSpec {
  import spark.implicits._

  def g(edges: (Long, Long)*): PropertyGraph =
    PropertyGraph.fromEdges(edges.toDF("src", "dst"), directed = false)

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  // ladder of d diamonds: σ(sink) = 2^d, dist = 2d
  def diamondLadder(d: Int): PropertyGraph = {
    val es = (0 until d).flatMap { i =>
      val base = 3L * i
      Seq((base, base + 1), (base, base + 2), (base + 1, base + 3), (base + 2, base + 3))
    }
    g(es: _*)
  }

  test("bfsCounted: diamond ladder has 2^d shortest paths in exact decimal") {
    val d = 12
    val src = Seq(0L).toDF("source")
    val res = Paths.bfsCounted(diamondLadder(d), src)
      .filter(col("id") === 3L * d).select("dist", "sigma").head()
    assert(res.getLong(0) == 2L * d)
    assert(res.getDecimal(1).toBigInteger == java.math.BigInteger.valueOf(2L).pow(d))
  }

  test("bfsCounted matches plain bfs distances on karate") {
    val src = Seq(1L).toDF("source")
    val counted = Paths.bfsCounted(karate, src).select("id", "dist")
    val plain = ShortestPaths.bfs(karate, src).select("id", "dist")
    assert(counted.except(plain).isEmpty && plain.except(counted).isEmpty)
  }

  test("bidirectionalBfs agrees with bfs on karate for far pairs") {
    val src = Seq(1L).toDF("source")
    val dist = ShortestPaths.bfs(karate, src)
      .select("id", "dist").as[(Long, Long)].collect().toMap
    for (t <- Seq(17L, 27L, 33L)) { // ids are 0-based: 0..33
      val got = Paths.bidirectionalBfs(karate, 1L, t).select("dist").as[Long].head()
      assert(got == dist(t), s"t=$t got=$got want=${dist(t)}")
    }
  }

  test("bidirectionalBfs: unreachable pair yields empty, s==t yields 0") {
    val disc = g((1L, 2L), (3L, 4L))
    assert(Paths.bidirectionalBfs(disc, 1L, 4L).isEmpty)
    assert(Paths.bidirectionalBfs(disc, 1L, 1L).select("dist").as[Long].head() == 0L)
  }

  test("aStar with zero heuristic equals dijkstra; admissible heuristic same answer") {
    val zeroH = karate.vertices.select(col("id"), lit(0.0).as("h"))
    val d0 = Paths.aStar(karate, 1L, 27L, zeroH).select("dist").as[Double].head()
    val dij = ShortestPaths.dijkstra(karate, Seq(1L).toDF("source"))
      .filter(col("id") === 27L).select("dist").as[Double].head()
    assert(d0 == dij)
    // admissible landmark bound: h(v) = |d(v,t)| is the tightest valid h
    val exact = ShortestPaths.bfs(karate, Seq(27L).toDF("source"))
      .select(col("id"), col("dist").cast("double").as("h"))
    val dh = Paths.aStar(karate, 1L, 27L, exact).select("dist").as[Double].head()
    assert(dh == dij)
  }

  test("allSimplePaths: K4 counts and cycle counts are closed-form") {
    // K4 s=1,t=2: paths 1-2, 1-x-2 (×2), 1-x-y-2 (×2) = 5 simple paths
    val k4 = g((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val paths = Paths.allSimplePaths(k4, 1L, 2L, cutoff = 3)
    assert(paths.count() == 5)
    // every path is simple and s→t
    val rows = paths.select("path").as[Seq[Long]].collect()
    assert(rows.forall(p => p.head == 1L && p.last == 2L && p.distinct.size == p.size))
    // 6-cycle s to antipode: exactly 2 paths of length 3 at cutoff 3
    val c6 = g((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0))
    assert(Paths.allSimplePaths(c6, 0L, 3L, cutoff = 3).count() == 2)
  }

  test("biconnected: barbell has bridge, articulation points, 3 components") {
    // two triangles joined by a bridge 3-4
    val barbell = g((1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6))
    val (labels, artic, bridges) = Biconnected.run(barbell)
    assert(bridges.as[(Long, Long)].collect().toSet == Set((3L, 4L)))
    assert(artic.as[Long].collect().toSet == Set(3L, 4L))
    assert(labels.select("bicc").distinct().count() == 3)
    // triangle edges share one component each
    val byComp = labels.as[(Long, Long, Long)].collect().groupBy(_._3)
    assert(byComp.values.map(_.length).toSeq.sorted == Seq(1, 3, 3))
    val cert = Biconnected.bridgeCertificate(barbell, bridges).head()
    assert(cert.getLong(0) == 1L && cert.getLong(1) == 1L)
  }

  test("biconnected: cycle has no bridges, one component; karate certificate holds") {
    val c5 = g((0, 1), (1, 2), (2, 3), (3, 4), (4, 0))
    val (labels, artic, bridges) = Biconnected.run(c5)
    assert(bridges.isEmpty && artic.isEmpty)
    assert(labels.select("bicc").distinct().count() == 1)

    val (kLabels, _, kBridges) = Biconnected.run(karate)
    assert(kLabels.count() == karate.edges.count())
    val cert = Biconnected.bridgeCertificate(karate, kBridges).head()
    assert(cert.getLong(0) == 1L && cert.getLong(1) == 1L)
  }

  test("biconnected: distributed run equals Hopcroft-Tarjan on golden graphs") {
    // partition-of-edges equality up to block renaming, plus exact
    // bridge and articulation sets
    def blocksOf(labels: org.apache.spark.sql.DataFrame): Set[Set[(Long, Long)]] =
      labels.as[(Long, Long, Long)].collect()
        .groupBy(_._3).values.map(_.map(t => (t._1, t._2)).toSet).toSet
    // golden graphs: karate; two components w/ isolated bridge chains;
    // a theta graph (two vertices joined by three paths — one block)
    val chainy = g((0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
      (10, 11), (11, 12), (12, 13), (13, 10), (13, 14))
    val theta = g((0, 1), (0, 2), (2, 1), (0, 3), (3, 4), (4, 1))
    for (gg <- Seq(karate, chainy, theta)) {
      val (dl, da, db) = Biconnected.run(gg)
      val (sl, sa, sb) = Biconnected.runSequential(gg)
      assert(blocksOf(dl) == blocksOf(sl))
      assert(da.as[Long].collect().toSet == sa.as[Long].collect().toSet)
      assert(db.as[(Long, Long)].collect().toSet ==
        sb.as[(Long, Long)].collect().toSet)
    }
  }

  test("bfs: high-diameter path graph (d >> compaction window) stays exact") {
    // 100-hop traversal = 3 leg compactions (compactEvery = 32): the
    // settled-union depth stays O(32) so per-hop planning cannot blow up,
    // and every hop distance must still be exact after compaction
    val n = 100
    val path = g((0L until n - 1).map(i => (i, i + 1)): _*)
    val dist = ShortestPaths.bfs(path, Seq(0L).toDF("source"), maxIter = n)
    val rows = dist.select("id", "dist").as[(Long, Long)].collect().toMap
    assert(rows.size == n)
    assert((0L until n).forall(i => rows(i) == i), "dist(i) must equal i on a path")
  }

  test("dijkstra: weighted path crosses the leg-compaction window exactly") {
    // 40 rounds = 2 compactions (compactEvery = 16); weights i+1 give
    // closed-form prefix sums to compare against
    val n = 40
    val edges = (0L until n - 1).map(i => (i, i + 1, (i + 1).toDouble))
      .toDF("src", "dst", "weight")
    val gw = PropertyGraph.fromEdges(edges, directed = false, weight = Some("weight"))
    val dist = ShortestPaths.dijkstra(gw, Seq(0L).toDF("source"), maxIter = n)
    val rows = dist.select("id", "dist").as[(Long, Double)].collect().toMap
    assert(rows.size == n)
    assert((0L until n).forall(i => rows(i) == (i * (i + 1) / 2).toDouble),
      "dist(i) must be the prefix sum i(i+1)/2")
  }
}
