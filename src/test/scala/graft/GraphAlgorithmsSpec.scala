package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Golden-graph correctness on the reference's karate fixture
  * (`/root/reference/input/karate.graph`: 34 nodes, 78 edges — values
  * cross-checked against published Zachary-karate facts the reference's
  * own tests rely on) plus cross-implementation agreement checks
  * (SURVEY.md §5 test plan).
  */
class GraphAlgorithmsSpec extends SparkSpec {
  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("metis reader: karate has 34 nodes and 78 edges") {
    assert(karate.numberOfNodes == 34)
    assert(karate.numberOfEdges == 78)
  }

  test("degrees: karate max degree is 17 (node 33), total degree 156") {
    val d = karate.degrees
    assert(d.agg(max("degree")).head.getLong(0) == 17)
    assert(d.agg(sum("degree")).head.getLong(0) == 156)
  }

  test("connected components: karate is one component; LSS == labelProp") {
    val lss = ConnectedComponents.run(karate)
    val lp = ConnectedComponents.labelProp(karate)
    assert(lss.select("component").distinct().count() == 1)
    assert(lss.count() == 34)
    assert(lss.except(lp).isEmpty && lp.except(lss).isEmpty)
  }

  test("triangles: karate has 45 triangles") {
    assert(Triangles.triangleCount(karate).head.getLong(0) == 45)
  }

  test("local clustering coefficient: degree-1 nodes are 0, bounds hold") {
    val lcc = Triangles.localClusteringCoefficient(karate)
    assert(lcc.count() == 34)
    assert(lcc.filter(col("lcc") < 0 || col("lcc") > 1).isEmpty)
  }

  test("pagerank: sums to 1, node 33 ranks highest") {
    val pr = PageRank.run(karate, tol = 1e-10, maxIter = 200)
    val total = pr.agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
    val top = pr.orderBy(desc("rank")).select("id").head.getLong(0)
    assert(top == 33L) // the instructor-side hub
  }

  test("pagerank: sink with in-edges and isolated vertex match naive iteration") {
    import spark.implicits._
    // 0→1→2 (node 2: sink WITH in-edges → per-iteration sink aggregate),
    // node 3 isolated (sink with none)
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0)).toDF("src", "dst", "weight")
    val verts = Seq(0L, 1L, 2L, 3L).toDF("id")
    val g = PropertyGraph(edges, directed = true, Some(verts))
    val got = PageRank.run(g, 0.85, tol = 0.0, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var r = Array.fill(4)(0.25)
    for (_ <- 0 until 12) {
      val sink = r(2) + r(3)
      val nr = Array.fill(4)(0.15 / 4 + 0.85 * sink / 4)
      nr(1) += 0.85 * r(0)
      nr(2) += 0.85 * r(1)
      r = nr
    }
    (0 until 4).foreach(i => assert(math.abs(got(i.toLong) - r(i)) < 1e-12,
      s"node $i: ${got(i.toLong)} vs ${r(i)}"))

    // undirected edge + isolated vertex → the fused isolated-sink
    // recurrence path; maxIter not divisible by the span
    val g2 = PropertyGraph(Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"),
      directed = false, Some(Seq(0L, 1L, 2L).toDF("id")))
    val got2 = PageRank.run(g2, 0.85, tol = 0.0, maxIter = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var s = Array.fill(3)(1.0 / 3)
    for (_ <- 0 until 7) {
      val sink = s(2)
      val ns = Array.fill(3)(0.05 + 0.85 * sink / 3)
      ns(1) += 0.85 * s(0)
      ns(0) += 0.85 * s(1)
      s = ns
    }
    (0 until 3).foreach(i => assert(math.abs(got2(i.toLong) - s(i)) < 1e-12,
      s"node $i: ${got2(i.toLong)} vs ${s(i)}"))
  }

  test("bfs == dijkstra on unit weights (all sources)") {
    val sources = ShortestPaths.sourcesOf(karate, Seq(0L, 16L, 33L))
    val b = ShortestPaths.bfs(karate, sources)
      .select(col("source"), col("id"), col("dist").cast("double").as("dist"))
    val d = ShortestPaths.dijkstra(GraphOps.toUnweighted(karate), sources)
    assert(b.except(d).isEmpty && d.except(b).isEmpty)
    // karate diameter is 5
    assert(b.agg(max("dist")).head.getDouble(0) <= 5.0)
  }

  test("k-core: karate max core is 4") {
    val core4 = GraphOps.kCore(karate, 4)
    val core5 = GraphOps.kCore(karate, 5)
    assert(core4.edges.count() > 0)
    assert(core5.edges.count() == 0)
    val cores = GraphOps.coreDecomposition(karate)
    assert(cores.agg(max("core")).head.getInt(0) == 4)
    assert(cores.count() == 34)
  }

  test("coreDecomposition equals sequential peel on ER + path tail + isolate") {
    import spark.implicits._
    val er = Generators.erdosRenyi(spark, 250, 0.03, seed = 5)
    // append a path tail (core 1) hanging off node 0 and an isolated id
    val extra = Seq((0L, 500L, 1.0), (500L, 501L, 1.0), (501L, 502L, 1.0))
      .toDF("src", "dst", "weight")
    val verts = er.vertices.select("id")
      .unionAll(Seq(500L, 501L, 502L, 900L).toDF("id"))
    val g = PropertyGraph(er.edges.unionAll(extra), directed = false, Some(verts))
    // driver brute force: repeatedly strip min-degree vertices
    val adj = scala.collection.mutable.HashMap[Long, scala.collection.mutable.HashSet[Long]]()
    g.edges.select("src", "dst").collect().foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      if (u != v) {
        adj.getOrElseUpdate(u, scala.collection.mutable.HashSet()) += v
        adj.getOrElseUpdate(v, scala.collection.mutable.HashSet()) += u
      }
    }
    val expected = scala.collection.mutable.HashMap[Long, Int]()
    verts.as[Long].collect().foreach(v => expected(v) = 0)
    var k = 1
    while (adj.nonEmpty) {
      var changed = true
      while (changed) {
        val drop = adj.collect { case (v, ns) if ns.size <= k => v }.toSeq
        changed = drop.nonEmpty
        drop.foreach { v =>
          expected(v) = k
          adj.remove(v).foreach(_.foreach(w => adj.get(w).foreach(_ -= v)))
        }
      }
      k += 1
    }
    val got = GraphOps.coreDecomposition(g).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected.toMap, {
      val diff = (got.keySet ++ expected.keySet)
        .filter(i => got.get(i) != expected.get(i)).take(5)
      s"mismatch at $diff: got ${diff.map(got.get)}, want ${diff.map(expected.get)}"
    })
  }

  test("transpose/toUndirected/subgraph invariants") {
    val t = GraphOps.transpose(karate)
    assert(t.numberOfEdges == karate.numberOfEdges)
    val sub = GraphOps.subgraphFromNodes(karate,
      spark.range(17).select(col("id")))
    assert(sub.edges.filter(col("src") >= 17 || col("dst") >= 17).isEmpty)
  }

  test("toWeighted/removeEdgesFromIsolatedSet/subgraphAndNeighbors semantics") {
    // toWeighted: weight column present and non-null everywhere
    val w = GraphOps.toWeighted(GraphOps.toUnweighted(karate))
    assert(w.edges.filter(col("weight").isNull).isEmpty)
    // isolating node 0 removes exactly its 16 incident undirected edges
    val iso = GraphOps.removeEdgesFromIsolatedSet(karate,
      spark.range(1).select(col("id")))
    assert(iso.edges.filter(col("src") === 0 || col("dst") === 0).isEmpty)
    assert(iso.numberOfEdges == karate.numberOfEdges - 16,
      s"${iso.numberOfEdges}")
    // core {0} + neighbors: edges = only the 16 core-incident ones,
    // neighbor-neighbor edges dropped (reference relevance-sum rule)
    val sn = GraphOps.subgraphAndNeighbors(karate,
      spark.range(1).select(col("id")))
    assert(sn.numberOfEdges == 16, s"${sn.numberOfEdges}")
    assert(sn.edges.filter(col("src") =!= 0 && col("dst") =!= 0).isEmpty)
    assert(sn.vertices.count() == 17) // 0 + its 16 neighbors
  }

  test("link prediction: jaccard within [0,1], symmetric candidate set") {
    val j = LinkPrediction.jaccard(karate)
    assert(j.filter(col("jaccard") <= 0 || col("jaccard") > 1).isEmpty)
    assert(j.filter(col("u") >= col("v")).isEmpty)
  }

  test("eigenvector centrality: node 33 tops on karate") {
    val ev = PageRank.eigenvector(karate, tol = 1e-10, maxIter = 300)
    val top = ev.orderBy(desc("score")).select("id").head.getLong(0)
    assert(top == 33L)
  }

  test("append/merge carry BOTH node sets, including isolated nodes") {
    import spark.implicits._
    // g1: edge 0-1 plus isolated node 9; g2: edge 0-2 plus isolated 5
    val g1 = PropertyGraph(Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"),
      directed = false, Some(Seq(0L, 1L, 9L).toDF("id")))
    val g2 = PropertyGraph(Seq((0L, 2L, 1.0)).toDF("src", "dst", "weight"),
      directed = false, Some(Seq(0L, 2L, 5L).toDF("id")))
    val app = GraphOps.append(g1, g2, offset = 100L)
    // reference append (graphtools.pyx:237): every g2 node shifted in
    assert(app.vertices.as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 9L, 100L, 102L, 105L))
    assert(app.edges.count() === 2)
    assert(app.edges.filter(col("src") === 100L && col("dst") === 102L).count() === 1)
    val mer = GraphOps.merge(g1, g2)
    assert(mer.vertices.as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L, 5L, 9L))
    assert(mer.edges.count() === 2)
  }
}
