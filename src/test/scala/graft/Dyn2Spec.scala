package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** DynAPSP, one-node betweenness from counted state, grow-shrink group
  * closeness, pivot-sampled closeness. */
class Dyn2Spec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("apspInsert equals from-scratch APSP after re-inserting held-out edges") {
    val held = Seq((0L, 31L), (2L, 32L)).toDF("src", "dst")
    val base = karate.edges
      .join(held, Seq("src", "dst"), "left_anti")
      .join(held.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_anti")
    val g1 = PropertyGraph(base, directed = false, Some(karate.vertices))
    val sources = karate.vertices.select(col("id").as("source"))
    val state0 = DynAlgorithms.apspInit(g1, sources)
    val inc = DynAlgorithms.apspInsert(karate, state0, held)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val scratch = DynAlgorithms.apspInit(karate, sources)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(inc == scratch)
  }

  test("betweennessOneNode matches Brandes for karate hubs and leaves") {
    val sources = karate.vertices.select(col("id").as("source"))
    val state = Paths.bfsCounted(karate, sources).localCheckpoint(true)
    val brandes = Betweenness.run(karate)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(0L, 33L, 11L).foreach { x =>
      val b = DynAlgorithms.betweennessOneNode(state, x)
      assert(math.abs(b - brandes(x)) < 1e-6, s"node $x: $b vs ${brandes(x)}")
    }
  }

  test("growShrink moves a bad path-graph group toward the center") {
    // path 0-1-2-3-4-5-6: start with the terrible group {0, 6}
    val path = PropertyGraph.fromEdges(
      (0L to 5L).map(i => (i, i + 1)).toDF("src", "dst"), directed = false)
    def farness(ms: Seq[Long]): Double =
      GroupCentrality.groupBfs(path, ms.map(m => (0L, m)).toDF("source", "id"))
        .agg(sum("dist").cast("double")).head.getDouble(0)
    val out = GroupCentrality.growShrink(path, Seq(0L, 6L), maxRounds = 5)
      .as[Long].collect().toSeq
    assert(out.size == 2)
    assert(farness(out) <= farness(Seq(0L, 6L)))
    assert(farness(out) < farness(Seq(0L, 6L)), s"no improvement: $out")
  }

  test("groupBetweenness: singleton equals one-node betweenness; monotone in S") {
    val sources = karate.vertices.select(col("id").as("source"))
    val state = Paths.bfsCounted(karate, sources).localCheckpoint(true)
    val b33 = DynAlgorithms.betweennessOneNode(state, 33L)
    val g33 = DynAlgorithms.groupBetweenness(karate, Seq(33L), sources)
    assert(math.abs(b33 - g33) < 1e-6, s"$b33 vs $g33")
    val gBoth = DynAlgorithms.groupBetweenness(karate, Seq(0L, 33L), sources)
    assert(gBoth >= g33 - 1e-9)
  }

  test("countedInsert equals from-scratch counted BFS after re-insertion") {
    val held = Seq((0L, 31L), (2L, 32L)).toDF("src", "dst")
    val base = karate.edges
      .join(held, Seq("src", "dst"), "left_anti")
      .join(held.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_anti")
    val g1 = PropertyGraph(base, directed = false, Some(karate.vertices))
    val sources = karate.vertices.select(col("id").as("source"))
    val state0 = Paths.bfsCounted(g1, sources)
    val inc = DynAlgorithms.countedInsert(karate, state0, held)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDecimal(3).toString)).toMap
    val scratch = Paths.bfsCounted(karate, sources)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDecimal(3).toString)).toMap
    assert(inc == scratch)
  }

  test("approxCloseness with all nodes as pivots equals exact closeness") {
    val n = karate.vertices.count().toInt
    val approx = ShortestPaths.approxCloseness(karate, nPivots = n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = ShortestPaths.closeness(
      ShortestPaths.bfs(karate, karate.vertices.select(col("id").as("source"))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    exact.foreach { case (id, c) =>
      assert(math.abs(approx(id) - c) < 1e-12, s"node $id: ${approx(id)} vs $c")
    }
  }
}
