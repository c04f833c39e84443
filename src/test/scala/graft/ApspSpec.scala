package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** Floyd–Warshall-class APSP (`Apsp.floydWarshall`): cross-checks
  * against per-source BFS on the karate fixture, plus the reference
  * contract corners — negative weights, negative-cycle flagging, and
  * the fewest-nodes tie-break (`distance/FloydWarshall.hpp:28`).
  */
class ApspSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def graphOf(directed: Boolean, es: (Long, Long, Double)*): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(es.toSeq.toDF("src", "dst", "weight"), directed)
  }

  test("karate: FW distances == all-pairs BFS, hops == dist (unit weights)") {
    val g = graft.io.GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val fw = Apsp.floydWarshall(g)
    assert(fw.filter(col("dist") =!= col("hops").cast("double")).count() == 0)
    val sources = g.vertices.select(col("id").as("source"))
    val bfs = ShortestPaths.bfs(g, sources)
      .select(col("source").as("src"), col("id").as("dst"),
        col("dist").cast("double").as("dist"))
    val fwD = fw.select("src", "dst", "dist")
    assert(fwD.except(bfs).isEmpty && bfs.except(fwD).isEmpty)
  }

  test("negative edge without a cycle relaxes through") {
    // s→a direct 5.0; s→b 2.0, b→a −4.0 ⇒ dist(s,a) = −2.0 in 2 hops
    val g = graphOf(directed = true, (0L, 1L, 5.0), (0L, 2L, 2.0), (2L, 1L, -4.0))
    val fw = Apsp.floydWarshall(g)
    val r = fw.filter(col("src") === 0 && col("dst") === 1).head
    assert(r.getDouble(2) == -2.0 && r.getLong(3) == 2L)
    assert(Apsp.negativeCycleNodes(fw).count() == 0)
  }

  test("negative cycle members are flagged; off-cycle node is not") {
    // cycle 0→1→2→0 of total weight −1; 3 hangs off it (0→3)
    val g = graphOf(directed = true,
      (0L, 1L, 1.0), (1L, 2L, -3.0), (2L, 0L, 1.0), (0L, 3L, 1.0))
    val neg = Apsp.negativeCycleNodes(Apsp.floydWarshall(g))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(neg == Seq(0L, 1L, 2L))
  }

  test("equal-weight paths break ties on fewest nodes") {
    // 0→1→4 dist 2.0 in 2 hops vs 0→2→3→4 dist 2.0 in 3 hops
    val g = graphOf(directed = true,
      (0L, 1L, 1.0), (1L, 4L, 1.0),
      (0L, 2L, 1.0), (2L, 3L, 0.5), (3L, 4L, 0.5))
    val r = Apsp.floydWarshall(g)
      .filter(col("src") === 0 && col("dst") === 4).head
    assert(r.getDouble(2) == 2.0 && r.getLong(3) == 2L)
  }

  test("unreachable pairs are absent; diagonal is zero") {
    val g = graphOf(directed = true, (0L, 1L, 1.0), (2L, 3L, 1.0))
    val fw = Apsp.floydWarshall(g)
    assert(fw.filter(col("src") === 0 && col("dst") === 2).count() == 0)
    assert(fw.filter(col("src") === col("dst"))
      .filter(col("dist") =!= 0.0 || col("hops") =!= 0L).count() == 0)
    assert(fw.filter(col("src") === col("dst")).count() == 4)
  }
}
