package graft

import org.apache.spark.sql.functions._
import graft.algebra.Coo
import graft.graph.{PageRank, ShortestPaths}
import graft.io.GraphReaders

/** Algebraic-kernel equivalence (reference `algebraic/algorithms/
  * AlgebraicBFS.hpp:21`, `AlgebraicPageRank.hpp:22`,
  * `AlgebraicBellmanFord.hpp:21`): the same answers must come out of
  * the semiring MxV machinery as out of the graph-native kernels —
  * NetworKit pins its Algebraic* wrappers to the graph algorithms the
  * same way. */
class AlgebraicKernelsSpec extends SparkSpec {

  private def karate =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("algebraic BFS: iterated min-plus MxV distances == ShortestPaths.bfs") {
    import spark.implicits._
    val g = karate
    // hop matrix: every stored arc costs 1
    val a = Coo.transpose(
      Coo.adjacencyMatrix(g).select(col("i"), col("j"), lit(1.0).as("v")))
    // x0 = source vector (0 at source); relax n times or until stable
    var x = Seq((0L, 0.0)).toDF("i", "v")
    for (_ <- 1 to 8) { // karate diameter is 5
      val relaxed = Coo.mxv(a, x, Coo.minPlus)
      x = relaxed.unionAll(x) // min with previous state (vector eWiseAdd)
        .groupBy("i").agg(min("v").as("v"))
        .localCheckpoint(true)
    }
    val bfs = ShortestPaths.bfs(g, Seq((0L, 0L)).toDF("source", "id").select("source"))
      .select(col("id").as("i"), col("dist").cast("double").as("bd"))
    val joined = x.join(bfs, "i")
    assert(joined.count() == 34)
    assert(joined.filter(col("v") =!= col("bd")).isEmpty,
      "min-plus closure must equal BFS distances")
  }

  test("algebraic BellmanFord: weighted min-plus MxV == dijkstra") {
    import spark.implicits._
    // weighted directed ring + shortcuts, positive weights
    val edges = ((0 until 12).map(i => (i.toLong, ((i + 1) % 12).toLong, 2.0)) ++
      Seq((0L, 6L, 5.0), (3L, 9L, 4.0))).toDF("src", "dst", "weight")
    val g = graft.graph.PropertyGraph(edges, directed = true)
    val a = Coo.transpose(Coo.adjacencyMatrix(g))
    var x = Seq((0L, 0.0)).toDF("i", "v")
    for (_ <- 1 to 12) {
      x = Coo.mxv(a, x, Coo.minPlus).unionAll(x)
        .groupBy("i").agg(min("v").as("v"))
        .localCheckpoint(true)
    }
    val dj = ShortestPaths.dijkstra(g,
        Seq((0L, 0L)).toDF("source", "id").select("source"))
      .select(col("id").as("i"), col("dist").as("dd"))
    val joined = x.join(dj, "i")
    assert(joined.filter(abs(col("v") - col("dd")) > 1e-9).isEmpty,
      "Bellman-Ford closure must equal Dijkstra")
  }

  test("algebraic PageRank: arithmetic MxV power iteration == PageRank.run") {
    import spark.implicits._
    val g = karate
    val n = 34L
    // column-stochastic transition (undirected: out-degree = degree)
    val deg = g.adjacency.groupBy(col("src").as("j")).agg(count(lit(1)).as("d"))
    val p = Coo.adjacencyMatrix(g)
      .select(col("j").as("i"), col("i").as("j"), col("v")) // transpose: mass flows src→dst
      .join(deg, "j")
      .select(col("i"), col("j"), (col("v") / col("d")).as("v"))
    var x = spark.range(n).select(col("id").as("i"), lit(1.0 / n).as("v"))
    for (_ <- 1 to 60) {
      x = Coo.mxv(p, x, Coo.arithmetic)
        .select(col("i"), (lit(0.15 / n) + lit(0.85) * col("v")).as("v"))
        .localCheckpoint(true)
    }
    val pr = PageRank.run(g).select(col("id").as("i"), col("rank").as("r"))
    val joined = x.join(pr, "i")
    assert(joined.count() == 34)
    val maxDiff = joined.agg(max(abs(col("v") - col("r")))).head.getDouble(0)
    assert(maxDiff < 1e-6, s"algebraic vs native PageRank maxDiff=$maxDiff")
  }
}
