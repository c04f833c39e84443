package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Distance tail: volume, diameter bounds, DynDijkstra, dyn top-k
  * harmonic. */
class DistanceTailSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("diameter: karate double-sweep lb ≤ exact = 5") {
    val (lb, exact) = DistanceTail.diameter(karate)
    assert(exact == 5L, s"karate diameter $exact")
    assert(lb >= 1L && lb <= exact)
  }

  test("volume: star r=1 ball averages over center and leaves") {
    // star K_{1,4}: ball(center) = 5, ball(leaf) = 2 → avg over all 5
    // starts = (5 + 4·2)/5
    val star = PropertyGraph.fromEdges(
      (1L to 4L).map(l => (0L, l)).toDF("src", "dst"), directed = false)
    val v = DistanceTail.volumeFrom(star,
      star.vertices.select(col("id").as("source")), r = 1)
    assert(math.abs(v - 13.0 / 5.0) < 1e-12, s"volume $v")
  }

  test("updateDijkstraInsert equals from-scratch Dijkstra after re-insertion") {
    val held = Seq((0L, 31L, 1.0), (2L, 32L, 1.0)).toDF("src", "dst", "weight")
    val base = karate.edges
      .join(held.select("src", "dst"), Seq("src", "dst"), "left_anti")
      .join(held.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_anti")
    val g1 = PropertyGraph(base, directed = false, Some(karate.vertices))
    val sources = karate.vertices.select(col("id").as("source"))
    val state0 = ShortestPaths.dijkstra(g1, sources)
    val inc = DistanceTail.updateDijkstraInsert(karate, state0, held)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val scratch = ShortestPaths.dijkstra(karate, sources)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inc == scratch)
  }

  test("dynTopHarmonic equals recomputed top-k after insertions") {
    val held = Seq((0L, 31L), (2L, 32L)).toDF("src", "dst")
    val base = karate.edges
      .join(held, Seq("src", "dst"), "left_anti")
      .join(held.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_anti")
    val g1 = PropertyGraph(base, directed = false, Some(karate.vertices))
    val cands = karate.vertices.select(col("id").as("source"))
    val state0 = ShortestPaths.bfs(g1, cands)
    val inc = DistanceTail.dynTopHarmonic(karate, state0, held, k = 5)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id"))).toSet
    val scratch = ShortestPaths.harmonicCloseness(ShortestPaths.bfs(karate, cands))
    import org.apache.spark.sql.expressions.Window
    val top = scratch.withColumn("rank",
        row_number().over(Window.orderBy(col("harmonic").desc, col("id").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id"))).toSet
    assert(inc == top)
  }

  test("neighborhoodFunction heuristic: anchors exact, full sampling == exact NF") {
    val karate = graft.io.GraphReaders.readMetis(
      spark, "/root/reference/input/karate.graph")
    // nSamples >= n -> every node is a source: counts are exact
    val nf = graft.graph.NeighborhoodFunction.heuristic(karate, nSamples = 34)
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(nf(1) == 2.0 * 78, "NF(1) anchor must be 2m")
    assert(nf(5) == 34.0 * 33, "NF(diameter) anchor must be n(n-1)")
    // karate is connected with diameter 5: the h=4 cumulative must
    // already be close to n(n-1) and monotone
    assert(nf(2) > nf(1) && nf(3) > nf(2) && nf(4) > nf(3))
    assert(nf(4) <= 34.0 * 33)
    // exact full-sample NF(2): pairs within distance <= 2
    val d = graft.graph.ShortestPaths.bfs(karate,
      karate.vertices.select(org.apache.spark.sql.functions.col("id").as("source")))
    val within2 = d.filter("dist > 0 and dist <= 2").count()
    assert(nf(2) == within2.toDouble, s"${nf(2)} vs $within2")
  }
}
