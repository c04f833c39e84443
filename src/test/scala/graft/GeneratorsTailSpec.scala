package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Generator tail: ring lattice, Dorogovtsev–Mendes, Havel–Hakimi,
  * PubWeb, Mocnik, dynamic streams, and curveball randomization.
  */
class GeneratorsTailSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("regularRingLattice: exact edge count and uniform degree 2k") {
    val g = Generators.regularRingLattice(spark, 100, 4)
    assert(g.edges.count() == 400)
    val degs = g.degrees.select("degree").distinct().as[Long].collect()
    assert(degs.toSeq == Seq(8L))
  }

  test("dorogovtsevMendes: 2n-3 edges, deterministic, connected") {
    val e1 = Generators.dorogovtsevMendes(spark, 300, seed = 7)
    val e2 = Generators.dorogovtsevMendes(spark, 300, seed = 7)
    assert(e1.count() == 597)
    assert(e1.except(e2).isEmpty)
    val g = PropertyGraph.fromEdges(e1, directed = false)
    assert(ConnectedComponents.run(g).select("component").distinct().count() == 1)
  }

  test("havelHakimi realizes a graphical sequence exactly") {
    val seq = Seq((1L, 3), (2L, 2), (3L, 2), (4L, 2), (5L, 1))
    val g = Generators.havelHakimi(spark, seq)
    val got = g.degrees.as[(Long, Long)].collect().toMap
    seq.foreach { case (id, d) => assert(got.getOrElse(id, 0L) == d.toLong, s"node $id") }
  }

  test("havelHakimi round-trips the karate degree sequence") {
    val degSeq = karate.degrees.as[(Long, Long)].collect()
      .map { case (i, d) => (i, d.toInt) }.toSeq
    val g = Generators.havelHakimi(spark, degSeq)
    val diff = g.degrees.join(
        karate.degrees.withColumnRenamed("degree", "want"), "id")
      .filter(col("degree") =!= col("want")).count()
    assert(diff == 0)
  }

  test("globalCurveball preserves the degree sequence and perturbs the edge set") {
    val cb = Randomization.globalCurveball(karate, trades = 4, seed = 3)
    val h1 = karate.degrees.groupBy("degree").agg(count(lit(1)).as("n"))
    val h2 = cb.degrees.groupBy("degree").agg(count(lit(1)).as("n"))
    assert(h1.except(h2).isEmpty && h2.except(h1).isEmpty)
    assert(cb.edges.count() == karate.edges.count())
    val moved = PropertyGraph.canonicalizeUndirected(karate.edges)
      .select("src", "dst").except(cb.edges.select("src", "dst")).count()
    assert(moved > 0, "curveball should rewire at least one edge")
  }

  test("pubWeb: node count, degree cap, determinism") {
    val g = GeometricGenerators.pubWeb(spark, 250, 4, 0.12, 6, seed = 5)
    assert(g.vertices.count() == 250)
    assert(g.degrees.agg(max("degree")).as[Long].head() <= 6L)
    val g2 = GeometricGenerators.pubWeb(spark, 250, 4, 0.12, 6, seed = 5)
    assert(g.edges.select("src", "dst").except(g2.edges.select("src", "dst")).isEmpty)
  }

  test("mocnik: expected degree near k") {
    val g = GeometricGenerators.mocnik(spark, 500, 6.0, seed = 9)
    assert(g.vertices.count() == 500)
    val avgDeg = g.degrees.agg(avg("degree")).as[Double].head()
    // boundary clipping lowers the mean below the torus-free k
    assert(avgDeg > 3.0 && avgDeg < 9.0, s"avg degree $avgDeg")
  }

  test("dynamic streams: DM events replay to the static graph; forest fire valid") {
    val ev = Generators.dynamicDorogovtsevMendes(spark, 100, seed = 11)
    val adds = ev.filter(col("type") === "EDGE_ADDITION")
    assert(adds.count() == 197)
    assert(ev.filter(col("type") === "NODE_ADDITION").count() == 100)
    // every edge event references nodes added at an earlier-or-equal step
    val nodeStep = ev.filter(col("type") === "NODE_ADDITION")
      .select(col("u").as("n"), col("step").as("ns"))
    val bad = adds.join(nodeStep, adds("u") === nodeStep("n"))
      .filter(col("ns") > col("step")).count()
    assert(bad == 0)

    val ff = Generators.dynamicForestFire(spark, 150, 0.25, seed = 13)
    assert(ff.filter(col("type") === "NODE_ADDITION").count() == 150)
    val ffg = PropertyGraph.fromEdges(
      ff.filter(col("type") === "EDGE_ADDITION").select("u", "v"),
      directed = false, src = "u", dst = "v")
    // each new node burns at least its ambassador: n-1 edges minimum
    assert(ffg.edges.count() >= 149)
  }
}
