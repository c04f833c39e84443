package graft

import org.apache.spark.sql.functions._
import graft.graph.{Planarity, PropertyGraph}

/** Left-right planarity test on golden fixtures (K5/K3,3 per
  * Kuratowski, grids, subdivisions, disconnected unions). */
class PlanaritySpec extends SparkSpec {

  private def graphOf(pairs: Seq[(Long, Long)]): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(pairs.toDF("src", "dst").withColumn("weight", lit(1.0)),
      directed = false)
  }

  private def complete(n: Int, offset: Long = 0L): Seq[(Long, Long)] =
    for { i <- 0 until n; j <- i + 1 until n }
      yield (offset + i.toLong, offset + j.toLong)

  private def bipartite(a: Int, b: Int): Seq[(Long, Long)] =
    for { i <- 0 until a; j <- 0 until b } yield (i.toLong, (a + j).toLong)

  test("K4 and K5-minus-an-edge are planar; K5 and K3,3 are not") {
    assert(Planarity.isPlanar(graphOf(complete(4))))
    assert(Planarity.isPlanar(graphOf(complete(5).tail))) // drop one edge
    assert(!Planarity.isPlanar(graphOf(complete(5))))
    assert(!Planarity.isPlanar(graphOf(bipartite(3, 3))))
  }

  test("K3,3 subdivision is still non-planar (Euler bound passes, LR catches it)") {
    // subdivide every K3,3 edge once: 15 nodes, 18 edges — m ≤ 3n−6 holds
    val sub = bipartite(3, 3).zipWithIndex.flatMap { case ((u, v), i) =>
      val mid = 100L + i
      Seq((u, mid), (mid, v))
    }
    assert(!Planarity.isPlanar(graphOf(sub)))
  }

  test("petersen graph is non-planar") {
    val outer = (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong))
    val spokes = (0 until 5).map(i => (i.toLong, (5 + i).toLong))
    val inner = (0 until 5).map(i => ((5 + i).toLong, (5 + (i + 2) % 5).toLong))
    assert(!Planarity.isPlanar(graphOf(outer ++ spokes ++ inner)))
  }

  test("10x10 grid, cycle, and star are planar") {
    val grid = (for { r <- 0 until 10; c <- 0 until 10 } yield {
      val id = (r * 10 + c).toLong
      Seq(
        if (c < 9) Some((id, id + 1)) else None,
        if (r < 9) Some((id, id + 10)) else None).flatten
    }).flatten
    assert(Planarity.isPlanar(graphOf(grid)))
    val cycle = (0 until 50).map(i => (i.toLong, ((i + 1) % 50).toLong))
    assert(Planarity.isPlanar(graphOf(cycle)))
    val star = (1 to 20).map(i => (0L, i.toLong))
    assert(Planarity.isPlanar(graphOf(star)))
  }

  test("disconnected: planar+planar is planar, planar+K5 is not") {
    val two = complete(4) ++ complete(4, offset = 100L)
    assert(Planarity.isPlanar(graphOf(two)))
    val withK5 = complete(4) ++ complete(5, offset = 100L)
    assert(!Planarity.isPlanar(graphOf(withK5)))
  }

  test("maximal planar graph (octahedron) is planar; plus any edge non-planar") {
    // octahedron = K2,2,2: 6 nodes, 12 edges = 3n−6
    val oct = complete(6).filterNot { case (u, v) =>
      (u == 0 && v == 1) || (u == 2 && v == 3) || (u == 4 && v == 5)
    }
    assert(Planarity.isPlanar(graphOf(oct)))
  }
}
