package graft

import org.apache.spark.sql.functions._
import graft.graph.{MaxFlow, PropertyGraph}
import graft.io.GraphReaders

/** Distributed push-relabel max-flow: equals Edmonds-Karp on every
  * fixture, min-cut certificate checks out. */
class PushRelabelSpec extends SparkSpec {

  private def flowOf(edges: Seq[(Long, Long, Double)], directed: Boolean,
      s: Long, t: Long): (Double, Double) = {
    import spark.implicits._
    val g = PropertyGraph(edges.toDF("src", "dst", "weight"), directed)
    val (ek, _) = MaxFlow.edmondsKarp(g, s, t)
    val (pr, cut) = MaxFlow.pushRelabel(g, s, t)
    // certificate: cut capacity == flow
    val cutCap = g.adjacency
      .join(cut.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(cut.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .agg(coalesce(sum("weight"), lit(0.0))).head.getDouble(0)
    assert(math.abs(cutCap - pr) < 1e-6, s"cut=$cutCap flow=$pr")
    (ek, pr)
  }

  test("diamond with bottleneck: both engines find the classic value") {
    // s=0 → {1,2} → t=3, cross arc 1→2
    val (ek, pr) = flowOf(Seq(
      (0L, 1L, 10.0), (0L, 2L, 10.0), (1L, 3L, 10.0), (2L, 3L, 10.0),
      (1L, 2L, 1.0)), directed = true, 0L, 3L)
    assert(ek == 20.0 && pr == 20.0)
  }

  test("directed chain with varying capacities: min edge wins") {
    val (ek, pr) = flowOf(Seq(
      (0L, 1L, 7.0), (1L, 2L, 3.0), (2L, 3L, 9.0)), directed = true, 0L, 3L)
    assert(ek == 3.0 && pr == 3.0)
  }

  test("undirected karate: push-relabel equals Edmonds-Karp for 3 pairs") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    for ((s, t) <- Seq((0L, 33L), (5L, 30L), (13L, 24L))) {
      val (ek, _) = MaxFlow.edmondsKarp(karate, s, t)
      val (pr, _) = MaxFlow.pushRelabel(karate, s, t)
      assert(math.abs(ek - pr) < 1e-6, s"($s,$t): ek=$ek pr=$pr")
    }
  }

  test("disconnected pair: zero flow, cut = source component") {
    import spark.implicits._
    val g = PropertyGraph(Seq((0L, 1L, 5.0), (2L, 3L, 5.0))
      .toDF("src", "dst", "weight"), directed = false)
    val (pr, cut) = MaxFlow.pushRelabel(g, 0L, 3L)
    assert(pr == 0.0)
    assert(cut.collect().map(_.getLong(0)).toSet == Set(0L, 1L))
  }
}
