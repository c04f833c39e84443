package graft

import org.apache.spark.sql.functions._
import graft.graph.Generators

/** Exact-ensemble Barabási–Albert (`BarabasiAlbertGenerator.cpp:116`
  * parallel variant): structural invariants the reference guarantees —
  * k distinct earlier neighbors per attaching node, exact edge count,
  * no self-loops, preferential attachment visible in the seed nodes'
  * degrees — plus determinism. */
class BaSpec extends SparkSpec {

  test("ba: exact edge count, k distinct earlier neighbors, no loops") {
    val n = 500L; val k = 4
    val g = Generators.barabasiAlbert(spark, n, k, seed = 7)
    // n0 = k cycle edges + (n - k)·k attachment edges
    assert(g.edges.count() == k + (n - k) * k)
    assert(g.edges.filter(col("src") === col("dst")).isEmpty)
    // every attaching node v ≥ k: exactly k DISTINCT neighbors, all < v
    val ba = g.edges.filter(col("dst") >= k)
    assert(ba.filter(col("src") >= col("dst")).isEmpty,
      "attachment edges must point to earlier nodes")
    val perNode = ba.groupBy("dst").agg(
      count(lit(1)).as("c"), countDistinct(col("src")).as("d"))
    assert(perNode.filter(col("c") =!= k || col("d") =!= k).isEmpty,
      "each node must attach to exactly k distinct neighbors")
    assert(perNode.count() == n - k)
  }

  test("ba: deterministic in seed, seed-sensitive") {
    val a = Generators.barabasiAlbert(spark, 300, 3, seed = 11).edges
    val b = Generators.barabasiAlbert(spark, 300, 3, seed = 11).edges
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val c = Generators.barabasiAlbert(spark, 300, 3, seed = 12).edges
    assert(a.select("src", "dst").except(c.select("src", "dst")).count() > 0)
  }

  test("ba: preferential attachment concentrates degree on early nodes") {
    val n = 2000L; val k = 3
    val g = Generators.barabasiAlbert(spark, n, k, seed = 5)
    val deg = g.adjacency.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val early = deg.filter(col("id") < 20).agg(avg("d")).head.getDouble(0)
    val late = deg.filter(col("id") >= n - 500).agg(avg("d")).head.getDouble(0)
    // BA degree of node v ~ k·sqrt(n/v); earliest 20 nodes should be
    // far above the newest 500 (which sit near k)
    assert(early > 3 * late, s"early=$early late=$late")
    assert(late < k + 2, s"newest nodes must sit near k, got $late")
  }
}
