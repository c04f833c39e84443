package graft

import org.apache.spark.sql.functions._
import graft.graph.{Generators, Randomization}
import graft.io.GraphReaders

/** DegreePreservingShuffle + ClusteredRandomGraphGenerator. */
class Randomization2Spec extends SparkSpec {

  test("degreePreservingShuffle: every id keeps its exact degree, labels move") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val shuffled = Randomization.degreePreservingShuffle(karate, seed = 5)
    def degTable(g: graft.graph.PropertyGraph) =
      g.adjacency.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val before = degTable(karate)
    val after = degTable(shuffled)
    assert(after.except(before).isEmpty && before.except(after).isEmpty,
      "per-id degrees must be invariant")
    assert(shuffled.edges.count() == 78)
    // the permutation is a bijection and moves at least one label
    val perm = Randomization.degreePreservingPermutation(karate, seed = 5)
    assert(perm.count() == 34)
    assert(perm.select("newId").distinct().count() == 34)
    assert(perm.filter(col("id") =!= col("newId")).count() > 0,
      "seeded shuffle must move some labels")
    // and moved labels only swap within equal-degree classes (implied by
    // the degree-table invariance, pinned explicitly here)
    val moved = perm.filter(col("id") =!= col("newId"))
      .join(before, Seq("id")).withColumnRenamed("d", "dOld")
      .join(before.withColumnRenamed("id", "newId"), Seq("newId"))
    assert(moved.filter(col("dOld") =!= col("d")).isEmpty)
  }

  test("edge switching / curveball rounds: no single-task exchange in the DAG") {
    // the r8 implementation globally ranked edges/nodes each round —
    // a Window with an empty partition spec, i.e. `Exchange SinglePartition`
    // in the physical plan. Bucketed pairing must produce neither.
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val es = Randomization.edgeSwitching(karate, rounds = 1, seed = 3)
    val cb = Randomization.globalCurveball(karate, trades = 1, seed = 3)
    // the public API localCheckpoints each round, hiding its plan — audit
    // one un-materialized round directly (package-private for this gate)
    val base = graft.graph.PropertyGraph.canonicalizeUndirected(
      karate.edges.filter(col("src") =!= col("dst"))).select("src", "dst").distinct()
    Seq(Randomization.round(base, 3L), Randomization.curveballRound(base, 3L))
      .foreach { oneRound =>
        val p = oneRound.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange SinglePartition"),
          s"randomization round plan has a single-task exchange:\n$p")
      }
    // and the results still hold the degree invariant
    def degs(e: org.apache.spark.sql.DataFrame) =
      e.select(col("src").as("id")).unionAll(e.select(col("dst").as("id")))
        .groupBy("id").count()
    assert(degs(es.edges.select("src", "dst"))
      .except(degs(karate.adjacency.filter(col("src") < col("dst"))
        .select("src", "dst"))).isEmpty)
    assert(cb.edges.count() == 78)
  }

  test("clusteredRandom: planted partition, deterministic, rates ordered") {
    val (g, part) = Generators.clusteredRandom(spark, 400, 4, 0.2, 0.01, seed = 8)
    val (g2, _) = Generators.clusteredRandom(spark, 400, 4, 0.2, 0.01, seed = 8)
    assert(g.edges.except(g2.edges).isEmpty && g2.edges.except(g.edges).isEmpty)
    assert(part.count() == 400)
    assert(part.select("community").distinct().count() == 4)
    val lbl = g.edges
      .join(part.select(col("id").as("src"), col("community").as("cs")), "src")
      .join(part.select(col("id").as("dst"), col("community").as("cd")), "dst")
    val intra = lbl.filter(col("cs") === col("cd")).count()
    val inter = lbl.filter(col("cs") =!= col("cd")).count()
    // ~400²/8 intra pairs at 0.2 vs ~3·400²/8 inter at 0.01: intra edges
    // must dominate despite 3× fewer pairs
    assert(intra > 3 * inter, s"intra=$intra inter=$inter")
  }
}
