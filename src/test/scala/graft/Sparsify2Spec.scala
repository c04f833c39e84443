package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Local-similarity and forest-fire edge scores. */
class Sparsify2Spec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("localSimilarityScore: scores in [0,1], degree-1 edges get 1.0") {
    // path graph: ends have degree 1 → their edge scores 1.0
    val path = PropertyGraph.fromEdges(
      Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), directed = false)
    val s = Sparsification.localSimilarityScore(path)
      .select("score").as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0))

    val ks = Sparsification.localSimilarityScore(karate)
    assert(ks.count() == karate.edges.count())
    val bad = ks.filter(col("score") < 0 || col("score") > 1).count()
    assert(bad == 0)
    // rank-1 edges exist for every node, so plenty of 1.0 scores
    assert(ks.filter(col("score") === 1.0).count() >= 10)
  }

  test("forestFireScore: deterministic, covers edges, burns bridge-heavy edges") {
    val f1 = Sparsification.forestFireScore(karate, nFires = 32, seed = 5)
    val f2 = Sparsification.forestFireScore(karate, nFires = 32, seed = 5)
    assert(f1.count() == karate.edges.count())
    assert(f1.except(f2).isEmpty && f2.except(f1).isEmpty)
    assert(f1.agg(max("score")).as[Double].head() > 0.0)
    assert(f1.filter(col("score") < 0).count() == 0)
  }

  test("randomEdgeScore: deterministic u01 per canonical edge, seed-sensitive") {
    val karate = graft.io.GraphReaders.readMetis(
      spark, "/root/reference/input/karate.graph")
    val a = graft.graph.Sparsification.randomEdgeScore(karate, seed = 1)
    val b = graft.graph.Sparsification.randomEdgeScore(karate, seed = 1)
    assert(a.count() == 78)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.filter(col("score") < 0 || col("score") >= 1).isEmpty)
    val c = graft.graph.Sparsification.randomEdgeScore(karate, seed = 2)
    assert(a.except(c).count() > 0)
  }
}
