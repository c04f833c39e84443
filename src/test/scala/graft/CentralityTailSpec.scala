package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Centrality tail: k-path sampled centrality + complex-contagion paths. */
class CentralityTailSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("kPathCentrality: nonneg, deterministic, hubs outrank leaves") {
    val s1 = Walks.kPathCentrality(karate, trials = 4000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = Walks.kPathCentrality(karate, trials = 4000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2, "deterministic")
    assert(s1.values.forall(_ >= 0))
    assert(s1.size == 34)
    // karate hubs 0/33 (degree 16/17) must clearly beat the degree-2 tail
    val hubs = (s1(0L) + s1(33L)) / 2
    val leaves = Seq(11L, 12L).map(s1).sum / 2 // degree 1 and 2 nodes
    assert(hubs > leaves, s"hubs $hubs vs leaves $leaves")
  }

  test("complexGraphs: star topology stops at the seeds, PLci exact") {
    // star K_{1,5}: center 0, leaves 1..5; threshold 2 → seeds are the
    // center + 1 smallest-id leaf, and no other leaf ever reaches 2
    // complex-graph neighbors, so adoption stops at the 2 seeds
    val star = PropertyGraph.fromEdges(
      (1L to 5L).map(l => (0L, l)).toDF("src", "dst"), directed = false)
    val srcs = Seq(0L).toDF("s")
    val (adopters, cedges) = ComplexPaths.complexGraphs(star, srcs, threshold = 2)
    assert(adopters.count() == 2) // center + smallest-id leaf
    assert(adopters.filter(col("ord") > 0).count() == 0)
    // complex graph still holds all center→leaf edges → every leaf at dist 1
    val plci = ComplexPaths.complexPathLengths(star, srcs, threshold = 2)
      .head().getDouble(1)
    assert(math.abs(plci - 5.0 / 6.0) < 1e-12, s"plci $plci")
    assert(cedges.filter(col("src") === 0L).count() == 5)
  }

  test("complexGraphs: karate core spreads beyond the seeds at threshold 2") {
    val srcs = Seq(0L).toDF("s")
    val (adopters, _) = ComplexPaths.complexGraphs(karate, srcs, threshold = 2)
    val n = adopters.count()
    assert(n > 3, s"no spread: $n")
    // validity: every late adopter had >= 2 adopter-side complex neighbors
    val (_, cedges) = ComplexPaths.complexGraphs(karate, srcs, threshold = 2)
    val deg = cedges.groupBy(col("s"), col("src").as("id")).agg(count(lit(1)).as("d"))
    val weak = adopters.filter(col("ord") > 0).join(deg, Seq("s", "id"), "left")
      .filter(coalesce(col("d"), lit(0L)) < 2).count()
    assert(weak == 0)
  }

  test("approxClosenessSplit: exact on samples, close elsewhere, eps=0 = sampling") {
    val exact = ShortestPaths.closeness(
        ShortestPaths.bfs(karate, karate.vertices.select(col("id").as("source"))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 34.0
    val est = ShortestPaths.approxCloseness(karate) // keep uniform path compiling
    assert(est.count() > 0)
    val split = ShortestPaths.approxClosenessSplit(karate, nSamples = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(split.size == 34)
    // closeness() is reach/sum(d); normalized (n-1)/farness = (n-1)/33 ratio
    def norm(c: Double) = c * (n - 1) / 33.0 // karate connected: reach=33
    // sampled nodes are computed exactly
    val samples = karate.vertices
      .orderBy(xxhash64(lit(42L), col("id")).asc, col("id").asc)
      .limit(16).select("id").as[Long].collect().toSet
    samples.foreach { s =>
      assert(math.abs(split(s) - norm(exact(s))) < 1e-9, s"sample $s not exact")
    }
    // non-samples: variance-split estimate within 25% mean relative error
    val errs = (split.keySet -- samples).toSeq
      .map(u => math.abs(split(u) - norm(exact(u))) / norm(exact(u)))
    assert(errs.sum / errs.size < 0.25, s"mean rel err ${errs.sum / errs.size}")
    // eps = 0 → pure sampling degenerate path still runs and stays sane
    val pure = ShortestPaths.approxClosenessSplit(karate, nSamples = 16, epsilon = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    samples.foreach { s => assert(math.abs(pure(s) - norm(exact(s))) < 1e-9) }
  }

  test("topCloseness: NB-cut pruned top-5 equals exact top-5 on karate") {
    val karate = graft.io.GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    // tiny batches force pruning decisions across many batches
    val pruned = ShortestPaths.topCloseness(karate, 5, batchSize = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val all = ShortestPaths.bfs(karate, karate.vertices.select(col("id").as("source")))
    val exact = ShortestPaths.closeness(all)
      .orderBy(desc("closeness"), asc("id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pruned.toSeq == exact.toSeq,
      s"pruned=${pruned.mkString(",")} exact=${exact.mkString(",")}")
  }

  test("topCloseness: pruned == exact on a 400-node ER graph") {
    val g = Generators.erdosRenyi(spark, 400, 0.02, seed = 13)
    val pruned = ShortestPaths.topCloseness(g, 10, batchSize = 64)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9)))
    val all = ShortestPaths.bfs(g, g.vertices.select(col("id").as("source")))
    val exact = ShortestPaths.closeness(all)
      .orderBy(desc("closeness"), asc("id")).limit(10)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9)))
    assert(pruned.toSeq == exact.toSeq)
  }
}
