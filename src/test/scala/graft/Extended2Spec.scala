package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Round-2 operator batch: max-flow, edge-switching randomization,
  * b-matching, square clustering, group centralities — golden-graph
  * checks on karate plus hand-computable micrographs.
  */
class Extended2Spec extends SparkSpec {
  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(edges.toDF("src", "dst", "weight"),
      directed = false, Some(spark.range(n).select(col("id"))))
  }

  test("maxflow: two parallel 2-paths s->t carry flow 2; certificate holds") {
    // s=0, t=3; paths 0-1-3 and 0-2-3, unit capacities
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 3L, 1.0), (0L, 2L, 1.0), (2L, 3L, 1.0)), 4)
    val (flow, cut) = MaxFlow.edmondsKarp(g, 0L, 3L)
    assert(math.abs(flow - 2.0) < 1e-9, s"flow $flow")
    assert(cut.contains(0L) && !cut.contains(3L))
    val r = MaxFlow.maxFlowCertified(g, 0L, 3L).head()
    assert(r.getAs[Long]("certificate_ok") == 1L)
  }

  test("maxflow: bottleneck edge bounds the flow") {
    // 0-1 capacity 5, 1-2 capacity 1 → flow(0,2) = 1
    val g = graphOf(Seq((0L, 1L, 5.0), (1L, 2L, 1.0)), 3)
    val (flow, _) = MaxFlow.edmondsKarp(g, 0L, 2L)
    assert(math.abs(flow - 1.0) < 1e-9, s"flow $flow")
  }

  test("edge switching: preserves degree sequence and edge count on karate") {
    val rnd = Randomization.edgeSwitching(karate, rounds = 5)
    assert(rnd.edges.count() == 78, s"${rnd.edges.count()} edges")
    def hist(g: PropertyGraph) = {
      val adj = g.edges.select("src", "dst")
        .unionAll(g.edges.select(col("dst").as("src"), col("src").as("dst")))
      adj.groupBy("src").agg(count(lit(1)).as("d"))
        .groupBy("d").agg(count(lit(1)).as("n"))
        .orderBy("d").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    assert(hist(rnd) == hist(karate), "degree histogram must be invariant")
    val moved = rnd.edges.select("src", "dst")
      .join(karate.edges.select("src", "dst"), Seq("src", "dst"), "left_anti").count()
    assert(moved > 0, "five rounds must move at least one edge")
  }

  test("b-matching (b=2): valid capacities, larger than 1-matching") {
    val m2 = Matching.bSuitor(karate, b = 2)
    val counts = m2.select(col("u").as("id")).unionAll(m2.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n"))
    assert(counts.filter(col("n") > 2).count() == 0, "capacity violated")
    val m1 = Matching.suitor(karate)
    assert(m2.count() >= m1.count(), s"${m2.count()} vs ${m1.count()}")
  }

  test("path-growing matching: valid, half-approx on a known-optimum path") {
    // weighted P4: 0-1 (1), 1-2 (3), 2-3 (1) — optimum matching = {1-2} w=3;
    // path growing from a degree-1 end follows the heaviest live edge
    val p4 = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 3.0), (2L, 3L, 1.0)), 4)
    val m = Matching.pathGrowing(p4)
    val w = m.agg(sum("weight")).head.getDouble(0)
    assert(w >= 1.5, s"weight $w below OPT/2") // ≥ OPT/2 = 1.5
    val ends = m.select(col("u").as("id")).unionAll(m.select(col("v").as("id")))
    assert(ends.count() == ends.distinct().count())
  }

  test("path-growing matching on karate: valid, within 2x of suitor both ways") {
    val pg = Matching.pathGrowing(karate)
    val ends = pg.select(col("u").as("id")).unionAll(pg.select(col("v").as("id")))
    assert(ends.count() == ends.distinct().count())
    val wPg = pg.agg(sum("weight")).head.getDouble(0)
    val wSu = Matching.suitor(karate).agg(sum("weight")).head.getDouble(0)
    // both are 1/2-approximations: each ≥ OPT/2 and ≤ OPT → ratio ∈ [0.5, 2]
    assert(wPg >= wSu / 2 && wPg <= wSu * 2, s"pg=$wPg suitor=$wSu")
  }

  test("square clustering: C4 of a 4-cycle corner is 1, star center is 0") {
    val square = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 0L, 1.0)), 4)
    val sq = Triangles.localSquareClusteringCoefficient(square)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sq.values.forall(v => math.abs(v - 1.0) < 1e-9), s"$sq")
    val star = graphOf(Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0)), 4)
    val st = Triangles.localSquareClusteringCoefficient(star)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(st(0L) == 0.0, s"$st")
  }

  test("group degree: k=1 picks the max-degree node; gains decrease") {
    val gd = GroupCentrality.groupDegree(karate, 3)
      .orderBy("rank").collect()
    assert(gd(0).getLong(1) == 33L || gd(0).getLong(1) == 0L) // degree 17 node 33
    val gains = gd.map(_.getLong(2))
    assert(gains.sameElements(gains.sorted.reverse), "marginal gains must be non-increasing")
  }

  test("cut clustering: alpha=0 -> one cluster, alpha >= max weight -> singletons") {
    val one = MaxFlow.cutClustering(karate, 0.0)
    assert(one.select("community").distinct().count() == 1, "alpha=0 must give one cluster")
    val singles = MaxFlow.cutClustering(karate, 2.0)
    assert(singles.select("community").distinct().count() == 34,
      "alpha >= max edge weight must give singletons")
    // cluster count is monotone in alpha (Flake et al. hierarchy);
    // karate's alpha breakpoints are abrupt, so only monotonicity is
    // asserted for the middle value
    val mid = MaxFlow.cutClustering(karate, 0.5)
    val k = mid.select("community").distinct().count()
    assert(k >= 1 && k <= 34, s"mid alpha gave $k clusters")
  }

  test("cut clustering: distributed push-relabel path equals the driver EK path") {
    import spark.implicits._
    // two K4s joined by a single bridge: alpha = 0.5 cuts at the bridge,
    // giving exactly two communities → two Flake flows per path.
    // driverMaxElements = 0 forces every flow through pushRelabel; both
    // paths take the residual-reachable source side = the unique MINIMAL
    // min cut, so the partitions must be identical, not merely equivalent.
    val k4a = for (i <- 0 until 4; j <- i + 1 until 4) yield (i.toLong, j.toLong)
    val k4b = k4a.map { case (u, v) => (u + 4, v + 4) }
    val edges = (k4a ++ k4b :+ (3L, 4L))
      .toDF("src", "dst").withColumn("weight", lit(1.0))
    val g = PropertyGraph(edges, directed = false,
      Some(spark.range(8).select(col("id"))))
    val viaEk = MaxFlow.cutClustering(g, 0.5)
    val viaPr = MaxFlow.cutClustering(g, 0.5, driverMaxElements = 0L)
    assert(viaEk.select("community").distinct().count() == 2)
    assert(viaEk.except(viaPr).isEmpty && viaPr.except(viaEk).isEmpty,
      "distributed CutClustering diverged from the driver path")
  }

  test("scd seed expansion: karate seed 33 grows a connected low-conductance set") {
    val comm = Community.expandSeed(karate, 33L, maxSize = 18)
    val members = comm.collect().map(_.getLong(0)).toSet
    assert(members.contains(33L))
    assert(members.size > 3 && members.size <= 18, s"size ${members.size}")
    // the instructor faction (around node 0) should be mostly absent
    assert(!members.contains(0L) || members.size > 12,
      s"seed-33 community unexpectedly swallowed node 0 early: $members")
  }

  test("hyperbolic generator: deterministic, connected-ish core, heavy-tailed degrees") {
    val g = Generators.hyperbolic(spark, 500, radius = 6.0, gamma = 3.0)
    val g2 = Generators.hyperbolic(spark, 500, radius = 6.0, gamma = 3.0)
    assert(g.edges.count() == g2.edges.count(), "deterministic per seed")
    val m = g.edges.count()
    assert(m > 250, s"too sparse: $m edges")
    val deg = g.edges.select(col("src").as("id"))
      .unionAll(g.edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val r = deg.agg(max("d"), avg("d")).head
    assert(r.getLong(0) >= 4 * r.getDouble(1),
      s"hyperbolic geometry should give hubs: max ${r.getLong(0)} avg ${r.getDouble(1)}")
  }

  test("hyperbolic banded scale path == pairwise predicate, edge-exact") {
    val banded = Generators.hyperbolic(spark, 1500, radius = 7.0, gamma = 2.7, seed = 11)
    val pair = Generators.hyperbolicPairwise(spark, 1500, radius = 7.0, gamma = 2.7, seed = 11)
    val b = banded.edges.select("src", "dst")
    val p = pair.edges.select("src", "dst")
    assert(b.count() == p.count(), s"banded ${b.count()} vs pairwise ${p.count()}")
    assert(b.except(p).isEmpty && p.except(b).isEmpty)
  }

  test("hyperbolic at n=2e5: linear-candidate path runs, hubs present") {
    val g = Generators.hyperbolic(spark, 200000, radius = 14.0, gamma = 2.9, seed = 3)
    val m = g.edges.count()
    assert(m > 100000, s"too sparse: $m")
    val deg = g.edges.select(col("src").as("id"))
      .unionAll(g.edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val r = deg.agg(max("d"), avg("d")).head
    assert(r.getLong(0) >= 10 * r.getDouble(1),
      s"expected heavy tail: max ${r.getLong(0)} avg ${r.getDouble(1)}")
  }

  test("configuration model: realizes a degree sequence up to erased stubs, deterministic") {
    import spark.implicits._
    val degs = (0L until 60L).map(i => (i, 2L + i % 4)).toDF("id", "deg")
    val g1 = Generators.configurationModel(spark, degs, seed = 5)
    val g2 = Generators.configurationModel(spark, degs, seed = 5)
    assert(g1.edges.count() == g2.edges.count(), "deterministic per seed")
    val want = degs.agg(sum("deg")).head.getLong(0) / 2
    val got = g1.edges.count()
    assert(got <= want && got >= (want * 0.85).toLong,
      s"$got edges vs $want stubs/2 (erasure should be small)")
    // realized degree never exceeds the requested degree
    val adj = g1.edges.select("src", "dst")
      .unionAll(g1.edges.select(col("dst").as("src"), col("src").as("dst")))
    val over = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      .join(degs, "id").filter(col("d") > col("deg")).count()
    assert(over == 0, "realized degree must not exceed requested")
  }

  test("group harmonic closeness: 3 members, scores increase with set size") {
    val gh = GroupCentrality.groupHarmonicCloseness(karate, 3, nCandidates = 8)
      .orderBy("rank").collect()
    assert(gh.length == 3)
    val scores = gh.map(_.getDouble(2))
    assert(scores(1) >= scores(0) && scores(2) >= scores(1),
      s"group score must be monotone: ${scores.mkString(",")}")
  }
}
