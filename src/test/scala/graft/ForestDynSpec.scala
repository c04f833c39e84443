package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** Specs for the round-5 long-tail operators: random / union-max
  * spanning forests, degree-ordered PLP, incremental NMI distance, and
  * the dynamic hyperbolic generator. */
class ForestDynSpec extends SparkSpec {

  private def graphOf(edges: Seq[(Long, Long, Double)]): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(edges.toDF("src", "dst", "weight"), directed = false)
  }

  test("randomSpanningForest: n-c edges, subset of E, seed-sensitive") {
    // two squares joined by a bridge: 8 nodes, 9 edges, 1 component
    val edges = Seq((0L,1L), (1L,2L), (2L,3L), (3L,0L), (3L,4L),
      (4L,5L), (5L,6L), (6L,7L), (7L,4L)).map { case (u,v) => (u, v, 1.0) }
    val g = graphOf(edges)
    val forests = Seq(1L, 2L, 3L, 4L).map { seed =>
      val f = SpanningForest.randomSpanningForest(g, seed)
      val fs = f.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fs.size == 7, s"seed $seed: expected n-c=7 edges, got ${fs.size}")
      assert(fs.subsetOf(edges.map(e =>
        (math.min(e._1, e._2), math.max(e._1, e._2))).toSet))
      fs
    }
    // the two 4-cycles give 16 spanning trees; 4 seeds should not all agree
    assert(forests.distinct.size > 1, "all seeds produced the same forest")
  }

  test("maxSpanningForest picks the heavy edges") {
    // triangle 0-1-2 with weights 5,3,1 plus pendant: maxSF = {5,3,pendant}
    val g = graphOf(Seq((0L,1L,5.0), (1L,2L,3.0), (0L,2L,1.0), (2L,3L,2.0)))
    val f = SpanningForest.maxSpanningForest(g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(f == Set((0L,1L,5.0), (1L,2L,3.0), (2L,3L,2.0)))
  }

  test("unionMaximumSpanningForest keeps ties, drops dominated edges") {
    // triangle with weights 2,2,1: both 2s are in some maxSF, the 1 is not
    val g = graphOf(Seq((0L,1L,2.0), (1L,2L,2.0), (0L,2L,1.0)))
    val um = SpanningForest.unionMaximumSpanningForest(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(um == Set((0L,1L), (1L,2L)))
    // equal-weight square: every edge is in some maxSF
    val sq = graphOf(Seq((0L,1L,1.0), (1L,2L,1.0), (2L,3L,1.0), (0L,3L,1.0)))
    assert(SpanningForest.unionMaximumSpanningForest(sq).count() == 4)
  }

  test("plpDegreeOrdered labels two cliques like plp") {
    // two 4-cliques joined by one edge
    val cl = (base: Long) => for { i <- 0 until 4; j <- i + 1 until 4 }
      yield (base + i, base + j, 1.0)
    val g = graphOf(cl(0L) ++ cl(10L) :+ (3L, 10L, 1.0))
    val p = Community.plpDegreeOrdered(g, maxIter = 10)
    val byComm = p.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    // each clique must be uniform (the bridge may merge them or not)
    val cliqueA = Set(0L, 1L, 2L, 3L); val cliqueB = Set(10L, 11L, 12L, 13L)
    assert(byComm.forall(c => cliqueA.subsetOf(c) || cliqueB.subsetOf(c) ||
      c.intersect(cliqueA ++ cliqueB).isEmpty))
  }

  test("dynamicNmi equals from-scratch nmi at every step") {
    import spark.implicits._
    val ids = (0L until 60L)
    val base = ids.map(i => (i, i % 5)).toDF("id", "community")
    val initial = ids.map(i => (i, i % 3)).toDF("id", "community")
    val changes = ids.filter(_ % 7 == 0).map(i => (1L, i, 99L))
      .++(ids.filter(_ % 7 == 1).map(i => (2L, i, 98L)))
      .toDF("step", "id", "community")
    val dyn = Community.dynamicNmi(base, initial, changes).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def evolved(t: Long) = ids.map { i =>
      val c = if (i % 7 == 0 && t >= 1) 99L
        else if (i % 7 == 1 && t >= 2) 98L else i % 3
      (i, c)
    }.toDF("id", "community")
    (0L to 2L).foreach { t =>
      val s = Community.nmi(base, evolved(t))
      assert(math.abs(dyn(t) - s) < 1e-9, s"step $t: ${dyn(t)} vs $s")
    }
  }

  test("maximalCliques matches brute force on structured graphs") {
    // K5 → one maximal clique {0..4}
    val k5 = graphOf(for { i <- 0 until 5; j <- i + 1 until 5 }
      yield (i.toLong, j.toLong, 1.0))
    val mk5 = Cliques.maximalCliques(k5).collect().map(_.getSeq[Long](0).toSet)
    assert(mk5.toSet == Set(Set(0L, 1L, 2L, 3L, 4L)))
    // two triangles sharing an edge + a pendant: {0,1,2}, {1,2,3}, {3,4}
    val g = graphOf(Seq((0L,1L,1.0), (0L,2L,1.0), (1L,2L,1.0),
      (1L,3L,1.0), (2L,3L,1.0), (3L,4L,1.0)))
    val mg = Cliques.maximalCliques(g).collect().map(_.getSeq[Long](0).toSet).toSet
    assert(mg == Set(Set(0L,1L,2L), Set(1L,2L,3L), Set(3L,4L)))
    // 5-path: maximal cliques are exactly the edges
    val path = graphOf((0L until 4L).map(i => (i, i + 1, 1.0)))
    val mp = Cliques.maximalCliques(path).collect().map(_.getSeq[Long](0).toSet).toSet
    assert(mp == (0L until 4L).map(i => Set(i, i + 1)).toSet)
  }

  test("maximalCliques emits singleton cliques for isolated vertices") {
    import spark.implicits._
    // triangle {0,1,2}; vertices 7 and 8 isolated; 9 has only a self-loop
    val edges = Seq((0L,1L,1.0), (0L,2L,1.0), (1L,2L,1.0), (9L,9L,1.0))
      .toDF("src", "dst", "weight")
    val verts = Seq(0L, 1L, 2L, 7L, 8L, 9L).toDF("id")
    val g = PropertyGraph(edges, directed = false, Some(verts))
    val mc = Cliques.maximalCliques(g).collect().map(_.getSeq[Long](0).toSet).toSet
    assert(mc == Set(Set(0L,1L,2L), Set(7L), Set(8L), Set(9L)))
  }

  test("maximalCliques handles a planted high-degree hub") {
    import spark.implicits._
    // a 10^4-leaf star plus one leaf-leaf edge: maximal cliques are the
    // triangle {hub, 1, 2} and every other star edge. The hub has the
    // highest rank, so its subproblem must stay O(triangle support)
    val hub = 0L
    val n = 10000
    val star = (1 to n).map(i => (hub, i.toLong, 1.0))
    val g = graphOf(star :+ (1L, 2L, 1.0))
    val mc = Cliques.maximalCliques(g)
    val bySize = mc.groupBy(size(col("members")).as("sz")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySize == Map(3 -> 1L, 2 -> (n - 2).toLong), s"got $bySize")
    val tri = mc.filter(size(col("members")) === 3).collect()
      .map(_.getSeq[Long](0).toSet)
    assert(tri.toSet == Set(Set(hub, 1L, 2L)))
  }

  test("algebraicDistance: symmetric-role nodes get zero, far pairs positive") {
    // two K3s joined by one edge: intra-clique distances shrink under
    // smoothing; every score is finite and >= 0, and the recurrence is
    // deterministic across invocations
    val g = graphOf(Seq((0L,1L,1.0), (0L,2L,1.0), (1L,2L,1.0),
      (3L,4L,1.0), (3L,5L,1.0), (4L,5L,1.0), (2L,3L,1.0)))
    val s1 = Sparsification.algebraicDistance(g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val s2 = Sparsification.algebraicDistance(g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(s1 == s2)
    assert(s1.values.forall(v => v >= 0.0 && !v.isNaN && !v.isInfinite))
    assert(s1.size == 7)
  }

  test("dynamicHyperbolic: step-0 equals static, replay equals snapshot") {
    val n = 150L; val radius = 3.5; val steps = 2
    val ev = Generators.dynamicHyperbolic(spark, n, radius, steps)
      .localCheckpoint(true)
    val static0 = Generators.hyperbolic(spark, n, radius).edges
      .select("src", "dst")
    val init = ev.filter(col("step") === 0)
      .select(col("u").as("src"), col("v").as("dst"))
    assert(init.except(static0).isEmpty && static0.except(init).isEmpty)
    val lastState = ev.groupBy("u", "v")
      .agg(max(struct(col("step"), (col("type") === "EDGE_ADDITION").as("on")))
        .as("last"))
      .filter(col("last.on"))
      .select(col("u").as("src"), col("v").as("dst"))
    val direct = Generators.dynamicHyperbolicSnapshot(spark, n, radius, steps)
    assert(lastState.except(direct).isEmpty && direct.except(lastState).isEmpty)
  }
}
