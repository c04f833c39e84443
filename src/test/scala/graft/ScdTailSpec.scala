package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** SCD expander tail: LTE, LocalT, TwoPhaseL, CombinedSCD, per-seed
  * ground-truth comparison (reference `scd/` module). */
class ScdTailSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("LTE: contains seed, connected, grows beyond the seed, deterministic") {
    val c1 = Scd.localTightnessExpansion(karate, 0L).as[Long].collect().toSet
    val c2 = Scd.localTightnessExpansion(karate, 0L).as[Long].collect().toSet
    assert(c1 == c2, "deterministic")
    assert(c1.contains(0L) && c1.size > 1 && c1.size < 34, s"$c1")
    // connected: every non-seed member reachable inside the community
    val intra = karate.edges.filter(col("src").isin(c1.toSeq: _*) &&
      col("dst").isin(c1.toSeq: _*))
    val cc = ConnectedComponents.run(PropertyGraph(intra, directed = false,
      Some(c1.toSeq.toDF("id"))))
    assert(cc.select("component").distinct().count() == 1)
  }

  test("LocalT: triangle-dense community around a karate hub") {
    val c = Scd.localT(karate, 0L).as[Long].collect().toSet
    assert(c.contains(0L) && c.size > 1, s"$c")
    // the community must contain at least one full triangle with the seed
    val tri = Triangles.triangles(karate)
      .filter(col("a").isin(c.toSeq: _*) && col("b").isin(c.toSeq: _*) &&
        col("c").isin(c.toSeq: _*)).count()
    assert(tri >= 1, s"internal triangles $tri")
  }

  test("TwoPhaseL: phases terminate; seed kept or community empty; prune is real") {
    // reference semantics return {} when phase 2 prunes the seed itself —
    // on karate's hub 33 removing the hub lowers BOTH Lin and Lex (its 17
    // external edges dominate), so the L-rule legitimately drops it
    val hub = Scd.twoPhaseL(karate, 33L).as[Long].collect().toSet
    assert(hub.isEmpty || hub.contains(33L), s"$hub")
    // a tight-group member must survive with a non-trivial community
    val results = Seq(23L, 27L, 0L).map { s =>
      val c = Scd.twoPhaseL(karate, s).as[Long].collect().toSet
      assert(c.isEmpty || (c.contains(s) && c.size <= 50), s"seed $s -> $c")
      c
    }
    assert(results.exists(c => c.size > 1), s"all pruned: $results")
    // deterministic
    assert(Scd.twoPhaseL(karate, 23L).as[Long].collect().toSet ==
      Scd.twoPhaseL(karate, 23L).as[Long].collect().toSet)
  }

  test("CombinedSCD: clique seed expanded by GCE, conductance no worse than clique alone") {
    val comb = Scd.combined(karate, 0L)
    val members = comb.as[Long].collect().toSet
    assert(members.contains(0L))
    val clique = Community.cliqueDetect(karate, 0L).as[Long].collect().toSet
    assert(clique.subsetOf(members), "expansion keeps the seed clique")
    val condComb = Community.setConductance(karate, comb)
    val condClique = Community.setConductance(karate, clique.toSeq.toDF("id"))
    assert(condComb <= condClique + 1e-12,
      s"combined $condComb vs clique $condClique")
  }

  test("groundTruthComparison: self-comparison is all-perfect, split is not") {
    val truth = (0L to 9L).map(i => (i, i % 2)).toDF("id", "community")
    val self = truth.select(col("community").as("seed"), col("id"))
    val gt = Scd.groundTruthComparison(self, truth).collect()
    assert(gt.length == 2)
    gt.foreach { r =>
      assert(r.getAs[Double]("f1") == 1.0 && r.getAs[Double]("jaccard") == 1.0)
    }
    // a detected set holding half of community 0 scores recall 0.5 against it
    val half = Seq((0L, 0L), (0L, 2L)).toDF("seed", "id")
    val g2 = Scd.groundTruthComparison(half, truth).head()
    assert(g2.getAs[Double]("precision") == 1.0)
    assert(math.abs(g2.getAs[Double]("recall") - 0.4) < 1e-12)
  }

  test("edgeSimilarity: symmetric, matches hand computation on a triangle+tail") {
    // 0-1, 0-2, 1-2 triangle; 2-3 tail (unit weights)
    val g = PropertyGraph.fromEdges(
      Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst"),
      directed = false)
    val sim = Scd.edgeSimilarity(g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // s(0,1) = (2 + w02*w12) / (sqrt(1+2)*sqrt(1+2)) = 3/3 = 1
    assert(math.abs(sim((0L, 1L)) - 1.0) < 1e-12)
    assert(sim((0L, 1L)) == sim((1L, 0L)))
    // s(2,3) = 2 / (sqrt(1+3)*sqrt(1+1)) = 2/(2*sqrt2) = 1/sqrt2
    assert(math.abs(sim((2L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
