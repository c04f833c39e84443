package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Group closeness, GedWalk, and KADABRA sampled betweenness. */
class GroupKadabraSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("groupCloseness: farness decreases monotonically; star center wins") {
    // star: center 0 — singleton {0} has farness n-1, optimal
    val star = PropertyGraph.fromEdges(
      (1L to 10L).map(i => (0L, i)).toDF("src", "dst"), directed = false)
    val r = GroupCentrality.groupCloseness(star, 1)
    val row = r.head()
    assert(row.getLong(1) == 0L, "center must be chosen first")
    assert(row.getLong(2) == 10L, s"farness ${row.getLong(2)}")

    val kr = GroupCentrality.groupCloseness(karate, 3)
      .orderBy("rank").select("farness").as[Long].collect()
    assert(kr.length == 3 && kr(0) >= kr(1) && kr(1) >= kr(2),
      s"farness must be non-increasing: ${kr.toSeq}")
  }

  test("gedWalk: gains positive and non-increasing; hub first on a star") {
    val star = PropertyGraph.fromEdges(
      (1L to 8L).map(i => (0L, i)).toDF("src", "dst"), directed = false)
    val r = GedWalkCheck.firstPick(star)
    assert(r == 0L, s"star hub must maximize walk coverage, got $r")

    val kg = GroupCentrality.gedWalk(karate, 2)
      .orderBy("rank").select("gain").as[Double].collect()
    assert(kg.length == 2 && kg(0) > 0 && kg(1) > 0 && kg(0) >= kg(1),
      s"gains ${kg.toSeq}")
  }

  test("kadabra: within additive err of exact on karate") {
    val n = karate.vertices.count().toDouble
    val est = Betweenness.kadabra(karate, err = 0.1, delta = 0.1)
    val exact = Betweenness.run(karate, sampleSources = None)
      .select(col("id"), (col("score") * 2.0 / (n * (n - 1.0))).as("exact"))
    val joined = est.join(exact, "id")
    val maxDev = joined.agg(max(abs(col("kadabra") - col("exact")))).as[Double].head()
    assert(maxDev <= 0.1, s"max deviation $maxDev")
    // the top node by estimate must be the known karate center (0 or 33)
    val top = joined.orderBy(col("kadabra").desc).select("id").as[Long].head()
    assert(Set(0L, 33L).contains(top), s"top $top")
  }

  test("kadabra: adaptive union-bound stop fires below the worst-case cap") {
    // err must sit ABOVE the Bernstein floor 3·ln(3n/δ)/m reachable
    // within the cap but BELOW where the cap itself ends the loop first:
    // at err = 0.05 the cap is ~3.2k samples and the union bound
    // certifies ε̂ ≤ err at the third batch boundary (~2.8k) for ANY
    // p̂ ≤ 0.5, so the stop fires deterministically; at looser err the
    // doubling batches hit the (smaller) cap before a checkpoint can
    // certify — the worst-case budget is doing its job there
    val res = Betweenness.kadabraWithInfo(karate, err = 0.05, delta = 0.1)
    assert(res.adaptiveStopped, "adaptive stop must fire on karate at err=0.05")
    assert(res.drawn < res.worstCase,
      s"drawn ${res.drawn} must be below the cap ${res.worstCase}")
    val n = karate.vertices.count().toDouble
    val exact = Betweenness.run(karate, sampleSources = None)
      .select(col("id"), (col("score") * 2.0 / (n * (n - 1.0))).as("exact"))
    val maxDev = res.scores.join(exact, "id")
      .agg(max(abs(col("kadabra") - col("exact")))).as[Double].head()
    assert(maxDev <= 0.05, s"max deviation $maxDev")
  }
}

object GedWalkCheck {
  def firstPick(g: PropertyGraph): Long =
    GroupCentrality.gedWalk(g, 1).head().getLong(1)
}
