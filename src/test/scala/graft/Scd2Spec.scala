package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** SCD tail: set conductance, clique-detect, TCE. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("setConductance: known cut on the barbell") {
    val g = PropertyGraph.fromEdges(
      Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
        .toDF("src", "dst"), directed = false)
    val c = Community.setConductance(g, Seq(0L, 1L, 2L).toDF("id"))
    assert(math.abs(c - 1.0 / 7.0) < 1e-12, s"conductance $c")
    // full set → denominator 0 → 1.0 by convention
    assert(Community.setConductance(g, (0L to 5L).toDF("id")) == 1.0)
  }

  test("cliqueDetect finds a genuine clique containing the seed") {
    val c = Community.cliqueDetect(karate, 0L)
    val members = c.as[Long].collect().toSet
    assert(members.contains(0L) && members.size >= 3, s"$members")
    val pairs = for (a <- members; b <- members if a < b) yield (a, b)
    val edgeSet = karate.edges.select(
      least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .as[(Long, Long)].collect().toSet
    assert(pairs.forall(edgeSet.contains), "all member pairs must be edges")
  }

  test("tce expands a triangle-dense community around the seed") {
    val t = Community.tce(karate, 0L)
    val members = t.as[Long].collect().toSet
    assert(members.contains(0L) && members.size >= 2 && members.size <= 30)
    val cond = Community.setConductance(karate, t)
    assert(cond >= 0.0 && cond <= 1.0)
  }
}
