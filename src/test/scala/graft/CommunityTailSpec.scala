package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Map equation, Louvain-map-equation detector, LFM expansion, and
  * LFK overlapping NMI.
  */
class CommunityTailSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("mapEquation: one-block L equals visit-rate entropy; detector beats singleton") {
    val oneBlock = karate.vertices.select(col("id"), lit(0L).as("community"))
    val lOne = Community.mapEquation(karate, oneBlock)
    // Q = 0 for one block → L = H(visit rates) > 0
    assert(lOne > 0.0 && lOne < 10.0, s"one-block L=$lOne")

    val singleton = karate.vertices.select(col("id"), col("id").as("community"))
    val lSingle = Community.mapEquation(karate, singleton)
    val p = Community.louvainMapEquation(karate, maxRounds = 12)
    val lDet = Community.mapEquation(karate, p)
    assert(lDet < lSingle, s"detector $lDet must beat singleton $lSingle")
    val k = p.select("community").distinct().count()
    assert(k >= 2 && k < 34, s"$k modules")
  }

  test("lfmLocal: seed kept, community connected, better fitness than singleton") {
    val c = Community.lfmLocal(karate, 0L, alpha = 1.0)
    val members = c.as[Long].collect().toSet
    assert(members.contains(0L))
    assert(members.size >= 2 && members.size <= 50, s"size ${members.size}")
    // all members reachable inside the induced subgraph
    val intra = karate.edges
      .filter(col("src").isin(members.toSeq: _*) && col("dst").isin(members.toSeq: _*))
    val cc = ConnectedComponents.run(
      PropertyGraph(intra, directed = false, Some(c)))
    assert(cc.select("component").distinct().count() == 1)
  }

  test("overlappingNmi: identity is 1, unrelated covers score lower") {
    val a = karate.vertices.select(col("id"), (col("id") % 2).as("community"))
    val b = karate.vertices.select(col("id"), (col("id") % 5).as("community"))
    val n = karate.vertices.count()
    assert(math.abs(Community.overlappingNmi(a, a, n) - 1.0) < 1e-9)
    val ab = Community.overlappingNmi(a, b, n)
    assert(ab >= 0.0 && ab < 0.9, s"onmi(a,b)=$ab")
    // a genuinely overlapping cover still self-matches at 1
    val ov = a.unionAll(karate.vertices.filter(col("id") % 3 === 0)
      .select(col("id"), (lit(10L) + col("id") % 4).as("community")))
    assert(math.abs(Community.overlappingNmi(ov, ov, n) - 1.0) < 1e-9)
  }

  test("projectClustering + hashingOverlapper: join/intersection semantics") {
    import spark.implicits._
    val mapping = Seq((0L, 10L), (1L, 10L), (2L, 20L), (3L, 20L))
      .toDF("id", "community")
    val coarse = Seq((10L, 7L), (20L, 8L)).toDF("id", "community")
    val fine = graft.graph.Community.projectClustering(mapping, coarse)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fine == Map(0L -> 7L, 1L -> 7L, 2L -> 8L, 3L -> 8L))
    val p1 = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "community")
    val p2 = Seq((0L, 5L), (1L, 6L), (2L, 6L), (3L, 6L)).toDF("id", "community")
    val ov = graft.graph.Community.hashingOverlapper(p1, p2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // intersection cells: {0}, {1}, {2, 3}
    assert(ov(2L) == ov(3L))
    assert(ov(0L) != ov(1L) && ov(0L) != ov(2L) && ov(1L) != ov(2L))
  }
}
