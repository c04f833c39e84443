package graft

import org.apache.spark.sql.functions._
import graft.io.Gexf

/** GEXF reader/writer on the reference's own fixtures
  * (`test_graphio.py:7` TestGEXFIO). */
class GexfSpec extends SparkSpec {

  test("staticTest.gexf: celegans — 306 nodes, 2345 undirected edges") {
    val (g, events) = Gexf.read(spark, "/root/reference/input/staticTest.gexf")
    assert(!g.directed)
    assert(g.vertices.count() == 306)
    // 2345 edge elements; 197 reciprocal pairs stay distinct (the
    // reference's multigraph append)
    assert(g.edges.count() == 2345)
    assert(events.isEmpty, "static mode must produce no events")
    // node ids map by document order: first node line is id "0", third
    // is id "10" → mapped 2
    assert(g.edges.filter(col("src") < 0 || col("src") >= 306 ||
      col("dst") < 0 || col("dst") >= 306).isEmpty)
  }

  test("static write -> read roundtrip preserves the graph") {
    val (g, _) = Gexf.read(spark, "/root/reference/input/staticTest.gexf")
    val p = "/tmp/graft_static_roundtrip.gexf"
    Gexf.write(g, p)
    val (back, ev) = Gexf.read(spark, p)
    assert(ev.isEmpty)
    assert(back.directed == g.directed)
    assert(back.vertices.count() == 306)
    val a = g.edges.select("src", "dst")
    val b = back.edges.select("src", "dst")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("dynamicTest.gexf: date-format events parse with timesteps") {
    val (g, events) = Gexf.read(spark, "/root/reference/input/dynamicTest.gexf")
    val ev = events.orderBy("seq").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(ev.nonEmpty)
    val types = ev.map(_._1).toSet
    assert(types.contains("TIME_STEP"))
    // every event type is one of the 7 GraphEvent kinds
    val legal = Set("NODE_ADDITION", "NODE_REMOVAL", "NODE_RESTORATION",
      "EDGE_ADDITION", "EDGE_REMOVAL", "EDGE_WEIGHT_UPDATE", "TIME_STEP")
    assert(ev.forall(e => legal(e._1)))
    // deterministic across reads
    val (_, events2) = Gexf.read(spark, "/root/reference/input/dynamicTest.gexf")
    assert(events.except(events2).isEmpty && events2.except(events).isEmpty)
  }

  test("dynamicTest3.gexf: exact event counts from the reference's spell rules") {
    // hand-traced per the reference's parseDynamics decision table
    // (graphio.pyx:1837, incl. rule 4's trailing d-event):
    // node 0: spell(end=1) → initial node + dn@1; spell(2,4) →
    //   deleted-before so rn@2 + dn@4
    // node 1: spell(start=1) → an@1; spell(start=4,end=3) →
    //   4<3 false so rn@4 + dn@3
    // edge 0-1: (start=2,end=3) → ae@2 + de@3; 3 distinct timestamps
    // beyond the first → 3 TIME_STEPs
    val (g, events) = Gexf.read(spark, "/root/reference/input/dynamicTest3.gexf")
    assert(g.vertices.count() == 1) // node 0 is the only initial node
    val counts = events.groupBy("type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("NODE_ADDITION" -> 1L, "NODE_REMOVAL" -> 3L,
      "NODE_RESTORATION" -> 2L, "EDGE_ADDITION" -> 1L, "EDGE_REMOVAL" -> 1L,
      "TIME_STEP" -> 3L), s"got $counts")
    // full trace: t1 = DN(0), AN(1); t2 = RN(0), AE; t3 = DN(1), DE;
    // t4 = DN(0), RN(1) — node 0's events carry its INITIAL id (no
    // NODE_ADDITION event, so mapDynamicNodes never touches it)
    val byTypeU = events.select("type", "u").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(byTypeU.count(_ == (("NODE_REMOVAL", 0L))) == 2)
    assert(byTypeU.count(_ == (("NODE_RESTORATION", 0L))) == 1)
  }

  test("graphml: hand fixture parses; weighted roundtrip on karate") {
    val p1 = "/tmp/graft_test.graphml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p1),
      """<?xml version="1.0"?>
        |<graphml>
        |  <key id="w" for="edge" attr.name="weight" attr.type="double"/>
        |  <graph id="G" edgedefault="directed">
        |    <node id="a"/><node id="b"/><node id="c"/>
        |    <edge source="a" target="b"><data key="w">2.5</data></edge>
        |    <edge source="c" target="a"><data key="w">1.5</data></edge>
        |  </graph>
        |</graphml>""".stripMargin)
    val g = Gexf.readGraphMl(spark, p1)
    assert(g.directed)
    val got = g.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // document order: a→0, b→1, c→2
    assert(got == Set((0L, 1L, 2.5), (2L, 0L, 1.5)))
    // weighted roundtrip on karate (weights forced non-1)
    val karate0 = graft.io.GraphReaders.readMetis(
      spark, "/root/reference/input/karate.graph")
    val karate = karate0.copy(edges = karate0.edges
      .withColumn("weight", col("src") + col("dst") + 2.0))
    val p2 = "/tmp/graft_karate.graphml"
    Gexf.writeGraphMl(karate, p2)
    val back = Gexf.readGraphMl(spark, p2)
    assert(back.vertices.count() == 34)
    val a = karate.edges.select("src", "dst", "weight")
    val b = back.edges.select("src", "dst", "weight")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
