package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** GML / KONECT interchange readers on the reference's own fixtures
  * (`input/jazz2_*.gml`, `input/looptest*.gml`,
  * `input/foodweb-baydry.konect`) plus a GML write→read roundtrip.
  */
class IoSpec extends SparkSpec {

  test("gml: jazz2 undirected and directed variants parse with matching edge counts") {
    val und = GraphReaders.readGml(spark, "/root/reference/input/jazz2_undirected.gml")
    assert(!und.directed)
    assert(und.vertices.count() == 5)
    // fixture has 4 edge blocks, two of which are self-loops
    assert(und.edges.count() == 4)
    val dir = GraphReaders.readGml(spark, "/root/reference/input/jazz2_directed.gml")
    assert(dir.directed)
    assert(dir.edges.count() == 4)
  }

  test("gml: looptest1 parses 9 nodes / 12 edges") {
    val g1 = GraphReaders.readGml(spark, "/root/reference/input/looptest1.gml")
    assert(g1.vertices.count() == 9, s"${g1.vertices.count()} nodes")
    assert(g1.edges.count() == 12, s"${g1.edges.count()} edges")
  }

  test("konect: foodweb header directives give a directed weighted graph") {
    val g = GraphReaders.readKonect(spark, "/root/reference/input/foodweb-baydry.konect")
    assert(g.directed, "asym directive must mean directed")
    assert(g.edges.count() == 2137, s"${g.edges.count()} edges") // per header
    val w = g.edges.agg(min("weight"), max("weight")).head
    assert(w.getDouble(0) > 0 && w.getDouble(1) > w.getDouble(0),
      "posweighted directive must parse real weights")
  }

  test("matrixmarket: symmetric real and pattern general fixtures parse") {
    // LFAT5: 14x14 coordinate real symmetric, 30 stored entries
    val lfat = GraphReaders.readMatrixMarket(spark, "/root/reference/input/LFAT5.mtx")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val stored = 30
    val diag = lfat.keys.count { case (i, j) => i == j }
    assert(lfat.size == 2 * stored - diag, s"${lfat.size} entries, $diag diagonal")
    assert(math.abs(lfat((3L, 0L)) - (-94.2528)) < 1e-9) // "4 1 -94.2528"
    assert(math.abs(lfat((0L, 3L)) - (-94.2528)) < 1e-9) // mirrored
    // GD01_b: 18x18 coordinate pattern general, 37 entries, value 1.0
    val gd = GraphReaders.readMatrixMarket(spark, "/root/reference/input/GD01_b.mtx")
    assert(gd.count() == 37)
    assert(gd.filter(col("v") =!= 1.0).isEmpty)
  }

  test("gml roundtrip: write karate, read it back identical") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val path = "/tmp/graft_karate_roundtrip.gml"
    GraphReaders.writeGml(karate, path)
    val back = GraphReaders.readGml(spark, path)
    assert(back.vertices.count() == 34)
    assert(back.edges.count() == 78)
    val orig = karate.edges.select("src", "dst").orderBy("src", "dst").collect().toSeq
    val rt = back.edges.select("src", "dst").orderBy("src", "dst").collect().toSeq
    assert(orig == rt, "edge sets must match after roundtrip")
  }

  private def edgeSet(g: PropertyGraph): Set[(Long, Long, Double)] = {
    val e = if (g.directed) g.edges
      else PropertyGraph.canonicalizeUndirected(g.edges)
    e.select("src", "dst", "weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("metis roundtrip: write karate, read back hash-equal; isolated vertex survives") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val path = "/tmp/graft_karate_roundtrip.metis"
    GraphReaders.writeMetis(karate, path)
    val back = GraphReaders.readMetis(spark, path)
    assert(back.vertices.count() == karate.vertices.count())
    assert(edgeSet(back) == edgeSet(karate))
    // weighted graph with an isolated vertex (id 3): blank adjacency line
    import spark.implicits._
    val wg = PropertyGraph(
      Seq((0L, 1L, 2.0), (1L, 2L, 5.0), (2L, 0L, 1.0)).toDF("src", "dst", "weight"),
      directed = false, Some(Seq(0L, 1L, 2L, 3L).toDF("id")))
    val wPath = "/tmp/graft_weighted_roundtrip.metis"
    GraphReaders.writeMetis(wg, wPath)
    val wBack = GraphReaders.readMetis(spark, wPath)
    assert(wBack.vertices.count() == 4, "isolated vertex must survive")
    assert(edgeSet(wBack) == edgeSet(wg))
  }

  test("edgelist roundtrip: weighted directed graph hash-equal") {
    import spark.implicits._
    val g = PropertyGraph(
      Seq((0L, 1L, 2.5), (1L, 2L, 1.0), (2L, 0L, 7.25), (5L, 1L, 3.0))
        .toDF("src", "dst", "weight"), directed = true)
    val path = "/tmp/graft_edgelist_roundtrip.txt"
    GraphReaders.writeEdgeList(g, path)
    val back = GraphReaders.readEdgeList(spark, path, directed = true)
    assert(edgeSet(back) == edgeSet(g))
  }

  test("dgs roundtrip: event stream write-read preserves events and replay") {
    import spark.implicits._
    val events = Seq(
      (0L, "NODE_ADDITION", 0L, -1L, 0.0),
      (1L, "NODE_ADDITION", 1L, -1L, 0.0),
      (2L, "EDGE_ADDITION", 0L, 1L, 2.0),
      (3L, "NODE_ADDITION", 2L, -1L, 0.0),
      (4L, "EDGE_ADDITION", 1L, 2L, 1.0),
      (5L, "EDGE_WEIGHT_UPDATE", 0L, 1L, 9.0),
      (6L, "TIME_STEP", -1L, -1L, 0.0),
      (7L, "EDGE_REMOVAL", 1L, 2L, 0.0),
      (8L, "NODE_REMOVAL", 2L, -1L, 0.0)
    ).toDF("seq", "type", "u", "v", "w")
    val path = "/tmp/graft_dgs_roundtrip.dgs"
    GraphReaders.writeDgs(events, path)
    val back = GraphReaders.readDgs(spark, path)
    // seq values shift (header lines), but type/u/v/w sequence must match
    val origSeq = events.orderBy("seq")
      .select("type", "u", "v", "w").collect().toSeq
    val backSeq = back.orderBy("seq")
      .select("type", "u", "v", "w").collect().toSeq
    assert(backSeq == origSeq, s"$backSeq")
    // replay of the round-tripped stream = replay of the original
    val a = GraphReaders.applyGraphEvents(events).collect().toSet
    val b = GraphReaders.applyGraphEvents(back).collect().toSet
    assert(a == b)
  }

  test("randomMaximumSpanningForest: max weight, subset of UMSF, seed-sensitive") {
    import spark.implicits._
    // two triangles sharing tie-weight edges + a heavy bridge: several
    // distinct maximum forests exist
    val edges = Seq(
      (0L, 1L, 2.0), (1L, 2L, 2.0), (2L, 0L, 2.0),
      (2L, 3L, 5.0),
      (3L, 4L, 2.0), (4L, 5L, 2.0), (5L, 3L, 2.0)).toDF("src", "dst", "weight")
    val g = PropertyGraph(edges, directed = false)
    val msfW = SpanningForest.maxSpanningForest(g)
      .agg(sum("weight")).head.getDouble(0)
    val umsf = SpanningForest.unionMaximumSpanningForest(g)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val forests = Seq(1L, 2L, 3L, 4L, 5L).map { seed =>
      val f = SpanningForest.randomMaximumSpanningForest(g, seed)
        .localCheckpoint(true)
      assert(f.count() == 5, "spanning forest of 6 nodes, 1 component")
      assert(math.abs(f.agg(sum("weight")).head.getDouble(0) - msfW) < 1e-9,
        "must be a MAXIMUM spanning forest")
      val fs = f.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fs.subsetOf(umsf), "every RMSF edge lies in the UMSF")
      fs
    }
    assert(forests.distinct.size > 1, "seeds must explore distinct maximum forests")
  }
}
