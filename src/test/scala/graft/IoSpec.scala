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
}
