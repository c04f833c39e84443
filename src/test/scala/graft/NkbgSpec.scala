package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.{GraphReaders, NetworkitBinary}

/** NetworKit binary graph format: varint unit laws, interop against the
  * reference's OWN nkbg002/nkbg003 fixtures (same graph as the KONECT
  * text twin), and write→read roundtrips across every weight format,
  * directedness, self-loops, isolated vertices and chunk boundaries.
  */
class NkbgSpec extends SparkSpec {

  test("varint: encode/decode roundtrips across width boundaries") {
    val buf = new Array[Byte](9)
    val cases = Seq(0L, 1L, 63L, 64L, 127L, 128L, 16383L, 16384L,
      (1L << 56) - 1, 1L << 56, Long.MaxValue, -1L) // -1 = max uint64
    cases.foreach { v =>
      val k = NetworkitBinary.varIntEncode(v, buf, 0)
      val (back, used) = NetworkitBinary.varIntDecode(buf, 0)
      assert(back == v && used == k, s"varint roundtrip failed for $v")
    }
    // width: ≤7 bits fits in the header byte alone
    assert(NetworkitBinary.varIntEncode(127L, buf, 0) == 1)
    assert(NetworkitBinary.varIntEncode(128L, buf, 0) == 2)
    assert(NetworkitBinary.varIntEncode(-1L, buf, 0) == 9)
  }

  test("zigzag: sign folds into the LSB") {
    Seq(0L -> 0L, -1L -> 1L, 1L -> 2L, -2L -> 3L, 2L -> 4L).foreach {
      case (v, enc) =>
        assert(NetworkitBinary.zigzagEncode(v) == enc)
        assert(NetworkitBinary.zigzagDecode(enc) == v)
    }
  }

  test("interop: reference-written nkbg003 equals the KONECT text twin") {
    val bin = NetworkitBinary.read(spark,
      "/root/reference/input/foodweb-baydry.nkbg003")
    val txt = GraphReaders.readKonect(spark,
      "/root/reference/input/foodweb-baydry.konect")
    assert(bin.directed == txt.directed)
    assert(bin.edges.count() == txt.edges.count())
    val binE = bin.edges.select(col("src"), col("dst"), round(col("weight"), 6).as("w"))
    val txtE = txt.edges.select(col("src"), col("dst"), round(col("weight"), 6).as("w"))
    assert(binE.except(txtE).isEmpty && txtE.except(binE).isEmpty,
      "binary and text parses must give the identical weighted edge set")
  }

  test("interop: nkbg002 (headerless-index version) decodes identically") {
    val v2 = NetworkitBinary.read(spark,
      "/root/reference/input/foodweb-baydry.nkbg002")
    val v3 = NetworkitBinary.read(spark,
      "/root/reference/input/foodweb-baydry.nkbg003")
    assert(v2.edges.count() == v3.edges.count())
    assert(v2.edges.except(v3.edges).isEmpty && v3.edges.except(v2.edges).isEmpty)
  }

  private def assertSameGraph(a: PropertyGraph, b: PropertyGraph): Unit = {
    assert(a.directed == b.directed)
    assert(b.vertices.select("id").except(a.vertices.select("id")).isEmpty &&
      a.vertices.select("id").except(b.vertices.select("id")).isEmpty, "vertex sets differ")
    val ae = a.edges.select(col("src"), col("dst"), round(col("weight"), 6).as("w"))
    val be = b.edges.select(col("src"), col("dst"), round(col("weight"), 6).as("w"))
    assert(ae.except(be).isEmpty && be.except(ae).isEmpty, "edge sets differ")
  }

  private def mkGraph(edges: Seq[(Long, Long, Double)], n: Long,
      directed: Boolean): PropertyGraph = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst", "weight")
    val e = if (directed) e0 else PropertyGraph.canonicalizeUndirected(e0)
    PropertyGraph(e, directed, Some(spark.range(n).select(col("id"))))
  }

  test("roundtrip: undirected unweighted with self-loop and isolated vertex") {
    val g = mkGraph(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
      (3L, 3L, 1.0), (0L, 4L, 1.0)), n = 6, directed = false)
    val path = "/tmp/graft_nkbg_u.nkbg"
    NetworkitBinary.write(g, path, chunks = 3)
    assertSameGraph(g, NetworkitBinary.read(spark, path))
  }

  test("roundtrip: directed across all four weight formats") {
    val base = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 0L), (4L, 1L))
    val weights = Map(
      "varint" -> Seq(2.0, 7.0, 1.0, 300.0, 5.0),
      "signed" -> Seq(-2.0, 7.0, 1.0, -300.0, 5.0),
      "float" -> Seq(0.5, -2.25, 1.0, 3.75, 8.125),
      "double" -> Seq(0.1, -2.3, 1.0, math.Pi, 8.0))
    weights.foreach { case (name, ws) =>
      val g = mkGraph(base.zip(ws).map { case ((u, v), w) => (u, v, w) },
        n = 5, directed = true)
      val path = s"/tmp/graft_nkbg_$name.nkbg"
      NetworkitBinary.write(g, path, chunks = 2)
      assertSameGraph(g, NetworkitBinary.read(spark, path))
    }
  }

  test("roundtrip: deleted node slot (id gap) survives") {
    import spark.implicits._
    // vertices {0,1,3}: slot 2 is a tombstone
    val g = PropertyGraph(
      Seq((0L, 1L, 1.0), (1L, 3L, 1.0)).toDF("src", "dst", "weight"),
      directed = false,
      Some(Seq(0L, 1L, 3L).toDF("id")))
    val path = "/tmp/graft_nkbg_del.nkbg"
    NetworkitBinary.write(g, path)
    val back = NetworkitBinary.read(spark, path)
    assertSameGraph(g, back)
    assert(back.vertices.count() == 3)
  }

  test("roundtrip: chunk boundaries — 1 chunk, n chunks, chunks > n") {
    val g = mkGraph((0L until 9L).map(i => (i, (i + 1) % 10, i.toDouble + 1)),
      n = 10, directed = false)
    Seq(1, 10, 64).foreach { c =>
      val path = s"/tmp/graft_nkbg_c$c.nkbg"
      NetworkitBinary.write(g, path, chunks = c)
      assertSameGraph(g, NetworkitBinary.read(spark, path))
    }
  }

  test("roundtrip: karate via nkbg equals the METIS parse") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val path = "/tmp/graft_nkbg_karate.nkbg"
    NetworkitBinary.write(karate, path, chunks = 4)
    val back = NetworkitBinary.read(spark, path)
    assertSameGraph(karate, back)
    assert(back.edges.count() == 78)
  }
}
