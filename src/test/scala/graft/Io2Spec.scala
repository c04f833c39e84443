package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.{BinaryFormats, GraphReaders}

/** Thrill / graph-tool binary graph formats, binary partition formats,
  * and the remaining text formats (DOT, SNAP writer, partition/cover
  * readers+writers) — write→read roundtrips on karate plus hand-built
  * fixtures, all vs the reference formats' byte layouts
  * (`io/ThrillGraphBinaryWriter.cpp:14`, `GraphToolBinaryWriter.cpp:19`,
  * `BinaryPartitionWriter.cpp:13`, `CoverReader.cpp:8`).
  */
class Io2Spec extends SparkSpec {

  private def karate =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  private def edgeSet(g: PropertyGraph): Set[(Long, Long)] =
    g.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dibap: airfoil1.gi equals its METIS twin; coordinates are 2-D") {
    val gi = graft.io.BinaryFormats.readDibap(
      spark, "/root/reference/input/airfoil1.gi")
    val twin = GraphReaders.readMetis(
      spark, "/root/reference/input/airfoil1.graph")
    assert(gi.vertices.count() == 4253)
    assert(gi.edges.count() == 12289) // METIS header: 4253 12289
    def canon(g: PropertyGraph) = PropertyGraph.canonicalizeUndirected(
      g.edges.select(col("src"), col("dst"), lit(1.0).as("weight")))
      .select("src", "dst")
    assert(canon(gi).except(canon(twin)).isEmpty &&
      canon(twin).except(canon(gi)).isEmpty,
      "dibap fixture must equal its METIS twin edge-for-edge")
    val coords = graft.io.BinaryFormats.readDibapCoordinates(
      spark, "/root/reference/input/airfoil1.gi")
    assert(coords.count() == 4253)
    assert(coords.select(size(col("coords"))).distinct().head.getInt(0) == 2)
  }

  test("thrill: write karate, read back the identical edge set") {
    val path = "/tmp/graft_karate.thrill"
    BinaryFormats.writeThrill(karate, path)
    val back = BinaryFormats.readThrill(spark, path)
    assert(back.vertices.count() == 34)
    assert(edgeSet(back) == edgeSet(karate))
  }

  test("thrill: varint degrees above 127 encode in two bytes and decode") {
    // star with 200 leaves: center degree needs a 2-byte LEB128 varint
    import spark.implicits._
    val star = PropertyGraph(
      (1L to 200L).map(v => (0L, v, 1.0)).toDF("src", "dst", "weight"),
      directed = false)
    val path = "/tmp/graft_star.thrill"
    BinaryFormats.writeThrill(star, path)
    val back = BinaryFormats.readThrill(spark, path)
    assert(back.edges.count() == 200)
    assert(edgeSet(back) == edgeSet(star))
  }

  test("thrill: multi-file input continues node numbering across files") {
    // hand-encoded two-part stream: file 0 holds nodes 0..1, file 1
    // holds nodes 2..3; neighbor ids are GLOBAL (the reference's
    // multi-path read(vector<string>) contract)
    def enc(lists: Seq[Seq[Long]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      lists.foreach { ns =>
        BinaryFormats.thrillVarint(bos, ns.length.toLong)
        ns.foreach { v =>
          bos.write((v & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
          bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 24) & 0xFF).toInt)
        }
      }
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-thrill-multi")
    java.nio.file.Files.write(dir.resolve("part-00"),
      enc(Seq(Seq(1L), Seq(3L)))) // node 0: [1]; node 1: [3]
    java.nio.file.Files.write(dir.resolve("part-01"),
      enc(Seq(Seq(3L), Seq()))) // node 2: [3]; node 3: []
    val g = BinaryFormats.readThrill(spark, dir.toString)
    assert(g.vertices.count() == 4)
    assert(edgeSet(g) == Set((0L, 1L), (1L, 3L), (2L, 3L)))
  }

  test("graphtool: write karate, read back the identical edge set") {
    val path = "/tmp/graft_karate.gt"
    BinaryFormats.writeGraphTool(karate, path)
    val back = BinaryFormats.readGraphTool(spark, path)
    assert(!back.directed)
    assert(back.vertices.count() == 34)
    assert(edgeSet(back) == edgeSet(karate))
  }

  test("graphtool: directed graphs and >255-node width switch roundtrip") {
    import spark.implicits._
    // 300 nodes forces 2-byte adjacency width; keep it directed
    val ring = PropertyGraph(
      (0L until 300L).map(v => (v, (v + 1) % 300, 1.0)).toDF("src", "dst", "weight"),
      directed = true)
    val path = "/tmp/graft_ring.gt"
    BinaryFormats.writeGraphTool(ring, path)
    val back = BinaryFormats.readGraphTool(spark, path)
    assert(back.directed)
    assert(back.vertices.count() == 300)
    assert(edgeSet(back) == edgeSet(ring))
  }

  test("binary partition: positional roundtrip at widths 4 and 8") {
    import spark.implicits._
    val part = (0L until 50L).map(i => (i, i % 7)).toDF("id", "community")
    for (w <- Seq(4, 8)) {
      val path = s"/tmp/graft_part_w$w.bin"
      BinaryFormats.writeBinaryPartition(part, path, width = w)
      val back = BinaryFormats.readBinaryPartition(spark, path, width = w)
      assert(back.count() == 50)
      assert(back.except(part).isEmpty && part.except(back).isEmpty)
    }
  }

  test("binary edge-list partition: explicit-id pairs roundtrip") {
    import spark.implicits._
    val part = Seq((3L, 9L), (0L, 2L), (7L, 9L), (5L, 1L)).toDF("id", "community")
    val path = "/tmp/graft_elpart.bin"
    BinaryFormats.writeBinaryEdgeListPartition(part, path, width = 4, firstNode = 1L)
    val back = BinaryFormats.readBinaryEdgeListPartition(
      spark, path, width = 4, firstNode = 1L)
    assert(back.except(part).isEmpty && part.except(back).isEmpty)
  }

  test("dot writer: shell plus one line per edge, reparses as an edge set") {
    val path = "/tmp/graft_karate_dot"
    GraphReaders.writeDot(karate, path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    assert(lines.head == "graph {" && lines.last == "}")
    val body = lines.tail.dropRight(1)
    assert(body.length == 78)
    val parsed = body.map { l =>
      val p = l.stripSuffix(";").split(" -- "); (p(0).toLong, p(1).toLong)
    }.toSet
    assert(parsed == edgeSet(karate))
  }

  test("snap writer: problem line + body reparses via readEdgeList") {
    val path = "/tmp/graft_karate_snap"
    GraphReaders.writeSnap(karate, path)
    val first = spark.read.text(path).collect().map(_.getString(0)).head
    assert(first == "p 34 78 u u 0")
    val back = GraphReaders.readEdgeList(spark, path, commentPrefix = "p")
    assert(edgeSet(back) == edgeSet(karate))
  }

  test("dot partition writer: styled node lines + edge body reparse") {
    import spark.implicits._
    val part = (0L until 34L).map(i => (i, i % 3)).toDF("id", "community")
    val path = "/tmp/graft_karate_dotpart"
    GraphReaders.writeDotPartition(karate, part, path)
    val lines = spark.read.text(path).collect().map(_.getString(0))
    assert(lines.head == "graph {" && lines.last == "}")
    val nodeLines = lines.filter(_.contains("style=filled"))
    assert(nodeLines.length == 34) // karate has no isolated nodes
    assert(nodeLines.forall(l => l.matches("""\d+ \[style=filled, color="[0-9.]+,0\.99,0\.99", label=\d+];""")))
    val edgeLines = lines.filter(_.contains(" -- "))
    assert(edgeLines.length == 78)
  }

  test("partition writer/reader: positional text roundtrip") {
    import spark.implicits._
    val part = (0L until 40L).map(i => (i, (i * i) % 5)).toDF("id", "community")
    val path = "/tmp/graft_part_text"
    GraphReaders.writePartition(part, path)
    val back = GraphReaders.readPartition(spark, path)
    assert(back.except(part).isEmpty && part.except(back).isEmpty)
  }

  test("cover writer/reader: overlapping memberships roundtrip") {
    import spark.implicits._
    val cover = Seq((0L, 0L), (1L, 0L), (1L, 1L), (2L, 1L), (3L, 2L), (0L, 2L))
      .toDF("id", "community")
    val path = "/tmp/graft_cover_text"
    GraphReaders.writeCover(cover, path)
    val back = GraphReaders.readCover(spark, path)
    assert(back.except(cover).isEmpty && cover.except(back).isEmpty)
  }

  test("thrill + graphtool: reference fixtures match their METIS twins") {
    // the reference's own expectations: power.gt = 4941 nodes, 6594
    // edges, undirected (IOGTest.cpp:642); celegans thrill twin header
    // = 453 2025
    val gt = BinaryFormats.readGraphTool(spark, "/root/reference/input/power.gt")
    assert(!gt.directed)
    assert(gt.vertices.count() == 4941)
    assert(gt.edges.count() == 6594)
    val thr = BinaryFormats.readThrill(
      spark, "/root/reference/input/celegans_metabolic.thrill")
    assert(thr.vertices.count() == 453)
    assert(thr.edges.count() == 2025)
  }

  test("rutherford-boeing: tiny_05.rb equals its MatrixMarket twin") {
    // the reference's own cross-format gate (IOGTest.cpp:1283)
    val rb = GraphReaders.readRutherfordBoeing(
      spark, "/root/reference/input/tiny_05.rb")
    val mm = GraphReaders.readMatrixMarket(
      spark, "/root/reference/input/tiny_05.matrixmarket")
    assert(rb.count() == 11)
    assert(rb.except(mm).isEmpty && mm.except(rb).isEmpty)
  }

  test("cover readers: reference overlapping-community fixtures") {
    // CoverReader expectations (IOGTest.cpp:446): 9 communities
    // (community 0 is the leading empty line), node 0 in subsets
    // {1, 5, 8}, node 3 in exactly one
    val cov = GraphReaders.readCover(
      spark, "/root/reference/input/community_overlapping.cover")
    assert(cov.agg(max("community")).head.getLong(0) == 8)
    val n0 = cov.filter(col("id") === 0).collect().map(_.getLong(1)).toSet
    assert(n0 == Set(1L, 5L, 8L))
    assert(cov.filter(col("id") === 3).count() == 1)
    // EdgeListCoverReader twin (.dat, 1-based node ids): same cover
    val elc = GraphReaders.readEdgeListCover(
      spark, "/root/reference/input/community_overlapping.dat", firstNode = 1L)
    assert(elc.except(cov).isEmpty && cov.except(elc).isEmpty)
  }

  test("edge-list partition and cover readers parse explicit-id lines") {
    val p1 = "/tmp/graft_elp.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p1),
      "# comment\n1 4\n2 5\n3 4\n")
    val part = GraphReaders.readEdgeListPartition(spark, p1, firstNode = 1L)
    assert(part.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 4L), (1L, 5L), (2L, 4L)))
    val p2 = "/tmp/graft_elc.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p2),
      "# c\n1 0 2\n2 1\n3 0\n")
    val cov = GraphReaders.readEdgeListCover(spark, p2, firstNode = 1L)
    assert(cov.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 0L), (0L, 2L), (1L, 1L), (2L, 0L)))
  }

  test("guessFileFormat: the reference's own testGuessFormat table") {
    // (test_graphio.py testGuessFormat instances, plus power.gt)
    val expected = Seq(
      "airfoil1.graph" -> "METIS",
      "comments.edgelist" -> "EdgeListTabOne",
      "dynamicTest.gexf" -> "GEXF",
      "foodweb-baydry.konect" -> "KONECT",
      "foodweb-baydry.nkbg002" -> "NetworkitBinary",
      "foodweb-baydry.nkbg003" -> "NetworkitBinary",
      "jazz2_directed.gml" -> "GML",
      "chesapeake.mtx" -> "MatrixMarket",
      "tiny_05.rb" -> "RB",
      "power.gt" -> "GraphToolBinary")
    expected.foreach { case (file, fmt) =>
      val got = GraphReaders.guessFileFormat(spark, s"/root/reference/input/$file")
      assert(got == fmt, s"$file guessed $got, expected $fmt")
    }
  }

  test("readGraph: sniffing dispatcher reproduces the direct readers") {
    val viaDispatch = GraphReaders.readGraph(
      spark, "/root/reference/input/karate.graph")
    assert(edgeSet(viaDispatch) == edgeSet(karate))
    val gml = GraphReaders.readGraph(
      spark, "/root/reference/input/jazz2_undirected.gml")
    assert(edgeSet(gml) == edgeSet(GraphReaders.readGml(
      spark, "/root/reference/input/jazz2_undirected.gml")))
    val gt = GraphReaders.readGraph(spark, "/root/reference/input/power.gt")
    assert(edgeSet(gt) == edgeSet(BinaryFormats.readGraphTool(
      spark, "/root/reference/input/power.gt")))
  }
}
