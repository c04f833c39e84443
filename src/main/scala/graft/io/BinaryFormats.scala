package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Binary interchange formats beyond nkbg (SURVEY.md §2.1; reference
  * `include/networkit/io/ThrillGraphBinaryReader.hpp:25`,
  * `GraphToolBinaryReader.hpp:22`, `BinaryPartitionReader.hpp:20`,
  * `BinaryEdgeListPartitionReader.hpp:21`).
  *
  * These formats are SEQUENTIAL streams (each record's position depends
  * on every varint before it), so a file cannot be byte-range split the
  * way [[NetworkitBinary]]'s chunked layout can. The readers therefore
  * decode one file per executor task via `sc.binaryFiles` — parallel
  * across files (both Thrill readers accept multi-file inputs, matching
  * the reference's `read(vector<string>)` overloads), sequential within
  * one, with no driver-side byte handling. Writers are single-file
  * sinks like [[GraphReaders.writeGml]] (the formats dictate a serial
  * encode); per-node adjacency lists are still BUILT distributed and
  * only the final encode runs on the driver. Parquet remains the
  * engine-native format; these exist for interchange fixtures.
  */
object BinaryFormats {

  /** LEB128-style varint used by Thrill (`ThrillGraphBinaryReader.cpp:24`):
    * 7 value bits per byte, low bits first, bit 7 = continuation. */
  private[graft] def thrillVarint(out: java.io.OutputStream, value: Long): Unit = {
    var v = value
    if (v == 0L) { out.write(0); return }
    while (v != 0L) {
      val low = (v & 0x7F).toInt
      v >>>= 7
      out.write(if (v != 0L) low | 0x80 else low)
    }
  }

  /** Thrill binary graph reader (reference
    * `ThrillGraphBinaryReader.hpp:25`, format: for node u = 0,1,2,… a
    * varint degree then that many little-endian uint32 neighbor ids;
    * undirected graphs store the u ≤ v half of each edge on u's list).
    * Multiple part files concatenate in path order, matching the
    * reference's multi-path overload. */
  def readThrill(spark: SparkSession, path: String,
      directed: Boolean = false): PropertyGraph = {
    import spark.implicits._
    // node numbering continues across files in path order: only the
    // NAME list touches the driver; bytes stay executor-side, one
    // decode task per file
    val names = spark.sparkContext.binaryFiles(path).keys.collect().sorted
    val idxOf = spark.sparkContext.broadcast(names.zipWithIndex.toMap)
    val decoded = spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, stream) =>
      val fileIdx = idxOf.value(name)
      val bytes = stream.toArray()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
      // (fileIdx, localNode, dst, isNode) rows; dst<0 marks the node row
      var pos = 0
      var u = 0L
      while (pos < bytes.length) {
        var deg = 0L; var shift = 0
        var cont = true
        while (cont) {
          val b = bytes(pos) & 0xFF; pos += 1
          deg |= (b & 0x7FL) << shift; shift += 7
          cont = (b & 0x80) != 0
        }
        out += ((fileIdx, u, -1L, 1L))
        var j = 0L
        while (j < deg) {
          val v = ((bytes(pos) & 0xFFL)) | ((bytes(pos + 1) & 0xFFL) << 8) |
            ((bytes(pos + 2) & 0xFFL) << 16) | ((bytes(pos + 3) & 0xFFL) << 24)
          pos += 4
          out += ((fileIdx, u, v, 0L))
          j += 1
        }
        u += 1
      }
      out.iterator
    }.toDF("file", "localNode", "dst", "isNode").localCheckpoint(true)
    // node numbering continues across files: offset(f) = Σ nodes(<f)
    val counts = decoded.filter(col("isNode") === 1)
      .groupBy("file").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsetOf = counts.map(_._1).zip(
      counts.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
    val withIds = decoded.withColumn("off",
      coalesce(typedLit(offsetOf).apply(col("file")), lit(0L)))
      .select((col("localNode") + col("off")).as("src"), col("dst"), col("isNode"))
    // the vertex set is exactly the node records read; a neighbor id
    // beyond them means a truncated/corrupt file, which the reference
    // rejects (ThrillGraphBinaryReader.cpp:91) rather than inventing
    // phantom nodes
    val nTotal = counts.map(_._2).sum
    val maxNeighbor = withIds.filter(col("isNode") === 0)
      .agg(coalesce(max(col("dst")), lit(-1L))).head.getLong(0)
    require(maxNeighbor < nTotal,
      "Maximum read node id larger than number of nodes read.")
    val vertices = spark.range(nTotal).select(col("id"))
    val edges = withIds.filter(col("isNode") === 0)
      // undirected: stored half is u ≤ v ⇒ already canonical src ≤ dst
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    PropertyGraph(edges, directed, Some(vertices))
  }

  /** Thrill binary graph writer (reference
    * `ThrillGraphBinaryWriter.hpp:22`): node ids must fit uint32; for
    * undirected graphs each edge is written once, on its lower
    * endpoint's list (the `u <= v` rule, incl. self-loops once). */
  def writeThrill(g: PropertyGraph, path: String): Unit = {
    val spark = g.edges.sparkSession
    val n = g.vertices.agg(coalesce(max(col("id")) + 1, lit(0L))).head.getLong(0)
    require(n <= (1L << 32) - 1, "Thrill binary supports at most 2^32-1 nodes")
    val outE =
      if (g.directed) g.adjacency
      else g.adjacency.filter(col("src") <= col("dst"))
        .unionAll(g.edges.filter(col("src") === col("dst"))
          .select("src", "dst", "weight"))
        .dropDuplicates("src", "dst")
    val rows = outE.groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(col("dst"))).as("ns"))
      .collect() // driver-bounded: single-file sequential sink (scaladoc)
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20)
    var u = 0L
    while (u < n) {
      val ns = rows.getOrElse(u, Seq.empty)
      thrillVarint(os, ns.length.toLong)
      ns.foreach { v =>
        os.write((v & 0xFF).toInt); os.write(((v >> 8) & 0xFF).toInt)
        os.write(((v >> 16) & 0xFF).toInt); os.write(((v >> 24) & 0xFF).toInt)
      }
      u += 1
    }
    os.close()
  }

  private val GtMagic = Array(0xe2, 0x9b, 0xbe, 0x20, 0x67, 0x74).map(_.toByte)

  private def gtWidth(n: Long): Int =
    if (n < (1L << 8)) 1 else if (n < (1L << 16)) 2
    else if (n < (1L << 32)) 4 else 8

  /** graph-tool binary (`gt`) reader (reference
    * `GraphToolBinaryReader.hpp:22`): 6-byte magic + version + endian
    * byte, uint64-length comment string, directed byte, uint64 n, then
    * per node a uint64 out-degree and that many neighbor ids whose
    * byte width is the smallest of {1,2,4,8} that fits n. Undirected
    * files store each edge once (the reference writer emits the
    * `v <= u` half); property maps after the topology are ignored,
    * like the reference reader. */
  def readGraphTool(spark: SparkSession, path: String): PropertyGraph = {
    import spark.implicits._
    val decoded = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) =>
        val bytes = stream.toArray()
        require(bytes.length >= 8 && (0 until 6).forall(i => bytes(i) == GtMagic(i)),
          "not a graph-tool binary file (bad magic)")
        require(bytes(6) == 0x01, s"unsupported gt version ${bytes(6)}")
        val little = bytes(7) == 0x00
        def rd(pos: Int, width: Int): Long = {
          var v = 0L
          var i = 0
          while (i < width) {
            val b = bytes(pos + i) & 0xFFL
            v |= (if (little) b << (8 * i) else b << (8 * (width - 1 - i)))
            i += 1
          }
          v
        }
        var pos = 8
        val commentLen = rd(pos, 8); pos += 8 + commentLen.toInt
        val directed = bytes(pos) == 0x01; pos += 1
        val n = rd(pos, 8); pos += 8
        val width = gtWidth(n)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        out += ((n, -1L, if (directed) 1L else 0L)) // header marker row
        var u = 0L
        while (u < n) {
          val deg = rd(pos, 8); pos += 8
          var j = 0L
          while (j < deg) {
            out += ((u, rd(pos, width), -2L)); pos += width
            j += 1
          }
          u += 1
        }
        out.iterator
      }.toDF("u", "v", "kind").localCheckpoint(true)
    val head = decoded.filter(col("kind") >= 0)
      .agg(max("u"), max("kind")).head
    val n = head.getLong(0); val directed = head.getLong(1) == 1L
    val vertices = spark.range(n).select(col("id"))
    val raw = decoded.filter(col("kind") === -2L)
      .select(col("u").as("src"), col("v").as("dst"), lit(1.0).as("weight"))
    val edges =
      if (directed) raw
      else PropertyGraph.canonicalizeUndirected(raw)
    PropertyGraph(edges, directed, Some(vertices))
  }

  /** graph-tool binary writer (reference `GraphToolBinaryWriter.hpp:24`):
    * little-endian, empty comment; undirected graphs store each edge
    * once as the `v <= u` half, exactly the reference writer's rule.
    * Node ids must be 0..n−1 (use `GraphOps.compactIds` first — the
    * reference writer applies `getContinuousNodeIds` the same way). */
  def writeGraphTool(g: PropertyGraph, path: String): Unit = {
    val spark = g.edges.sparkSession
    val n = g.vertices.agg(coalesce(max(col("id")) + 1, lit(0L))).head.getLong(0)
    val width = gtWidth(n)
    val outE =
      if (g.directed) g.adjacency
      else g.adjacency.filter(col("dst") <= col("src"))
        .unionAll(g.edges.filter(col("src") === col("dst"))
          .select("src", "dst", "weight"))
        .dropDuplicates("src", "dst")
    val rows = outE.groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(col("dst"))).as("ns"))
      .collect() // driver-bounded: single-file sequential sink (scaladoc)
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20)
    def wr(v: Long, w: Int): Unit = {
      var i = 0
      while (i < w) { os.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    os.write(GtMagic); os.write(0x01); os.write(0x00) // version, little-endian
    wr(0L, 8) // empty comment
    os.write(if (g.directed) 0x01 else 0x00)
    wr(n, 8)
    var u = 0L
    while (u < n) {
      val ns = rows.getOrElse(u, Seq.empty)
      wr(ns.length.toLong, 8)
      ns.foreach(v => wr(v, width))
      u += 1
    }
    os.close()
  }

  /** Binary partition reader (reference `BinaryPartitionReader.hpp:20`):
    * little-endian fixed-width (4 or 8 bytes, default 4 like the
    * reference) community ids, entry i =
    * node i. Fixed-width records split cleanly, so the file is decoded
    * in parallel byte ranges — `(id, community)` rows. */
  def readBinaryPartition(spark: SparkSession, path: String,
      width: Int = 4): DataFrame = {
    import spark.implicits._
    require(width == 4 || width == 8, "width must be 4 or 8")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    val len = fs.getFileStatus(p).getLen
    require(len % width == 0, "partition file length must be a multiple of width")
    val total = len / width
    val nSplits = math.max(1, math.min(32L, total)).toInt
    val per = (total + nSplits - 1) / nSplits
    val pathStr = path
    spark.createDataset((0 until nSplits).map { s =>
      (s * per, math.min(total, (s + 1) * per))
    }).repartition(nSplits)
      .mapPartitions { it =>
        val hp = new org.apache.hadoop.fs.Path(pathStr)
        val hfs = hp.getFileSystem(conf.value)
        it.flatMap { case (from, until) =>
          if (until <= from) Iterator.empty
          else {
            val b = new Array[Byte](((until - from) * width).toInt)
            val in = hfs.open(hp)
            in.readFully(from * width, b)
            in.close()
            (0 until (until - from).toInt).iterator.map { i =>
              var v = 0L
              var k = 0
              while (k < width) { v |= (b(i * width + k) & 0xFFL) << (8 * k); k += 1 }
              (from + i, v)
            }
          }
        }
      }.toDF("id", "community")
  }

  /** Binary partition writer (reference `BinaryPartitionWriter.hpp:22`):
    * node i's community as little-endian fixed width. Input `(id,
    * community)`; ids must be 0..n−1 (position IS the id in this
    * format). Single sequential sink like the reference. */
  def writeBinaryPartition(partition: DataFrame, path: String,
      width: Int = 4): Unit = {
    require(width == 4 || width == 8, "width must be 4 or 8")
    val spark = partition.sparkSession
    val rows = partition.select(col("id").cast("long"), col("community").cast("long"))
      .orderBy("id").collect() // driver-bounded single-file sink
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20)
    rows.foreach { r =>
      var v = r.getLong(1)
      var k = 0
      while (k < width) { os.write((v & 0xFF).toInt); v >>= 8; k += 1 }
    }
    os.close()
  }

  /** Binary edge-list partition reader (reference
    * `BinaryEdgeListPartitionReader.hpp:21`): a stream of fixed-width
    * little-endian `(node, community)` pairs — explicit ids, unlike
    * [[readBinaryPartition]]'s positional ids. Fixed-width pairs split
    * cleanly; decoded in parallel byte ranges. */
  def readBinaryEdgeListPartition(spark: SparkSession, path: String,
      width: Int = 4, firstNode: Long = 0L): DataFrame = {
    import spark.implicits._
    require(width == 4 || width == 8, "width must be 4 or 8")
    // reuse the fixed-width word scan: word index i alternates
    // (even = node id, odd = community); join the halves back on pair k
    val words = readBinaryPartition(spark, path, width)
      .select(col("id").as("i"), col("community").as("w"))
    words.filter(col("i") % 2 === 0)
      .select((col("i") / 2).cast("long").as("k"), (col("w") - firstNode).as("id"))
      .join(words.filter(col("i") % 2 === 1)
        .select(((col("i") - 1) / 2).cast("long").as("k"), col("w").as("community")),
        "k")
      .select("id", "community")
  }

  /** Binary edge-list partition writer (reference
    * `BinaryEdgeListPartitionWriter.hpp:20`): `(node, community)`
    * fixed-width little-endian pairs in node order. */
  def writeBinaryEdgeListPartition(partition: DataFrame, path: String,
      width: Int = 4, firstNode: Long = 0L): Unit = {
    require(width == 4 || width == 8, "width must be 4 or 8")
    val spark = partition.sparkSession
    val rows = partition
      .select(col("id").cast("long"), col("community").cast("long"))
      .orderBy("id").collect() // driver-bounded single-file sink
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = new java.io.BufferedOutputStream(fs.create(p, true), 1 << 20)
    def put(x: Long): Unit = {
      var v = x
      var k = 0
      while (k < width) { os.write((v & 0xFF).toInt); v >>= 8; k += 1 }
    }
    rows.foreach { r => put(r.getLong(0) + firstNode); put(r.getLong(1)) }
    os.close()
  }

  /** DiBaP `.gi` binary reader (reference `DibapGraphReader.hpp:25`,
    * `DibapGraphReader.cpp:32`): big-endian ("network order") stream —
    * int16 type tag `GI`, int32 n, int32 vertex-weight dim (+ n·dvw
    * int32 weights), int32 CSR offsets `of[0..n]`, `of[n]` int32
    * targets, int32 edge-weight dim (+ 2m·dew int32 weights), int32
    * coordinate dim (+ n·dxy float32 coordinates, exposed via
    * [[readDibapCoordinates]]). The CSR stores BOTH directions; the
    * graph keeps the `v ≤ to[e]` half once, first occurrence winning on
    * duplicates, exactly like the reference's checked addEdge loop.
    * Single sequential file → one decode task, no driver byte handling. */
  def readDibap(spark: SparkSession, path: String): PropertyGraph = {
    import spark.implicits._
    val decoded = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) =>
        val bytes = stream.toArray()
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        require(bb.getShort() == (('G' << 8) | 'I').toShort,
          "bad file structure (not a DiBaP GI file)")
        val n = bb.getInt()
        val dvw = bb.getInt()
        bb.position(bb.position() + n * dvw * 4) // vertex weights unused
        val of = Array.fill(n + 1)(bb.getInt())
        val numE2 = of(n)
        val to = Array.fill(numE2)(bb.getInt())
        val dew = bb.getInt()
        val ew = if (dew > 0) Array.fill(numE2 * dew)(bb.getInt()) else null
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
        var v = 0
        while (v < n) {
          // node marker row keeps isolated vertices in the vertex set
          out += ((v.toLong, -1L, 0.0, 1L))
          var e = of(v)
          while (e < of(v + 1)) {
            if (v <= to(e))
              out += ((v.toLong, to(e).toLong,
                if (dew > 0) ew(e * dew).toDouble else 1.0, 0L))
            e += 1
          }
          v += 1
        }
        out.iterator
      }.toDF("src", "dst", "weight", "isNode").localCheckpoint(true)
    val vertices = decoded.filter(col("isNode") === 1).select(col("src").as("id"))
    // duplicates: first CSR occurrence wins (weights identical per edge
    // in practice; min keeps determinism either way)
    val edges = decoded.filter(col("isNode") === 0)
      .groupBy("src", "dst").agg(min("weight").as("weight"))
    PropertyGraph(edges, directed = false, Some(vertices))
  }

  /** Node coordinates from a DiBaP `.gi` file: `(id, coords: array<double>)`
    * (empty result when the file carries no coordinate block). */
  def readDibapCoordinates(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, stream) =>
        val bytes = stream.toArray()
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        require(bb.getShort() == (('G' << 8) | 'I').toShort,
          "bad file structure (not a DiBaP GI file)")
        val n = bb.getInt()
        val dvw = bb.getInt()
        bb.position(bb.position() + n * dvw * 4)
        val nOf = n + 1
        var i = 0; var numE2 = 0
        while (i < nOf) { numE2 = bb.getInt(); i += 1 } // of[n] is the last
        bb.position(bb.position() + numE2 * 4) // targets
        val dew = bb.getInt()
        bb.position(bb.position() + numE2 * dew * 4)
        val dxy = bb.getInt()
        if (dxy <= 0) Iterator.empty
        else (0 until n).iterator.map { u =>
          (u.toLong, Seq.fill(dxy)(bb.getFloat().toDouble))
        }
      }.toDF("id", "coords")
  }
}
