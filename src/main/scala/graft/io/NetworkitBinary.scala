package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** NetworKit binary graph format (`nkbg`) reader / writer (reference
  * `include/networkit/io/NetworkitBinaryGraph.hpp:20`,
  * `networkit/cpp/io/NetworkitBinaryGraph.md` — the format spec,
  * `NetworkitBinaryReader.hpp:27`, `NetworkitBinaryWriter.hpp:24`).
  *
  * File layout (little-endian throughout): a fixed header (magic
  * `nkbg003`, feature bits, node/chunk counts, absolute block offsets),
  * base data (one flag byte per node + the first vertex of each chunk),
  * then per-block `(chunks-1)` uint64 prefix offsets followed by varint
  * data: adjacency out-lists, transposed lists, weights, optional edge
  * ids. The varint puts the data-byte count in the trailing zeros of the
  * header byte (0 header byte = 8 data bytes) and the low value bits in
  * its remaining high bits; signed weights are zigzag-folded first.
  *
  * Scale design: the format is CHUNKED precisely so chunks decode
  * independently — the reader plans one task per chunk, each opening the
  * file via the Hadoop filesystem API and reading only its own byte
  * range (header/offset arrays are the only driver-side reads, O(chunks)
  * bytes). A graph written with enough chunks therefore reads with full
  * cluster parallelism. Only the OUT-adjacency block is read: for
  * undirected graphs it stores each edge exactly once (the `v ≤ u`
  * half), for directed graphs it is the arc list — the transpose block
  * is derivable and skipped. The writer streams one file with global
  * prefix offsets (inherently serial sink, same discipline as
  * [[GraphReaders.writeMetis]]); per-node lists are built distributedly
  * and only the final encode is on the driver. Parquet remains the
  * engine-native format; nkbg is for interchange with the reference.
  */
/** One decodable unit of a [[NetworkitBinary]] file: a chunk's node range
  * plus the byte ranges of its flag / adjacency / weight data. (Top-level:
  * Catalyst's generated encoder code needs JVM-public accessors.) */
private[graft] final case class NkbChunkSpec(
    chunk: Long, firstNode: Long, endNode: Long,
    flagStart: Long,
    adjStart: Long, adjEnd: Long,
    wStart: Long, wEnd: Long)

object NetworkitBinary {

  private val DirMask = 0x1L
  private val WeightMask = 0xEL
  private val WeightShift = 1
  private val IndexMask = 0x10L
  private val IndexShift = 4

  // WeightFormat codes (NetworkitBinaryGraph.hpp:35)
  private val WNone = 0
  private val WVarint = 1
  private val WSignedVarint = 2
  private val WDouble = 3
  private val WFloat = 4

  /** Encode `value` into `buf` at `pos`; returns bytes written (1–9). */
  private[graft] def varIntEncode(value: Long, buf: Array[Byte], pos: Int): Int = {
    if (value == 0L) { buf(pos) = 1; return 1 }
    if (java.lang.Long.compareUnsigned(value, 1L << 56) >= 0) {
      // ≥ 2^56: zero header byte announces 8 data bytes
      buf(pos) = 0
      var v = value
      var i = 0
      while (i < 8) { buf(pos + 1 + i) = (v & 0xFF).toByte; v >>>= 8; i += 1 }
      return 9
    }
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(value)
    val dataBytes = (bits - 1) / 7
    var head = (1 << dataBytes) | ((value << (dataBytes + 1)) & 0xFF)
    buf(pos) = head.toByte
    var v = value >>> (7 - dataBytes)
    var i = 0
    while (i < dataBytes) { buf(pos + 1 + i) = (v & 0xFF).toByte; v >>>= 8; i += 1 }
    dataBytes + 1
  }

  /** Decode a varint at `pos`; returns (value, bytesConsumed). */
  private[graft] def varIntDecode(buf: Array[Byte], pos: Int): (Long, Int) = {
    val head = buf(pos) & 0xFF
    var n = 8
    var decoded = 0L
    var bits = 0
    if (head != 0) {
      n = java.lang.Integer.numberOfTrailingZeros(head)
      decoded = (head >>> (n + 1)).toLong
      bits = 7 - n
    }
    var i = 0
    while (i < n) {
      decoded |= (buf(pos + 1 + i) & 0xFFL) << bits
      bits += 8
      i += 1
    }
    (decoded, n + 1)
  }

  private[graft] def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  private[graft] def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  /** Read an `nkbg002` / `nkbg003` file into a [[PropertyGraph]].
    * Deleted nodes (flag bit clear) are kept out of the vertex table,
    * matching the reference reader's `removeNode`
    * (`NetworkitBinaryReader.cpp:107`). Edge ids, if present, are
    * skipped (the engine does not model them). */
  def read(spark: SparkSession, path: String): PropertyGraph = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)

    def readLongs(at: Long, k: Int): Array[Long] = {
      val b = new Array[Byte](k * 8)
      in.readFully(at, b)
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Array.fill(k)(bb.getLong)
    }

    val magicBytes = new Array[Byte](8)
    in.readFully(0, magicBytes)
    val magic = new String(magicBytes.takeWhile(_ != 0), "US-ASCII")
    val version = magic match {
      case "nkbg002" => 2
      case "nkbg003" => 3
      case other => throw new IllegalArgumentException(
        s"not a NetworKit binary graph (magic '$other')")
    }
    val nHeaderLongs = if (version >= 3) 11 else 9
    val h = readLongs(8, nHeaderLongs)
    // h: checksum, features, nodes, chunks, offBase, offAdj, offTransp,
    //    offWeight, offWeightTransp, [offAdjId, offAdjIdTransp]
    val features = h(1)
    val directed = (features & DirMask) != 0
    val weightFormat = ((features & WeightMask) >> WeightShift).toInt
    val nodes = h(2)
    val chunks = h(3).toInt
    val offBase = h(4); val offAdj = h(5); val offTransp = h(6)
    val offWeight = h(7); val offWeightTransp = h(8)

    // base data: nodes × uint8 flags, then firstVertex[1..chunks-1]
    val firstVert = 0L +: (if (chunks > 1)
      readLongs(offBase + nodes, chunks - 1) else Array.empty[Long]) :+ nodes
    // adjacency block: offsets[1..chunks-1], uint64 nrOfEdges, data
    val adjOffsets = 0L +: (if (chunks > 1) readLongs(offAdj, chunks - 1)
      else Array.empty[Long])
    val adjDataStart = offAdj + (chunks - 1) * 8L + 8L
    // weight block: offsets[1..chunks-1], data (no size field)
    val weighted = weightFormat != WNone
    val wOffsets = if (weighted)
      0L +: (if (chunks > 1) readLongs(offWeight, chunks - 1)
        else Array.empty[Long])
    else Array.fill(chunks + 1)(0L)
    val wDataStart = if (weighted) offWeight + (chunks - 1) * 8L else 0L
    val wBlockEnd = if (weighted)
      (if (offWeightTransp > 0) offWeightTransp else fileLen) else 0L
    in.close()

    val specs = (0 until chunks).map { c =>
      NkbChunkSpec(c, firstVert(c), firstVert(c + 1),
        flagStart = offBase + firstVert(c),
        adjStart = adjDataStart + adjOffsets(c),
        adjEnd = if (c + 1 < chunks) adjDataStart + adjOffsets(c + 1) else offTransp,
        wStart = wDataStart + wOffsets(c),
        wEnd = if (!weighted) 0L
          else if (c + 1 < chunks) wDataStart + wOffsets(c + 1) else wBlockEnd)
    }

    val pathStr = path
    val wf = weightFormat
    val decoded = spark.createDataset(specs)
      .repartition(math.max(1, math.min(specs.size, 32)))
      .mapPartitions { it =>
        val hp = new org.apache.hadoop.fs.Path(pathStr)
        val hfs = hp.getFileSystem(conf.value)
        it.flatMap { sp =>
          val stream = hfs.open(hp)
          val nNodes = (sp.endNode - sp.firstNode).toInt
          val flags = new Array[Byte](nNodes)
          stream.readFully(sp.flagStart, flags)
          val adjBytes = new Array[Byte]((sp.adjEnd - sp.adjStart).toInt)
          stream.readFully(sp.adjStart, adjBytes)
          val wBytes = if (wf != WNone && sp.wEnd > sp.wStart) {
            val b = new Array[Byte]((sp.wEnd - sp.wStart).toInt)
            stream.readFully(sp.wStart, b); b
          } else Array.empty[Byte]
          stream.close()

          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Double)] // (flagNode, src, dst, w) — flagNode<0 for edges
          var pos = 0
          var wPos = 0
          var u = sp.firstNode
          while (u < sp.endNode) {
            if ((flags((u - sp.firstNode).toInt) & 0x1) != 0)
              out += ((u, -1L, -1L, 0.0)) // existing node marker
            val (cnt, used) = varIntDecode(adjBytes, pos)
            pos += used
            var j = 0L
            while (j < cnt) {
              val (v, used2) = varIntDecode(adjBytes, pos)
              pos += used2
              val w: Double = wf match {
                case WNone => 1.0
                case WVarint =>
                  val (x, u3) = varIntDecode(wBytes, wPos); wPos += u3; x.toDouble
                case WSignedVarint =>
                  val (x, u3) = varIntDecode(wBytes, wPos); wPos += u3
                  zigzagDecode(x).toDouble
                case WDouble =>
                  val bb = java.nio.ByteBuffer.wrap(wBytes, wPos, 8)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  wPos += 8; bb.getDouble
                case WFloat =>
                  val bb = java.nio.ByteBuffer.wrap(wBytes, wPos, 4)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  wPos += 4; bb.getFloat.toDouble
              }
              out += ((-1L, u, v, w))
              j += 1
            }
            u += 1
          }
          out.iterator
        }
      }.toDF("node", "src", "dst", "weight").localCheckpoint(true)

    val vertices = decoded.filter(col("node") >= 0).select(col("node").as("id"))
    val rawEdges = decoded.filter(col("node") < 0).select("src", "dst", "weight")
    val edges =
      if (directed) rawEdges
      // undirected out-lists store the v ≤ u half; canonical form is src ≤ dst
      else rawEdges.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
    PropertyGraph(edges, directed, Some(vertices))
  }

  /** Write `g` as `nkbg003`. Node ids must be 0..n−1 (ids absent from
    * `g.vertices` are flagged deleted, the reference's tombstone
    * representation). Weight format is auto-detected like the reference
    * writer (`NetworkitBinaryWriter.cpp:43`): all-1.0 → unweighted,
    * unsigned integral → varint, integral → zigzag varint, float-exact →
    * float, else double. Edge ids are not written. Every node SLOT gets
    * a neighbor-count varint (deleted slots get 0): the reference READER
    * consumes one count per slot (`NetworkitBinaryReader.cpp:172`), so
    * this is the layout it can actually decode. */
  def write(g: PropertyGraph, path: String, chunks: Int = 32): Unit = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val n = g.vertices.agg(coalesce(max(col("id")) + 1, lit(0L))).head.getLong(0)
    val nChunks = math.max(1, math.min(chunks.toLong, n).toInt)

    val stats = g.edges.agg(
      count(lit(1)),
      coalesce(max((col("weight") =!= 1.0).cast("int")), lit(0)),
      coalesce(max((col("weight") =!= col("weight").cast("long").cast("double"))
        .cast("int")), lit(0)),
      coalesce(max((col("weight") < 0).cast("int")), lit(0)),
      coalesce(max((col("weight") =!= col("weight").cast("float").cast("double"))
        .cast("int")), lit(0))).head
    val anyNonOne = stats.getInt(1) == 1
    val anyFrac = stats.getInt(2) == 1
    val anyNeg = stats.getInt(3) == 1
    val anyNonFloat = stats.getInt(4) == 1
    val weightFormat =
      if (!anyNonOne) WNone
      else if (!anyFrac && !anyNeg) WVarint
      else if (!anyFrac) WSignedVarint
      else if (!anyNonFloat) WFloat
      else WDouble

    // per-node out/in lists, built distributedly. Undirected out-lists
    // store the v ≤ u half of each edge; self-loops live once in both
    // the out and transpose list (adjacency expands a loop twice, so
    // loops are excluded there and re-added once from the stored edges)
    val adj = g.adjacency
    val loops = g.edges.filter(col("src") === col("dst"))
      .select(col("src"), col("dst"), col("weight"))
    val (outL, inL) =
      if (g.directed) (adj, g.inAdjacency)
      else
        (adj.filter(col("dst") < col("src")).unionAll(loops),
         adj.filter(col("dst") > col("src")).unionAll(loops))
    def lists(e: DataFrame) = e.groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(struct(col("dst"), col("weight")))).as("ns"))
    val rows = g.vertices.select(col("id"))
      .join(lists(outL), Seq("id"), "left")
      .join(lists(inL).withColumnRenamed("ns", "nsIn"), Seq("id"), "left")
      .orderBy("id")
      .select(col("id"), col("ns"), col("nsIn"))
      .collect() // driver-bounded: single-file binary sink (see scaladoc)

    val present = new Array[Boolean](n.toInt)
    type NL = Array[(Long, Double)]
    val outA = new Array[NL](n.toInt)
    val inA = new Array[NL](n.toInt)
    rows.foreach { r =>
      val id = r.getLong(0).toInt
      present(id) = true
      def toNL(i: Int): NL =
        if (r.isNullAt(i)) Array.empty
        else r.getSeq[org.apache.spark.sql.Row](i)
          .map(s => (s.getLong(0), s.getDouble(1))).toArray
      outA(id) = toNL(1); inA(id) = toNL(2)
    }
    (0 until n.toInt).foreach { i =>
      if (outA(i) == null) { outA(i) = Array.empty; inA(i) = Array.empty }
    }

    val firstInChunk = (0 until nChunks).map(c => n / nChunks * c).toArray :+ n

    val tmp = new Array[Byte](10)
    def encodedSize(v: Long): Int = varIntEncode(v, tmp, 0)
    def weightSize(w: Double): Int = weightFormat match {
      case WNone => 0
      case WVarint => encodedSize(w.toLong)
      case WSignedVarint => encodedSize(zigzagEncode(w.toLong))
      case WDouble => 8
      case WFloat => 4
    }

    // per-chunk prefix byte sizes (adjacency includes the count varints)
    val adjOff = new Array[Long](nChunks)
    val inOff = new Array[Long](nChunks)
    val wOff = new Array[Long](nChunks)
    val wInOff = new Array[Long](nChunks)
    var (a, t, wa, wt) = (0L, 0L, 0L, 0L)
    var totalOut = 0L; var totalIn = 0L
    for (c <- 0 until nChunks) {
      var u = firstInChunk(c)
      while (u < firstInChunk(c + 1)) {
        val o = outA(u.toInt); val i = inA(u.toInt)
        a += encodedSize(o.length.toLong); t += encodedSize(i.length.toLong)
        totalOut += o.length; totalIn += i.length
        o.foreach { case (v, w) => a += encodedSize(v); wa += weightSize(w) }
        i.foreach { case (v, w) => t += encodedSize(v); wt += weightSize(w) }
        u += 1
      }
      adjOff(c) = a; inOff(c) = t; wOff(c) = wa; wInOff(c) = wt
    }

    val headerSize = 8 + 11 * 8
    val offBase = headerSize.toLong
    val offAdj = offBase + n + (nChunks - 1) * 8L
    val offTransp = offAdj + (nChunks - 1) * 8L + 8L + a
    val weighted = weightFormat != WNone
    val offWeight = if (weighted) offTransp + (nChunks - 1) * 8L + 8L + t else 0L
    val offWeightTransp = if (weighted) offWeight + (nChunks - 1) * 8L + wa else 0L

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = fs.create(p, true)
    val os = new java.io.BufferedOutputStream(raw, 1 << 20)
    val lb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def putLong(v: Long): Unit = {
      lb.clear(); lb.putLong(v); os.write(lb.array(), 0, 8)
    }
    def putVarint(v: Long): Unit = { val k = varIntEncode(v, tmp, 0); os.write(tmp, 0, k) }
    def putWeight(w: Double): Unit = weightFormat match {
      case WNone =>
      case WVarint => putVarint(w.toLong)
      case WSignedVarint => putVarint(zigzagEncode(w.toLong))
      case WDouble =>
        lb.clear(); lb.putDouble(w); os.write(lb.array(), 0, 8)
      case WFloat =>
        lb.clear(); lb.putFloat(w.toFloat); os.write(lb.array(), 0, 4)
    }

    os.write("nkbg003".getBytes("US-ASCII")); os.write(0) // 8-byte magic
    putLong(0L) // checksum (unused)
    putLong((if (g.directed) 1L else 0L) |
      ((weightFormat.toLong << WeightShift) & WeightMask))
    putLong(n); putLong(nChunks.toLong)
    putLong(offBase); putLong(offAdj); putLong(offTransp)
    putLong(offWeight); putLong(offWeightTransp)
    putLong(0L); putLong(0L) // no edge ids
    // base data
    (0 until n.toInt).foreach(i => os.write(if (present(i)) 1 else 0))
    (1 until nChunks).foreach(c => putLong(firstInChunk(c)))
    // adjacency block
    (1 until nChunks).foreach(c => putLong(adjOff(c - 1)))
    putLong(totalOut)
    (0 until n.toInt).foreach { u =>
      putVarint(outA(u).length.toLong); outA(u).foreach { case (v, _) => putVarint(v) }
    }
    // transpose block
    (1 until nChunks).foreach(c => putLong(inOff(c - 1)))
    putLong(totalIn)
    (0 until n.toInt).foreach { u =>
      putVarint(inA(u).length.toLong); inA(u).foreach { case (v, _) => putVarint(v) }
    }
    // weight blocks: offset arrays are written even when unweighted
    // (zero-valued), mirroring the reference writer's unconditional loops
    (1 until nChunks).foreach(c => putLong(wOff(c - 1)))
    (0 until n.toInt).foreach(u => outA(u).foreach { case (_, w) => putWeight(w) })
    (1 until nChunks).foreach(c => putLong(wInOff(c - 1)))
    (0 until n.toInt).foreach(u => inA(u).foreach { case (_, w) => putWeight(w) })
    // edge-id offset arrays (always present, zero; no id data)
    (1 until nChunks).foreach(_ => putLong(0L))
    (1 until nChunks).foreach(_ => putLong(0L))
    os.close()
  }
}
