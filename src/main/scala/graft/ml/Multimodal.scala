package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (builder
  * brief): image/audio/video ride as opaque `BINARY` columns with typed
  * metadata; decode / feature-extract run per-partition in batches.
  *
  * The codecs are REAL, dependency-free implementations of open
  * formats — 24-bit uncompressed BMP (bottom-up rows, 4-byte padded),
  * 16-bit PCM mono WAV (RIFF), and a raw-frame video container — so the
  * decode stage genuinely parses headers and pixel/sample payloads.
  * Swapping in a JPEG/FLAC/H.264 decoder (JNI/FFmpeg, out of this
  * container) changes only [[Codec]], no plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_duration_ms", LongType)))

  /** Dependency-free binary codecs for the three media kinds. All
    * little-endian, matching the on-disk formats. */
  object Codec {
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    /** Padded bytes per BMP pixel row. */
    def bmpRowSize(w: Int): Int = (3 * w + 3) / 4 * 4
    def bmpSize(w: Int, h: Int): Int = 54 + bmpRowSize(w) * h
    def wavSize(nSamples: Int): Int = 44 + 2 * nSamples
    def videoSize(w: Int, h: Int, nFrames: Int): Int = 16 + nFrames * w * h * 3

    /** 24-bit uncompressed BMP (BITMAPINFOHEADER). `rgb` is top-down
      * R,G,B triples; rows are written bottom-up as BGR with padding,
      * per the format. */
    def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"rgb ${rgb.length} != ${w * h * 3}")
      val rowSize = bmpRowSize(w)
      val out = new Array[Byte](54 + rowSize * h)
      out(0) = 'B'; out(1) = 'M'
      le32(out, 2, out.length); le32(out, 10, 54)
      le32(out, 14, 40); le32(out, 18, w); le32(out, 22, h)
      le16(out, 26, 1); le16(out, 28, 24)
      le32(out, 34, rowSize * h)
      var y = 0
      while (y < h) {
        val dstRow = 54 + (h - 1 - y) * rowSize // bottom-up
        var x = 0
        while (x < w) {
          val s = (y * w + x) * 3
          out(dstRow + x * 3) = rgb(s + 2)     // B
          out(dstRow + x * 3 + 1) = rgb(s + 1) // G
          out(dstRow + x * 3 + 2) = rgb(s)     // R
          x += 1
        }
        y += 1
      }
      out
    }

    /** Decode 24-bit BMP → (width, height, top-down RGB triples). */
    def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
      val off = rd32(bytes, 10)
      val w = rd32(bytes, 18); val h = rd32(bytes, 22)
      require(rd16(bytes, 28) == 24, "only 24bpp supported")
      val rowSize = bmpRowSize(w)
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = off + (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val d = (y * w + x) * 3
          rgb(d) = bytes(srcRow + x * 3 + 2)
          rgb(d + 1) = bytes(srcRow + x * 3 + 1)
          rgb(d + 2) = bytes(srcRow + x * 3)
          x += 1
        }
        y += 1
      }
      (w, h, rgb)
    }

    /** 16-bit PCM mono WAV (RIFF/WAVE, fmt + data chunks). */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      le32(out, 4, 36 + dataLen)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      le32(out, 16, 16); le16(out, 20, 1); le16(out, 22, 1)
      le32(out, 24, sampleRate); le32(out, 28, sampleRate * 2)
      le16(out, 32, 2); le16(out, 34, 16)
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      le32(out, 40, dataLen)
      var i = 0
      while (i < samples.length) { le16(out, 44 + i * 2, samples(i) & 0xffff); i += 1 }
      out
    }

    /** Decode PCM16 mono WAV → (sampleRate, samples). */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
      require(bytes.length >= 44 && bytes(0) == 'R' && bytes(8) == 'W', "not a WAV")
      require(rd16(bytes, 20) == 1 && rd16(bytes, 34) == 16, "only PCM16 supported")
      val sampleRate = rd32(bytes, 24)
      val dataLen = rd32(bytes, 40)
      val n = dataLen / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = rd16(bytes, 44 + i * 2).toShort; i += 1 }
      (sampleRate, samples)
    }

    /** Raw-frame video container `GRV1`: magic(4) | w(4) | h(4) |
      * nFrames(4) | nFrames × (w·h·3 RGB bytes). Stands in for a real
      * codec's GOP structure with an exactly-parseable layout. */
    def encodeVideo(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
      val fl = w * h * 3
      frames.foreach(f => require(f.length == fl))
      val out = new Array[Byte](16 + frames.length * fl)
      out(0) = 'G'; out(1) = 'R'; out(2) = 'V'; out(3) = '1'
      le32(out, 4, w); le32(out, 8, h); le32(out, 12, frames.length)
      var i = 0
      while (i < frames.length) {
        System.arraycopy(frames(i), 0, out, 16 + i * fl, fl); i += 1
      }
      out
    }

    /** Decode GRV1 → (width, height, frames). */
    def decodeVideo(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
      require(bytes.length >= 16 && bytes(0) == 'G' && bytes(3) == '1', "not GRV1")
      val w = rd32(bytes, 4); val h = rd32(bytes, 8); val n = rd32(bytes, 12)
      val fl = w * h * 3
      val frames = Array.tabulate(n) { i =>
        val f = new Array[Byte](fl)
        System.arraycopy(bytes, 16 + i * fl, f, 0, fl); f
      }
      (w, h, frames)
    }
  }

  /** Deterministic payload dimensions from the document's char count —
    * the SQL-derivable contract the x10–x12 oracles re-derive. */
  def widthOf(nChars: Long): Int = (8 + nChars % 24).toInt
  def heightOf(nChars: Long): Int = (8 + nChars % 16).toInt
  def samplesOf(nChars: Long): Int = (256 + nChars % 512).toInt
  def framesOf(nChars: Long): Int = (1 + nChars % 5).toInt
  val sampleRate = 8000

  /** Fill `n` payload bytes by cycling the source bytes (seeded fallback
    * byte when the source is empty). */
  private def cycle(src: Array[Byte], n: Int, seed: Long): Array[Byte] = {
    val s = if (src.nonEmpty) src else Array((seed & 0xff).toByte)
    Array.tabulate(n)(i => s(i % s.length))
  }

  /** Build a media table from the documents table: text bytes become
    * REAL encoded payloads — BMP images, PCM16 WAVs, GRV1 video — with
    * dimensions derived from `n_chars` (so the oracle can re-derive
    * every encoded size and decoded dimension in SQL). Encoding runs
    * per-partition, the same batch shape as the decode. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val in = docs.select(col("doc_id").cast("long"), col("text").cast("binary"),
      col("n_chars").cast("long"))
    val rdd = in.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val txt = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
        val nc = r.getLong(2)
        val w = widthOf(nc); val h = heightOf(nc)
        (id % 3) match {
          case 0 =>
            val content = Codec.encodeBmp(w, h, cycle(txt, w * h * 3, id))
            Row(id, "image", content, w, h, 0L)
          case 1 =>
            val n = samplesOf(nc)
            val raw = cycle(txt, n * 2, id)
            val samples = Array.tabulate(n)(i =>
              (((raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)).toShort))
            val content = Codec.encodeWav(sampleRate, samples)
            Row(id, "audio", content, 0, 0, n * 1000L / sampleRate)
          case _ =>
            val nf = framesOf(nc)
            val frames = Array.tabulate(nf)(i => cycle(txt, w * h * 3, id + i))
            val content = Codec.encodeVideo(w, h, frames)
            Row(id, "video", content, w, h, nf * 1000L)
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Per-partition batched decode → feature column. `mapPartitions`
    * (not a per-row UDF) so a real decoder can amortize model/codec
    * init per batch — the Spark-side analog of `mapInPandas` batch
    * semantics. Partition count controls batch size at scale.
    *
    * Features (8 floats; integer-valued entries are exact in float):
    * image  [w, h, meanR, meanG, meanB, w·h,      0, 0]
    * audio  [rate, nSamples, meanAbs/327.68, rms/327.68, 0, nSamples, 0, 1]
    * video  [w, h, meanPixel, 0, 0, nFrames, 0, 2]
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.toSeq :+
      StructField("features", ArrayType(FloatType)) :+
      StructField("byte_len", LongType))
    val rdd = media.rdd.mapPartitions { rows =>
      // per-partition init happens HERE (codec handles, model weights)
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val kind = r.getAs[String]("kind")
        val feats: Array[Float] = kind match {
          case "image" =>
            val (w, h, rgb) = Codec.decodeBmp(content)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < rgb.length) {
              sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
              i += 3
            }
            val n = (w * h).toFloat
            Array(w, h, sr / n, sg / n, sb / n, w * h, 0f, 0f)
          case "audio" =>
            val (rate, samples) = Codec.decodeWav(content)
            var sa = 0.0; var sq = 0.0
            samples.foreach { s => sa += math.abs(s.toDouble); sq += s.toDouble * s }
            val n = samples.length.toDouble
            Array(rate, samples.length, (sa / n / 327.68).toFloat,
              (math.sqrt(sq / n) / 327.68).toFloat, 0f, samples.length, 0f, 1f)
          case _ =>
            val (w, h, frames) = Codec.decodeVideo(content)
            var sp = 0L; var np = 0L
            frames.foreach { f => f.foreach(b => sp += b & 0xff); np += f.length }
            Array(w, h, (sp.toDouble / np).toFloat, 0f, 0f, frames.length, 0f, 2f)
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq :+ content.length.toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plan for video rows: one row per sampled frame
    * index (pure column math — `sequence` + `explode`; the decode of
    * each frame would ride [[extractFeatures]]). */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta_duration_ms"),
        explode(sequence(lit(0L), greatest(col("meta_duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_ms"))

  /** Feature stats per kind — the shape a quality-filter stage consumes. */
  def featureStats(features: DataFrame): DataFrame =
    features
      .select(col("kind"), col("byte_len"),
        expr("aggregate(features, 0D, (a, x) -> a + cast(x as double))").as("fsum"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        round(avg("byte_len"), 2).as("avg_bytes"),
        round(avg("fsum"), 6).as("avg_feature_sum"))
}
