package graft

import org.apache.spark.sql.functions._
import graft.ml.Multimodal
import graft.ml.Multimodal.Codec

/** Real-codec specs: byte-exact roundtrips, a golden BMP fixture decoded
  * from fixed bytes (catches silent encode+decode-agree-but-both-wrong),
  * and the end-to-end media pipeline on the sf0.001 documents table. */
class MultimodalSpec extends SparkSpec {

  test("BMP roundtrip is pixel-exact and size matches the format formula") {
    val w = 5; val h = 3 // w=5 forces row padding (15 -> 16 bytes)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 256).toByte)
    val bmp = Codec.encodeBmp(w, h, rgb)
    assert(bmp.length == Codec.bmpSize(w, h))
    assert(bmp.length == 54 + 16 * h)
    val (dw, dh, drgb) = Codec.decodeBmp(bmp)
    assert(dw == w && dh == h)
    assert(drgb.toSeq == rgb.toSeq)
  }

  test("golden BMP: hand-built 2x2 bytes decode to the expected pixels") {
    // 2x2 24-bit BMP, rowSize = 8 (2 px * 3 B + 2 padding). Rows are
    // stored bottom-up, pixels as BGR. Top-left R=255, top-right G=255,
    // bottom-left B=255, bottom-right white.
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0,
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    val bottomRow = Array[Int](255, 0, 0, 255, 255, 255, 0, 0) // BGR: blue px, white px
    val topRow = Array[Int](0, 0, 255, 0, 255, 0, 0, 0)        // BGR: red px, green px
    val bytes = (header ++ bottomRow ++ topRow).map(_.toByte)
    val (w, h, rgb) = Codec.decodeBmp(bytes)
    assert(w == 2 && h == 2)
    val px = rgb.grouped(3).map(_.map(_ & 0xff).toSeq).toSeq
    assert(px == Seq(Seq(255, 0, 0), Seq(0, 255, 0), Seq(0, 0, 255), Seq(255, 255, 255)))
  }

  test("WAV roundtrip preserves sample rate and samples exactly") {
    val samples = Array.tabulate(300)(i => ((i * 131 - 16000) % 32768).toShort)
    val wav = Codec.encodeWav(8000, samples)
    assert(wav.length == Codec.wavSize(samples.length))
    val (rate, out) = Codec.decodeWav(wav)
    assert(rate == 8000)
    assert(out.toSeq == samples.toSeq)
  }

  test("GRV1 video roundtrip preserves dims and every frame") {
    val w = 4; val h = 3
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(w * h * 3)(i => ((f * 100 + i) % 256).toByte))
    val vid = Codec.encodeVideo(w, h, frames)
    assert(vid.length == Codec.videoSize(w, h, 5))
    val (dw, dh, dframes) = Codec.decodeVideo(vid)
    assert(dw == w && dh == h && dframes.length == 5)
    (0 until 5).foreach(f => assert(dframes(f).toSeq == frames(f).toSeq))
  }

  test("media pipeline: encoded sizes and decoded dims match the n_chars contract") {
    val docs = Tables.load(spark, sf001, "documents")
    val media = Multimodal.mediaFromDocuments(docs).cache()
    val feats = Multimodal.extractFeatures(media)
    // every decoded dimension must equal the metadata written at encode
    val bad = feats.filter(
      when(col("kind") === "image",
        col("features").getItem(0) =!= col("meta_width").cast("float") ||
        col("features").getItem(1) =!= col("meta_height").cast("float"))
      .when(col("kind") === "audio", col("features").getItem(0) =!= lit(8000f))
      .otherwise(
        col("features").getItem(0) =!= col("meta_width").cast("float") ||
        col("features").getItem(5) * 1000 =!= col("meta_duration_ms").cast("float")))
      .count()
    assert(bad == 0)
    // encoded byte length must equal the closed-form size for the kind
    val docDims = docs.select(col("doc_id").as("media_id"), col("n_chars"))
    val sizeBad = media.join(docDims, "media_id")
      .withColumn("expect", expr(
        """CASE kind
          |  WHEN 'image' THEN 54 + ((3*(8 + n_chars % 24)+3) div 4 * 4)*(8 + n_chars % 16)
          |  WHEN 'audio' THEN 44 + 2*(256 + n_chars % 512)
          |  ELSE 16 + (1 + n_chars % 5)*(8 + n_chars % 24)*(8 + n_chars % 16)*3
          |END""".stripMargin))
      .filter(octet_length(col("content")) =!= col("expect")).count()
    assert(sizeBad == 0)
    media.unpersist()
  }

  test("decoded image mean channels equal the cycled-text expectation") {
    import spark.implicits._
    val docs = Seq((0L, "abcdef", 6L)).toDF("doc_id", "text", "n_chars")
    val media = Multimodal.mediaFromDocuments(docs)
    val f = Multimodal.extractFeatures(media).select("features").head()
      .getSeq[Float](0)
    val w = Multimodal.widthOf(6); val h = Multimodal.heightOf(6)
    assert(f(0) == w.toFloat && f(1) == h.toFloat)
    // payload cycles "abcdef": channel c mean = mean of bytes at i%3==c
    val bytes = "abcdef".getBytes
    val n = w * h * 3
    val sums = new Array[Long](3)
    (0 until n).foreach(i => sums(i % 3) += bytes(i % bytes.length) & 0xff)
    (0 until 3).foreach(c =>
      assert(math.abs(f(2 + c) - sums(c).toFloat / (w * h)) < 1e-3f))
  }
}
