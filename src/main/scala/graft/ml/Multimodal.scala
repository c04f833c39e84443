package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (builder
  * brief): image/audio/video ride as opaque `BINARY` columns with typed
  * metadata; decode / feature-extract run per-partition in batches.
  *
  * The actual codecs are NOT in this environment, so [[StubCodec]] is a
  * clearly-marked deterministic fake — the Spark-side contract (schema,
  * partition sizing, per-partition batch processing, feature shapes) is
  * real and tested, and swapping the stub for a JNI/FFmpeg decoder
  * changes no plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_duration_ms", LongType)))

  /** Deterministic fake decoder: stands in for the real image/audio
    * codec (===== STUB — replace with a real decoder out of this
    * container =====). Produces a stable 8-float "feature" from the
    * bytes so pipelines are testable end-to-end. */
  object StubCodec {
    def decodeFeatures(content: Array[Byte], kind: String): Array[Float] = {
      // ??? real codec goes here; deterministic fake below
      val h = content.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
      Array.tabulate(8)(i =>
        (((h >> (i * 8)) & 0xff).toFloat / 255.0f) + (if (kind == "audio") 1f else 0f))
    }
  }

  /** Build a media table from the documents table (text bytes standing
    * in for media payloads — same column shapes as real ingestion). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("kind"),
      col("text").cast("binary").as("content"),
      (col("n_chars") % 1920).cast("int").as("meta_width"),
      (col("n_chars") % 1080).cast("int").as("meta_height"),
      (col("n_chars") * 10L).as("meta_duration_ms"))

  /** Per-partition batched decode → feature column. `mapPartitions`
    * (not a per-row UDF) so a real decoder can amortize model/codec
    * init per batch — the Spark-side analog of `mapInPandas` batch
    * semantics. Partition count controls batch size at scale. */
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
        val feats = StubCodec.decodeFeatures(content, kind)
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
