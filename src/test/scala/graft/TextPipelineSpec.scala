package graft

import org.apache.spark.sql.functions._
import graft.ml.TextPipeline

/** Hand-computed fixtures for the training-data pipeline text ops:
  * repetition signals, stratified sampling, decontamination. */
class TextPipelineSpec extends SparkSpec {

  test("repetitionStats: exact counts + derived fractions on a hand-built doc") {
    import spark.implicits._
    val df = Seq((1L, "a a a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val stats = TextPipeline.repetitionStats(df, "doc_id", "text")
    val c = stats.collect().map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
        x.getLong(6))).toMap
    // doc 1: tokens 4, top word 'a'×3; 2-grams [a a, a a, a b] → 3 total
    // 2 distinct; 3-grams [a a a, a a b] → 2 total 2 distinct
    assert(c(1L) == ((4L, 3L, 3L, 2L, 2L, 2L)))
    assert(c(2L) == ((4L, 1L, 3L, 3L, 2L, 2L)))
    val f = TextPipeline.repetitionFractions(stats, "doc_id")
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(f(1L) == ((0.75, 1.0 / 3.0, 0.0)))
    assert(f(2L) == ((0.25, 0.0, 0.0)))
  }

  test("stratifiedSample: reproducible, per-stratum ceil(frac*n), salt-sensitive") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "stratum")
    val s1 = TextPipeline.stratifiedSample(df, "doc_id", Seq("stratum"), 0.3)
    val s2 = TextPipeline.stratifiedSample(df, "doc_id", Seq("stratum"), 0.3)
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty, "must be deterministic")
    val sizes = s1.groupBy("stratum").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("a" -> 15L, "b" -> 15L)) // ceil(50 · 0.3)
    val other = TextPipeline.stratifiedSample(df, "doc_id", Seq("stratum"), 0.3,
      salt = "other")
    assert(other.count() == 30)
    assert(s1.except(other).count() > 0, "different salt must pick different rows")
  }

  test("streamingDedup: first arrival wins across micro-batches, counts exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams
      .streamingDedup(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      src.addData(Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")))
      q.processAllAvailable()
      src.addData(Seq((4L, "aaa"), (5L, "ccc"), (6L, "bbb")))
      q.processAllAvailable()
      val out = spark.table("dedup_out")
        .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
      // doc 1 is the canonical 'aaa' (smallest id in its first batch);
      // 3 is rank 2 same batch, 4 is rank 3 from the later batch
      assert(out(1L) == ((true, 1L)) && out(3L) == ((false, 2L)) &&
        out(4L) == ((false, 3L)))
      assert(out(2L) == ((true, 1L)) && out(6L) == ((false, 2L)))
      assert(out(5L) == ((true, 1L)))
      // streaming keep-set == batch dropExactDuplicates on the union
      val batch = graft.ml.Dedup.dropExactDuplicates(
        Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"), (5L, "ccc"),
          (6L, "bbb")).toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val kept = out.filter(_._2._1).keySet
      assert(kept == batch)
    } finally q.stop()
  }

  test("decontaminate: flags exactly the docs sharing a blocked 3-gram") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a quick brown dog sits"),
      (3L, "quick brown fox runs away")).toDF("doc_id", "text")
    val block = Seq("quick brown fox").toDF("ngram")
    val out = TextPipeline.decontaminate(df, "doc_id", "text", block)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 1L))
  }
}
