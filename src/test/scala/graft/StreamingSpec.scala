package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming == batch semantics on the sf0.001 events table (memory
  * sink + processAllAvailable drives the file stream synchronously). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts == batch ev1_tumbling") {
    val stream = EventStreams.readEvents(spark, sf001)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("hour_start", "event_type", "n", "total")
      val batch = SparkEntry.queries("ev1_tumbling")(spark, sf001)
      assert(streamed.count() > 0)
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("stateful sessionization matches batch session counts") {
    val stream = EventStreams.readEvents(spark, sf001)
    val q = EventStreams.sessionize(stream)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
      val batch = SparkEntry.queries("ev2_sessions")(spark, sf001)
        .select("user_id", "n_sessions")
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    } finally q.stop()
  }

  test("foreachBatch graph updater maintains state across micro-batches") {
    // reference GraphUpdater.update: events drive an evolving graph;
    // here each micro-batch folds into a driver-held running edge count
    // (the DynAlgorithm.updateBatch analog)
    val dir = java.nio.file.Files.createTempDirectory("graft-updater").toString
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = EventStreams.readEvents(spark, sf001)
    val q = EventStreams.graphUpdater(stream, dir) { (batch, _) =>
      seen.addAndGet(batch.count())
    }
    try {
      q.processAllAvailable()
      val total = Tables.load(spark, sf001, "events").count()
      assert(seen.get() == total, s"updater saw ${seen.get()} of $total events")
    } finally q.stop()
  }

  test("sliding windows emit more buckets than tumbling") {
    val stream = EventStreams.readEvents(spark, sf001)
    val q = EventStreams.slidingCounts(stream)
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val slid = spark.table("sliding_out").count()
      val tumb = SparkEntry.queries("ev1_tumbling")(spark, sf001).count()
      assert(slid > tumb)
    } finally q.stop()
  }
}
