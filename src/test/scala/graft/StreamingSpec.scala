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

  test("incremental CC: union-find state across micro-batches == batch recompute") {
    // karate streamed as edge additions: the final component count must
    // equal the batch ConnectedComponents result (1 component), and the
    // incremental path must process every batch without recomputation
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val karate = graft.io.GraphReaders
      .readMetis(spark, "/root/reference/input/karate.graph")
    val edges = karate.edges.select("src", "dst")
      .as[(Long, Long)].collect().toSeq
    val src = MemoryStream[(Long, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft-dyncc").toString
    val results = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = EventStreams.incrementalCC(
      src.toDF().toDF("src", "dst"), dir) { (b, n, c) =>
      results.synchronized { results += ((b, n, c)) }
    }
    try {
      // three growing batches
      src.addData(edges.take(30))
      q.processAllAvailable()
      src.addData(edges.slice(30, 60))
      q.processAllAvailable()
      src.addData(edges.drop(60))
      q.processAllAvailable()
      val fin = results.synchronized(results.maxBy(_._1))
      assert(fin._2 == 34, s"${fin._2} nodes tracked")
      assert(fin._3 == 1, s"${fin._3} components (karate is connected)")
      assert(results.size >= 3, "must have processed each micro-batch incrementally")
    } finally q.stop()
  }

  test("incremental CC: 1e5-edge replay, distributed state, known components") {
    // 100k nodes in 1000-node blocks: edge (i, i+1) unless i+1 is a block
    // boundary → exactly 100 components; replayed in 4 micro-batches the
    // distributed label table must converge to the same counts
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val edges = (0L until 100000L).filter(i => (i + 1) % 1000 != 0).map(i => (i, i + 1))
    val src = MemoryStream[(Long, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft-dyncc-big").toString
    val results = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = EventStreams.incrementalCC(
      src.toDF().toDF("src", "dst"), dir) { (b, n, c) =>
      results.synchronized { results += ((b, n, c)) }
    }
    try {
      edges.grouped(edges.size / 4 + 1).foreach { chunk =>
        src.addData(chunk)
        q.processAllAvailable()
      }
      val fin = results.synchronized(results.maxBy(_._1))
      assert(fin._2 == 100000L, s"${fin._2} nodes tracked")
      assert(fin._3 == 100L, s"${fin._3} components")
      assert(results.size >= 4)
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
