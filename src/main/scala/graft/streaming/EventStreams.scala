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

  /** File-backed event stream over the testdata `events.parquet`.
    * The schema is taken from the file itself (one driver-side footer
    * read) so the stream survives testdata layout changes — `ts` has
    * shipped both as INT64 nanos and as TIMESTAMP(NTZ) across rounds —
    * and the long→timestamp conversion mirrors [[Tables.load]] exactly,
    * keeping streaming == batch comparable. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (fileSchema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // watermarks require TIMESTAMP (not NTZ); sessions pin UTC, so the
    // cast keeps the same wall-clock and the batch's window boundaries
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

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

  case class DedupIn(hash: String, doc_id: Long)
  case class DedupOut(doc_id: Long, hash: String, is_first: Boolean, dup_rank: Long)

  /** Streaming exact-dedup over a document stream (the pipeline dedup
    * ops of `ml.Dedup`, online): keyed by content hash, per-key state =
    * (canonical doc_id, #seen); each arrival emits `(doc_id, hash,
    * is_first, dup_rank)`, so a downstream filter `is_first` is the
    * streaming `dropExactDuplicates`. State is one tiny record per
    * DISTINCT content — the same hash-keyed shuffle shape as the batch
    * op, and the canonical choice (first arrival, then smallest id
    * within a micro-batch group) is deterministic under replay. */
  def streamingDedup(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(md5(col(text)).as("hash"), col(id).cast("long").as("doc_id"))
      .as[DedupIn]
      .groupByKey(_.hash)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (hash: String, rows: Iterator[DedupIn],
         state: GroupState[(Long, Long)]) => {
          val sorted = rows.map(_.doc_id).toSeq.sorted
          val (seen0, first) =
            if (state.exists) (state.get._2, false) else (0L, true)
          val out = sorted.zipWithIndex.map { case (d, i) =>
            DedupOut(d, hash, first && i == 0, seen0 + i + 1)
          }
          val canonical = if (state.exists) state.get._1 else sorted.head
          state.update((canonical, seen0 + sorted.size))
          out.iterator
        })
  }

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
    * merged into the carried component labels instead of recomputing
    * from scratch — additions only merge components.
    *
    * The state is a DISTRIBUTED `(id, comp)` table (comp = min node id
    * of the component), localCheckpointed per batch; the driver holds
    * only the DataFrame handle and per-batch scalar counts. Each batch:
    * relabel the new edges' endpoints through the current roots (one
    * join against batch-sized data), contract the ≤ batch-sized
    * root-graph with [[graft.graph.ConnectedComponents.run]]'s
    * large/small-star rounds, and fold the resulting root→root map back
    * into the label table (a broadcast-sized join — the big table never
    * shuffles). O(batch · log batch) distributed work per batch, no
    * O(n) driver structure, no per-batch collect. Emits
    * `(batch_id, n_nodes, n_components)` after each batch. */
  def incrementalCC(events: DataFrame, stateDir: String)(
      onResult: (Long, Long, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var comp: Option[DataFrame] = None // (id, comp) — distributed state
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        import graft.graph.{ConnectedComponents, PropertyGraph}
        val raw = batch.toDF().select(col("src"), col("dst"))
          .localCheckpoint(true)
        val e = raw.filter(col("src") =!= col("dst")).distinct()
        // batch endpoints not yet labeled start as their own root
        // (self-loop-only nodes included, matching union-find semantics)
        val ends = raw.select(col("src").as("id"))
          .unionAll(raw.select(col("dst").as("id"))).distinct()
        val newNodes = comp match {
          case Some(c) => ends.join(c, Seq("id"), "left_anti")
          case None => ends
        }
        val base = comp match {
          case Some(c) => c.unionAll(newNodes.select(col("id"), col("id").as("comp")))
          case None => newNodes.select(col("id"), col("id").as("comp"))
        }
        // relabel the batch edges to current roots; contract the root graph
        val lbl = base.select(col("id"), col("comp"))
        val rootEdges = e
          .join(lbl.select(col("id").as("src"), col("comp").as("ru")), Seq("src"))
          .join(lbl.select(col("id").as("dst"), col("comp").as("rv")), Seq("dst"))
          .select(col("ru").as("src"), col("rv").as("dst"), lit(1.0).as("weight"))
          .filter(col("src") =!= col("dst"))
        val updated = (if (rootEdges.isEmpty) base
          else {
            val rootMap = ConnectedComponents.run(PropertyGraph(rootEdges, directed = false))
              .select(col("id").as("comp"), col("component").as("newComp"))
            base.join(rootMap, Seq("comp"), "left")
              .select(col("id"), coalesce(col("newComp"), col("comp")).as("comp"))
          }).localCheckpoint(true)
        comp.foreach(_.unpersist(blocking = false))
        comp = Some(updated)
        val stats = updated.agg(count(lit(1)), countDistinct("comp")).head
        onResult(id, stats.getLong(0), stats.getLong(1))
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
