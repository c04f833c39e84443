package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream surface in batch form over the `events` table
  * (`event_id, ts, user_id, event_type, value, props`): tumbling
  * windows, sessionization, running aggregates, JSON extraction.
  * The same transforms run under Structured Streaming in
  * [[graft.streaming.EventStreams]]; these batch queries are the
  * DuckDB-oracle-checked semantics.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val defs: Map[String, Q] = Map(
    // tumbling 1-hour windows (bucket keyed by epoch seconds for
    // engine-portable hashing)
    "ev1_tumbling" -> ((s, dir) =>
      events(s, dir)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))),

    // 30-minute-gap sessionization: sessions per user + avg session size
    "ev2_sessions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("prev", lag("ts", 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))) > 1800, 1)
            .otherwise(0))
        .withColumn("sess", sum("new_sess")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess").agg(count(lit(1)).as("sz"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), round(avg("sz"), 6).as("avg_len"))
    }),

    // per-user running sum ordered by time
    "ev3_running" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir).select(
        col("event_id"), col("user_id"),
        round(sum("value").over(w), 2).as("running"))
    }),

    // JSON property extraction + aggregation
    "ev4_json" -> ((s, dir) =>
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), round(avg("k"), 6).as("avg_k"),
          count(lit(1)).as("n"))),

    // top-10 users by total value
    "ev5_topusers" -> ((s, dir) =>
      events(s, dir)
        .groupBy("user_id")
        .agg(round(sum("value"), 2).as("total"), count(lit(1)).as("n"))
        .orderBy(desc("total"), asc("user_id"))
        .limit(10)),

    // event-type transition counts per user (lead/lag sequence analysis)
    "ev6_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
    })
  )

  val oracles: Map[String, String] = Map(
    "ev1_tumbling" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS hour_start, event_type,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev2_sessions" ->
      """WITH l AS (SELECT user_id, ts, event_id,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
        |m AS (SELECT user_id, ts, event_id,
        |  CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END AS new_sess FROM l),
        |sx AS (SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM m),
        |g AS (SELECT user_id, sess, count(*) AS sz FROM sx GROUP BY user_id, sess)
        |SELECT user_id, count(*) AS n_sessions, round(avg(sz), 6) AS avg_len
        |FROM g GROUP BY user_id""".stripMargin,
    "ev3_running" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events""".stripMargin,
    "ev4_json" ->
      """SELECT event_type, sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        | round(avg(json_extract(props, '$.k')::BIGINT), 6) AS avg_k, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "ev5_topusers" ->
      """SELECT user_id, round(sum(value), 2) AS total, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY total DESC, user_id ASC LIMIT 10""".stripMargin,
    "ev6_transitions" ->
      """WITH l AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |FROM l WHERE next_type IS NOT NULL GROUP BY 1, 2""".stripMargin
  )
}
