package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[sessionConfigs]]): the `events` table stores TIMESTAMP(NANOS),
    * which the vectorized reader otherwise rejects. The nano-long is
    * converted back to a (microsecond) timestamp here. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Required session configs for the testdata + the engine's session
    * extensions (checkpoint-stats clamp; see [[GraftExtensions]]).
    *
    * Escape hatch: setting env `GRAFT_DISABLE_CLAMP` (debug-only,
    * evaluated once at object load) omits the extensions entry and thus
    * re-enables the exponential checkpoint-stats planning blowup that
    * [[org.apache.spark.sql.GraftStatsClampRule]] exists to fix —
    * iterative algorithms (agglomerative clustering, PageRank) will
    * appear to hang while planning. Never set it in normal runs. */
  val sessionConfigs: Map[String, String] = {
    val base = Map(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.session.timeZone" -> "UTC",
      // with AQE on, plan wide shuffles at 8× the session parallelism and
      // let coalescing shrink small ones back — big intermediates (the
      // part-graph pair explosion at high SF) stop funneling through
      // `shuffle.partitions`-sized reducers, while small queries still
      // end up with few partitions after coalesce
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "256",
      // let the planner pick shuffled-hash join when its build side fits
      // (guide §3.1): skips both sort passes of sort-merge; the planner
      // still falls back to SMJ when the size conditions fail, so this
      // is scale-safe (a too-big build side never hash-joins)
      "spark.sql.join.preferSortMergeJoin" -> "false")
    if (sys.env.contains("GRAFT_DISABLE_CLAMP")) base
    else base + ("spark.sql.extensions" -> "graft.GraftExtensions")
  }
}
