package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up data generator: replicates a testdata directory k× with
  * per-domain key offsets, so `<outDir>` behaves like a k×-larger scale
  * factor (each copy's keys live in a disjoint range; joins stay
  * consistent within a copy, and cross-copy keys never collide). Usage:
  * `runMain graft.ScaleData <srcDir> <outDir> <k>`. Dimension tables
  * (nation, region) are shared, as in TPC-H's fixed dimensions. */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (kk, v) => builder.config(kk, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def span(table: String, key: String): Long =
      Tables.load(spark, srcDir, table).agg(max(col(key))).head.getLong(0) + 1L

    val orderSpan = span("orders", "o_orderkey")
    val partSpan = span("part", "p_partkey")
    val suppSpan = span("supplier", "s_suppkey")
    val custSpan = span("customer", "c_custkey")
    val docSpan = span("documents", "doc_id")
    val vecSpan = span("embeddings", "vec_id")
    val evSpan = span("events", "event_id")
    val userSpan = span("events", "user_id")

    /** k offset copies with the named BIGINT key columns shifted. */
    def replicate(name: String, offsets: Map[String, Long]): DataFrame = {
      val src = Tables.load(spark, srcDir, name)
      (0 until k).map { i =>
        offsets.foldLeft(src) { case (df, (c, s)) =>
          df.withColumn(c, col(c) + lit(i * s)) }
      }.reduce(_ unionAll _)
    }

    val out: Seq[(String, DataFrame)] = Seq(
      "lineitem" -> replicate("lineitem", Map(
        "l_orderkey" -> orderSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)),
      "orders" -> replicate("orders", Map(
        "o_orderkey" -> orderSpan, "o_custkey" -> custSpan)),
      "customer" -> replicate("customer", Map("c_custkey" -> custSpan)),
      "part" -> replicate("part", Map("p_partkey" -> partSpan)),
      "supplier" -> replicate("supplier", Map("s_suppkey" -> suppSpan)),
      "documents" -> replicate("documents", Map("doc_id" -> docSpan)),
      "embeddings" -> replicate("embeddings", Map("vec_id" -> vecSpan)),
      "events" -> replicate("events", Map(
        "event_id" -> evSpan, "user_id" -> userSpan)),
      "nation" -> Tables.load(spark, srcDir, "nation"),
      "region" -> Tables.load(spark, srcDir, "region"))

    out.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaledata] wrote $name x$k")
    }
    spark.stop()
  }
}
