package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-shape CI probe: re-asserts, on SMALL inputs in seconds, the
  * executed-plan invariants behind the anti-pattern families retired in
  * rounds 7–9 — no `CartesianProduct` / `BroadcastNestedLoopJoin`, no
  * `Exchange SinglePartition`, no unpartitioned `Window` — so a
  * regression reintroducing any of them fails the round gate without a
  * 10⁸-row scale run (those live in GiniScale / OctreeScale /
  * SrpScale). The plan is the scale contract: these operators' costs
  * are decided by plan SHAPE, which is size-independent.
  *
  * Checks: gini (the algebraic rank-aggregate form), Barnes–Hut octree
  * repulsion (interaction lists, `exactBelow = 0`), and SRP bucket
  * occupancy (the ANN candidate generator).
  *
  * Usage: `runMain graft.PlanProbe` — one JSON line per check, exits
  * nonzero on any violation.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 5000L
    val giniDf = graft.graph.Coloring.gini(
      spark.range(n).select(pmod(xxhash64(lit(9L), col("id")), lit(1000L)).as("deg")),
      "deg")
    val coords = spark.range(n).select(col("id"),
        (pmod(xxhash64(lit(1L), col("id")), lit(1000000L)).cast("double")
          / 1000000.0).as("c0"),
        (pmod(xxhash64(lit(2L), col("id")), lit(1000000L)).cast("double")
          / 1000000.0).as("c1"))
      .localCheckpoint(true)
    val octreeDf = graft.viz.Octree.repulsion(coords, dim = 2,
      qSign = 1.0, q2 = 1.0, exactBelow = 0)
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 15), d ->
             |  cast(cast(pmod(xxhash64(vec_id, d), 1000000) as double)
             |       / 500000.0 - 1.0 as float))""".stripMargin).as("embedding"))
    val bits = graft.ml.Similarity.srpBits(n)
    val srpDf = graft.ml.Similarity.srpBuckets(vecs, "vec_id", "embedding", bits)
      .groupBy("bucket").agg(count(lit(1)).as("s"))

    // `single_partition` is only banned for checks whose OUTPUT is
    // row-per-entity: a scalar aggregate's final stage legitimately
    // exchanges its k partial rows to one partition (gini is 1-row BY
    // DESIGN — its retired anti-pattern was the Window, not the final
    // partial-agg exchange)
    var bad = 0
    Seq(
      ("gini", giniDf, false),
      ("octree_bh", octreeDf, true),
      ("srp_occupancy", srpDf, true))
      .foreach { case (name, df, banSinglePartition) =>
        df.collect() // drive to the FINAL (AQE-resolved) physical plan
        val plan = df.queryExecution.executedPlan.toString
        val hits = Seq(
          "cartesian" -> plan.contains("CartesianProduct"),
          "nested_loop" -> plan.contains("BroadcastNestedLoop"),
          "single_partition_exchange" ->
            (banSinglePartition && plan.contains("Exchange SinglePartition")),
          "window" -> plan.contains("Window"))
          .collect { case (k, true) => k }
        if (hits.nonEmpty) bad += 1
        println(s"""{"probe":"plan","check":"$name","n":$n,"violations":[${
          hits.map("\"" + _ + "\"").mkString(",")}],"ok":${hits.isEmpty}}""")
      }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
