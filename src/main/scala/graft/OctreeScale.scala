package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Barnes–Hut repulsion scale probe: runs `viz.Octree.repulsion` on an
  * n-point hash-random 2D layout and records (a) wall seconds, (b) the
  * output node count (`nodes` — one aggregated force row per input
  * point; the per-node interaction fan-out itself is aggregated away
  * inside `repulsion` and is bounded by O(log n) per node by the
  * interaction-list construction), and (c) the partition-of-space
  * invariant
  * (min/max of `cov` must both equal n−1). The former single-level
  * grid was one broadcast crossJoin of n × cells — constant-accuracy
  * only if cells grow as O(n), i.e. O(n²) pair rows; the interaction
  * lists replace that with per-node O(log n) cells at FIXED accuracy.
  *
  * Usage: `runMain graft.OctreeScale <n1,n2,...>`.
  */
object OctreeScale {
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
      val coords = spark.range(n).select(col("id"),
        (pmod(xxhash64(lit(1L), col("id")), lit(1000000L)).cast("double")
          / 1000000.0).as("c0"),
        (pmod(xxhash64(lit(2L), col("id")), lit(1000000L)).cast("double")
          / 1000000.0).as("c1"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val rep = graft.viz.Octree.repulsion(coords, dim = 2,
        qSign = 1.0, q2 = 1.0).localCheckpoint(true)
      val dt = (System.nanoTime() - t0) / 1e9
      val stats = rep.agg(min(col("cov")).as("mn"), max(col("cov")).as("mx"),
        count(lit(1)).as("rows")).head
      val covOk = stats.getLong(0) == n - 1 && stats.getLong(1) == n - 1
      println(f"""{"probe":"octree","n":$n,"sec":$dt%.1f,"cov_ok":$covOk,"nodes":${stats.getLong(2)}}""")
      graft.graph.Fixpoint.free(coords)
      graft.graph.Fixpoint.free(rep)
    }
    spark.stop()
  }
}
