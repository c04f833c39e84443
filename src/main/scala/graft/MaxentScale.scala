package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** END-TO-END maxent-stress layout scale probe: OctreeScale measures
  * the Barnes–Hut repulsion pass alone and x80 runs the layout tiny —
  * this drives `MaxentLayout.maxentStress` whole (known-distance build,
  * multigrid hierarchy, per-solve rhs + BH repulsion + zero-sum
  * correction + V-cycle solves, convergence checks) at 10⁶ nodes.
  *
  * Input: a random-attachment tree — node i > 0 attaches to a uniform
  * hash-random parent < i. Connected BY CONSTRUCTION (the layout throws
  * on disconnected input, matching the reference), and max degree stays
  * O(log n), so the 2-hop known-distance set S grows ~linearly — the
  * same reason a production layout would pre-coarsen hubs. Solve
  * bounds mirror the x80 oracle gate (3 solves × 2 alpha rounds, loose
  * inner tolerance): stress majorization does most of its work in the
  * first solves, and the probe's subject is the SCALE SHAPE of one
  * solve, not final layout polish.
  *
  * After the layout, the probe re-issues the exact in-loop
  * `Octree.repulsion` call on the final coordinates and machine-checks
  * the executed plan (no cartesian / nested-loop / single-partition
  * exchange) — the OctreeSpec invariants on the full-size layout plan.
  *
  * Usage: `runMain graft.MaxentScale [n]` (default 2^20). Prints one
  * JSON line.
  */
object MaxentScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1L << 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-maxentscale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "48g"))
      .config("spark.cleaner.periodicGC.interval", "45s")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", cpus))
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // warmup

    // attachment tree: parent(i) = hash(i) mod i < i, so src < dst is
    // already the canonical undirected orientation
    val edges = spark.range(1, n).select(
        pmod(xxhash64(lit(3L), col("id")), col("id")).as("src"),
        col("id").as("dst"), lit(1.0).as("weight"))
      .localCheckpoint(true)
    val g = PropertyGraph(edges, directed = false,
      Some(spark.range(n).select(col("id"))))

    val t0 = System.nanoTime()
    val res = graft.viz.MaxentLayout.maxentStress(g, k = 2,
      maxSolvesPerAlpha = 3, finalAlpha = 0.3,
      solveTol = 1e-4, solveMaxCycles = 5, coarsestN = 4096)
    val coords = res.coords.localCheckpoint(true)
    val rows = coords.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val finiteOk = rows == n && coords.filter(
      isnan(col("c0")) || isnan(col("c1")) ||
        col("c0").isNull || col("c1").isNull).count() == 0

    // OctreeSpec plan invariants on the full-size in-loop repulsion call
    // (q = 0 defaults: qSign = 1, q2 = 1, the layout's exactBelow)
    val rep = graft.viz.Octree.repulsion(coords, dim = 2,
      qSign = 1.0, q2 = 1.0, exactBelow = 1024L)
    rep.count()
    val plan = rep.queryExecution.executedPlan.toString
    val planOk = !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop") &&
      !plan.contains("Exchange SinglePartition")

    println(f"""{"probe":"maxent","n":$n,"m":${n - 1},"s_pairs":${res.knownPairs},"solves":${res.solves},"sec":$dt%.1f,"ldme_initial":${res.ldmeInitial}%.4f,"ldme_final":${res.ldmeFinal}%.4f,"improved":${res.ldmeFinal < res.ldmeInitial},"finite_ok":$finiteOk,"plan_ok":$planOk}""")
    spark.stop()
    if (!finiteOk || !planOk) sys.exit(1)
  }
}
