package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph._

/** Scale-point benchmark (BASELINE.md §flat-cost claim): runs the
  * baseline kernels on GENERATED RMAT graphs orders of magnitude larger
  * than the reference's METIS fixtures, and reports per-iteration edge
  * throughput. The reference fixtures top out at 242k edges, where
  * Spark's per-stage scheduling floor dominates; this main produces the
  * measurement that shows wall-clock growing sub-linearly in edges
  * (constant stage cost amortizing) — the data behind the
  * design-for-100TB argument.
  *
  * Usage: `runMain graft.ScaleBench [scale] [edgeFactor]` — RMAT with
  * 2^scale nodes and 2^scale · edgeFactor directed edge draws
  * (default scale=21, edgeFactor=16 → ~33M draws). Prints one JSON
  * line with kernel seconds and edges-per-second-per-iteration.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val scale = if (args.length > 0) args(0).toInt else 21
    val edgeFactor = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_DRIVER_MEM", "48g"))
      // iterative kernels emit thousands of stages; shuffle files are only
      // reclaimed when the ContextCleaner GCs dead RDDs, and the default
      // periodicGC.interval (30min) lets ~80 GB of dead shuffle/checkpoint
      // blocks pile up mid-run on one box — collect aggressively instead
      .config("spark.cleaner.periodicGC.interval", "45s")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // iterative kernels re-shuffle a same-sized frame every round, so
    // planning width 8× the cores (the suite default, right for one-shot
    // wide explosions like the sf10 pair build) only multiplies the
    // per-stage scheduling floor here — measured at RMAT-21: CC 85 s at
    // 256 vs 28 s at 32. Pin kernel sessions to the core count
    // (overridable for A/B via SPARK_GRAFT_INIT_PARTITIONS).
    builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", cpus))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // warmup

    val g0 = Generators.rmat(spark, scale, edgeFactor, seed = 7)
    val edges = g0.edges.filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(lit(1.0).as("weight"))
      .localCheckpoint(true)
    val g = PropertyGraph(edges, directed = false, None)
    val n = g.vertices.count()
    val m = edges.count()

    // optional comma-separated kernel filter for local iteration
    // (e.g. SPARK_GRAFT_KERNELS=kcore); default runs all
    val kernels = sys.env.get("SPARK_GRAFT_KERNELS").map(_.split(",").toSet)
    def timeIt(name: String)(f: => Long): Double = {
      if (!kernels.forall(_.contains(name))) return -1.0
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      System.err.println(f"[scalebench] $name ${dt}%.1fs") // survive partial runs
      dt
    }

    val prIters = 10
    val tPr = timeIt("pagerank10")(PageRank.run(g, 0.85, tol = 0.0, maxIter = prIters).count())
    val tCc = timeIt("cc")(ConnectedComponents.run(g).count())
    val src = spark.range(1).select(lit(0L).as("source"))
    val tBfs = timeIt("bfs")(ShortestPaths.bfs(g, src).count())
    val tDeg = timeIt("degree")(g.degrees.count())
    val tCore = timeIt("kcore")(GraphOps.coreDecomposition(g).count())
    // exact triangle counting materializes the wedge set — ~m^1.5 shuffle
    // rows, ~10^10 on a scale-21 skewed RMAT (hundreds of GB of shuffle):
    // disk-infeasible on one box, and a non-iterative kernel besides, so
    // it is opt-in here (arg 3 = "tri"); at cluster scale the same plan
    // spreads across executors' disks
    val tTri = if (args.length > 2 && args(2) == "tri")
      timeIt("triangles") { Triangles.triangleCount(g).count(); 1L }
    else -1.0

    // blocked subspace iteration (Fiedler block, k = 4): one distributed
    // MxV + one k²-entry Gram aggregate per round — O(1) Spark jobs per
    // round regardless of k, driver work k×k only. Opt-in via
    // SPARK_GRAFT_KERNELS=spectral (fixed 60-round iteration, not part
    // of the default kernel confirmation set)
    val tSpec = if (kernels.exists(_.contains("spectral")))
      timeIt("spectral")(Spectral.laplacianEigenvectors(g, k = 4).count())
    else -1.0

    // per-iteration edge throughput: symmetric edge traversals per second
    // (−1 when pagerank was filtered out of this invocation)
    val prEps = if (tPr > 0) 2.0 * m * prIters / tPr else -1.0
    println(f"""{"bench":"scale","scale":$scale,"edge_factor":$edgeFactor,"n":$n,"m":$m,"spark":{"pagerank10":$tPr%.3f,"cc":$tCc%.3f,"bfs":$tBfs%.3f,"degree":$tDeg%.3f,"kcore":$tCore%.3f,"triangles":$tTri%.3f,"spectral":$tSpec%.3f},"pagerank_edge_ops_per_sec":$prEps%.0f}""")
    spark.stop()
  }
}
