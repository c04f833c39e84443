package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph._
import graft.io.GraphReaders

/** Baseline comparison main (BASELINE.md measurement plan): runs the six
  * kernels the reference baseline times — PageRank(1e-8), connected
  * components, PLM/Louvain, BFS, local clustering coefficient, k-core
  * decomposition — on the reference's own METIS fixture graphs, so the
  * numbers in BASELINE.md compare like for like on the same box.
  *
  * Usage: `runMain graft.BaselineBench <metis.graph> [more.graph…]`;
  * prints one JSON line per graph, mirroring the reference bench binary.
  */
object BaselineBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-baseline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // JVM/codegen warmup

    args.foreach { path =>
      val g0 = GraphReaders.readMetis(spark, path)
      // materialize the graph once so kernel timings exclude the text parse
      val edges = g0.edges.localCheckpoint(true)
      val g = PropertyGraph(edges, directed = false, g0.verticesOpt)
      val n = g.vertices.count()
      val m = edges.count()

      def timeIt(f: => Long): Double = {
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        dt
      }

      val tPr = timeIt(PageRank.run(g, 0.85, 1e-8).count())
      val tCc = timeIt(ConnectedComponents.run(g).count())
      val tPlm = timeIt(Community.louvain(g).count())
      val src = spark.range(1).select(lit(0L).as("source"))
      val tBfs = timeIt(ShortestPaths.bfs(g, src).count())
      val tLcc = timeIt(Triangles.localClusteringCoefficient(g).count())
      val tCore = timeIt(GraphOps.coreDecomposition(g).count())

      println(f"""{"graph":"$path","n":$n,"m":$m,"spark":{"pagerank":$tPr%.4f,"cc":$tCc%.4f,"plm":$tPlm%.4f,"bfs":$tBfs%.4f,"lcc":$tLcc%.4f,"kcore":$tCore%.4f}}""")
    }
    spark.stop()
  }
}
