package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run named queries against an sf dir and show results.
  * `runMain graft.Debug <sfDir> <query...>` */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
        else { df.show(20, truncate = false); println(s"rows=${df.count()}") }
      } catch {
        case e: Throwable =>
          println(s"FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}
