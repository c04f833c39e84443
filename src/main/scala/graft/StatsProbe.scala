package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: watch checkpoint-stats bit length across an iterative
  * self-join loop (the compounding the clamp rule must stop). */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("extensions=" + spark.conf.get("spark.sql.extensions", "NONE"))
    var df = spark.range(100).select(col("id"), (col("id") % 10).as("k"))
      .localCheckpoint(true)
    for (i <- 1 to 12) {
      val b = df.select(col("k"), col("id").as("id2"))
      df = df.join(b, "k").groupBy("k").agg(count(lit(1)).as("id"))
        .select(col("id"), col("k")).localCheckpoint(true)
      // analyzed = the stored LogicalRDD leaf itself — reads originStats
      // with no optimizer pass, i.e. what downstream plans will inherit
      val stored = df.queryExecution.analyzed.stats
      println(s"iter $i storedBits=${stored.sizeInBytes.bitLength}")
    }
    spark.stop()
  }
}
