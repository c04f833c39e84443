package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Deterministic per-query cost profile: Spark JOB / STAGE / TASK counts
  * (and shuffle bytes written) for named queries — box-noise-free
  * evidence of structural plan changes (a removed exchange or fused job
  * shows up exactly, every run). `runMain graft.JobCount <sfDir> <q...>`
  * (no names = Bench headline). Each query runs twice; the SECOND run's
  * counts are reported so one-time setup (DerivedGraphs memo, JIT) is
  * excluded, mirroring a warm steady state. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    val summary = names.map { n =>
      val fn = SparkEntry.queries(n)
      val rows = (1 to 2).map { run =>
        spark.sparkContext.setJobDescription(s"$n run$run")
        // settle listener events from the previous run before zeroing
        Thread.sleep(300)
        jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0)
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the last job's events drain
        spark.catalog.clearCache()
        (c, dt, jobs.get, stages.get, tasks.get, shuffleWrite.get)
      }
      val (c, dt, j, st, tk, sw) = rows.last
      println(f"$n%-16s rows=$c%-8d jobs=$j%-4d stages=$st%-4d tasks=$tk%-6d shufMB=${sw / 1e6}%-8.1f wall=$dt%.2fs")
      f""""$n":{"rows":$c,"jobs":$j,"stages":$st,"tasks":$tk,"shuffle_mb":${sw / 1e6}%.1f}"""
    }
    // machine-readable line for the plans/rNN evidence artifacts
    println(summary.mkString("{\"jobcount\":{", ",", s"""},"sf":"$sfDir"}"""))
    spark.stop()
  }
}
