package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** SRP-LSH scale probe: measures multi-probe bucket-join candidate-pair
  * VOLUME (Σ_b s_b(s_b−1)/2 over probe-visit bucket occupancies — the
  * quantity that decides whether embeddingNearDup / ANN survive corpus
  * growth) for n independent hash-random unit-scale vectors, with
  * auto-sized `srpBits` vs the bucket count frozen at the smallest
  * scale. Independent vectors, not clones: replicating a fixture 100×
  * manufactures inseparable near-duplicate groups whose pair count is
  * quadratic BY CONSTRUCTION and says nothing about bucket sizing.
  * Occupancy counting is one groupBy per scale (no pair join needs to
  * materialize), so the probe itself scales. Prints one JSON line per
  * scale point.
  *
  * Usage: `runMain graft.SrpScale <sfDir> <n1,n2,...>` — sfDir supplies
  * only the embedding dimensionality.
  */
object SrpScale {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, ns) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = Tables.load(spark, sfDir, "embeddings")
      .select(size(col("embedding"))).head.getInt(0)
    val points = ns.split(",").map(_.trim.toLong)
    val baseBits = Similarity.srpBits(points.min)

    def vecs(n: Long): DataFrame = spark.range(n).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), d ->
              |  cast(cast(pmod(xxhash64(id, d), 1000000) as double)
              |       / 500000.0 - 1.0 as float))""".stripMargin).as("embedding"))

    def pairVolume(df: DataFrame, bits: Int): Long = {
      val b0 = df.join(Similarity.srpBuckets(df, "vec_id", "embedding", bits),
        Seq("vec_id"))
      val probed = b0.withColumn("probe",
          explode(array(lit(0L) +: (0 until bits).map(b => lit(1L << b)): _*)))
        .select(expr("cast(bucket as bigint) ^ probe").as("bucket"))
      probed.groupBy("bucket").agg(count(lit(1)).as("s"))
        .agg(coalesce(sum(expr("(s * (s - 1)) div 2")), lit(0L)))
        .head.getLong(0)
    }

    points.foreach { n =>
      val df = vecs(n).localCheckpoint(true)
      val autoBits = Similarity.srpBits(n)
      val t0 = System.nanoTime()
      val auto = pairVolume(df, autoBits)
      val tAuto = (System.nanoTime() - t0) / 1e9
      val frozen = if (autoBits == baseBits) auto else pairVolume(df, baseBits)
      println(f"""{"n":$n,"auto_bits":$autoBits,"auto_pair_volume":$auto,"auto_sec":$tAuto%.1f,"frozen_bits":$baseBits,"frozen_pair_volume":$frozen}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
