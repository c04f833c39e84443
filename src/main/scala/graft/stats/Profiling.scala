package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.Ranks

/** Distributed port of the reference profiling STATISTICS (reference
  * `networkit/profiling/stat.py:30` — the per-measure location /
  * dispersion / shape battery, and `profiling.py`'s Spearman rank
  * correlation between measures). The HTML/LaTeX report RENDERING
  * remains out of scope; these are the numbers the report is made of.
  *
  * Every statistic is computed by Spark aggregates over the measure
  * column; order statistics (quartiles via the reference's
  * α-quantile rule, the interquartile mean) come from the distributed
  * sort + zipRank, fetching only the O(1) boundary rows — no driver
  * sample materializes, so the battery runs unchanged on a 10⁹-row
  * measure.
  */
object Profiling {

  /** Long-format `(stat, value)` — the reference's non-rank Location /
    * Dispersion / Shape stats. NaN-by-definition entries (harmonic mean
    * with min ≤ 0, shape stats with zero variance) come back as NaN,
    * matching `stat.py`. */
  def measureStats(values: DataFrame, valueCol: String): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val xs = values.select(col(valueCol).cast("double").as("x"))
      .filter(col("x").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val row = xs.agg(
      count(lit(1)).as("n"),
      min("x").as("mn"), max("x").as("mx"),
      avg("x").as("mean"),
      avg(col("x") * col("x")).as("m2"),
      avg(col("x") * col("x") * col("x")).as("m3"),
      avg(when(col("x") =!= 0.0, lit(1.0) / col("x"))).as("invMean"),
      count(when(col("x") <= 0.0, 1)).as("nonPos")).head()
    val n = row.getLong(0)
    require(n > 0, "measureStats needs a non-empty sample")
    val mn = row.getDouble(1); val mx = row.getDouble(2)
    val mean = row.getDouble(3)
    val quadraticMean = math.sqrt(row.getDouble(4))
    val cubicMean = math.cbrt(row.getDouble(5))
    val harmonicMean =
      if (mn > 0) 1.0 / row.getDouble(6) else Double.NaN

    // α-quantile rule (stat.py funcAlphaQuartile): k = ⌊αn⌋; fractional
    // k or k < 1 → sorted[k] (0-based), else avg(sorted[k−1], sorted[k])
    val ranked = Ranks.zipRank(xs, Seq(col("x")), "rnk") // 0-based
    def quartilePositions(alpha: Double): Seq[Long] = {
      val kReal = alpha * n
      val k = math.floor(kReal).toLong
      if (k != kReal || k < 1) Seq(k) else Seq(k - 1, k)
    }
    val alphas = Seq(0.25, 0.5, 0.75)
    val need = alphas.flatMap(quartilePositions).distinct
    val at = ranked.filter(col("rnk").isin(need: _*))
      .collect().map(r => r.getLong(1) -> r.getDouble(0)).toMap
    def quartile(alpha: Double): Double = {
      val ps = quartilePositions(alpha)
      ps.map(at).sum / ps.length
    }
    val q1 = quartile(0.25); val median = quartile(0.5); val q3 = quartile(0.75)

    // interquartile mean (α-trimmed, α = 0.25): mean of 0-based sorted
    // positions [k, n−k−1], k = ⌊n/4⌋
    val kTrim = math.floor(0.25 * n).toLong
    val iqm = ranked.filter(col("rnk") >= kTrim && col("rnk") <= n - kTrim - 1)
      .agg(avg("x")).head.getDouble(0)

    val varUnc = {
      // second pass keeps the uncorrected variance exact for constant
      // columns (the one-pass moment identity can go slightly negative)
      xs.agg(avg((col("x") - mean) * (col("x") - mean))).head.getDouble(0)
    }
    val bessel = if (n > 1) n.toDouble / (n - 1) else Double.NaN
    val variance = varUnc * bessel
    val sd = math.sqrt(variance)
    val sdUnc = math.sqrt(varUnc)
    val cv = if (mean != 0) sd / mean else Double.NaN
    val cvUnc = if (mean != 0) sdUnc / mean else Double.NaN

    // standardized moments (shape), one more pass with μ and CORRECTED
    // sd broadcast as literals, like stat.py funcMomentum
    val (skewM, kurt) =
      if (sd == 0 || sd.isNaN) (Double.NaN, Double.NaN)
      else {
        val z = (col("x") - mean) / sd
        val r = xs.agg(avg(pow(z, 3)), avg(pow(z, 4))).head
        (r.getDouble(0), r.getDouble(1) - 3.0)
      }
    val skewYP = if (sd != 0 && !sd.isNaN) 3 * (mean - median) / sd else Double.NaN

    xs.unpersist(false)
    Seq(
      ("size", n.toDouble),
      ("min", mn), ("max", mx),
      ("arithmetic_mean", mean),
      ("quadratic_mean", quadraticMean),
      ("cubic_mean", cubicMean),
      ("harmonic_mean", harmonicMean),
      ("q1", q1), ("median", median), ("q3", q3),
      ("interquartile_mean", iqm),
      ("iqr", q3 - q1),
      ("sample_range", mx - mn),
      ("mid_range", (mn + mx) / 2),
      ("uncorrected_variance", varUnc),
      ("variance", variance),
      ("standard_deviation", sd),
      ("uncorrected_standard_deviation", sdUnc),
      ("coefficient_of_variation", cv),
      ("uncorrected_coefficient_of_variation", cvUnc),
      ("skewness_yp", skewYP),
      ("skewness_m", skewM),
      ("kurtosis", kurt)
    ).toDF("stat", "value")
  }

  /** Tie-averaged ranks (1-based, the Spearman convention): zipRank the
    * total (value, key) order, then average ranks within equal values. */
  def tieAveragedRanks(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(valueCol).cast("double").as("v"))
    val ranked = Ranks.zipRank(base, Seq(col("v"), col("k")), "r", base = 1L)
    val avgByValue = ranked.groupBy("v").agg(avg(col("r")).as("rank"))
    ranked.join(avgByValue, "v").select(col("k").as(keyCol), col("rank"))
  }

  /** Spearman rank correlation between two per-key measures (reference
    * `profiling.py` correlation matrix entries): tie-averaged ranks,
    * then Pearson on the ranks via the `corr` aggregate. */
  def spearman(a: DataFrame, b: DataFrame, keyCol: String,
      aCol: String, bCol: String): Double = {
    val ra = tieAveragedRanks(a, keyCol, aCol).withColumnRenamed("rank", "ra")
    val rb = tieAveragedRanks(b, keyCol, bCol).withColumnRenamed("rank", "rb")
    ra.join(rb, keyCol).agg(corr(col("ra"), col("rb"))).head.getDouble(0)
  }
}
