package graft

import graft.stats.Profiling

/** Distributed port of the reference profiling stat battery
  * (networkit/profiling/stat.py) — hand-computed gates. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("measureStats: 1..10 matches the reference formulas by hand") {
    val df = (1 to 10).map(_.toDouble).toDF("x")
    val got = Profiling.measureStats(df, "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def ≈(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(got("size") == 10.0)
    assert(got("min") == 1.0 && got("max") == 10.0)
    assert(≈(got("arithmetic_mean"), 5.5))
    assert(≈(got("quadratic_mean"), math.sqrt(38.5)))
    assert(≈(got("cubic_mean"), math.cbrt(302.5)))
    assert(≈(got("harmonic_mean"), 10.0 / (1 to 10).map(1.0 / _).sum))
    // α-quartile rule: q1 = sorted[2] = 3 (fractional k), median =
    // avg(sorted[4], sorted[5]) = 5.5, q3 = sorted[7] = 8
    assert(got("q1") == 3.0 && got("median") == 5.5 && got("q3") == 8.0)
    assert(≈(got("interquartile_mean"), (3 + 4 + 5 + 6 + 7 + 8) / 6.0))
    assert(got("iqr") == 5.0 && got("sample_range") == 9.0 && got("mid_range") == 5.5)
    assert(≈(got("uncorrected_variance"), 8.25))
    assert(≈(got("variance"), 8.25 * 10 / 9))
    val sd = math.sqrt(8.25 * 10 / 9)
    assert(≈(got("standard_deviation"), sd))
    assert(≈(got("coefficient_of_variation"), sd / 5.5))
    assert(≈(got("skewness_yp"), 0.0)) // symmetric: mean == median
    assert(≈(got("skewness_m"), 0.0))
    val kurt = (1 to 10).map(x => math.pow((x - 5.5) / sd, 4)).sum / 10 - 3
    assert(≈(got("kurtosis"), kurt))
  }

  test("measureStats: constant column has zero spread, NaN shape") {
    val got = Profiling.measureStats(Seq(4.0, 4.0, 4.0).toDF("x"), "x")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("variance") == 0.0 && got("iqr") == 0.0)
    assert(got("skewness_m").isNaN && got("kurtosis").isNaN)
  }

  test("spearman: monotone = 1, reversed = -1, ties averaged") {
    val a = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    val up = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("id", "w")
    val down = Seq((1L, 40.0), (2L, 30.0), (3L, 20.0), (4L, 10.0)).toDF("id", "w")
    assert(math.abs(Profiling.spearman(a, up, "id", "v", "w") - 1.0) < 1e-9)
    assert(math.abs(Profiling.spearman(a, down, "id", "v", "w") + 1.0) < 1e-9)
    // ties: b = (1,1,2,2) against v = 1..4 — hand Pearson on tie-averaged
    // ranks (1.5, 1.5, 3.5, 3.5) vs (1,2,3,4) = 2/sqrt(5)
    val tied = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0)).toDF("id", "w")
    assert(math.abs(
      Profiling.spearman(a, tied, "id", "v", "w") - 2.0 / math.sqrt(5)) < 1e-9)
  }
}
