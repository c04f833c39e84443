package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Population-raster point generator (reference `RasterReader.hpp:21`,
  * `RasterReader.cpp:19`): reads an ESRI-ASCII-grid-style raster (6
  * header lines — ncols, nrows, then 4 ignored — followed by nrows
  * lines of ncols cell values), multiplies each cell by
  * `normalizationFactor`, rounds, and scatters that many points
  * uniformly inside the cell. The reference's grid geometry is kept
  * exactly: unit cells, x ∈ [col, col+1), y ∈ [1−(row+1), 1−row) (row 0
  * is the TOP band). Deviation: point jitter derives from seeded
  * xxhash64 rather than the reference's global RNG — deterministic and
  * shuffle-free, same uniform-per-cell distribution.
  *
  * Distributed shape: the raster lines parse as a DataFrame, cells
  * explode to `(row, col, k)` and `sequence(1, k)` explodes to points —
  * no driver-side point loop, so a billion-point raster scatters across
  * the cluster.
  */
object Raster {

  /** `(x, y)` point cloud. */
  def read(spark: SparkSession, path: String,
      normalizationFactor: Double, seed: Long = 42): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (l, i) => (i, l) }.toDF("ln", "l")
      .localCheckpoint(true)
    // one job for the whole 6-line header (the reference skips a fixed
    // 14-char key field; accept any "<key> <value>" header line)
    val header = lines.filter(col("ln") < 6).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def headerNum(ln: Long): Double = header(ln).trim.split("\\s+").last.toDouble
    val ncols = headerNum(0).toLong
    val nrows = headerNum(1).toLong
    val cells = lines.filter(col("ln") >= 6 && col("ln") < 6 + nrows)
      .select((col("ln") - 6).as("row"),
        posexplode(split(trim(col("l")), "\\s+")).as(Seq("col", "v")))
      .filter(col("col") < ncols)
      .select(col("row"), col("col"),
        round(col("v").cast("double") * normalizationFactor).cast("long").as("k"))
      .filter(col("k") > 0)
    // uniform jitter u ∈ [0,1) per (cell, i, axis) from the seeded hash
    def u(axis: Int) = (pmod(xxhash64(lit(seed), lit(axis), col("row"),
      col("col"), col("i")), lit(1L << 40))).cast("double") / (1L << 40).toDouble
    cells.select(col("row"), col("col"),
        explode(sequence(lit(1L), col("k"))).as("i"))
      .select(
        (col("col").cast("double") + u(0)).as("x"),
        (lit(1.0) - (col("row") + 1).cast("double") + u(1)).as("y"))
  }
}
