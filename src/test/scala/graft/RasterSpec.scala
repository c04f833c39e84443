package graft

import org.apache.spark.sql.functions._

/** Population-raster point generator (no raster fixture ships with the
  * reference — gated on a hand-written grid with exact counts). */
class RasterSpec extends SparkSpec {

  private def writeGrid(): String = {
    val p = java.nio.file.Files.createTempFile("graft_raster", ".asc")
    // 3 cols × 2 rows; row 0 is the top band
    java.nio.file.Files.writeString(p,
      """ncols         3
        |nrows         2
        |xllcorner     0.0
        |yllcorner     0.0
        |cellsize      1.0
        |NODATA_value  -9999
        |2 0 1
        |0 3 0
        |""".stripMargin)
    p.toString
  }

  test("raster: exact per-cell point counts, points inside their cells") {
    val path = writeGrid()
    val pts = Raster.read(spark, path, normalizationFactor = 1.0, seed = 5)
      .localCheckpoint(true)
    assert(pts.count() == 6) // 2 + 1 + 3
    // cell (row 0, col 0): x ∈ [0,1), y ∈ [0,1) → 2 points
    def inCell(row: Int, c: Int) = pts.filter(
      col("x") >= c && col("x") < c + 1 &&
        col("y") >= 1.0 - (row + 1) && col("y") < 1.0 - row).count()
    assert(inCell(0, 0) == 2)
    assert(inCell(0, 2) == 1)
    assert(inCell(1, 1) == 3)
    // normalization scales counts through round()
    assert(Raster.read(spark, path, 2.0, seed = 5).count() == 12)
    assert(Raster.read(spark, path, 0.4, seed = 5).count() == 2) // 1+0+1
    // deterministic per seed, seed-sensitive
    val a = Raster.read(spark, path, 1.0, seed = 5)
    val b = Raster.read(spark, path, 1.0, seed = 5)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val c2 = Raster.read(spark, path, 1.0, seed = 6)
    assert(a.except(c2).count() > 0)
  }

  private val Raster = graft.io.Raster
}
