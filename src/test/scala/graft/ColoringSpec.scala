package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** SpectralColoring (reference `networkit/coloring.py:5`) and gini
  * (`networkit/stats.pyx:16`). */
class ColoringSpec extends SparkSpec {

  lazy val karate: PropertyGraph =
    graft.io.GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("spectral coloring: karate gets a VALID coloring (no monochromatic edge)") {
    val coloring = Coloring.spectralColoring(karate).persist()
    assert(coloring.count() == 34)
    val mono = karate.adjacency
      .join(coloring.select(col("id").as("src"), col("color").as("cs")), "src")
      .join(coloring.select(col("id").as("dst"), col("color").as("cd")), "dst")
      .filter(col("cs") === col("cd")).count()
    assert(mono == 0, s"$mono monochromatic edges")
    val nColors = coloring.select("color").distinct().count()
    // colors are densified 0..C−1 and non-trivial (karate isn't bipartite
    // so ≥ 3; the sign-split tree shouldn't explode either)
    assert(nColors >= 3 && nColors <= 20, s"$nColors colors")
    assert(coloring.agg(max("color")).head.getLong(0) == nColors - 1)
    // deterministic across runs
    val again = Coloring.spectralColoring(karate)
    assert(coloring.except(again).isEmpty && again.except(coloring).isEmpty)
  }

  test("spectral coloring: a triangle needs exactly 3 colors; K2 exactly 2") {
    import spark.implicits._
    val tri = PropertyGraph(
      Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
        .withColumn("weight", lit(1.0)),
      directed = false, Some(spark.range(3).select(col("id"))))
    val c3 = Coloring.spectralColoring(tri)
    assert(c3.select("color").distinct().count() == 3)
    val k2 = PropertyGraph(
      Seq((0L, 1L)).toDF("src", "dst").withColumn("weight", lit(1.0)),
      directed = false, Some(spark.range(2).select(col("id"))))
    assert(Coloring.spectralColoring(k2).select("color").distinct().count() == 2)
  }

  test("smallest adjacency eigenvector: K2's is the (+,-)/sqrt(2) split") {
    import spark.implicits._
    val k2 = PropertyGraph(
      Seq((0L, 1L)).toDF("src", "dst").withColumn("weight", lit(1.0)),
      directed = false, Some(spark.range(2).select(col("id"))))
    val v = Coloring.smallestAdjacencyEigenvectors(k2, 1, iters = 60)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // eigenvalue −1 eigenvector (1,−1)/√2, sign fixed so id 0 positive
    assert(math.abs(v(0L) - 1.0 / math.sqrt(2)) < 1e-6)
    assert(math.abs(v(1L) + 1.0 / math.sqrt(2)) < 1e-6)
  }

  test("gini: hand examples match the reference formula") {
    import spark.implicits._
    // reference trace on [1,3]: area=3, fair=4 → 0.25
    val g1 = Coloring.gini(Seq(1.0, 3.0).toDF("x"), "x").head
    assert(math.abs(g1.getDouble(2) - 0.25) < 1e-12)
    assert(g1.getDouble(0) == 2.0 && g1.getDouble(1) == 8.0)
    // equal values → 0
    val g2 = Coloring.gini(Seq(5.0, 5.0, 5.0, 5.0).toDF("x"), "x").head
    assert(math.abs(g2.getDouble(2)) < 1e-12)
    // [0,0,0,1]: cum=0,0,0,1; area=0.5; fair=2 → 0.75 = (n−1)/n
    val g3 = Coloring.gini(Seq(0.0, 0.0, 0.0, 1.0).toDF("x"), "x").head
    assert(math.abs(g3.getDouble(2) - 0.75) < 1e-12)
  }
}
