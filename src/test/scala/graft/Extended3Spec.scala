package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Round-2 additions: edge-score sheet (multiscale, chance-corrected,
  * geometric-mean, quadrangle), link-prediction tail (adjusted Rand,
  * Katz index, ROC evaluation), powerlaw fit, sfigality, local
  * partition coverage.
  */
class Extended3Spec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*): PropertyGraph =
    PropertyGraph.fromEdges(pairs.toDF("src", "dst"), directed = false)

  // triangle {1,2,3} plus pendant 4 hanging off 3
  private lazy val triPendant = undirected((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))

  test("multiscale score: weighted path graph matches hand computation") {
    val g = PropertyGraph.fromEdges(
      Seq((1L, 2L, 1.0), (2L, 3L, 3.0)).toDF("src", "dst", "weight"),
      directed = false, weight = Some("weight"))
    val got = Sparsification.multiscaleScore(
        g.edges.withColumn("score", col("weight")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(got((1L, 2L)) - 0.25) < 1e-9)
    assert(math.abs(got((2L, 3L)) - 0.75) < 1e-9)
  }

  test("chance-corrected triangle score: triangle edges and pendant edge") {
    val got = Sparsification.chanceCorrectedTriangleScore(triPendant)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(got((1L, 2L)) - 2.0) < 1e-9)   // 1·(4−2)/(1·1)
    assert(math.abs(got((1L, 3L)) - 1.0) < 1e-9)   // 1·2/(1·2)
    assert(math.abs(got((3L, 4L)) - 1.0) < 1e-9)   // pendant
  }

  test("quadrangle score: every edge of a 4-cycle closes one quadrangle") {
    val square = undirected((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val got = Sparsification.quadrangleScore(square)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.values.toSet == Set(1L))
    assert(got.size == 4)
  }

  test("geometric mean of the triangle attribute is symmetric and bounded") {
    val gm = Sparsification.geometricMeanScore(
      Sparsification.triangleScore(triPendant))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(gm((3L, 4L)) == 0.0)                    // zero attribute stays zero
    assert(gm((1L, 2L)) > 0 && gm((1L, 2L)) <= 1.0)
  }

  test("adjusted Rand replicates the reference's set_union quirk") {
    val got = LinkPrediction.adjustedRand(triPendant)
      .filter(col("u") === 1 && col("v") === 4)
      .head.getDouble(2)
    // a=1, un=2, d=2: 2(1·2−4)/(2·1·2+2·1·2+2·4+2·2·2) = −4/24
    assert(math.abs(got - (-1.0 / 6.0)) < 1e-9)
  }

  test("katz index uses frontier-set semantics") {
    val path = undirected((1L, 2L), (2L, 3L))
    val src = Seq(1L).toDF("id")
    val got = LinkPrediction.katzIndex(path, src, maxPathLength = 2,
        dampingValue = 0.5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(math.abs(got(2L) - 0.5) < 1e-12)
    assert(math.abs(got(3L) - 0.25) < 1e-12)
    assert(math.abs(got(1L) - 0.25) < 1e-12)       // bounce-back at l=2
  }

  test("roc evaluation on karate: sane AUC, nonzero split") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val r = LinkPrediction.rocEvaluation(karate, k = 20).head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val auc = r.getDouble(2)
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("powerlaw fit: karate gamma lands in the search interval") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val r = Generators.powerlawFit(karate.degrees).head
    assert(r.getLong(0) == 1 && r.getLong(1) == 17)
    val gamma = r.getDouble(3)
    assert(gamma >= -6.0 && gamma <= -1.0)
  }

  test("sfigality matches hand computation on the triangle+pendant graph") {
    val got = GraphOps.sfigality(triPendant)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.5) < 1e-9)
    assert(got(3L) == 0.0)
    assert(got(4L) == 1.0)
  }

  test("local partition coverage: all-internal node scores 1") {
    val part = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)).toDF("id", "community")
    val got = Community.localPartitionCoverage(triPendant, part)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0)
    assert(got(4L) == 0.0)
    assert(math.abs(got(3L) - 2.0 / 3.0) < 1e-9)
  }
}
