package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** Laplacian eigenvectors / Fiedler vector / spectral bisection
  * (reference `networkit/algebraic.py:242,296`). */
class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private def barbell(c: Int): PropertyGraph = {
    val k1 = for (i <- 0 until c; j <- i + 1 until c) yield (i.toLong, j.toLong)
    val k2 = k1.map { case (u, v) => (u + c, v + c) }
    PropertyGraph(
      (k1 ++ k2 :+ ((c - 1).toLong, c.toLong)).toDF("src", "dst")
        .withColumn("weight", lit(1.0)),
      directed = false, Some(spark.range(2L * c).select(col("id"))))
  }

  test("spectral bisection: barbell splits exactly at the bridge") {
    val g = barbell(8)
    val sides = Spectral.spectralBisection(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 8L).foreach(i => assert(sides(i) == 0L, s"node $i"))
    (8L until 16L).foreach(i => assert(sides(i) == 1L, s"node $i"))
  }

  test("fiedler vector: unit norm, ⊥ 1, Rayleigh quotient below clique eigenvalue") {
    val g = barbell(6)
    val f = Spectral.fiedlerVector(g).persist()
    val nrm = f.agg(sum(col("value") * col("value"))).head.getDouble(0)
    assert(math.abs(nrm - 1.0) < 1e-6, s"norm² $nrm")
    val mean = f.agg(avg("value")).head.getDouble(0)
    assert(math.abs(mean) < 1e-9, s"mean $mean")
    // fᵀLf = Σ_edges (f_u − f_v)²: the barbell's λ₂ is far below the
    // clique eigenvalue c = 6
    val rq = g.edges
      .join(f.select(col("id").as("src"), col("value").as("fu")), "src")
      .join(f.select(col("id").as("dst"), col("value").as("fv")), "dst")
      .agg(sum(pow(col("fu") - col("fv"), 2))).head.getDouble(0)
    assert(rq > 0 && rq < 1.0, s"Rayleigh quotient $rq")
  }

  test("laplacianEigenvectors: depth 0 constant, depths orthonormal") {
    val g = barbell(5)
    val vecs = Spectral.laplacianEigenvectors(g, k = 3).persist()
    val c0 = vecs.filter(col("depth") === 0).select("value")
      .distinct().collect()
    assert(c0.length == 1 && math.abs(c0(0).getDouble(0) - 1.0 / math.sqrt(10)) < 1e-12)
    // pairwise dot products ≈ identity
    for (a <- 0 to 3; b <- a to 3) {
      val dot = vecs.filter(col("depth") === a)
        .select(col("id"), col("value").as("va"))
        .join(vecs.filter(col("depth") === b)
          .select(col("id"), col("value").as("vb")), "id")
        .agg(sum(col("va") * col("vb"))).head.getDouble(0)
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-5, s"<$a,$b> = $dot")
    }
  }
}
