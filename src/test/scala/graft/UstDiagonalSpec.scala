package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Cross-check of the engine's batched-CG Laplacian-diagonal path
  * against the reference's OWN estimator family: Wilson-sampled USTs
  * (reference `ApproxElectricalCloseness.hpp:28`, ESA 2020). */
class UstDiagonalSpec extends SparkSpec {
  import spark.implicits._

  private def exactDiagonal(g: PropertyGraph): Map[Long, Double] = {
    // L x_u = e_u − 1/n for every node u, batched; x_u[u] = L⁺_uu
    val n = g.vertices.count()
    val ids = g.vertices.select("id").collect().map(_.getLong(0)).sorted
    val all = ids.zipWithIndex.map { case (v, k) => (k.toLong, v) }.toSeq
      .toDF("rhs", "tgt")
    val b = g.vertices.join(all)
      .select(col("rhs"), col("id").as("i"),
        (when(col("id") === col("tgt"), 1.0).otherwise(0.0) - lit(1.0 / n)).as("v"))
    val x = Electrical.conjugateGradientBatch(
      graft.algebra.Coo.laplacianMatrix(g), b.localCheckpoint(true), maxIter = 80)
    x.join(all, Seq("rhs")).filter(col("i") === col("tgt"))
      .select(col("tgt"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("UST-sampled diagonal matches the CG diagonal on karate (ε = 0.1)") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val want = exactDiagonal(karate)
    val got = UstDiagonal.diagonal(karate, nSamples = 4000, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    val worst = want.keys.map(id => id -> math.abs(got(id) - want(id)))
      .maxBy(_._2)
    assert(worst._2 < 0.1,
      s"node ${worst._1}: UST ${got(worst._1)} vs CG ${want(worst._1)}")
  }

  test("UST diagonal is exact-in-expectation on a path (closed form)") {
    // P_4 (0-1-2-3): L⁺ diagonal = [ 7, 1, 1, 7 ] / 8 … closed form
    // diag_i = Σ_j (i−j)²/n² summed shifted — here just pin via CG and
    // demand the UST estimate agrees to sampling noise
    val p4 = PropertyGraph.fromEdges(
      Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), directed = false)
    val want = exactDiagonal(p4)
    val got = UstDiagonal.diagonal(p4, nSamples = 1500, seed = 11)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // P_4 has a UNIQUE spanning tree (itself) — the UST estimator is
    // deterministic here, so the agreement must be at solver precision
    want.foreach { case (id, d) =>
      assert(math.abs(got(id) - d) < 1e-6, s"node $id: ${got(id)} vs $d")
    }
  }
}
