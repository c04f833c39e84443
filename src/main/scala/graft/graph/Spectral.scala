package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laplacian spectral tools (reference `networkit/algebraic.py:242`
  * `laplacianEigenvectors` / `:296` `laplacianEigenvector`): the
  * smallest Laplacian eigenvectors via the same blocked subspace
  * iteration as [[Coloring.smallestAdjacencyEigenvectors]], with the
  * known constant eigenvector (λ₁ = 0) deflated analytically rather
  * than wasting a subspace column on it. Depth 0 of the returned block
  * is therefore the FIEDLER vector (λ₂), the classic spectral-bisection
  * direction.
  */
object Spectral {

  /** The constant eigenvector plus the `k` next-smallest Laplacian
    * eigenvectors, long format `(depth, id, value)` — depth 0 is the
    * (exact) constant 1/√n like the reference's ascending order, depth
    * 1 the Fiedler vector. */
  def laplacianEigenvectors(g: PropertyGraph, k: Int,
      iters: Int = 60, seed: Long = 42): DataFrame = {
    val n = g.vertices.count()
    val lap = graft.algebra.Coo.laplacianMatrix(g)
    val rest = Coloring.smallestEigenvectors(lap, g.vertices.select("id"),
      k, iters, seed, projectOutConstant = true)
      .select((col("depth") + 1).as("depth"), col("id"), col("value"))
    g.vertices.select(lit(0).as("depth"), col("id"),
        lit(1.0 / math.sqrt(n.toDouble)).as("value"))
      .unionAll(rest)
  }

  /** The Fiedler vector `(id, value)` — λ₂'s eigenvector, sign fixed by
    * the kernel so the smallest id with a non-negligible component is
    * positive. */
  def fiedlerVector(g: PropertyGraph, iters: Int = 60,
      seed: Long = 42): DataFrame =
    laplacianEigenvectors(g, k = 2, iters, seed)
      .filter(col("depth") === 1).select("id", "value")

  /** Spectral bisection: split on the Fiedler vector's sign — the
    * minimal-ish balanced cut direction. `(id, side)` with side 0/1,
    * normalized so the smallest node id sits on side 0. */
  def spectralBisection(g: PropertyGraph, iters: Int = 60,
      seed: Long = 42): DataFrame = {
    val f = fiedlerVector(g, iters, seed)
    val sides = f.select(col("id"),
      when(col("value") >= 0, 0L).otherwise(1L).as("s"))
    val side0 = sides.orderBy("id").limit(1).head.getLong(1)
    sides.select(col("id"),
      (if (side0 == 0L) col("s") else lit(1L) - col("s")).as("side"))
  }
}
