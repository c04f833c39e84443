package graft.algebra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphBLAS-style algebra on COO DataFrames `(i LONG, j LONG, v DOUBLE)`
  * (reference: `algebraic/GraphBLAS.hpp:202,225,245` MxM/MxV/eWise,
  * `Semirings.hpp:25-157`, `CSRGeneralMatrix.hpp:38`; SURVEY.md §2.11).
  *
  * A semiring is an (add-aggregate, multiply-column) pair of Catalyst
  * expressions — swapping `sum/×` for `min/+` turns matmul into
  * shortest-path relaxation, exactly as in the reference's template
  * parameterization, but here the plan stays declarative so Catalyst
  * still prunes/pushes/broadcasts.
  */
object Coo {

  /** (addAgg, mult): addAgg folds the "products" column. */
  final case class Semiring(
      add: Column => Column,
      mult: (Column, Column) => Column,
      name: String)

  val arithmetic: Semiring = Semiring(sum, _ * _, "arithmetic") // Σ, ×
  val minPlus: Semiring = Semiring(min, _ + _, "min-plus") // shortest path
  val maxPlus: Semiring = Semiring(max, _ + _, "max-plus") // longest path
  val maxMin: Semiring = Semiring(max, least(_, _), "max-min") // widest path
  val boolOr: Semiring = Semiring( // reachability
    c => max(c), (a, b) => when(a =!= 0.0 && b =!= 0.0, 1.0).otherwise(0.0), "bool")

  /** y = A ⊗ x (reference `GraphBLAS::MxV`): join on the inner index,
    * fold per row — one shuffle keyed j, one keyed i. */
  def mxv(a: DataFrame, x: DataFrame, sr: Semiring = arithmetic): DataFrame =
    a.join(x.select(col("i").as("j"), col("v").as("xv")), "j")
      .groupBy(col("i"))
      .agg(sr.add(sr.mult(col("v"), col("xv"))).as("v"))
      .select(col("i"), col("v"))

  /** C = A ⊗ B (reference `GraphBLAS::MxM`): equi-join A.j = B.i then
    * fold per (i, k). At scale: broadcast the small side, or
    * pre-partition both on the contraction index. */
  def mxm(a: DataFrame, b: DataFrame, sr: Semiring = arithmetic): DataFrame =
    a.select(col("i"), col("j"), col("v").as("av"))
      .join(b.select(col("i").as("j"), col("j").as("k"), col("v").as("bv")), "j")
      .groupBy(col("i"), col("k"))
      .agg(sr.add(sr.mult(col("av"), col("bv"))).as("v"))
      .select(col("i"), col("k").as("j"), col("v"))

  /** Element-wise combine with union semantics (reference
    * `GraphBLAS::eWiseAdd`): missing cells treated as add-identity. */
  def eWiseAdd(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("j"), col("v"))
      .unionAll(b.select(col("i"), col("j"), col("v")))
      .groupBy("i", "j").agg(sum("v").as("v"))

  /** Element-wise multiply with intersection semantics
    * (reference `GraphBLAS::eWiseMult`). */
  def eWiseMult(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("j"), col("v").as("av"))
      .join(b.select(col("i"), col("j"), col("v").as("bv")), Seq("i", "j"))
      .select(col("i"), col("j"), (col("av") * col("bv")).as("v"))

  /** Transpose. */
  def transpose(a: DataFrame): DataFrame =
    a.select(col("j").as("i"), col("i").as("j"), col("v"))

  /** Adjacency matrix of a graph (reference `networkit/algebraic.py:35`). */
  def adjacencyMatrix(g: graft.graph.PropertyGraph): DataFrame =
    g.adjacency.select(col("src").as("i"), col("dst").as("j"),
      col("weight").as("v"))

  /** Graph Laplacian L = D − A (reference `networkit/algebraic.py:82`). */
  def laplacianMatrix(g: graft.graph.PropertyGraph): DataFrame = {
    val a = adjacencyMatrix(g)
    val d = a.groupBy("i").agg(sum("v").as("v"))
      .select(col("i"), col("i").as("j"), col("v"))
    eWiseAdd(d, a.select(col("i"), col("j"), (-col("v")).as("v")))
  }

  /** Conjugate gradient for s.p.d. systems Ax = b (reference
    * `numerics/ConjugateGradient.hpp:25`; LAMG is declared not ported —
    * SURVEY.md §2.11). Vectors are `(i, v)` DataFrames; the driver holds
    * only scalars (dot products), every vector op is distributed. */
  def conjugateGradient(a: DataFrame, b: DataFrame, maxIter: Int = 50,
      tol: Double = 1e-10): DataFrame = {
    def dot(x: DataFrame, y: DataFrame): Double =
      x.select(col("i"), col("v").as("xv"))
        .join(y.select(col("i"), col("v").as("yv")), "i")
        .agg(coalesce(sum(col("xv") * col("yv")), lit(0.0))).head.getDouble(0)
    def axpy(alpha: Double, x: DataFrame, y: DataFrame): DataFrame =
      x.select(col("i"), (col("v") * alpha).as("v"))
        .unionAll(y.select(col("i"), col("v")))
        .groupBy("i").agg(sum("v").as("v"))

    var x = b.select(col("i"), lit(0.0).as("v")).localCheckpoint(true)
    var r = b.localCheckpoint(true)
    var p = r
    var rs = dot(r, r)
    var it = 0
    while (it < maxIter && rs > tol) {
      val ap = mxv(a, p).localCheckpoint(true)
      val alpha = rs / dot(p, ap)
      x = axpy(alpha, p, x).localCheckpoint(true)
      r = axpy(-alpha, ap, r).localCheckpoint(true)
      val rsNew = dot(r, r)
      p = axpy(rsNew / rs, p, r).localCheckpoint(true)
      rs = rsNew
      it += 1
    }
    x
  }
}
