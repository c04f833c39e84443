package graft

import org.apache.spark.sql.functions._
import graft.algebra.{Coo, GaussSeidel, Multigrid}

/** Gauss–Seidel relaxation (reference
  * `numerics/GaussSeidelRelaxation.hpp:22`): multi-color sweeps must
  * (1) be EXACT Gauss–Seidel in color order — each update sees the
  * latest values of previously-swept classes, not the previous
  * iterate (that would be Jacobi); (2) converge to the direct
  * solution; (3) smooth at least as fast as damped Jacobi; and the
  * coloring must be proper. */
class GaussSeidelSpec extends SparkSpec {
  import spark.implicits._

  // SDD test system: weighted-path Laplacian + 4I on n nodes, weights
  // w(i,i+1) = 1 + (i % 3). The 4I shift keeps the GS contraction
  // factor ≈ 0.36/sweep so convergence tests finish in ~25 sweeps.
  private def pathSystem(n: Int): org.apache.spark.sql.DataFrame = {
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong, 1.0 + (i % 3)))
    val e = edges.toDF("i", "j", "w")
    e.select(col("i"), col("j"), (-col("w")).as("v"))
      .unionAll(e.select(col("j").as("i"), col("i").as("j"), (-col("w")).as("v")))
      .unionAll(e.select(col("i"), col("i").as("j"), col("w").as("v")))
      .unionAll(e.select(col("j").as("i"), col("j").as("j"), col("w").as("v")))
      .groupBy("i", "j").agg(sum("v").as("v"))
      .unionAll((0 until n).map(i => (i.toLong, i.toLong, 4.0)).toDF("i", "j", "v"))
      .groupBy("i", "j").agg(sum("v").as("v"))
  }

  private def denseSolve(n: Int, a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val m = Array.tabulate(n)(i => a(i) :+ b(i))
    for (c <- 0 until n) {
      var piv = c
      for (r <- c + 1 until n) if (math.abs(m(r)(c)) > math.abs(m(piv)(c))) piv = r
      val t = m(c); m(c) = m(piv); m(piv) = t
      val d = m(c)(c)
      for (k <- c to n) m(c)(k) /= d
      for (r <- 0 until n if r != c) {
        val f = m(r)(c)
        if (f != 0.0) for (k <- c to n) m(r)(k) -= f * m(c)(k)
      }
    }
    Array.tabulate(n)(i => m(i)(n))
  }

  private def toDense(n: Int, aDf: org.apache.spark.sql.DataFrame): Array[Array[Double]] = {
    val a = Array.ofDim[Double](n, n)
    aDf.select("i", "j", "v").as[(Long, Long, Double)].collect()
      .foreach { case (i, j, v) => a(i.toInt)(j.toInt) += v }
    a
  }

  test("colorMatrix yields a proper coloring") {
    val a = pathSystem(40)
    val cols = GaussSeidel.colorMatrix(a)
    val off = a.filter(col("i") =!= col("j")).select("i", "j")
    val conflicts = off
      .join(cols.withColumnRenamed("i", "ii").withColumnRenamed("color", "ci"),
        col("i") === col("ii"))
      .join(cols.withColumnRenamed("i", "jj").withColumnRenamed("color", "cj"),
        col("j") === col("jj"))
      .filter(col("ci") === col("cj")).count()
    assert(conflicts === 0)
    assert(cols.count() === 40)
  }

  test("one sweep is sequential Gauss-Seidel in color order (not Jacobi)") {
    val n = 6
    val a = pathSystem(n)
    val bArr = Array(5.0, 0.0, 1.0, 0.0, 0.0, 3.0)
    val b = bArr.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) }
      .toSeq.toDF("rhs", "i", "v")
    // fixed red-black coloring: pos % 2 — proper on a path
    val colors = (0 until n).map(i => (i.toLong, i % 2)).toDF("i", "color")
    val x1 = GaussSeidel.relax(a, b, maxIterations = 1, tolerance = 0,
        colors = Some(colors))
      .select("i", "v").as[(Long, Double)].collect().toMap
    // replay sequentially on the driver: color 0 rows in id order, then
    // color 1 rows — using the LATEST values
    val dense = toDense(n, a)
    val x = Array.fill(n)(0.0)
    for (c <- 0 to 1; i <- 0 until n if i % 2 == c) {
      var sigma = 0.0
      for (j <- 0 until n if j != i) sigma += dense(i)(j) * x(j)
      x(i) = (bArr(i) - sigma) / dense(i)(i)
    }
    for (i <- 0 until n)
      assert(math.abs(x1(i.toLong) - x(i)) < 1e-12, s"node $i")
    // and it must DIFFER from one Jacobi sweep (x_j all zero => x_i = b_i/d_i)
    val jac = Array.tabulate(n)(i => bArr(i) / dense(i)(i))
    assert((0 until n).exists(i => math.abs(x1(i.toLong) - jac(i)) > 1e-9))
  }

  test("relax converges to the direct solution; residual stop honored") {
    val n = 8
    val a = pathSystem(n)
    // TWO batched rhs — a batch must equal two independent solves
    // (guards against per-rhs duplication in the sigma join)
    val b0 = Array.tabulate(n)(i => if (i == 0) 4.0 else if (i == n - 1) -2.0 else 0.5)
    val b1 = Array.tabulate(n)(i => if (i == 3) 7.0 else 0.0)
    val b = (b0.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) } ++
      b1.zipWithIndex.filter(_._1 != 0.0).map { case (v, i) => (1L, i.toLong, v) })
      .toSeq.toDF("rhs", "i", "v")
    val xs = GaussSeidel.relax(a, b, maxIterations = 150, tolerance = 1e-11)
      .select("rhs", "i", "v").as[(Long, Long, Double)].collect()
      .map { case (r, i, v) => (r, i) -> v }.toMap
    val dense = toDense(n, a)
    val exact0 = denseSolve(n, dense, b0)
    val exact1 = denseSolve(n, dense, b1)
    for (i <- 0 until n) {
      assert(math.abs(xs((0L, i.toLong)) - exact0(i)) < 1e-8, s"rhs0 node $i")
      assert(math.abs(xs((1L, i.toLong)) - exact1(i)) < 1e-8, s"rhs1 node $i")
    }
  }

  test("one GS sweep smooths at least as well as one damped-Jacobi sweep") {
    val n = 20
    val a = pathSystem(n)
    val bArr = Array.tabulate(n)(i => math.sin(i * 1.7) * 3.0)
    val b = bArr.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) }
      .toSeq.toDF("rhs", "i", "v")
    def resNorm(x: Map[Long, Double]): Double = {
      val dense = toDense(n, a)
      math.sqrt((0 until n).map { i =>
        val r = bArr(i) - (0 until n).map(j => dense(i)(j) * x.getOrElse(j.toLong, 0.0)).sum
        r * r
      }.sum)
    }
    val gs1 = GaussSeidel.relax(a, b, maxIterations = 1, tolerance = 0)
      .select("i", "v").as[(Long, Double)].collect().toMap
    // one damped-Jacobi sweep from zero: x_i = (2/3) b_i / d_i
    val dense = toDense(n, a)
    val jac1 = (0 until n).map(i => i.toLong -> (2.0 / 3.0) * bArr(i) / dense(i)(i)).toMap
    assert(resNorm(gs1) <= resNorm(jac1) + 1e-12)
  }

  test("multigrid with gauss-seidel smoother solves the ring Laplacian") {
    val n = 64L
    val ring = (0L until n).map(i => (i, (i + 1) % n, 1.0)).toDF("i", "j", "w")
    val lap = ring.select(col("i"), col("j"), (-col("w")).as("v"))
      .unionAll(ring.select(col("j").as("i"), col("i").as("j"), (-col("w")).as("v")))
      .unionAll(ring.select(col("i"), col("i").as("j"), col("w").as("v")))
      .unionAll(ring.select(col("j").as("i"), col("j").as("j"), col("w").as("v")))
      .groupBy("i", "j").agg(sum("v").as("v"))
    val b = Seq((0L, 0L, 1.0), (0L, n / 2, -1.0)).toDF("rhs", "i", "v")
    val levels = Multigrid.setup(lap, coarsestN = 24, smoother = "gauss-seidel")
    assert(levels.head.gsColors.nonEmpty)
    val x = Multigrid.solvePrepared(levels, b, tol = 1e-9)
      .filter(col("i").isin(0L, n / 2))
      .select("i", "v").as[(Long, Double)].collect().toMap
    // two-terminal effective resistance of a unit ring split n/2 : n/2
    val rExpected = (n / 2.0) * (n / 2.0) / n
    val rGot = x(0L) - x(n / 2)
    assert(math.abs(rGot - rExpected) < 1e-6 * rExpected)
  }
}
