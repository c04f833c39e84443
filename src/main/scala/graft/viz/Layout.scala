package graft.viz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, ShortestPaths}

/** Graph layout (the reference's viz family). PivotMDS here; the
  * stress-majorization layout lives in [[MaxentLayout]].
  *
  * PivotMDS (Brandes & Pich, "Eigensolver methods for progressive
  * multidimensional scaling of large data", 2007; reference
  * `viz/PivotMDS.cpp:21-109`): distances from k pivots to every node,
  * double-center the n×k distance matrix, take the top `dim`
  * eigenvectors of the k×k Gram matrix CᵀC, and read coordinates off
  * C·v. Mirrors the reference implementation's quirk of centering the
  * RAW distances (`PivotMDS.cpp:53-71` — the comment there says
  * "squared" but the code never squares; we match the code).
  *
  * Scale design: the n×k distance table comes from the engine's
  * multi-source BFS/Dijkstra (k frontier waves ride one keyed
  * fixpoint); the centering terms are two aggregations; the k×k Gram
  * matrix is one partial-aggregated self-join (map-side combine leaves
  * k² rows per partition, so the shuffle is O(k²·partitions), never
  * O(n)); only the k×k eigenproblem (k ~ tens) runs on the driver —
  * the same constant-size-driver-object bound as Multigrid's coarse
  * solve. Coordinates are one broadcast join of the k×dim eigenbasis.
  */
object Layout {

  /** Coordinates + the eigenvalues that produced them. */
  final case class PivotMdsResult(coords: DataFrame, eigenvalues: Seq[Double])

  /** PivotMDS layout. Returns `(id, p0, …, p{dim-1})` for every vertex
    * (vertices unreachable from every pivot sit at the origin, like the
    * reference's default-initialized coordinates). `pivots` defaults to
    * the k lowest vertex ids — a deterministic, oracle-re-derivable
    * choice standing in for the reference's `randomNodes` sampling.
    * `weighted = true` uses Dijkstra (the reference always does);
    * `false` uses hop-count BFS. */
  def pivotMds(g: PropertyGraph, dim: Int = 2, numPivots: Int = 24,
      pivots: Option[Seq[Long]] = None, weighted: Boolean = false): DataFrame =
    pivotMdsWithInfo(g, dim, numPivots, pivots, weighted).coords

  def pivotMdsWithInfo(g: PropertyGraph, dim: Int = 2, numPivots: Int = 24,
      pivots: Option[Seq[Long]] = None,
      weighted: Boolean = false): PivotMdsResult = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val pivotIds: Seq[Long] = pivots.getOrElse(
      g.vertices.select(col("id").cast("long")).orderBy("id")
        .limit(numPivots).as[Long].collect().toSeq)
    val k = pivotIds.size
    require(k > 0, "PivotMDS needs at least one pivot")
    val n = g.vertices.count()
    val srcs = pivotIds.toDF("source")
    val distAll = (if (weighted) ShortestPaths.dijkstra(g, srcs)
                   else ShortestPaths.bfs(g, srcs))
      .select(col("source"), col("id"), col("dist").cast("double").as("dist"))
    val jIdx = broadcast(pivotIds.zipWithIndex
      .map { case (p, j) => (p, j.toLong) }.toDF("source", "j"))
    val d = distAll.join(jIdx, "source").select(col("id"), col("j"), col("dist"))
      .localCheckpoint(true)
    // All float sums below run as exact DECIMAL(38,18) aggregation: a
    // plain double `sum` merges partials in task-completion order, so
    // two runs of the same layout differ in the last bits and the
    // downstream power method amplifies that into visibly different
    // coordinates (LayoutSpec "deterministic across runs" was flaky).
    // Each term is rounded deterministically per row (at 1e-18, far
    // below double noise); decimal addition is integer-exact and thus
    // order-independent.
    def dsum(e: org.apache.spark.sql.Column) =
      sum(e.cast("decimal(38,18)")).cast("double")
    // double centering (reference divisors: rowMean/k, colMean/n,
    // grandMean = Σrow/(2n) + Σcol/(2k)); absent (unreachable) entries
    // are implicit zeros exactly as in the reference's sparse CSR
    val rowMean = d.groupBy("id").agg((dsum(col("dist")) / k).as("rm"))
    val colMean = d.groupBy("j").agg((dsum(col("dist")) / n).as("cm"))
    val grand = rowMean.agg(dsum(col("rm") / (2.0 * n))).first().getDouble(0) +
      colMean.agg(dsum(col("cm") / (2.0 * k))).first().getDouble(0)
    val b = d.join(rowMean, "id").join(colMean, "j")
      .select(col("id"), col("j"),
        (col("dist") - col("rm") - col("cm") + grand).as("v"))
      .localCheckpoint(true)
    // Gram matrix CᵀC: k×k via partial-aggregated self-join
    val gram = b.select(col("id"), col("j").as("j1"), col("v").as("v1"))
      .join(b.select(col("id"), col("j").as("j2"), col("v").as("v2")), "id")
      .groupBy("j1", "j2").agg(dsum(col("v1") * col("v2")).as("g"))
      .collect()
    val cc = Array.ofDim[Double](k, k)
    gram.foreach(r => cc(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getDouble(2))
    // driver-side power method with deflation (reference powerMethod,
    // `PivotMDS.cpp:111-128`), deterministically seeded LCG init in
    // place of the reference's Aux::Random
    val eigVecs = Array.ofDim[Double](dim, k)
    val eigVals = Array.ofDim[Double](dim)
    var lcg = 0x2545F4914F6CDD1DL
    def nextUnit(): Double = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      2.0 * (((lcg >>> 11).toDouble / (1L << 53).toDouble)) - 1.0
    }
    def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] = {
      val y = new Array[Double](k)
      var i = 0
      while (i < k) {
        var s = 0.0; var j = 0
        while (j < k) { s += m(i)(j) * x(j); j += 1 }
        y(i) = s; i += 1
      }
      y
    }
    def norm(x: Array[Double]): Double = math.sqrt(x.map(e => e * e).sum)
    for (dIdx <- 0 until dim) {
      var v = Array.fill(k)(nextUnit())
      var it = 0
      var delta = Double.MaxValue
      while (delta > 1e-6 && it < 1500) {
        val old = v
        val mv = matVec(cc, old)
        val nn = math.max(norm(mv), 1e-300)
        v = mv.map(_ / nn)
        delta = norm(v.zip(old).map { case (a, bb) => a - bb })
        it += 1
      }
      val mv = matVec(cc, v)
      val lam = v.zip(mv).map { case (a, bb) => a * bb }.sum /
        math.max(v.map(e => e * e).sum, 1e-300)
      eigVecs(dIdx) = v; eigVals(dIdx) = lam
      // deflate: CC -= λ/||v||² · v vᵀ
      val f = lam / math.max(v.map(e => e * e).sum, 1e-300)
      for (i <- 0 until k; j <- 0 until k) cc(i)(j) -= f * v(i) * v(j)
    }
    // coordinates = C · v_d — one broadcast join of the k×dim basis
    val basis = broadcast((0 until k).map { j =>
      (j.toLong, (0 until dim).map(dd => eigVecs(dd)(j)))
    }.toDF("j", "cs"))
    val aggCols = (0 until dim).map(dd =>
      dsum(col("v") * col("cs")(dd)).as(s"p$dd"))
    val coords = b.join(basis, "j").groupBy("id")
      .agg(aggCols.head, aggCols.tail: _*)
    val outCols = (0 until dim).map(dd =>
      coalesce(col(s"p$dd"), lit(0.0)).as(s"p$dd"))
    val full = g.vertices.select(col("id")).join(coords, Seq("id"), "left")
      .select(col("id") +: outCols: _*)
    PivotMdsResult(full, eigVals.toSeq)
  }
}
