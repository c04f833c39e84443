package graft.viz

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Barnes–Hut repulsion field — the engine's port of the
  * reference's octree-approximated repulsive forces
  * (`include/networkit/viz/Octree.hpp:409-424` acceptance rule
  * `side² ≤ θ²·sqDist(p, com)` with θ = 0.6 from
  * `viz/MaxentStress.cpp:129`, handle at `:474-500`).
  *
  * Structure: the adaptive octree descent is re-expressed as a
  * FIXED-DEPTH multilevel grid with FMM-style interaction lists — the
  * textbook parallel/bulk formulation of Barnes–Hut:
  *
  *  - levels ℓ = 1..L halve the (square) root box; per-level cell
  *    statistics (count, center of mass) are ONE explode + hash
  *    aggregate over the points — no tree pointers, no driver state.
  *  - a cell at level ℓ is in a node's interaction list iff its
  *    Chebyshev index distance is ≥ 3 (well-separated: point-to-com
  *    distance ≥ 2·side, so side/dist ≤ 0.5 < 0.6 — every accepted
  *    cell SATISFIES the reference's θ-criterion) and its parent is
  *    NOT well-separated (index distance ≤ 2 — else the pair was
  *    already handled one level coarser). The two rules make the
  *    accepted cells a PARTITION of all far cells: each far node is
  *    counted exactly once, at the coarsest level that separates it
  *    (`OctreeSpec` asserts Σ accepted counts + near pairs = n−1 for
  *    every node).
  *  - what remains at the finest level (index distance ≤ 2) is summed
  *    directly node-to-node within the 5^dim finest-cell neighborhood.
  *
  * Scale shape: interaction lists bound the per-node fan-out by
  * (11^dim − 5^dim)·L accepted cells + 5^dim near cells — O(log n) per
  * node, the Barnes–Hut bound — realized as cell-keyed hash joins
  * (cells × offset list → cells, then nodes × own cell → lists), never
  * a crossJoin. Depth L targets `leafOccupancy` points per finest
  * cell; heavily clustered layouts can exceed it in dense cells (the
  * capped-depth analog of deep octree leaves) — the near-field join is
  * keyed per cell pair, so skew stays bounded per task.
  */
object Octree {

  /** All integer offset vectors in [−r..r]^dim. */
  private def offsets(dim: Int, r: Int): Seq[Seq[Int]] =
    (0 until dim).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      acc.flatMap(o => (-r to r).map(o :+ _))
    }

  /** Barnes–Hut approximate repulsion field over coordinates
    * `(id, c0..c{dim-1})`: returns `(id, f0..f{dim-1}, cov)` with
    * `f_d = Σ qSign·cnt/max(sqd,1e-3)^q2 · (c_d − com_d)` over the
    * accepted cells plus direct near pairs (contributions with
    * `sqd < 1e-5` are skipped, the reference's guard), and `cov` =
    * total point count covered (= n−1 when no skip triggered — the
    * partition-of-space invariant). */
  def repulsion(coords: DataFrame, dim: Int, qSign: Double, q2: Double,
      maxLevels: Int = 12, leafOccupancy: Double = 4.0,
      exactBelow: Long = 8192): DataFrame = {
    val cs = (0 until dim).map(d => col(s"c$d"))
    val n = coords.count()
    // size dispatch: below the cutoff the EXACT field is one broadcast
    // join + one aggregate — cheaper than building the level tables and
    // strictly more accurate; the interaction lists are the scale path
    // (the same dispatch discipline as MaxFlow.cutClustering)
    if (n <= exactBelow) {
      val other = broadcast(coords.select(col("id").as("id2") +:
        (0 until dim).map(d => col(s"c$d").as(s"m$d")): _*))
      val pairs = coords.crossJoin(other)
        .filter(col("id2") =!= col("id"))
        .withColumn("cnt", lit(1L))
      val sqd0 = (0 until dim).map(d =>
        (col(s"c$d") - col(s"m$d")) * (col(s"c$d") - col(s"m$d"))).reduce(_ + _)
      val sums0 = (0 until dim).map(d => sum(col(s"p$d")).as(s"f$d")) :+
        sum(col("cnt")).as("cov")
      return pairs.withColumn("sqd", sqd0)
        .withColumn("factor",
          when(col("sqd") < 1e-5, lit(0.0)).otherwise(
            lit(qSign) * col("cnt") / pow(greatest(col("sqd"), lit(1e-3)), q2)))
        .select(col("id") +: (col("cnt") +:
          (0 until dim).map(d =>
            (col("factor") * (col(s"c$d") - col(s"m$d"))).as(s"p$d")).toSeq): _*)
        .groupBy("id").agg(sums0.head, sums0.tail: _*)
    }
    val boxAggs = (0 until dim).map(d => min(col(s"c$d")).as(s"lo$d")) ++
      (0 until dim).map(d => max(col(s"c$d")).as(s"hi$d"))
    val box = coords.agg(boxAggs.head, boxAggs.tail: _*).first()
    val los = (0 until dim).map(d => box.getDouble(d))
    val side0 = math.max((0 until dim)
      .map(d => box.getDouble(dim + d) - los(d)).max, 1e-9) * (1.0 + 1e-12)
    val lMax = math.max(2, math.min(maxLevels,
      math.ceil(math.log(math.max(n, 2L).toDouble / leafOccupancy) /
        (dim * math.log(2.0))).toInt))

    // (id, c*, level, g0..g{dim-1}) for every level in one explode
    val levelStructs = array((1 to lMax).map { l =>
      val s = side0 / (1L << l).toDouble
      struct(lit(l).as("level") +: (0 until dim).map { d =>
        least(greatest(floor((col(s"c$d") - los(d)) / s).cast("long"), lit(0L)),
          lit((1L << l) - 1L)).as(s"g$d")
      }: _*)
    }: _*)
    val nodeCells = coords
      .select(col("id") +: cs :+ explode(levelStructs).as("lc"): _*)
      .select((col("id") +: cs) ++ (col("lc.level").as("level") +:
        (0 until dim).map(d => col(s"lc.g$d").as(s"g$d"))): _*)
      .localCheckpoint(true)
    val gCols = (0 until dim).map(d => col(s"g$d"))
    val cellAggs = count(lit(1)).as("cnt") +:
      (0 until dim).map(d => avg(col(s"c$d")).as(s"m$d"))
    val cells = nodeCells
      .groupBy(col("level") +: gCols: _*)
      .agg(cellAggs.head, cellAggs.tail: _*)
      .localCheckpoint(true)

    // ---- far field: cell-level interaction lists, then node join ----
    val farOff = offsets(dim, 5).filter(o => o.map(math.abs).max >= 3)
    val farOffArr = array(farOff.map(o => struct(
      o.zipWithIndex.map { case (v, d) => lit(v).as(s"o$d") }: _*)): _*)
    val srcCells = cells.select(col("level") +: gCols: _*)
    val withTargets = srcCells
      .select(col("level") +: gCols :+ explode(farOffArr).as("o"): _*)
      .select((col("level") +: gCols) ++
        (0 until dim).map(d => (col(s"g$d") + col(s"o.o$d")).as(s"t$d")): _*)
      .filter((0 until dim).map(d =>
        col(s"t$d") >= 0L &&
          col(s"t$d").cast("double") < pow(lit(2.0), col("level"))
      ).reduce(_ && _))
      // parent NOT well-separated — else handled one level coarser
      .filter((0 until dim).map(d =>
        abs(shiftright(col(s"t$d"), 1) - shiftright(col(s"g$d"), 1)) <= 2L
      ).reduce(_ && _))
    val cellPairs = withTargets.join(
      cells.select((col("level") +: (0 until dim).map(d =>
        col(s"g$d").as(s"t$d"))) ++ (col("cnt") +:
        (0 until dim).map(d => col(s"m$d"))): _*),
      Seq("level") ++ (0 until dim).map(d => s"t$d"))
      .select((col("level") +: gCols) ++ (col("cnt") +:
        (0 until dim).map(d => col(s"m$d"))): _*)
    val far = nodeCells
      .join(cellPairs, Seq("level") ++ (0 until dim).map(d => s"g$d"))

    // ---- near field: direct pairs within the finest 5^dim stencil ----
    val nearOff = offsets(dim, 2)
    val nearOffArr = array(nearOff.map(o => struct(
      o.zipWithIndex.map { case (v, d) => lit(v).as(s"o$d") }: _*)): _*)
    val finest = nodeCells.filter(col("level") === lMax)
    val near = finest
      .select(((col("id") +: cs) ++ gCols) :+ explode(nearOffArr).as("o"): _*)
      .select((col("id") +: cs) ++
        (0 until dim).map(d => (col(s"g$d") + col(s"o.o$d")).as(s"t$d")): _*)
      .join(finest.select((0 until dim).map(d => col(s"g$d").as(s"t$d")) ++
        (col("id").as("id2") +:
          (0 until dim).map(d => col(s"c$d").as(s"m$d")).toSeq): _*),
        (0 until dim).map(d => s"t$d"))
      .filter(col("id2") =!= col("id"))
      .withColumn("cnt", lit(1L))

    // ---- shared force expression ----
    def contrib(df: DataFrame): DataFrame = {
      val sqd = (0 until dim).map(d =>
        (col(s"c$d") - col(s"m$d")) * (col(s"c$d") - col(s"m$d"))).reduce(_ + _)
      df.withColumn("sqd", sqd)
        .withColumn("factor",
          when(col("sqd") < 1e-5, lit(0.0)).otherwise(
            lit(qSign) * col("cnt") / pow(greatest(col("sqd"), lit(1e-3)), q2)))
        .select(col("id") +: (col("cnt") +:
          (0 until dim).map(d =>
            (col("factor") * (col(s"c$d") - col(s"m$d"))).as(s"p$d")).toSeq): _*)
    }
    val sums = (0 until dim).map(d => sum(col(s"p$d")).as(s"f$d")) :+
      sum(col("cnt")).as("cov")
    contrib(far).unionAll(contrib(near))
      .groupBy("id").agg(sums.head, sums.tail: _*)
  }
}
