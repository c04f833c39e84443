package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Generators.u01

/** Geometric generators (reference `generators/PubWebGenerator.hpp:42`,
  * `MocnikGenerator.hpp:18`): random points in the unit square/torus,
  * edges between points within a threshold radius.
  *
  * The scale path is a grid-bucketed spatial join: cell side = radius,
  * so every candidate neighbor lives in the 3×3 surrounding cells and
  * the join is keyed by cell id — never all-pairs. The reference's
  * quadtree plays the same pruning role single-node; a hash-partitioned
  * grid is the distributed equivalent (cells shard evenly because the
  * point process is near-uniform at cell granularity).
  */
object GeometricGenerators {

  /** Threshold graph over `(id, x, y)` points: undirected edges between
    * pairs at distance ≤ r (torus wrap optional), each node keeping at
    * most `cap` nearest neighbors when set (PubWeb's maxNeigh — applied
    * symmetrically rather than by the reference's sequential insertion
    * order; documented deviation, same degree bound). */
  def thresholdGraph(pts: DataFrame, r: Double, torus: Boolean,
      cap: Option[Int], seed: Long): PropertyGraph = {
    val gsz = math.max(1L, math.floor(1.0 / r).toLong)
    val cells = pts
      .withColumn("cx", least(floor(col("x") * gsz), lit(gsz - 1)).cast("long"))
      .withColumn("cy", least(floor(col("y") * gsz), lit(gsz - 1)).cast("long"))
      .localCheckpoint(true)

    // probe side: each point addresses its 9 candidate cells
    val offsets = (for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))
    val probe = cells.select(col("id").as("pid"), col("x").as("px"), col("y").as("py"),
        col("cx"), col("cy"), explode(array(offsets: _*)).as("o"))
      .select(col("pid"), col("px"), col("py"),
        (col("cx") + col("o.dx")).as("qx0"), (col("cy") + col("o.dy")).as("qy0"))
    val wrapped =
      if (torus) probe.select(col("pid"), col("px"), col("py"),
        pmod(col("qx0"), lit(gsz)).as("qx"), pmod(col("qy0"), lit(gsz)).as("qy"))
      else probe.filter(col("qx0") >= 0 && col("qx0") < gsz &&
          col("qy0") >= 0 && col("qy0") < gsz)
        .select(col("pid"), col("px"), col("py"),
          col("qx0").as("qx"), col("qy0").as("qy"))

    def axisDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val d = abs(a - b)
      if (torus) least(d, lit(1.0) - d) else d
    }
    val pairs = wrapped.join(cells,
        wrapped("qx") === cells("cx") && wrapped("qy") === cells("cy") &&
          wrapped("pid") < cells("id"))
      .select(col("pid").as("src"), col("id").as("dst"),
        (pow(axisDist(col("px"), col("x")), 2) +
          pow(axisDist(col("py"), col("y")), 2)).as("d2"))
      .filter(col("d2") <= r * r)
      .distinct() // a pair can meet in several probe cells on small grids

    val capped = cap match {
      case None => pairs.select("src", "dst")
      case Some(k) =>
        // symmetric nearest-k: an edge survives if it is within the k
        // closest for BOTH endpoints
        val sym = pairs.select(col("src").as("u"), col("dst").as("v"), col("d2"))
          .unionAll(pairs.select(col("dst").as("u"), col("src").as("v"), col("d2")))
        val ranked = sym.withColumn("rn", row_number().over(
          Window.partitionBy("u").orderBy(col("d2"), xxhash64(lit(seed), col("v")))))
        val keep = ranked.filter(col("rn") <= k)
          .select(least(col("u"), col("v")).as("src"),
            greatest(col("u"), col("v")).as("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("sides"))
          .filter(col("sides") === 2)
        keep.select("src", "dst")
    }
    PropertyGraph(capped.withColumn("weight", lit(1.0)), directed = false,
      Some(pts.select("id")))
  }

  /** PubWeb P2P layout (reference `PubWebGenerator.hpp:42`): points on
    * the unit torus, ~70% clustered into `numDenseAreas` circular dense
    * areas, edges within `neighRad`, degree-capped at `maxNeigh`. */
  def pubWeb(spark: SparkSession, n: Long, numDenseAreas: Int,
      neighRad: Double, maxNeigh: Int, seed: Long = 42): PropertyGraph = {
    val areas = spark.range(numDenseAreas.toLong)
      .select(col("id").as("a"),
        u01(seed ^ 1, col("id")).as("ax"),
        u01(seed ^ 2, col("id")).as("ay"),
        (lit(0.05) + lit(0.15) * u01(seed ^ 3, col("id"))).as("rad"))
    val base = spark.range(n)
      .withColumn("inDense", u01(seed ^ 4, col("id")) < 0.7)
      .withColumn("a", pmod(xxhash64(lit(seed ^ 5), col("id")), lit(numDenseAreas.toLong)))
    val dense = base.filter(col("inDense")).join(broadcast(areas), "a")
      .withColumn("theta", u01(seed ^ 6, col("id")) * 2.0 * math.Pi)
      .withColumn("rr", sqrt(u01(seed ^ 7, col("id"))) * col("rad"))
      .select(col("id"),
        pmod(col("ax") + col("rr") * cos(col("theta")), lit(1.0)).as("x"),
        pmod(col("ay") + col("rr") * sin(col("theta")), lit(1.0)).as("y"))
    val sparse = base.filter(!col("inDense"))
      .select(col("id"), u01(seed ^ 8, col("id")).as("x"), u01(seed ^ 9, col("id")).as("y"))
    thresholdGraph(dense.unionAll(sparse), neighRad, torus = true,
      Some(maxNeigh), seed)
  }

  /** Dynamic PubWeb event stream (reference
    * `generators/DynamicPubWebGenerator.hpp`): points drift with a
    * constant hash-derived velocity on the torus; each step's threshold
    * graph is recomputed with the same grid join and diffed against the
    * previous step — additions and removals become timestamped events.
    * Fully distributed: `steps` spatial joins plus two anti-join diffs
    * per step. `(step, type, u, v)`. */
  def dynamicPubWeb(spark: SparkSession, n: Long, steps: Int,
      neighRad: Double, seed: Long = 42): DataFrame = {
    import org.apache.spark.sql.functions.{lit => flit}
    val base = spark.range(n).select(col("id"),
      u01(seed ^ 20, col("id")).as("x0"), u01(seed ^ 21, col("id")).as("y0"),
      ((u01(seed ^ 22, col("id")) - 0.5) * 0.02).as("vx"),
      ((u01(seed ^ 23, col("id")) - 0.5) * 0.02).as("vy"))
      .localCheckpoint(true)
    var prev: DataFrame = null
    var events: DataFrame = null
    for (t <- 0 until steps) {
      val pts = base.select(col("id"),
        pmod(col("x0") + flit(t.toDouble) * col("vx"), flit(1.0)).as("x"),
        pmod(col("y0") + flit(t.toDouble) * col("vy"), flit(1.0)).as("y"))
      val cur = thresholdGraph(pts, neighRad, torus = true, None, seed)
        .edges.select("src", "dst").localCheckpoint(true)
      val stepEvents =
        if (prev == null)
          cur.select(flit(t.toLong).as("step"), flit("EDGE_ADDITION").as("type"),
            col("src").as("u"), col("dst").as("v"))
        else {
          val added = cur.join(prev, Seq("src", "dst"), "left_anti")
            .select(flit(t.toLong).as("step"), flit("EDGE_ADDITION").as("type"),
              col("src").as("u"), col("dst").as("v"))
          val removed = prev.join(cur, Seq("src", "dst"), "left_anti")
            .select(flit(t.toLong).as("step"), flit("EDGE_REMOVAL").as("type"),
              col("src").as("u"), col("dst").as("v"))
          added.unionAll(removed)
        }
      events = if (events == null) stepEvents.localCheckpoint(true)
        else events.unionAll(stepEvents).localCheckpoint(true)
      prev = cur
    }
    events
  }

  /** Mocnik random spatial graph (reference `MocnikGenerator.hpp:18`,
    * dim=2): uniform points in the unit square, edges within the radius
    * that makes the expected degree ≈ k (πr²n = k). The reference's
    * per-node adaptive radius is approximated by the ensemble-equivalent
    * global threshold; density parameter k matches in expectation. */
  def mocnik(spark: SparkSession, n: Long, k: Double, seed: Long = 42): PropertyGraph = {
    val r = math.sqrt(k / (math.Pi * n))
    val pts = spark.range(n).select(col("id"),
      u01(seed ^ 10, col("id")).as("x"), u01(seed ^ 11, col("id")).as("y"))
    thresholdGraph(pts, r, torus = false, None, seed)
  }
}
