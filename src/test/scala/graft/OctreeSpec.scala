package graft

import org.apache.spark.sql.functions._
import graft.viz.Octree

/** Barnes–Hut repulsion (reference `viz/Octree.hpp`): the interaction
  * lists must PARTITION space (every other point counted exactly once,
  * at exactly one level or as a near pair), and the approximate field
  * must track the exact O(n²) direct sum closely (every accepted cell
  * satisfies the reference's θ = 0.6 acceptance rule). */
class OctreeSpec extends SparkSpec {
  import spark.implicits._

  private def randomPoints(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // two gaussian clusters + uniform background: exercises both dense
    // cells (capped depth) and sparse far-field
    (0 until n).map { i =>
      val cl = i % 3
      val base = (0 until dim).map { d =>
        if (cl == 0) 0.2 + 0.05 * rnd.nextGaussian()
        else if (cl == 1) 0.8 + 0.05 * rnd.nextGaussian()
        else rnd.nextDouble()
      }
      (i.toLong, base)
    }
  }

  private def toCoordsDf(pts: Seq[(Long, Seq[Double])], dim: Int) = {
    val rows = pts.map { case (id, cs) => (id, cs(0), if (dim > 1) cs(1) else 0.0, if (dim > 2) cs(2) else 0.0) }
      .toDF("id", "c0", "cx1", "cx2")
    val keep = col("id") +: (0 until dim).map {
      case 0 => col("c0")
      case 1 => col("cx1").as("c1")
      case 2 => col("cx2").as("c2")
    }
    rows.select(keep: _*)
  }

  test("coverage: every other point counted exactly once (2D)") {
    val n = 300
    val pts = randomPoints(n, 2, 7)
    val coords = toCoordsDf(pts, 2)
    val rep = Octree.repulsion(coords, dim = 2, qSign = 1.0, q2 = 1.0,
      exactBelow = 0)
    val covs = rep.select("id", "cov").as[(Long, Long)].collect().toMap
    assert(covs.size === n)
    covs.foreach { case (id, cov) =>
      assert(cov === n - 1, s"node $id covered $cov of ${n - 1}")
    }
  }

  test("coverage holds in 3D") {
    val n = 80
    val pts = randomPoints(n, 3, 11)
    val coords = toCoordsDf(pts, 3)
    val rep = Octree.repulsion(coords, dim = 3, qSign = 1.0, q2 = 1.0,
      exactBelow = 0)
    val covs = rep.select("cov").as[Long].collect()
    assert(covs.length === n && covs.forall(_ == n - 1))
  }

  test("approximate field tracks the exact direct sum (q = 0)") {
    val n = 300
    val pts = randomPoints(n, 2, 7)
    val coords = toCoordsDf(pts, 2).localCheckpoint(true)
    val rep = Octree.repulsion(coords, dim = 2, qSign = 1.0, q2 = 1.0,
        exactBelow = 0)
      .select("id", "f0", "f1").as[(Long, Double, Double)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    // exact direct sum with the same guards
    val exact = coords.as("a").crossJoin(coords.as("b"))
      .filter(col("a.id") =!= col("b.id"))
      .withColumn("sqd",
        (col("a.c0") - col("b.c0")) * (col("a.c0") - col("b.c0")) +
        (col("a.c1") - col("b.c1")) * (col("a.c1") - col("b.c1")))
      .withColumn("factor", when(col("sqd") < 1e-5, lit(0.0))
        .otherwise(lit(1.0) / greatest(col("sqd"), lit(1e-3))))
      .groupBy(col("a.id").as("id"))
      .agg(sum(col("factor") * (col("a.c0") - col("b.c0"))).as("f0"),
        sum(col("factor") * (col("a.c1") - col("b.c1"))).as("f1"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val relErrs = exact.toSeq.map { case (id, (e0, e1)) =>
      val (g0, g1) = rep(id)
      math.hypot(g0 - e0, g1 - e1) / math.max(math.hypot(e0, e1), 1e-12)
    }.sorted
    val median = relErrs(relErrs.length / 2)
    val p95 = relErrs((relErrs.length * 95) / 100)
    assert(median < 0.08, s"median rel err $median")
    assert(p95 < 0.25, s"p95 rel err $p95")
  }

  test("BH physical plan: no cartesian/nested-loop joins, no single-partition exchange") {
    val pts = randomPoints(300, 2, 7)
    val coords = toCoordsDf(pts, 2)
    val rep = Octree.repulsion(coords, dim = 2, qSign = 1.0, q2 = 1.0,
      exactBelow = 0)
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in BH plan")
    assert(!plan.contains("BroadcastNestedLoop"), "nested-loop join in BH plan")
    assert(!plan.contains("Exchange SinglePartition"), "single-task stage in BH plan")
  }

  test("small-n dispatch returns the exact field") {
    val n = 120
    val pts = randomPoints(n, 2, 3)
    val coords = toCoordsDf(pts, 2).localCheckpoint(true)
    val small = Octree.repulsion(coords, dim = 2, qSign = 1.0, q2 = 1.0)
      .select("id", "f0", "f1", "cov").as[(Long, Double, Double, Long)]
      .collect().map(t => t._1 -> t).toMap
    val bh = Octree.repulsion(coords, dim = 2, qSign = 1.0, q2 = 1.0,
        exactBelow = 0)
      .select("id", "f0", "f1").as[(Long, Double, Double)]
      .collect().map(t => t._1 -> t).toMap
    assert(small.size === n)
    small.values.foreach { case (id, f0, f1, cov) =>
      assert(cov === n - 1)
      // exact field == BH field up to the acceptance-rule error bound
      val (_, b0, b1) = bh(id)
      val rel = math.hypot(f0 - b0, f1 - b1) / math.max(math.hypot(f0, f1), 1e-12)
      assert(rel < 0.5, s"node $id rel $rel")
    }
  }
}
