package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** Round-state storage hygiene: `Dataset.unpersist` is a silent no-op on
  * `localCheckpoint`ed states (their blocks live in RDD storage, not the
  * CacheManager), so per-round states used to pile up until the periodic
  * GC — eviction churn at 10⁸-row scale. These specs pin the fix:
  * `Fixpoint.free` drops the checkpointed RDD itself, and the iterative
  * kernels leave no per-round blocks behind. Counting is by DELTA against
  * the session-wide persistent-RDD set (the shared session memoizes
  * fixture graphs across suites — never unpersist those).
  */
class FixpointSpec extends SparkSpec {

  private def persistedRddCount(): Int =
    spark.sparkContext.getPersistentRDDs.size

  test("free releases a localCheckpoint'd state; Dataset.unpersist does not") {
    import spark.implicits._
    val base = persistedRddCount()
    val ck = (1 to 1000).toDF("x").localCheckpoint(true)
    assert(persistedRddCount() == base + 1)
    ck.unpersist(true) // the trap: no-op for checkpoint blocks
    assert(persistedRddCount() == base + 1)
    Fixpoint.free(ck)
    assert(persistedRddCount() == base)
  }

  test("loopFusedFingerprint retains only the final state") {
    import spark.implicits._
    val base = persistedRddCount()
    val init = (1 to 64).map(_.toLong).toDF("x")
    var rounds = 0
    val out = Fixpoint.loopFusedFingerprint(init, maxIter = 20) { (df, _) =>
      rounds += 1
      df.select((col("x") / 2).cast("long").as("x"))
    } { df => df.agg(sum("x")).head.getLong(0) }
    assert(rounds >= 6) // genuinely iterated
    assert(out.agg(sum("x")).head.getLong(0) == 0L)
    // every intermediate round's checkpoint was freed; only the final
    // state may remain beyond what was already persisted
    assert(persistedRddCount() <= base + 1)
    Fixpoint.free(out)
    assert(persistedRddCount() <= base)
  }

  test("bfs and coreDecomposition leave no per-round blocks behind") {
    val g = graft.io.GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    assert(g.numberOfNodes == 34) // materialize the fixture first
    val base = persistedRddCount()
    val src = spark.range(1).select(lit(1L).as("source"))
    val d = ShortestPaths.bfs(g, src)
    assert(d.count() == 34)
    val cores = GraphOps.coreDecomposition(g)
    assert(cores.agg(max("core")).head.getInt(0) == 4) // karate's degeneracy
    // retained: the two returned results (bfs dist + kcore out), nothing
    // per-round
    val leaked = persistedRddCount() - base
    assert(leaked <= 2, s"leaked round states: $leaked")
    Fixpoint.free(d); Fixpoint.free(cores)
    assert(persistedRddCount() <= base)
  }
}
