package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Iterative fixpoint driver — the engine's real "execution engine"
  * (SURVEY.md §7.1). BFS/SSSP/PageRank/label-propagation/Louvain all loop
  * through here.
  *
  * Each iteration of a graph fixpoint is one Spark job with at least one
  * shuffle (join on src + groupBy dst). Two things make this survive at
  * scale (SURVEY.md §4.2.1):
  *   - persist each state and materialize it before dropping the parent,
  *     so a state is computed exactly once;
  *   - cut lineage with `localCheckpoint` every `checkpointEvery` rounds,
  *     otherwise the logical plan (and task closures) grow per iteration
  *     and stage submission eventually dominates.
  */
object Fixpoint {

  /** Loop-body plan evidence: `explain` on the OUTPUT of a checkpointing
    * loop shows only the final projection over a LogicalRDD — the real
    * per-iteration plan (exchange count, join strategy) is invisible.
    * When `GRAFT_LOOP_PLAN_DIR` is set, the first call per label writes
    * the formatted plan of one loop-body iteration (the pre-checkpoint
    * DataFrame) to `<dir>/<label>_loop.txt`, so per-iteration claims are
    * checkable against a committed artifact. No-op (and zero cost beyond
    * an env probe) in normal runs. */
  private val dumpedLabels = scala.collection.concurrent.TrieMap.empty[String, Boolean]
  def dumpLoopPlan(label: String, df: DataFrame): Unit =
    sys.env.get("GRAFT_LOOP_PLAN_DIR").foreach { dir =>
      if (dumpedLabels.putIfAbsent(label, true).isEmpty) {
        val d = new java.io.File(dir); d.mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/${label}_loop.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    }

  /** Release the storage behind a per-round state. `Dataset.unpersist`
    * only drops CacheManager entries, so for a `localCheckpoint`ed state
    * (plan = `LogicalRDD`) it is a silent no-op and every round's blocks
    * pile up in the block manager — at 10⁸-row states the memory store
    * fills after a few rounds and each subsequent round pays eviction
    * churn. Unpersist the checkpointed RDD itself instead. */
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    case _ => df.unpersist(false)
  }

  /** Run `step` until `stop(prev, next, i)` is true or `maxIter` reached.
    * Returns the final (persisted) state. */
  def loop(init: DataFrame, maxIter: Int, checkpointEvery: Int = 1)(
      step: (DataFrame, Int) => DataFrame)(
      stop: (DataFrame, DataFrame, Int) => Boolean): DataFrame = {
    val debug = sys.env.contains("GRAFT_FIXPOINT_DEBUG")
    var cur = init.persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val t0 = System.nanoTime()
      val stepped = step(cur, i)
      val next =
        if ((i + 1) % checkpointEvery == 0) stepped.localCheckpoint(true)
        else stepped.persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before judging convergence / unpersisting parent
      val t1 = System.nanoTime()
      done = stop(cur, next, i)
      if (debug) System.err.println(
        f"[fixpoint] iter $i step=${(t1 - t0) / 1e9}%.2fs stop=${(System.nanoTime() - t1) / 1e9}%.2fs")
      free(cur)
      cur = next
      i += 1
    }
    cur
  }

  /** Convergence via a monotone scalar: stop when `metric` (e.g. sum of
    * labels, sum of distances) stops changing between iterations. */
  def loopUntilStableScalar(init: DataFrame, maxIter: Int,
      metric: DataFrame => Double, checkpointEvery: Int = 1)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var prevMetric = Double.NaN
    loop(init, maxIter, checkpointEvery)(step) { (_, next, _) =>
      val m = metric(next)
      val stable = !prevMetric.isNaN && m == prevMetric
      prevMetric = m
      stable
    }
  }

  /** One job per round: the state is lineage-cut lazily and the
    * fingerprint aggregate doubles as the materializing action, so a
    * round costs exactly one Spark job (plus the step's own shuffles)
    * instead of a count job + a fingerprint job. `fingerprint` may
    * return any equality-comparable value (a Long, a tuple…).
    *
    * `span` > 1 chains that many lazy steps between fingerprints — one
    * job per span instead of per round. Only safe when `step` references
    * its input ONCE (a chained re-reference would recompute the whole
    * span per reference); the fixpoint is unchanged (extra rounds past
    * it are idempotent), at most span−1 idempotent rounds run extra. */
  def loopFusedFingerprint(init: DataFrame, maxIter: Int, span: Int = 1)(
      step: (DataFrame, Int) => DataFrame)(
      fingerprint: DataFrame => Any): DataFrame = {
    val debug = sys.env.contains("GRAFT_FIXPOINT_DEBUG")
    var cur = init.localCheckpoint(true)
    var prev = Option.empty[Any]
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val t0 = System.nanoTime()
      val w = math.min(span, maxIter - i)
      var stepped = cur
      for (k <- 0 until w) stepped = step(stepped, i + k)
      val next = stepped.localCheckpoint(false) // lazy cut
      val f = fingerprint(next) // materializes the checkpoint + aggregates
      if (debug) System.err.println(
        f"[fixpoint-fused] iter $i span=$w ${(System.nanoTime() - t0) / 1e9}%.2fs")
      done = prev.contains(f)
      prev = Some(f)
      free(cur) // next is fully materialized by the fingerprint action
      cur = next
      i += w
    }
    cur
  }

  /** Convergence via an exact 64-bit fingerprint (e.g. an
    * order-independent `bit_xor(xxhash64(...))` of the state): stop when
    * the fingerprint repeats. Unlike [[loopUntilStableScalar]] this keeps
    * all 64 bits (a Double comparison would only keep 53). */
  def loopUntilStableFingerprint(init: DataFrame, maxIter: Int,
      fingerprint: DataFrame => Long, checkpointEvery: Int = 1)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    var prev = Option.empty[Long]
    loop(init, maxIter, checkpointEvery)(step) { (_, next, _) =>
      val m = fingerprint(next)
      val stable = prev.contains(m)
      prev = Some(m)
      stable
    }
  }
}
