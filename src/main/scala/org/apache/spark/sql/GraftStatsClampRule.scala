package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.LogicalRDD

/** Clamps the size statistics that `localCheckpoint`ed frames inherit
  * from their origin plan.
  *
  * `Dataset.localCheckpoint` stores `optimizedPlan.stats` on the new
  * `LogicalRDD` leaf. Catalyst's fallback estimator
  * (`SizeInBytesOnlyStatsPlanVisitor`) multiplies children's
  * `sizeInBytes` at every join, so an iterative algorithm that
  * checkpoints each round re-feeds an already-inflated product into the
  * next round's product: the estimate's BIT LENGTH grows geometrically
  * with iteration count. After a few dozen rounds the `BigInt` has
  * millions of digits and a single stats pass spends minutes inside
  * `BigInteger.multiplyToomCook3` — the driver appears hung while
  * planning a trivially small query (observed: the multi-level
  * matching-coarsening loop in `graft.graph.Community.agglomerative`).
  *
  * A checkpointed frame's true size is never astronomical — the RDD is
  * materialized in the block manager — so any inherited estimate above
  * the clamp can only be product noise. Clamping at the leaves keeps
  * every downstream product polynomial in plan depth while leaving
  * genuinely-small estimates (broadcast decisions) untouched.
  *
  * Injected by [[graft.GraftExtensions]] via `spark.sql.extensions`.
  */
class GraftStatsClampRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Fire on BIT LENGTH, not magnitude: merely-too-big estimates
    // (2^40..2^70 — every iterative span inherits these) are harmless
    // overestimates whose only effect, suppressing broadcast, is the
    // same after clamping; rewriting them bought nothing and cost a
    // re-run of the operator-optimization fixpoint batch on every
    // planned span (~30 % of RMAT-18 PageRank wall-clock). The
    // pathology this rule exists for grows the bit length GEOMETRICALLY
    // per checkpoint round — it blows through 200 bits within a round
    // or two of going bad and is clamped there, long before BigInt
    // arithmetic is measurable.
    case lr: LogicalRDD if lr.stats.sizeInBytes.bitLength > GraftStatsClampRule.maxBits =>
      if (sys.env.contains("GRAFT_FIXPOINT_DEBUG"))
        System.err.println(s"[clamp] LogicalRDD bits=${lr.stats.sizeInBytes.bitLength}")
      val clamped = Statistics(
        sizeInBytes = GraftStatsClampRule.cap,
        rowCount = lr.stats.rowCount.filter(_ <= GraftStatsClampRule.maxRows))
      // The replacement must NOT be case-equal to the original:
      // LogicalRDD equality ignores the curried originStats, and
      // TreeNode.mapChildren silently keeps the OLD child when the new
      // one compares equal — an identity-wrapped RDD makes the node
      // structurally distinct at zero execution cost. The wrapper is
      // memoized per source-RDD id: optimization runs once per plan
      // occurrence and again per AQE re-plan, and a fresh wrapper each
      // time would give each occurrence a distinct rdd.id — defeating
      // canonical plan equality and with it ReuseExchange/ReuseSubquery,
      // which recomputes shared branches of iterative self-joins.
      val rddCopy = GraftStatsClampRule.stableWrapper(lr.rdd)
      LogicalRDD(lr.output, rddCopy, lr.outputPartitioning, lr.outputOrdering,
        lr.isStreaming, lr.stream)(
        session.asInstanceOf[classic.SparkSession], Some(clamped), None)
  }
}

object GraftStatsClampRule {
  /** 1 TiB — far above any broadcast threshold, far below compounding. */
  val cap: BigInt = BigInt(1L) << 40
  /** Fire only past this estimate bit length (≈ 10^60 bytes) — see rule. */
  val maxBits: Int = 200
  val maxRows: BigInt = BigInt(Long.MaxValue)

  private val wrappers = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]()
  @volatile private var wrappersApp: String = null

  /** Identity-mapPartitions wrapper, one stable instance per source RDD
    * (see rule body). RDD ids restart at 0 per SparkContext, so the key
    * includes the applicationId; when a new application appears the map
    * is dropped wholesale — the cached wrappers belong to a stopped
    * context and would fail at execution, and clearing also releases
    * their lineages (and the stopped SparkContext) for GC. Within one
    * application entries are never evicted: each is a narrow RDD handle
    * and a run touches thousands at most, and evicting mid-run would
    * hand two occurrences of the same source RDD different wrapper
    * instances, defeating the canonical-plan equality this memo exists
    * to provide. */
  private[sql] def stableWrapper(
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = {
    val app = rdd.sparkContext.applicationId
    if (wrappersApp != app) synchronized {
      if (wrappersApp != app) { wrappers.clear(); wrappersApp = app }
    }
    wrappers.computeIfAbsent(
      (app, rdd.id), _ => rdd.mapPartitions(it => it, preservesPartitioning = true))
  }
}
