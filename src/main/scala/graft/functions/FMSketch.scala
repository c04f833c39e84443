package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Flajolet–Martin neighborhood sketches (reference:
  * `distance/EffectiveDiameterApproximation.hpp:25-34`,
  * `NeighborhoodFunctionApproximation.hpp:26-34` — k parallel FM
  * bitmasks per node, merged by bitwise OR as the frontier expands;
  * SURVEY.md §4.2.2 names this the one custom aggregate the engine
  * needs, because Spark's `approx_count_distinct` can't express
  * per-hop sketch union).
  *
  * A sketch is `k` 64-bit words. Word t of node u sets bit
  * ρ(xxhash(u, t)) where ρ = number of trailing zeros (geometric).
  * Estimate = 2^(mean_t R_t) / 0.77351 with R_t = lowest unset bit of
  * word t. All hashing is seed-deterministic (same result under any
  * partitioning — SURVEY.md §4.2.3).
  */
object FMSketch {
  val DefaultK = 64
  val Phi = 0.77351

  def numWords(bytes: Array[Byte]): Int = bytes.length / 8

  def init(id: Long, k: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(k * 8)
    var t = 0
    while (t < k) {
      val h = scala.util.hashing.MurmurHash3.productHash((id, t)).toLong & 0xffffffffL |
        (scala.util.hashing.MurmurHash3.productHash((t, id)).toLong << 32)
      val rho = java.lang.Long.numberOfTrailingZeros(if (h == 0) 1L else h)
      buf.putLong(t * 8, 1L << math.min(rho, 62))
      t += 1
    }
    buf.array()
  }

  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }

  def estimate(bytes: Array[Byte]): Double = {
    val buf = ByteBuffer.wrap(bytes)
    val k = numWords(bytes)
    var sumR = 0.0
    var t = 0
    while (t < k) {
      val word = buf.getLong(t * 8)
      sumR += java.lang.Long.numberOfTrailingZeros(~word)
      t += 1
    }
    math.pow(2.0, sumR / k) / Phi
  }

  // ---- Catalyst expressions ----

  /** Scalar: node id → singleton sketch bytes. */
  case class FMInit(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = init(v.asInstanceOf[Long], k)
    override protected def withNewChildInternal(c: Expression): FMInit = copy(child = c)
    override def prettyName: String = "fm_init"
  }

  /** Scalar: sketch → estimated distinct count. */
  case class FMEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = estimate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): FMEstimate = copy(child = c)
    override def prettyName: String = "fm_estimate"
  }

  /** Aggregate: bitwise-OR union of sketches (partial + final merge both
    * OR — fully associative/commutative, so map-side combine is free). */
  case class FMMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray
    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v == null) buf
      else {
        val b = v.asInstanceOf[Array[Byte]]
        if (buf.isEmpty) b.clone() else or(buf, b)
      }
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b else if (b.isEmpty) a else or(a, b)
    override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
    override def withNewMutableAggBufferOffset(o: Int): FMMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FMMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FMMergeAgg =
      copy(child = c.head)
    override def prettyName: String = "fm_merge"
  }

  // Column-level API (Spark 4: Column wraps a ColumnNode, not an
  // Expression — bridge through GraftColumnBridge)
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => ex}
  def fmInit(c: Column, k: Int = DefaultK): Column = toCol(FMInit(ex(c), k))
  def fmEstimate(c: Column): Column = toCol(FMEstimate(ex(c)))
  def fmMerge(c: Column): Column =
    toCol(FMMergeAgg(ex(c)).toAggregateExpression())
}
