package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Product quantization: codebook shape, encode determinism, and ADC
  * rank fidelity on planted orthogonal clusters. */
class PqSpec extends SparkSpec {

  /** 3 clusters of 20 vectors in 12 dims: cluster c hot on dims
    * [4c, 4c+4) with a small deterministic per-vector jitter. */
  private def clustered = {
    import spark.implicits._
    (0 until 60).map { i =>
      val c = i / 20
      val v = Array.tabulate(12) { d =>
        val base = if (d / 4 == c) 1.0f else 0.0f
        base + 0.01f * ((i * 7 + d * 3) % 5)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("pq: codebooks are m·ksub rows, codes in range, encode deterministic") {
    val df = clustered
    val cb = Similarity.pqCodebooks(df, "vec_id", "embedding", m = 3, ksub = 4,
      iters = 2)
    assert(cb.count() == 3 * 4)
    assert(cb.filter(col("code") < 0 || col("code") >= 4).isEmpty)
    val c1 = Similarity.pqEncode(df, "vec_id", "embedding", cb, m = 3)
    val c2 = Similarity.pqEncode(df, "vec_id", "embedding", cb, m = 3)
    assert(c1.count() == 60 * 3)
    assert(c1.except(c2).isEmpty && c2.except(c1).isEmpty)
  }

  test("pq ADC: top-k of a clustered corpus stays within the query's cluster") {
    val df = clustered
    val queries = df.filter(col("vec_id").isin(0L, 25L, 50L))
    val top = Similarity.pqTopK(df, queries, "vec_id", "embedding", k = 5,
      m = 3, ksub = 4, iters = 2)
    assert(top.count() == 3 * 5)
    // every neighbor must come from the query's own 20-vector cluster
    val crossCluster = top.filter(
      floor(col("q") / 20) =!= floor(col("id") / 20)).count()
    assert(crossCluster == 0, s"$crossCluster cross-cluster neighbors")
    // ADC scores of unit vectors stay in the cosine envelope
    assert(top.filter(abs(col("score")) > 1.05).isEmpty)
  }
}
