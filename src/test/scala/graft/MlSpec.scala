package graft

import org.apache.spark.sql.functions._
import graft.ml.{Dedup, Similarity}

/** Dedup + similarity-search specs on the driver's sf0.001 tables. */
class MlSpec extends SparkSpec {

  test("minhash: identical texts get identical signatures") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence with other words entirely")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("ngram jaccard: identical docs = 1.0, disjoint docs absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5"), (3L, "x1 x2 x3 x4 x5")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text").collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getAs[Double]("jaccard") == 1.0)
    assert(pairs.head.getAs[Long]("n_inter") == pairs.head.getAs[Long]("n_union"))
  }

  test("simhash: near-identical docs have close hashes (hamming ≤ 4)") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val h = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) <= 4)
    assert(hamming(h(1L), h(3L)) >= 3)
  }

  test("exact dedup drops duplicates keeping min id") {
    import spark.implicits._
    val df = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 9L))
  }

  test("lsh candidate pairs recover exact duplicates") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark scale shuffle partition join agg window stream"),
      (2L, "spark scale shuffle partition join agg window stream"),
      (3L, "entirely unrelated content goes right here in this doc")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(df, "doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBuckets(sig, "doc_id", 4, 2), "doc_id").collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L))
  }

  test("ANN (SRP-LSH multi-probe) beats random-candidate recall on sf0.001") {
    // the synthetic embeddings are near-uniform (max pairwise cosine
    // ~0.5), the hardest case for LSH — 4 bits + multi-probe still has
    // to do clearly better than the ~16% a random candidate set of the
    // same size would get
    val emb = Tables.load(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annTopK(emb, queries, "vec_id", "embedding", 5, nBits = 4)
      .select("q", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"ANN recall $recall too low")
  }

  test("srpBits: auto sizing rule, and candidate pairs stay near-linear in n") {
    import spark.implicits._
    // the sizing rule: 2^bits ≈ n / targetBucketRows, clamped [4, 24]
    assert(Similarity.srpBits(1000) == 4)
    assert(Similarity.srpBits(1L << 20, 1024) == 10)
    assert(Similarity.srpBits(1000000000L, 1024) == 20)
    assert(Similarity.srpBits(Long.MaxValue) == 24)
    assert(Similarity.srpBits(0L) == 4)
    // candidate-pair growth: deterministic hash-derived vectors; the
    // multi-probe bucket join (the embeddingNearDup candidate stage)
    // with AUTO bits must grow near-linearly when n quadruples, while
    // FIXED bits grow quadratically
    def vecs(n: Int) = spark.range(n).select(col("id"),
      expr("transform(sequence(0, 31), d -> cast(pmod(xxhash64(id, d), 1000) as double) / 500.0 - 1.0)")
        .as("embedding"))
    def candPairs(n: Int, bits: Int): Long = {
      val b0 = vecs(n).join(
        Similarity.srpBuckets(vecs(n), "id", "embedding", bits), Seq("id"))
      val probed = b0.withColumn("probe",
          explode(array(lit(0L) +: (0 until bits).map(b => lit(1L << b)): _*)))
        .withColumn("bucket", expr("cast(bucket as bigint) ^ probe"))
        .select("id", "bucket")
      probed.select(col("id").as("a"), col("bucket"))
        .join(probed.select(col("id").as("b"), col("bucket")), "bucket")
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
    }
    val (n1, n2) = (1024, 4096)
    val auto1 = candPairs(n1, Similarity.srpBits(n1, 32))
    val auto2 = candPairs(n2, Similarity.srpBits(n2, 32))
    val fixed2 = candPairs(n2, Similarity.srpBits(n1, 32))
    val growth = auto2.toDouble / auto1
    // uniform buckets would give ~5.6× (4× data × 7/5 probes); SRP sign
    // patterns are inherently skewed so allow up to 10× — the gate is
    // "clearly below the ≥16× a fixed bucket space gives on 4× data"
    assert(growth < 10.0,
      s"auto-sized candidate pairs grew ${growth}x on 4x data")
    assert(fixed2 > 2L * auto2,
      s"fixed bucket space should blow up quadratically (fixed=$fixed2 auto=$auto2)")
  }

  test("IVF top-k: cosines exact for returned pairs, recall beats cell fraction") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q", "id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nLists = 8, nProbe = 2).select("q", "id", "cosine").collect()
    // every IVF cosine equals the brute-force cosine for that pair
    val allVecs = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
      Int.MaxValue).select("q", "id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      assert(allVecs((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
    // recall clearly above the 2/8 = 25% a random 2-cell probe would get
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.keySet.count(got).toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("kmeansCentroids: nLists unit centroids, deterministic across runs") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val c1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, iters = 2)
      .orderBy("list_id").collect()
    val c2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, iters = 2)
      .orderBy("list_id").collect()
    assert(c1.length == 8)
    c1.zip(c2).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Double](1) == b.getSeq[Double](1))
    }
    c1.foreach { r =>
      val n = math.sqrt(r.getSeq[Double](1).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("embeddingNearDup: planted duplicate clusters recovered; LSH path finds true near-dups") {
    import spark.implicits._
    // 20 orthogonal base directions in R^32 (one-hot dims 0..19), each
    // cloned 3× with a tiny perturbation confined to dims 20..31: clones
    // are cosine ≥ 0.99 to their base, cross-cluster pairs near 0
    val rows = for (c <- 0 until 20; j <- 0 until 3) yield {
      val v = Array.fill(32)(0.0)
      v(c) = 1.0
      v(20 + c % 12) = 0.05 * j
      (c * 3L + j, v.map(_.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(df, "vec_id", "embedding",
      minCosine = 0.95, exact = true).collect()
    val groupsOf = exact.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted cluster is one group, canonical = its min id
    for (c <- 0 until 20; j <- 0 until 3)
      assert(groupsOf(c * 3L + j) == c * 3L, s"member ${c * 3 + j} not grouped to ${c * 3}")
    assert(exact.count(_.getLong(3) == 1L) == 20, "one canonical per cluster")
    assert(exact.forall(_.getLong(2) == 3L), "all groups size 3")
    // scale path: SRP buckets + Hamming-1 multi-probe must recover most
    // true near-dup pairs (cosine ≥ 0.99 pairs collide with high prob.)
    val lsh = Dedup.embeddingNearDup(df, "vec_id", "embedding",
      minCosine = 0.95, exact = false, nBits = 8).collect()
    val nonSingleton = lsh.count(_.getLong(2) > 1L)
    assert(nonSingleton >= 42, // ≥ 70 % of the 60 members keep a partner
      s"LSH path grouped only $nonSingleton of 60 planted near-dup members")
    // refinement: LSH groups never merge two exact groups
    val lshGroups = lsh.map(r => r.getLong(0) -> r.getLong(1)).toMap
    lsh.groupBy(r => r.getLong(1)).foreach { case (_, members) =>
      assert(members.map(m => groupsOf(m.getLong(0))).toSet.size == 1,
        "an LSH group spans two exact groups")
    }
  }

  test("cosineTopK is exact top-k (matches naive recompute for one query)") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val res = Similarity.cosineTopK(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", 3).collect()
    assert(res.length == 3)
    assert(res.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
    assert(res.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }
}
