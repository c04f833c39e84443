package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`), for
  * training-data pipelines: brute-force cosine top-k as the exact
  * baseline, and a sign-random-projection LSH bucketing as the scale
  * path (bucketed join instead of the quadratic cross join).
  *
  * Dot products are codegen-friendly higher-order functions
  * (`zip_with` + `aggregate`), evaluated left-to-right — deterministic
  * and oracle-matchable after a cast to double.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two double arrays (named columns), as an expression. */
  def dotExpr(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  /** L2 norm of a float/double array column (named). */
  def normExpr(a: String): Column =
    sqrt(expr(s"aggregate(transform($a, x -> cast(x as double) * cast(x as double)), 0D, (acc, v) -> acc + v)"))

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k: for each query row, the k nearest
    * non-identical vectors. Cosine is rounded to 6 decimals BEFORE
    * ranking (ties broken by id) so results are reproducible across
    * engines and partitionings. `(q, id, cosine, rank)` */
  def cosineTopK(vectors: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val v = vectors.select(col(id).as("id"), asDouble(col(vec)).as("v"))
      .withColumn("nv", normExpr("v"))
    val q = queries.select(col(id).as("q"), asDouble(col(vec)).as("qv"))
      .withColumn("nq", normExpr("qv"))
    val scored = q.crossJoin(v).filter(col("q") =!= col("id"))
      .withColumn("cosine", round(dotExpr("qv", "v") / (col("nq") * col("nv")), 6))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q", "id", "cosine", "rank")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * `(a, b, cosine)` — exact; use [[srpBuckets]] + bucket-join at scale. */
  def cosinePairs(vectors: DataFrame, id: String, vec: String,
      minCosine: Double): DataFrame = {
    val v = vectors.select(col(id).as("a"), asDouble(col(vec)).as("va"))
      .withColumn("na", normExpr("va"))
    val w = vectors.select(col(id).as("b"), asDouble(col(vec)).as("vb"))
      .withColumn("nb", normExpr("vb"))
    v.crossJoin(w).filter(col("a") < col("b"))
      .withColumn("cosine", round(dotExpr("va", "vb") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= minCosine)
      .select("a", "b", "cosine")
  }

  /** Scale-aware SRP bit count. The bucket join is per-bucket QUADRATIC,
    * so a fixed bucket space is a scale-killer: 256 buckets over 10⁹
    * vectors means ~10⁷ rows per bucket and a ~10¹⁴-pair join. The
    * bucket count must grow with the corpus — 2^nBits ≈ n /
    * targetBucketRows keeps the expected bucket at `targetBucketRows`
    * rows and the total candidate-pair count near-linear in n
    * (n · targetBucketRows · (1 + nBits multi-probes)). Clamped to
    * [4, 24]: ≥16 buckets even for tiny inputs, and 2²⁴ buckets carry
    * 10¹⁰+ vectors at the default target. */
  def srpBits(n: Long, targetBucketRows: Long = 1024L): Int = {
    require(targetBucketRows > 0, "targetBucketRows must be positive")
    val buckets = math.max(1.0, n.toDouble / targetBucketRows)
    math.min(24, math.max(4, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** Sign-random-projection LSH bucket per vector: `nBits` pseudo-random
    * hyperplanes with deterministic ±1 coefficients derived from
    * xxhash64(bit, dim) — no stored plane matrix, reproducible under any
    * partitioning. Approximate-NN then joins within buckets only.
    * Size `nBits` with [[srpBits]] (the callers' auto default) — a fixed
    * bucket space does not survive corpus growth. */
  def srpBuckets(vectors: DataFrame, id: String, vec: String, nBits: Int = 8): DataFrame = {
    val v = vectors.select(col(id), asDouble(col(vec)).as("srp_v"))
    val bitCols = (0 until nBits).map { b =>
      // coefficient for dim i: +1 if xxhash64(b, i) even else -1
      val proj = expr(
        s"""aggregate(zip_with(srp_v, sequence(0, size(srp_v)-1),
           |  (x, i) -> x * (1.0 - 2.0 * cast(pmod(xxhash64($b, i), 2) as double))),
           |  0D, (acc, p) -> acc + p)""".stripMargin)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    v.select(col(id), bitCols.reduce(_ + _).as("bucket"))
  }

  /** Deterministic spherical k-means (Lloyd) for IVF coarse quantization:
    * init = the `k` vectors with smallest xxhash64(seed, id); each round
    * assigns every vector to its max-cosine centroid (broadcast join — the
    * centroid table is k rows at any data scale, the standard IVF shape)
    * and recomputes unit-normalized centroid means. Empty lists keep their
    * previous centroid. Returns `(list_id, c ARRAY<DOUBLE>)`. */
  def kmeansCentroids(vectors: DataFrame, id: String, vec: String, k: Int,
      iters: Int = 4, seed: Long = 42L): DataFrame = {
    val unit = vectors
      .select(col(id).as("kid"), asDouble(col(vec)).as("kv"))
      .withColumn("nrm", normExpr("kv"))
      .filter(col("nrm") > 0)
      .withColumn("kv", transform(col("kv"), x => x / col("nrm")))
      .select("kid", "kv")
      .persist()
    import org.apache.spark.sql.expressions.Window
    var cents = unit
      .withColumn("h", xxhash64(lit(seed), col("kid")))
      .orderBy(col("h").asc, col("kid").asc).limit(k)
      .withColumn("list_id", row_number().over(Window.orderBy(col("h").asc, col("kid").asc)).cast("long") - 1)
      .select(col("list_id"), col("kv").as("c"))
      .persist()
    cents.count()
    for (_ <- 1 to iters) {
      val assigned = assignLists(unit.select(col("kid"), col("kv")), cents, nProbe = 1)
      val means = assigned.join(unit, "kid")
        .select(col("list_id"), posexplode(col("kv")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos").agg(avg("x").as("m"))
        .groupBy("list_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .withColumn("cn", normExpr("c"))
        .filter(col("cn") > 0)
        .withColumn("c", transform(col("c"), x => x / col("cn")))
        .select("list_id", "c")
      // keep the previous centroid for lists that went empty
      val next = means
        .unionByName(cents.join(means.select("list_id"), Seq("list_id"), "left_anti"))
        .persist()
      next.count()
      cents.unpersist(false)
      cents = next
    }
    unit.unpersist(false)
    cents
  }

  /** Nearest `nProbe` IVF lists per vector, by centroid cosine:
    * `(kid, list_id)`. Input vectors must carry unit `kv`. */
  private def assignLists(unitVecs: DataFrame, cents: DataFrame, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unitVecs.crossJoin(broadcast(cents))
      .withColumn("sim", dotExpr("kv", "c"))
    val w = Window.partitionBy("kid").orderBy(col("sim").desc, col("list_id").asc)
    scored.withColumn("r", row_number().over(w)).filter(col("r") <= nProbe)
      .select("kid", "list_id")
  }

  /** IVF approximate cosine top-k (reference point: the inverted-file ANN
    * design of Faiss/IVF — coarse-quantize into `nLists` k-means cells,
    * search only the query's `nProbe` nearest cells). Exact cosine within
    * the probed cells, so every returned cosine equals the brute-force
    * value for that pair; only recall is approximate. Scale shape: one
    * broadcast join against the k-row centroid table + a shuffle keyed by
    * `list_id` — no cross join anywhere. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4, iters: Int = 4): DataFrame = {
    val cents = kmeansCentroids(vectors, id, vec, nLists, iters)
    def unit(df: DataFrame, as: String) = df
      .select(col(id).as(as), asDouble(col(vec)).as("kv"))
      .withColumn("nrm", normExpr("kv"))
      .filter(col("nrm") > 0)
      .withColumn("kv", transform(col("kv"), x => x / col("nrm")))
      .select(col(as).as("kid"), col("kv"))
    val vl = assignLists(unit(vectors, "vid"), cents, nProbe = 1)
      .withColumnRenamed("kid", "cid")
    val ql = assignLists(unit(queries, "qid"), cents, nProbe = nProbe)
      .withColumnRenamed("kid", "q")
    val v = vectors.select(col(id).as("cid"), asDouble(col(vec)).as("v"))
      .withColumn("nv", normExpr("v")).join(vl, "cid")
    val q = queries.select(col(id).as("q"), asDouble(col(vec)).as("qv"))
      .withColumn("nq", normExpr("qv")).join(ql, "q")
    val scored = q.join(v, "list_id").filter(col("q") =!= col("cid"))
      .dropDuplicates("q", "cid")
      .withColumn("cosine", round(dotExpr("qv", "v") / (col("nq") * col("nv")), 6))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q").orderBy(col("cosine").desc, col("cid").asc)
    val out = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q"), col("cid").as("id"), col("cosine"), col("rank"))
    out
  }

  /** Sub-vector rows `(id', sub, sv)` of unit-normalized vectors: the
    * `m` equal slices product quantization operates on. */
  private def subVectors(df: DataFrame, id: String, vec: String, m: Int,
      as: String): DataFrame =
    df.select(col(id).as(as), asDouble(col(vec)).as("fv"))
      .withColumn("nrm", normExpr("fv"))
      .filter(col("nrm") > 0)
      .withColumn("fv", transform(col("fv"), x => x / col("nrm")))
      .select(col(as), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("fv"))
      .withColumn("sv", expr(
        s"slice(fv, sub * (size(fv) DIV $m) + 1, size(fv) DIV $m)"))
      .select(as, "sub", "sv")

  /** Squared L2 distance between two double-array columns (named). */
  private def sqDistExpr(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)")

  /** Nearest codebook entry per (row, sub): `(id', sub, code)`. The
    * codebook is m·ksub rows at any data scale — always broadcast. */
  private def pqAssign(subv: DataFrame, cb: DataFrame, as: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(as, "sub").orderBy(col("d2").asc, col("code").asc)
    subv.join(broadcast(cb), "sub")
      .withColumn("d2", sqDistExpr("sv", "c"))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(as, "sub", "code")
  }

  /** Product-quantization codebooks (the PQ of Jégou et al., the Faiss
    * `PQ` building block): the d dims split into `m` sub-spaces, each
    * sub-space L2-k-means-quantized into `ksub` centroids. Deterministic
    * like [[kmeansCentroids]] (hash-seeded init, argmin with (dist,
    * code) tie-break). Returns `(sub, code, c ARRAY<DOUBLE>)` — m·ksub
    * rows, broadcastable at any data scale. */
  def pqCodebooks(vectors: DataFrame, id: String, vec: String, m: Int = 4,
      ksub: Int = 16, iters: Int = 3, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subv = subVectors(vectors, id, vec, m, "kid").persist()
    val wInit = Window.partitionBy("sub")
      .orderBy(xxhash64(lit(seed), col("kid")).asc, col("kid").asc)
    var cb = subv
      .withColumn("code", row_number().over(wInit).cast("long") - 1)
      .filter(col("code") < ksub)
      .select(col("sub"), col("code"), col("sv").as("c"))
      .persist()
    cb.count()
    for (_ <- 1 to iters) {
      val assigned = pqAssign(subv, cb, "kid")
      val means = assigned.join(subv, Seq("kid", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos").agg(avg("x").as("mu"))
        .groupBy("sub", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          s => s.getField("mu")).as("c"))
      val next = means
        .unionByName(cb.join(means.select("sub", "code"),
          Seq("sub", "code"), "left_anti"))
        .persist()
      next.count()
      cb.unpersist(false)
      cb = next
    }
    subv.unpersist(false)
    cb
  }

  /** PQ codes per vector: `(id, sub, code)` — the m-byte compressed
    * representation (d·4 bytes → m·log2(ksub) bits per vector, the
    * memory step that makes billion-vector search fit a cluster). */
  def pqEncode(vectors: DataFrame, id: String, vec: String,
      codebooks: DataFrame, m: Int = 4): DataFrame =
    pqAssign(subVectors(vectors, id, vec, m, id), codebooks, id)

  /** PQ approximate cosine top-k via asymmetric distance computation
    * (ADC): each query builds an m·ksub lookup table of sub-dot-products
    * against the codebook ONCE, and a candidate's score is the m-term
    * table sum for its codes — no array math against candidates at all.
    * Scale shape: codes are m rows per vector keyed by (sub, code), the
    * LUT is broadcast (nq·m·ksub rows), and the only shuffle is the
    * per-(q, id) sum — candidate scoring is O(m) per pair vs O(d) exact,
    * and composes with IVF probing upstream. Scores approximate the
    * unit-vector cosine; rank fidelity is the gate, not score equality. */
  def pqTopK(vectors: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, m: Int = 4, ksub: Int = 16, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = pqCodebooks(vectors, id, vec, m, ksub, iters)
    val codes = pqEncode(vectors, id, vec, cb, m)
      .withColumnRenamed(id, "cid")
    val lut = subVectors(queries, id, vec, m, "q")
      .join(broadcast(cb), "sub")
      .withColumn("dot", dotExpr("sv", "c"))
      .select("q", "sub", "code", "dot")
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("q") =!= col("cid"))
      .groupBy("q", "cid")
      .agg(round(sum("dot"), 6).as("score"))
    val w = Window.partitionBy("q").orderBy(col("score").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q"), col("cid").as("id"), col("score"), col("rank"))
  }

  /** Approximate cosine top-k: candidates restricted to the query's SRP
    * bucket (optionally ± Hamming-1 neighbors via multi-probe).
    * `nBits ≤ 0` (the default) auto-sizes the bucket space from the
    * corpus count via [[srpBits]] — the required behavior at scale.
    * Pass `nRows` when the caller already knows the corpus size (saves
    * the sizing count job); otherwise the input is persisted before
    * counting since the bucketing scans it again. */
  def annTopK(vectors: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, nBits: Int = 0, multiProbe: Boolean = true,
      nRows: Long = 0L): DataFrame = {
    val corpus =
      if (nBits > 0 || nRows > 0) vectors
      else vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bits =
      if (nBits > 0) nBits
      else srpBits(if (nRows > 0) nRows else corpus.count())
    val vb = corpus.join(srpBuckets(corpus, id, vec, bits), Seq(id))
    val qb0 = queries.join(srpBuckets(queries, id, vec, bits), Seq(id))
    // multi-probe: also search the nBits buckets at Hamming distance 1
    val qb =
      if (!multiProbe) qb0
      else qb0.withColumn("probe",
          explode(array(lit(0L) +: (0 until bits).map(b => lit(1L << b)): _*)))
        .withColumn("bucket", expr("cast(bucket as bigint) ^ probe"))
        .drop("probe")
    val v = vb.select(col(id).as("cid"), col("bucket"), asDouble(col(vec)).as("v"))
      .withColumn("nv", normExpr("v"))
    val q = qb.select(col(id).as("q"), col("bucket"), asDouble(col(vec)).as("qv"))
      .withColumn("nq", normExpr("qv"))
    val scored = q.join(v, "bucket").filter(col("q") =!= col("cid"))
      .dropDuplicates("q", "cid") // multi-probe can reach a candidate twice
      .withColumn("cosine", round(dotExpr("qv", "v") / (col("nq") * col("nv")), 6))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q"), col("cid").as("id"), col("cosine"), col("rank"))
  }
}
