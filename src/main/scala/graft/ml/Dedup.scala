package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact (hash
  * group-by), MinHash + LSH banding, n-gram Jaccard, SimHash.
  *
  * All hashing is md5-based (codegen'd built-in, identical semantics in
  * any ANSI engine — which is what lets every one of these ship with a
  * DuckDB oracle). At 100 TB the shapes that matter: shingling is a
  * narrow map (explode), signatures are one hash-agg by doc, LSH turns
  * the quadratic all-pairs problem into a per-bucket join keyed on band
  * hash — the only shuffle is by (band, bucket).
  */
object Dedup {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Exact-duplicate summary: 1 row `(n_docs, n_distinct, n_dup)`. */
  def exactStats(df: DataFrame, text: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(text))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col(text)))).as("n_dup"))

  /** Drop exact duplicates keeping the smallest id per text hash. */
  def dropExactDuplicates(df: DataFrame, id: String, text: String): DataFrame = {
    val keep = df.groupBy(md5(col(text)).as("fp")).agg(min(col(id)).as(id))
    df.join(keep.select(id), Seq(id), "left_semi")
  }

  /** Word n-gram shingles of the tokenized text (named col required). */
  def shingleExpr(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"$toksCol[i-1+$j]").mkString(", ")
    when(size(col(toksCol)) >= n,
      expr(s"transform(sequence(1, size($toksCol)-${n - 1}), i -> concat_ws(' ', $parts))"))
      .otherwise(array())
  }

  /** MinHash signatures: k independent min-hashes over the shingle set,
    * as hex-string columns `mh0..mh{k-1}`.
    * (hash_i(s) = md5(i || s); the min is taken lexicographically.)
    * No shingle-dedup pass: `min` is duplicate-insensitive, so the
    * former per-(doc, shingle) distinct was a full extra exchange for
    * the identical result — the signature aggregate (with map-side
    * partial min) is the only shuffle. */
  def minhashSignatures(df: DataFrame, id: String, text: String,
      k: Int = 8, shingleN: Int = 3): DataFrame = {
    val sh = df
      .withColumn("toks", tokens(col(text)))
      .withColumn("sh", explode(shingleExpr("toks", shingleN)))
      .select(col(id), col("sh"))
    val aggs = (0 until k).map(i => min(md5(concat(lit(i.toString), col("sh")))).as(s"mh$i"))
    sh.groupBy(id).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a minhash signature (rows of `mh0..`): bucket id
    * per (doc, band); docs sharing a bucket are near-dup candidates. */
  def lshBuckets(sig: DataFrame, id: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val perBand = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      sig.select(col(id), lit(b).as("band"), md5(concat(cols: _*)).as("bucket"))
    }
    perBand.reduce(_ unionAll _)
  }

  /** Candidate near-duplicate pairs from LSH buckets `(a, b, n_bands)`. */
  def lshCandidatePairs(buckets: DataFrame, id: String): DataFrame = {
    val l = buckets.select(col(id).as("a"), col("band"), col("bucket"))
    val r = buckets.select(col(id).as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_bands"))
  }

  /** Exact n-gram Jaccard for all pairs sharing ≥1 shingle, thresholded.
    * `(a, b, n_inter, n_union, jaccard)`.
    *
    * Shingles appearing in more than `maxShingleDf` documents are
    * dropped from the shingle universe before the self-join (counts and
    * intersections both computed post-drop, so the result is the exact
    * Jaccard over the filtered space): a stop-shingle like "the quick
    * brown" otherwise creates a quadratic hot key in the shingle join —
    * the standard fix at corpus scale. At test scale no shingle comes
    * near the default cap (measured max df = 7 at sf0.01), so results
    * are unchanged. */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
      shingleN: Int = 3, minJaccard: Double = 0.0,
      maxShingleDf: Int = 100): DataFrame = {
    val shAll = df
      .withColumn("toks", tokens(col(text)))
      .withColumn("sh", explode(shingleExpr("toks", shingleN)))
      .select(col(id), col("sh")).distinct()
    val rare = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf).select("sh")
    val sh = shAll.join(rare, Seq("sh"), "left_semi").persist()
    val cnt = sh.groupBy(id).agg(count(lit(1)).as("n"))
    val inter = sh.select(col(id).as("a"), col("sh"))
      .join(sh.select(col(id).as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    inter
      .join(cnt.select(col(id).as("a"), col("n").as("na")), "a")
      .join(cnt.select(col(id).as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        col("c").as("n_inter"),
        (col("na") + col("nb") - col("c")).as("n_union"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Character n-gram near-dup pairs: like [[ngramJaccardPairs]] but
    * over SUB-WORD character n-grams of the trimmed text — robust to
    * word reordering and in-word edits that word shingles miss (the
    * standard complement in dedup pipelines). Same keyed rare-gram
    * join, same DF hot-gram cap. `(a, b, n_inter, n_union, jaccard)`. */
  def charNgramJaccardPairs(df: DataFrame, id: String, text: String,
      n: Int = 5, minJaccard: Double = 0.0,
      maxGramDf: Int = 100): DataFrame = {
    // guard: sequence(1, 0) infers step −1 in Spark — short texts must
    // yield an EMPTY gram set, not [1, 0]
    val grams = expr(
      s"""CASE WHEN length(trim($text)) < $n THEN CAST(array() AS ARRAY<STRING>)
         |ELSE array_distinct(transform(
         |  sequence(1, length(trim($text)) - ${n - 1}),
         |  i -> substring(trim($text), i, $n))) END""".stripMargin)
    val shAll = df.select(col(id), explode(grams).as("sh"))
    val rare = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxGramDf).select("sh")
    val sh = shAll.join(rare, Seq("sh"), "left_semi").persist()
    val cnt = sh.groupBy(id).agg(count(lit(1)).as("n"))
    val inter = sh.select(col(id).as("a"), col("sh"))
      .join(sh.select(col(id).as("b"), col("sh")), "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    inter
      .join(cnt.select(col(id).as("a"), col("n").as("na")), "a")
      .join(cnt.select(col(id).as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        col("c").as("n_inter"),
        (col("na") + col("nb") - col("c")).as("n_union"),
        (col("c") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** SimHash over token hashes, `bits` ≤ 16 (hash = first 4 hex chars of
    * md5 → 16-bit int; per-bit majority vote). `(id, simhash)` */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 16): DataFrame = {
    val tok = df
      .withColumn("tok", explode(tokens(col(text))))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int"))
    val bitAggs = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(id).agg(bitAggs.head, bitAggs.tail: _*)
    val hashCol = (0 until bits).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(id), hashCol.as("simhash"))
  }

  /** Embedding-cosine near-duplicate GROUPS: pairs at `cosine ≥
    * minCosine` are edges of a similarity graph; each connected
    * component is one duplicate group and its smallest id the canonical
    * representative (the same keep-rule as [[dropExactDuplicates]]).
    * Returns one row per vector: `(id, group, group_size,
    * is_canonical)` — singletons are their own group.
    *
    * `exact = true` scores every pair (quadratic — the small-n oracle
    * baseline, like the brute-force cosine top-k). The default scale
    * path hashes vectors into SRP-LSH buckets (multi-probe, Hamming-1)
    * and scores only same-bucket candidates — the shuffle is keyed by
    * bucket, never all-pairs, the same shape that makes MinHash-LSH
    * scale; candidates then pass the SAME exact rounded-cosine test, so
    * approximation can only MISS pairs (lower recall), never admit
    * false ones. Component-finding reuses the distributed large/small
    * star CC kernel, O(log n) rounds at any scale. */
  def embeddingNearDup(vectors0: DataFrame, id: String, vec: String,
      minCosine: Double, exact: Boolean = false, nBits: Int = 0,
      nRows: Long = 0L): DataFrame = {
    import graft.graph.{ConnectedComponents, PropertyGraph}
    // auto-sizing needs a count; persist first (the plan is scanned
    // again for bucketing + the final vertex set), or skip the count
    // entirely when the caller passes a known nRows
    val vectors =
      if (exact || nBits > 0 || nRows > 0) vectors0
      else vectors0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs =
      if (exact) Similarity.cosinePairs(vectors, id, vec, minCosine)
      else {
        // nBits ≤ 0 auto-sizes the bucket space from the corpus count —
        // a fixed bucket count makes the per-bucket join quadratic at
        // scale (see Similarity.srpBits)
        val bits =
          if (nBits > 0) nBits
          else Similarity.srpBits(if (nRows > 0) nRows else vectors.count())
        val b0 = vectors.join(Similarity.srpBuckets(vectors, id, vec, bits), Seq(id))
        // multi-probe: each vector also visits its Hamming-1 buckets, so
        // a pair meets when their buckets differ by ≤ 1 bit (visit-side
        // expansion keeps the join key a single bucket column)
        val probed = b0.withColumn("probe",
            explode(array(lit(0L) +: (0 until bits).map(b => lit(1L << b)): _*)))
          .withColumn("bucket", expr("cast(bucket as bigint) ^ probe"))
        val v = probed.select(col(id).as("a"), col("bucket"),
            expr(s"transform($vec, x -> cast(x as double))").as("va"))
          .withColumn("na", Similarity.normExpr("va"))
        val w = probed.select(col(id).as("b"), col("bucket"),
            expr(s"transform($vec, x -> cast(x as double))").as("vb"))
          .withColumn("nb", Similarity.normExpr("vb"))
        v.join(w, "bucket").filter(col("a") < col("b"))
          .dropDuplicates("a", "b")
          .withColumn("cosine",
            round(Similarity.dotExpr("va", "vb") / (col("na") * col("nb")), 6))
          .filter(col("cosine") >= minCosine)
          .select("a", "b", "cosine")
      }
    val g = PropertyGraph(
      pairs.select(col("a").as("src"), col("b").as("dst"), lit(1.0).as("weight")),
      directed = false,
      Some(vectors.select(col(id).as("id"))))
    val cc = ConnectedComponents.run(g) // (id, component)
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("group_size"))
    cc.join(sizes, "component")
      .select(col("id").as(id), col("component").as("group"),
        col("group_size"),
        (col("id") === col("component")).cast("long").as("is_canonical"))
  }
}
