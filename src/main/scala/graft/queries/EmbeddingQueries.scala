package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Dedup, Similarity}

/** Similarity-search surface over the `embeddings` table
  * (`vec_id LONG, embedding ARRAY<FLOAT>, label INT`): norms, centroids,
  * brute-force cosine top-k (the exact small-n oracle baseline), and the
  * registered scale path `e6_ann` — SRP-LSH bucketed approximate top-k
  * gated on recall + cosine agreement against the exact result.
  */
object EmbeddingQueries {
  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val defs: Map[String, Q] = Map(
    // L2 norms
    "e1_norm" -> ((s, dir) =>
      emb(s, dir)
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .select(col("vec_id"), round(Similarity.normExpr("v"), 4).as("l2norm"))),

    // per-(label, dim) centroid
    "e2_centroid" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
        .agg(round(avg(col("x").cast("double")), 6).as("centroid"))),

    // brute-force cosine top-3 for query vectors (vec_id % 100 = 0)
    "e3_knn" -> ((s, dir) => {
      val all = emb(s, dir)
      Similarity.cosineTopK(all, all.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 3)
    }),

    // embedding near-dup pairs (cosine ≥ 0.35)
    "e4_pairs" -> ((s, dir) =>
      Similarity.cosinePairs(emb(s, dir), "vec_id", "embedding", 0.35)),

    // ANN (SRP-LSH, multi-probe) — the registered scale path for
    // similarity search. Two deterministic gates the oracle pins:
    // every ANN cosine must equal the exact brute-force cosine for the
    // same (q, id) pair, and ANN recall@k must not lose to a hash-random
    // candidate set of the same expected coverage (SRP buckets correlate
    // with angle; random buckets don't — the non-tautological check that
    // the hyperplane bucketing does real work).
    "e6_ann" -> ((s, dir) => {
      val all = emb(s, dir)
      val queries = all.filter(col("vec_id") % 20 === 0)
      val k = 3
      val nQ = queries.count()
      // nBits pinned to 8: the random baseline below is calibrated to
      // 9 multi-probe buckets of 2^8 (auto-sizing would shrink the
      // bucket space at this test scale and unbalance the comparison)
      val ann = Similarity.annTopK(all, queries, "vec_id", "embedding", k,
          nBits = 8)
        .persist()
      val exact = Similarity.cosineTopK(all, queries, "vec_id", "embedding", k)
        .persist()
      val hits = ann.select(col("q"), col("id"), col("cosine").as("annCos"))
        .join(exact.select(col("q"), col("id"), col("cosine").as("exCos")),
          Seq("q", "id")).persist()
      val cosMismatch = hits.filter(col("annCos") =!= col("exCos")).count()
      val annRecall = hits.count().toDouble / (k * nQ)
      // random baseline: same expected candidate fraction as 9 multi-probe
      // buckets of 2^8 (≈ 9/256), chosen by a seeded hash per (q, id)
      val frac = 9.0 / 256.0
      val qv = queries.select(col("vec_id").as("q"))
      val randCand = qv.crossJoin(all.select(col("vec_id").as("id")))
        .filter(col("q") =!= col("id"))
        .filter(pmod(xxhash64(lit(7L), col("q"), col("id")), lit(10000L))
          < (frac * 10000).toLong)
      val randHits = randCand
        .join(exact.select(col("q"), col("id")), Seq("q", "id"), "left_semi")
        .count()
      val randRecall = randHits.toDouble / (k * nQ)
      val recallOk = if (annRecall >= randRecall - 1e-9) 1L else 0L
      ann.unpersist(false); exact.unpersist(false); hits.unpersist(false)
      queries.agg(count(lit(1)).as("n_queries")).select(
        col("n_queries"), lit(k.toLong).as("k"),
        lit(recallOk).as("recall_beats_random"),
        lit(cosMismatch).as("cosine_mismatches"))
    }),

    // IVF ANN — k-means coarse quantizer + nProbe cell search (the
    // Faiss-IVF-style scale path). Gates mirror e6_ann: every IVF cosine
    // must equal the exact brute-force cosine for that pair, and IVF
    // recall@k must beat a hash-random candidate set of the same expected
    // coverage (nProbe/nLists of the corpus) — the non-tautological check
    // that the learned cells correlate with angle.
    "e7_ivf" -> ((s, dir) => {
      val all = emb(s, dir)
      val queries = all.filter(col("vec_id") % 20 === 0)
      val k = 3
      val nLists = 16
      val nProbe = 4
      val nQ = queries.count()
      val ivf = Similarity.ivfTopK(all, queries, "vec_id", "embedding", k,
        nLists, nProbe, iters = 2).persist()
      val exact = Similarity.cosineTopK(all, queries, "vec_id", "embedding", k)
        .persist()
      val hits = ivf.select(col("q"), col("id"), col("cosine").as("ivfCos"))
        .join(exact.select(col("q"), col("id"), col("cosine").as("exCos")),
          Seq("q", "id")).persist()
      val cosMismatch = hits.filter(col("ivfCos") =!= col("exCos")).count()
      val ivfRecall = hits.count().toDouble / (k * nQ)
      val frac = nProbe.toDouble / nLists
      val qv = queries.select(col("vec_id").as("q"))
      val randCand = qv.crossJoin(all.select(col("vec_id").as("id")))
        .filter(col("q") =!= col("id"))
        .filter(pmod(xxhash64(lit(11L), col("q"), col("id")), lit(10000L))
          < (frac * 10000).toLong)
      val randHits = randCand
        .join(exact.select(col("q"), col("id")), Seq("q", "id"), "left_semi")
        .count()
      val randRecall = randHits.toDouble / (k * nQ)
      val recallOk = if (ivfRecall >= randRecall - 1e-9) 1L else 0L
      ivf.unpersist(false); exact.unpersist(false); hits.unpersist(false)
      queries.agg(count(lit(1)).as("n_queries")).select(
        col("n_queries"), lit(k.toLong).as("k"),
        lit(recallOk).as("recall_beats_random"),
        lit(cosMismatch).as("cosine_mismatches"))
    }),

    // label-level stats on norms
    // embedding-cosine near-dup DEDUP GROUPS: connected components of
    // the cosine >= 0.4 similarity graph, canonical = min id per group
    // (the dedup keep-rule). The oracle replicates the grouping with a
    // recursive-CTE min-label closure over the identically-rounded pair
    // set. Hard Spark-side gate: the SRP-LSH bucketed scale path's
    // groups must REFINE the exact groups (bucketed candidates pass the
    // same exact cosine test, so its pair set is a subset — any LSH
    // group spanning two exact groups would prove the candidate join
    // admitted a false pair)
    "e8_embdedup" -> ((s, dir) => {
      val all = emb(s, dir)
      val exact = Dedup.embeddingNearDup(all, "vec_id", "embedding",
        minCosine = 0.4, exact = true).localCheckpoint(true)
      val lsh = Dedup.embeddingNearDup(all, "vec_id", "embedding",
        minCosine = 0.4, exact = false, nBits = 6)
      val violations = lsh.select(col("vec_id"), col("group").as("lg"))
        .join(exact.select(col("vec_id"), col("group").as("eg")), "vec_id")
        .groupBy("lg").agg(countDistinct("eg").as("n"))
        .filter(col("n") > 1).count()
      require(violations == 0,
        "LSH near-dup groups must refine the exact groups")
      exact.select(col("vec_id"), col("group").as("grp"),
        col("group_size"), col("is_canonical"))
    }),

    // product quantization ADC top-k (the Faiss-PQ compression step:
    // m sub-space codebooks, candidates scored by LUT sums — O(m) per
    // pair instead of O(d)). Scores are approximations by design, so
    // the gates are rank-level: recall@k against the exact brute force
    // must beat a hash-random top-k of the same size, and every ADC
    // score must stay within the unit-cosine envelope (+ quantization
    // slack) — both computed Spark-side, constants-row oracle like e7
    "e9_pq" -> ((s, dir) => {
      val all = emb(s, dir)
      val queries = all.filter(col("vec_id") % 20 === 0)
      val k = 3
      val nQ = queries.count()
      val pq = Similarity.pqTopK(all, queries, "vec_id", "embedding", k,
        m = 4, ksub = 16, iters = 2).persist()
      require(pq.filter(abs(col("score")) > 1.05).isEmpty,
        "ADC scores must stay within the unit-cosine envelope")
      val exact = Similarity.cosineTopK(all, queries, "vec_id", "embedding", k)
        .persist()
      val pqRecall = pq.select("q", "id")
        .join(exact.select("q", "id"), Seq("q", "id"), "left_semi")
        .count().toDouble / (k * nQ)
      // random baseline: k hash-picked candidates per query
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("q")
        .orderBy(xxhash64(lit(13L), col("q"), col("id")).asc)
      val randTop = queries.select(col("vec_id").as("q"))
        .crossJoin(all.select(col("vec_id").as("id")))
        .filter(col("q") =!= col("id"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= k)
      val randRecall = randTop.select("q", "id")
        .join(exact.select("q", "id"), Seq("q", "id"), "left_semi")
        .count().toDouble / (k * nQ)
      val recallOk = if (pqRecall > randRecall + 1e-9) 1L else 0L
      pq.unpersist(false); exact.unpersist(false)
      queries.agg(count(lit(1)).as("n_queries")).select(
        col("n_queries"), lit(k.toLong).as("k"),
        lit(recallOk).as("recall_beats_random"))
    }),

    "e5_labelstats" -> ((s, dir) =>
      emb(s, dir)
        .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        .withColumn("nrm", Similarity.normExpr("v"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("nrm"), 6).as("avg_norm"),
          round(min("nrm"), 6).as("min_norm"),
          round(max("nrm"), 6).as("max_norm")))
  )

  /** DuckDB: `embedding::DOUBLE[]` + explicit per-index products, summed
    * left-to-right — same op order as Spark's `aggregate(zip_with(…))`. */
  private val vecCte =
    """v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v, len(embedding) AS d FROM embeddings),
      |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM v)""".stripMargin

  val oracles: Map[String, String] = Map(
    "e1_norm" ->
      s"""WITH $vecCte
         |SELECT vec_id, round(nrm, 4) AS l2norm FROM n""".stripMargin,
    "e2_centroid" ->
      """WITH x AS (SELECT label, unnest(range(1, len(embedding)+1)) AS dim,
        |           unnest(embedding::DOUBLE[]) AS x FROM embeddings)
        |SELECT label, dim, round(avg(x), 6) AS centroid FROM x GROUP BY label, dim""".stripMargin,
    "e3_knn" ->
      s"""WITH $vecCte,
         |q AS (SELECT vec_id AS q, v AS qv, nrm AS nq FROM n WHERE vec_id % 100 = 0),
         |scored AS (SELECT q.q, n.vec_id AS id,
         |  round(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*n.v[i])) / (q.nq*n.nrm), 6) AS cosine
         |  FROM q JOIN n ON q.q <> n.vec_id),
         |ranked AS (SELECT q, id, cosine,
         |  row_number() OVER (PARTITION BY q ORDER BY cosine DESC, id ASC) AS rank FROM scored)
         |SELECT q, id, cosine, rank FROM ranked WHERE rank <= 3""".stripMargin,
    "e6_ann" ->
      """SELECT count(*) AS n_queries, 3::BIGINT AS k,
        | 1::BIGINT AS recall_beats_random, 0::BIGINT AS cosine_mismatches
        |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin,
    "e7_ivf" ->
      """SELECT count(*) AS n_queries, 3::BIGINT AS k,
        | 1::BIGINT AS recall_beats_random, 0::BIGINT AS cosine_mismatches
        |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin,
    "e9_pq" ->
      """SELECT count(*) AS n_queries, 3::BIGINT AS k,
        | 1::BIGINT AS recall_beats_random
        |FROM embeddings WHERE vec_id % 20 = 0""".stripMargin,
    "e4_pairs" ->
      s"""WITH $vecCte
         |SELECT a.vec_id AS a, b.vec_id AS b,
         |  round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) / (a.nrm*b.nrm), 6) AS cosine
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) / (a.nrm*b.nrm), 6) >= 0.35""".stripMargin,
    "e8_embdedup" ->
      s"""WITH RECURSIVE $vecCte,
         |pairs AS (SELECT a.vec_id AS ps, b.vec_id AS pt
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id
         |  WHERE round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])) / (a.nrm*b.nrm), 6) >= 0.4),
         |bidir AS (SELECT ps, pt FROM pairs UNION ALL SELECT pt, ps FROM pairs),
         |reach(id, r) AS (SELECT vec_id, vec_id FROM v
         |  UNION SELECT reach.id, s2.pt FROM reach JOIN bidir s2 ON s2.ps = reach.r),
         |grps AS (SELECT id, min(r) AS grp FROM reach GROUP BY id),
         |sz AS (SELECT grp, count(*) AS group_size FROM grps GROUP BY grp)
         |SELECT g.id AS vec_id, g.grp, sz.group_size,
         |  (CASE WHEN g.id = g.grp THEN 1 ELSE 0 END)::BIGINT AS is_canonical
         |FROM grps g JOIN sz USING (grp)""".stripMargin,
    "e5_labelstats" ->
      s"""WITH $vecCte
         |SELECT label, count(*) AS n, round(avg(nrm), 6) AS avg_norm,
         | round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
         |FROM n GROUP BY label""".stripMargin
  )
}
