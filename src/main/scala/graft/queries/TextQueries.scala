package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.{Dedup, TextPipeline}

/** Text-analysis / dedup surface for training-data pipelines (builder
  * brief: dedup, language-ID, quality scoring, token counting,
  * fingerprinting) over the `documents` table. All md5-based so each
  * query hash-matches a DuckDB oracle.
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", Dedup.tokens(col("text")))

  /** lang marker word sets for the heuristic language-ID. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "order", "table"),
    "de" -> Seq("customer", "hash", "merge"),
    "es" -> Seq("slow", "agg", "sort"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "row"))

  val defs: Map[String, Q] = Map(
    // token counting + type-token ratio
    "t1_tokens" -> ((s, dir) =>
      withToks(docs(s, dir))
        .withColumn("tok", explode(col("toks")))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct"),
          round(avg(length(col("tok"))), 4).as("avg_tok_len"),
          round(countDistinct(col("tok")) / count(lit(1)), 6).as("ttr"))),

    // quality scoring: composite of length, diversity, marker ratio
    "t2_quality" -> ((s, dir) =>
      withToks(docs(s, dir))
        .withColumn("tok", explode(col("toks")))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct"),
          sum(when(col("tok").isin("the", "a"), 1).otherwise(0)).as("n_stop"))
        .select(col("doc_id"),
          round(
            lit(0.5) * least(col("n_tokens") / 100.0, lit(1.0)) +
            lit(0.3) * (col("n_distinct") / col("n_tokens")) +
            lit(0.2) * (lit(1.0) - col("n_stop") / col("n_tokens")), 6).as("quality"))),

    // heuristic language-ID (marker-set argmax, fixed tie-break order)
    "t3_langid" -> ((s, dir) => {
      val aggs = markers.map { case (l, ws) =>
        sum(when(col("tok").isin(ws: _*), 1).otherwise(0)).as(s"c_$l")
      }
      val counted = withToks(docs(s, dir))
        .withColumn("tok", explode(col("toks")))
        .groupBy("doc_id", "lang")
        .agg(aggs.head, aggs.tail: _*)
      val Seq(en, de, es, fr, zh) = markers.map(m => col(s"c_${m._1}"))
      val pred = when(en >= de && en >= es && en >= fr && en >= zh, "en")
        .when(de >= es && de >= fr && de >= zh, "de")
        .when(es >= fr && es >= zh, "es")
        .when(fr >= zh, "fr")
        .otherwise("zh")
      counted.select(col("doc_id"), pred.as("lang_pred"),
        (pred === col("lang")).cast("int").as("is_match"))
    }),

    // document fingerprints: raw + bag-of-words-normalized
    "t4_fingerprint" -> ((s, dir) =>
      withToks(docs(s, dir)).select(
        col("doc_id"),
        md5(col("text")).as("fp_raw"),
        md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fp_bag"))),

    // MinHash signatures (8 hashes over 3-word shingles)
    "t5_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", k = 8)),

    // LSH banding stats (4 bands × 2 rows)
    "t6_lshstats" -> ((s, dir) => {
      val sig = Dedup.minhashSignatures(docs(s, dir), "doc_id", "text", k = 8)
      val buckets = Dedup.lshBuckets(sig, "doc_id", bands = 4, rowsPerBand = 2)
      buckets.groupBy("band", "bucket").agg(count(lit(1)).as("c"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_buckets"), max("c").as("max_bucket"))
    }),

    // exact n-gram Jaccard near-dup pairs — hashed on the integer
    // intersection/union counts (threshold compares the raw IEEE double,
    // identical on every engine; round(double) ties are not)
    "t7_ngramjaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.03)
        .select(col("a"), col("b"), col("n_inter"), col("n_union"))),

    // 16-bit SimHash per document
    "t8_simhash" -> ((s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", "text")),

    // exact-dedup summary
    "t9_exactdedup" -> ((s, dir) =>
      Dedup.exactStats(docs(s, dir), "text")),

    // Gopher-style repetition signals (top-word fraction, duplicate
    // 2-/3-gram fractions)
    "t10_repetition" -> ((s, dir) =>
      TextPipeline.repetitionStats(docs(s, dir), "doc_id", "text")),

    // deterministic stratified 20 % sample per (lang, source) — the
    // training-mix builder's reproducible subset
    "t11_sample" -> ((s, dir) =>
      TextPipeline.stratifiedSample(docs(s, dir), "doc_id",
        Seq("lang", "source"), frac = 0.2)
        .select("doc_id", "lang", "source")),

    // character n-gram near-dup pairs (sub-word dedup, robust to word
    // reordering — complements t7's word shingles)
    "t13_chargram" -> ((s, dir) =>
      Dedup.charNgramJaccardPairs(docs(s, dir), "doc_id", "text",
        n = 8, minJaccard = 0.12, maxGramDf = 100)
        .select(col("a"), col("b"), col("n_inter"), col("n_union"))),

    // benchmark decontamination: the 5 globally most document-frequent
    // 3-grams stand in for an eval set's shingles; every document
    // containing one is flagged
    "t12_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      val sh = d.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(TextPipeline.ngrams("toks", 3)).as("ngram"))
        .distinct()
      val block = sh.groupBy("ngram").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("ngram")).limit(5).select("ngram")
      TextPipeline.decontaminate(d, "doc_id", "text", block)
    })
  )

  private val tokCte =
    raw"""t AS (SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
         |     FROM documents)""".stripMargin

  private val shingleCte =
    raw"""toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
         |sh0 AS (SELECT doc_id, unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l)-1)]) AS sh
         |        FROM toks WHERE len(l) >= 3),
         |sh AS (SELECT DISTINCT doc_id, sh FROM sh0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t1_tokens" ->
      s"""WITH $tokCte
         |SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
         | round(avg(length(tok)), 4) AS avg_tok_len,
         | round(count(DISTINCT tok)*1.0/count(*), 6) AS ttr
         |FROM t GROUP BY doc_id""".stripMargin,
    "t2_quality" ->
      s"""WITH $tokCte,
         |g AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
         |      sum(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) AS n_stop
         |      FROM t GROUP BY doc_id)
         |SELECT doc_id, round(
         |  0.5*least(n_tokens/100.0, 1.0) + 0.3*(n_distinct*1.0/n_tokens) +
         |  0.2*(1.0 - n_stop*1.0/n_tokens), 6) AS quality FROM g""".stripMargin,
    "t3_langid" -> {
      val cnts = markers.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"sum(CASE WHEN tok IN ($set) THEN 1 ELSE 0 END) AS c_$l"
      }.mkString(",\n ")
      s"""WITH $tokCte,
         |g AS (SELECT doc_id, lang, $cnts FROM t GROUP BY doc_id, lang),
         |p AS (SELECT doc_id, lang, CASE
         |  WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
         |  WHEN c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
         |  WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
         |  WHEN c_fr >= c_zh THEN 'fr' ELSE 'zh' END AS lang_pred FROM g)
         |SELECT doc_id, lang_pred, CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS is_match
         |FROM p""".stripMargin
    },
    "t4_fingerprint" ->
      raw"""SELECT doc_id, md5(text) AS fp_raw,
           | md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')) AS fp_bag
           |FROM documents""".stripMargin,
    "t5_minhash" -> {
      val mins = (0 until 8).map(i => s"min(md5(concat('$i', sh))) AS mh$i").mkString(",\n ")
      s"""WITH $shingleCte
         |SELECT doc_id, $mins FROM sh GROUP BY doc_id""".stripMargin
    },
    "t6_lshstats" -> {
      val mins = (0 until 8).map(i => s"min(md5(concat('$i', sh))) AS mh$i").mkString(",\n ")
      val bandsSel = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, md5(concat(mh${2 * b}, mh${2 * b + 1})) AS bucket FROM mh")
        .mkString("\n UNION ALL ")
      s"""WITH $shingleCte,
         |mh AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
         |bands AS ($bandsSel),
         |bc AS (SELECT band, bucket, count(*) AS c FROM bands GROUP BY band, bucket)
         |SELECT band, count(*) AS n_buckets, max(c) AS max_bucket FROM bc GROUP BY band""".stripMargin
    },
    "t7_ngramjaccard" ->
      s"""WITH $shingleCte,
         |rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100),
         |shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)),
         |cnt AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |          FROM shf x JOIN shf y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |          GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b, c AS n_inter, na.n + nb.n - c AS n_union
         |FROM inter JOIN cnt na ON na.doc_id = a JOIN cnt nb ON nb.doc_id = b
         |WHERE c*1.0/(na.n + nb.n - c) >= 0.03""".stripMargin,
    "t8_simhash" -> {
      val bitSums = (0 until 16).map(b =>
        s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b").mkString(",\n ")
      val hashSum = (0 until 16).map(b =>
        s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
      s"""WITH $tokCte,
         |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::INT AS h FROM t),
         |g AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
         |SELECT doc_id, ($hashSum)::BIGINT AS simhash FROM g""".stripMargin
    },
    "t9_exactdedup" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct,
        | count(*) - count(DISTINCT md5(text)) AS n_dup FROM documents""".stripMargin,
    // integer counts only — engine-invariant by construction (the r7
    // red row was a cross-engine round(double) half-ulp tie; fractions
    // now derive client-side via TextPipeline.repetitionFractions)
    "t10_repetition" ->
      raw"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
           |             FROM documents),
           |w AS (SELECT doc_id, unnest(l) AS tok FROM toks),
           |wc AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY doc_id, tok),
           |wg AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens, max(c) AS top_word
           |       FROM wc GROUP BY doc_id),
           |gs AS (SELECT doc_id,
           |  [array_to_string(l[i:i+1], ' ') for i in range(1, len(l))] AS g2,
           |  [array_to_string(l[i:i+2], ' ') for i in range(1, len(l)-1)] AS g3
           |  FROM toks),
           |d AS (SELECT doc_id, len(g2)::BIGINT AS n2, len(list_distinct(g2))::BIGINT AS d2,
           |             len(g3)::BIGINT AS n3, len(list_distinct(g3))::BIGINT AS d3 FROM gs)
           |SELECT wg.doc_id, n_tokens, top_word, n2, d2, n3, d3
           |FROM wg JOIN d ON wg.doc_id = d.doc_id""".stripMargin,
    "t11_sample" ->
      """WITH r AS (SELECT doc_id, lang, source,
        |  row_number() OVER (PARTITION BY lang, source
        |    ORDER BY md5(concat('s', cast(doc_id AS VARCHAR))), doc_id) AS rk,
        |  count(*) OVER (PARTITION BY lang, source) AS n
        |  FROM documents)
        |SELECT doc_id, lang, source FROM r WHERE rk <= ceil(n * 0.2)""".stripMargin,
    "t13_chargram" ->
      raw"""WITH g0 AS (SELECT doc_id, trim(text) AS t FROM documents),
           |sh0 AS (SELECT doc_id,
           |    unnest(list_distinct(CASE WHEN length(t) < 8 THEN []
           |      ELSE [substr(t, i, 8) for i in range(1, length(t) - 6)] END)) AS sh
           |  FROM g0),
           |rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 100),
           |shf AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN rare USING (sh)),
           |cnt AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
           |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
           |          FROM shf x JOIN shf y ON x.sh = y.sh AND x.doc_id < y.doc_id
           |          GROUP BY x.doc_id, y.doc_id)
           |SELECT a, b, c AS n_inter, na.n + nb.n - c AS n_union
           |FROM inter JOIN cnt na ON na.doc_id = a JOIN cnt nb ON nb.doc_id = b
           |WHERE c*1.0/(na.n + nb.n - c) >= 0.12""".stripMargin,
    "t12_decontam" ->
      s"""WITH $shingleCte,
         |block AS (SELECT sh FROM sh GROUP BY sh
         |          ORDER BY count(*) DESC, sh LIMIT 5),
         |hit AS (SELECT DISTINCT s.doc_id FROM sh s JOIN block USING (sh))
         |SELECT d.doc_id,
         |  CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END::BIGINT AS is_contaminated
         |FROM documents d LEFT JOIN hit h ON h.doc_id = d.doc_id""".stripMargin
  )
}
