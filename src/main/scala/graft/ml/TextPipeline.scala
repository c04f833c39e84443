package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond dedup (builder brief §ML):
  * repetition-based quality signals, deterministic stratified sampling
  * for mix building, and benchmark decontamination. All are one or two
  * keyed shuffles — no crossJoin, no driver loops — and every signal is
  * md5/count-based so the queries hash-match a DuckDB oracle.
  */
object TextPipeline {

  /** Word n-grams of a token-array column named `toksCol`, joined by
    * single spaces — the codegen'd (no UDF) sliding window. */
  def ngrams(toksCol: String, n: Int): Column = expr(
    s"""transform(slice($toksCol, 1, greatest(size($toksCol) - ${n - 1}, 0)),
       |  (x, i) -> array_join(slice($toksCol, i + 1, $n), ' '))""".stripMargin)

  /** Repetition signals per document (the Gopher/MassiveText repetition
    * filters re-expressed on a token stream), emitted as INTEGER counts
    * so the contract is engine-invariant (no cross-engine `round(double)`
    * tie fragility): total tokens, the count of the single most frequent
    * word, and total/distinct n-gram counts for n = 2, 3. Fractions
    * (top-word fraction, duplicate-n-gram fraction 1 − dₙ/nₙ) derive
    * deterministically via [[repetitionFractions]]. One groupBy(doc)
    * over map-side-exploded n-grams — scales linearly in corpus size. */
  def repetitionStats(df: DataFrame, id: String, text: String): DataFrame = {
    val base = df.select(col(id), Dedup.tokens(col(text)).as("toks"))
      .select(col(id), col("toks"),
        ngrams("toks", 2).as("g2"), ngrams("toks", 3).as("g3"))
    val words = base.select(col(id), explode(col("toks")).as("tok"))
      .groupBy(id, "tok").agg(count(lit(1)).as("c"))
      .groupBy(id).agg(
        sum("c").as("n_tokens"),
        max("c").as("top_word"))
    val dup = base.select(col(id),
      size(col("g2")).cast("long").as("n2"),
      size(array_distinct(col("g2"))).cast("long").as("d2"),
      size(col("g3")).cast("long").as("n3"),
      size(array_distinct(col("g3"))).cast("long").as("d3"))
    words.join(dup, id).select(
      col(id), col("n_tokens"), col("top_word"),
      col("n2"), col("d2"), col("n3"), col("d3"))
  }

  /** Ratio view over [[repetitionStats]]'s counts — for filtering
    * pipelines that want the Gopher-style fractions directly. Plain
    * IEEE double division (no rounding), so equal counts give equal
    * fractions on every engine. */
  def repetitionFractions(stats: DataFrame, id: String): DataFrame =
    stats.select(
      col(id),
      col("n_tokens"),
      (col("top_word") / col("n_tokens")).as("top_word_frac"),
      when(col("n2") > 0, (col("n2") - col("d2")) / col("n2").cast("double"))
        .otherwise(0.0).as("dup_2gram_frac"),
      when(col("n3") > 0, (col("n3") - col("d3")) / col("n3").cast("double"))
        .otherwise(0.0).as("dup_3gram_frac"))

  /** Deterministic stratified sample: within each stratum (the given
    * key columns) keep the `ceil(frac · |stratum|)` rows with the
    * smallest `md5(salt ‖ id)` — a seedable, engine-agnostic order, so
    * the SAME rows come back on every engine and every rerun (the
    * property a training-mix builder needs for reproducibility).
    * The window is PARTITIONED by the stratum — no global sort, the
    * rank shuffle is one exchange keyed by stratum. */
  def stratifiedSample(df: DataFrame, id: String, strata: Seq[String],
      frac: Double, salt: String = "s"): DataFrame = {
    val key = md5(concat(lit(salt), col(id).cast("string")))
    val w = Window.partitionBy(strata.map(col): _*).orderBy(key, col(id))
    val n = Window.partitionBy(strata.map(col): _*)
    df.withColumn("rk", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(n))
      .filter(col("rk") <= ceil(col("n_stratum") * frac))
      .drop("rk", "n_stratum")
  }

  /** Benchmark decontamination: flag documents sharing any n-gram with
    * a blocklist table (one column `ngram`). The blocklist — an
    * evaluation set's shingles — is small by construction, so the match
    * is a broadcast semi-join against map-side-exploded document
    * n-grams; returns `(id, is_contaminated)` for every input row. */
  def decontaminate(df: DataFrame, id: String, text: String,
      blocklist: DataFrame, n: Int = 3): DataFrame = {
    val sh = df.select(col(id), Dedup.tokens(col(text)).as("toks"))
      .select(col(id), explode(ngrams("toks", n)).as("ngram"))
    val hit = sh.join(broadcast(blocklist.select(col("ngram"))), Seq("ngram"),
      "left_semi").select(col(id)).distinct()
    df.select(col(id))
      .join(hit.withColumn("is_contaminated", lit(1L)), Seq(id), "left")
      .select(col(id), coalesce(col("is_contaminated"), lit(0L))
        .as("is_contaminated"))
  }
}
