package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph generators (reference: `include/networkit/generators/`,
  * SURVEY.md §2.9): `spark.range`-based, embarrassingly parallel, with
  * ALL randomness derived from `xxhash64(seed, index)` so the same seed
  * yields the same graph under any partitioning or cluster size
  * (SURVEY.md §4.2.3 — `rand()` is NOT reproducible across
  * repartitioning; hashing the row index is).
  */
object Generators {

  /** uniform [0,1) from a hashed key — deterministic per (seed, keys) */
  private def u01(seed: Long, keys: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    (pmod(xxhash64(lit(seed) +: keys: _*), lit(1L << 40)) / lit((1L << 40).toDouble))

  /** Erdős–Rényi G(n, p) (reference `ErdosRenyiGenerator.hpp:20`):
    * Bernoulli coin per unordered pair, pair index decoded from a flat
    * range — n(n-1)/2 candidate rows scanned in parallel, no shuffle.
    * (The reference's skip-sampling enumeration is an equivalent
    * perf trick; at cluster scale the flat scan parallelizes better.) */
  def erdosRenyi(spark: SparkSession, n: Long, p: Double, seed: Long = 42): PropertyGraph = {
    val pairs = spark.range(n * (n - 1) / 2)
      // decode pair index -> (u, v): u = floor((1+sqrt(1+8k))/2), v = k - u(u-1)/2
      .withColumn("u", floor((lit(1.0) + sqrt(lit(1.0) + lit(8.0) * col("id"))) / 2.0).cast("long"))
      .withColumn("v", (col("id") - col("u") * (col("u") - 1) / 2).cast("long"))
    val edges = pairs
      .filter(u01(seed, col("u"), col("v")) < p)
      .select(col("v").as("src"), col("u").as("dst"), lit(1.0).as("weight"))
    PropertyGraph(edges, directed = false,
      Some(spark.range(n).select(col("id"))))
  }

  /** R-MAT (reference `RmatGenerator.hpp:25`): per-edge recursive
    * quadrant choice, all `scale` levels unrolled as column expressions
    * — one narrow projection, no shuffle, no driver loop. */
  def rmat(spark: SparkSession, scale: Int, edgeFactor: Int,
      a: Double = 0.57, b: Double = 0.19, c: Double = 0.19,
      seed: Long = 42): PropertyGraph = {
    val n = 1L << scale
    val m = n * edgeFactor
    var df = spark.range(m).select(col("id").as("e"),
      lit(0L).as("src"), lit(0L).as("dst"))
    for (level <- 0 until scale) {
      val r = u01(seed + level, col("e"))
      df = df.select(
        col("e"),
        (col("src") * 2 + when(r >= a + b, 1L).otherwise(0L)).as("src"),
        (col("dst") * 2 + when((r >= a && r < a + b) || r >= a + b + c, 1L).otherwise(0L)).as("dst"))
    }
    PropertyGraph(
      df.select(col("src"), col("dst"), lit(1.0).as("weight")),
      directed = true, Some(spark.range(n).select(col("id"))))
  }

  /** Watts–Strogatz small world (reference
    * `WattsStrogatzGenerator.hpp:17`): ring lattice with k/2 right
    * neighbors, each endpoint rewired with probability β to a hashed
    * random target. */
  def wattsStrogatz(spark: SparkSession, n: Long, k: Int, beta: Double,
      seed: Long = 42): PropertyGraph = {
    val ring = spark.range(n)
      .select(col("id").as("src"), explode(
        array((1 to k / 2).map(lit(_)): _*)).as("off"))
      .select(col("src"), pmod(col("src") + col("off"), lit(n)).as("dst"), col("off"))
    val rewired = ring.select(
      col("src"),
      when(u01(seed, col("src"), col("off")) < beta,
        pmod(xxhash64(lit(seed + 1), col("src"), col("off")), lit(n)))
        .otherwise(col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    PropertyGraph(
      PropertyGraph.canonicalizeUndirected(
        rewired.withColumn("weight", lit(1.0)))
        .withColumn("weight", lit(1.0)),
      directed = false, Some(spark.range(n).select(col("id"))))
  }

  /** Chung–Lu with power-law expected degrees (reference
    * `ChungLuGenerator.hpp:32`, `PowerlawDegreeSequence.hpp:12`):
    * w_i = (n/(i+1))^(1/(γ-1)), P(i~j) ≈ w_i w_j / Σw capped at 1.
    * Exact pairwise sampling (n² scan) — fine to ~10⁵ nodes; beyond
    * that use degree-bucket blocking (same math, bucketed join). */
  def chungLuPowerlaw(spark: SparkSession, n: Long, gamma: Double = 2.5,
      avgDegreeScale: Double = 1.0, seed: Long = 42): PropertyGraph = {
    val w = spark.range(n).select(col("id"),
      (pow(lit(n.toDouble) / (col("id") + 1), 1.0 / (gamma - 1.0)) * avgDegreeScale).as("w"))
    val totalW = w.agg(sum("w")).head.getDouble(0)
    val pairs = spark.range(n * (n - 1) / 2)
      .withColumn("u", floor((lit(1.0) + sqrt(lit(1.0) + lit(8.0) * col("id"))) / 2.0).cast("long"))
      .withColumn("v", (col("id") - col("u") * (col("u") - 1) / 2).cast("long"))
      .select(col("u"), col("v"))
    val edges = pairs
      .join(w.select(col("id").as("u"), col("w").as("wu")), "u")
      .join(w.select(col("id").as("v"), col("w").as("wv")), "v")
      .filter(u01(seed, col("u"), col("v")) < least(col("wu") * col("wv") / totalW, lit(1.0)))
      .select(col("v").as("src"), col("u").as("dst"), lit(1.0).as("weight"))
    PropertyGraph(edges, directed = false, Some(spark.range(n).select(col("id"))))
  }

  /** Barabási–Albert preferential attachment via the Batagelj–Brandes
    * trick (reference `BarabasiAlbertGenerator.hpp:19`): node t's i-th
    * edge endpoint is drawn uniformly from the first 2(t·k+i) cells of
    * the virtual edge-endpoint array; a uniform cell index is an
    * endpoint drawn ∝ degree. Cell decoding is pure column math — the
    * sequential process parallelizes away. */
  def barabasiAlbert(spark: SparkSession, n: Long, k: Int, seed: Long = 42): PropertyGraph = {
    // edge j = (t, i): t = j / k + 1 (nodes 1.. attach), i = j % k
    val edges = spark.range((n - 1) * k)
      .select(col("id").as("j"),
        (col("id") / k + 1).cast("long").as("t"),
        pmod(col("id"), lit(k.toLong)).as("i"))
      // uniform cell in [0, 2*j): even cell c/2 = source of edge c/2 -> its t; odd = target
      .withColumn("cell",
        pmod(xxhash64(lit(seed), col("j")), greatest(col("j") * 2, lit(1L))))
      .withColumn("dst",
        when(col("cell") % 2 === 0, (col("cell") / 2 / k + 1).cast("long"))
          .otherwise(lit(-1L))) // odd cell: resolved below against target array
      .select(col("t").as("src"), col("j"), col("cell"), col("dst"))
    // odd cells reference the TARGET of a previous edge, which is itself
    // recursive; approximate with one level of resolution (cells of edge
    // c2 = cell/2: take its source) — degree-proportional in expectation
    val resolved = edges.withColumn("dst",
      when(col("dst") >= 0, col("dst"))
        .otherwise((col("cell") / 2 / k + 1).cast("long")))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    PropertyGraph(PropertyGraph.canonicalizeUndirected(resolved), directed = false,
      Some(spark.range(n).select(col("id"))))
  }

  /** Stochastic block model (reference `StochasticBlockmodel.hpp:18`):
    * k blocks, intra-block probability pIn, inter pOut. */
  def stochasticBlockModel(spark: SparkSession, n: Long, k: Int,
      pIn: Double, pOut: Double, seed: Long = 42): PropertyGraph = {
    val pairs = spark.range(n * (n - 1) / 2)
      .withColumn("u", floor((lit(1.0) + sqrt(lit(1.0) + lit(8.0) * col("id"))) / 2.0).cast("long"))
      .withColumn("v", (col("id") - col("u") * (col("u") - 1) / 2).cast("long"))
    val edges = pairs
      .withColumn("p",
        when(pmod(col("u"), lit(k.toLong)) === pmod(col("v"), lit(k.toLong)), pIn)
          .otherwise(pOut))
      .filter(u01(seed, col("u"), col("v")) < col("p"))
      .select(col("v").as("src"), col("u").as("dst"), lit(1.0).as("weight"))
    PropertyGraph(edges, directed = false, Some(spark.range(n).select(col("id"))))
  }

  /** Synthetic clustering generators (reference
    * `ClusteringGenerator.hpp:20`): one-block / singleton / hashed
    * random k-partition of a graph's vertices. */
  def clusteringOne(g: PropertyGraph): DataFrame =
    g.vertices.select(col("id"), lit(0L).as("community"))
  def clusteringSingleton(g: PropertyGraph): DataFrame =
    g.vertices.select(col("id"), col("id").as("community"))
  def clusteringRandom(g: PropertyGraph, k: Int, seed: Long = 42): DataFrame =
    g.vertices.select(col("id"),
      pmod(xxhash64(lit(seed), col("id")), lit(k.toLong)).as("community"))
}
