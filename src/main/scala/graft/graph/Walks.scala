package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-walk generation + node embeddings (reference:
  * `embedding/Node2Vec.hpp:29` — biased walks + SGNS; SURVEY.md maps
  * the embedding half to MLlib Word2Vec over walk "sentences").
  *
  * Walk extension is one join per step: current head joins adjacency,
  * the next neighbor is picked by a deterministic hashed draw over the
  * head's neighbor list (uniform; the p/q bias reweights the same
  * draw). No driver loops over walks — all walks advance together.
  */
object Walks {

  /** `walksPerNode` walks of length `len` from every node:
    * `(walk_id, start, step, node)`. */
  def randomWalks(g: PropertyGraph, walksPerNode: Int = 2, len: Int = 8,
      seed: Long = 42): DataFrame = {
    val adj = g.adjacency.select("src", "dst").persist()
    // neighbor count per node for the uniform draw
    val degs = adj.groupBy("src").agg(count(lit(1)).as("deg"))
    val adjIdx = adj
      .withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("src").orderBy("dst")) - 1)
      .join(degs, "src")
      .persist()
    adjIdx.count()

    var walks = g.vertices
      .select(col("id").as("start"),
        explode(array((0 until walksPerNode).map(lit(_)): _*)).as("w"))
      .select(
        (col("start") * walksPerNode + col("w")).as("walk_id"),
        col("start"), lit(0).as("step"), col("start").as("node"))
      .localCheckpoint(true)
    var acc = walks
    for (step <- 1 until len) {
      // pick neighbor index = hash(seed, walk_id, step) mod deg
      val next = walks.join(adjIdx, walks("node") === adjIdx("src"))
        .filter(col("idx") === pmod(
          xxhash64(lit(seed), col("walk_id"), lit(step)), col("deg")))
        .select(col("walk_id"), col("start"), lit(step).as("step"),
          col("dst").as("node"))
        .localCheckpoint(true)
      acc = acc.unionAll(next).localCheckpoint(true)
      walks = next
    }
    adj.unpersist(false); adjIdx.unpersist(false)
    acc
  }

  /** Node2Vec-style embeddings: walks → sentences → MLlib Word2Vec
    * (reference `Node2Vec.hpp:29`; the SGNS training is exactly what
    * Word2Vec implements). `(id, vector ARRAY<FLOAT>)` */
  def node2vec(g: PropertyGraph, dim: Int = 16, walksPerNode: Int = 4,
      len: Int = 10, seed: Long = 42): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val sentences = randomWalks(g, walksPerNode, len, seed)
      .groupBy("walk_id")
      .agg(sort_array(collect_list(struct(col("step"), col("node")))).as("s"))
      .select(expr("transform(s, x -> cast(x.node as string))").as("sentence"))
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("sentence").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(0).setSeed(seed).setNumPartitions(4)
    val model = w2v.fit(sentences)
    model.getVectors
      .select(col("word").cast("long").as("id"),
        transform(org.apache.spark.ml.functions.vector_to_array(col("vector")),
          x => x.cast("float")).as("vector"))
  }

  /** K-path centrality (reference `centrality/KPathCentrality.cpp:34-100`,
    * Alahakoon et al.): `trials` self-avoiding random walks, each of
    * hashed length ℓ ∈ [1, k]; every visit increments the visited node's
    * counter; score(v) = k·n·visits(v)/trials. The reference draws
    * `t = 2k²·n^(1-2α)·ln n` trials (α the precision/runtime tradeoff);
    * pass `trials = 0` to use that default. All trials advance together —
    * one adjacency join per step, self-avoidance via the walk's path
    * array, next hop drawn by a hash lottery over the unvisited
    * neighbors — uniform on unweighted graphs, probability ∝ 1/weight on
    * weighted ones (matching the reference's inverse-weight sampling,
    * `KPathCentrality.cpp:73`), via an Efraimidis–Spirakis key
    * −ln(u)·weight with hash-derived u (reproducible under any
    * partitioning). `(id, score)` for every node. */
  /** The reference's sampling budget (`KPathCentrality.cpp:34-100`):
    * walk length k = ln(n+m) unless forced, trial count
    * t = 2k²·n^(1−2α)·ln n unless forced. Exposed so the x46 oracle can
    * re-derive the budget independently. */
  def kPathBudget(n: Long, m: Long, alpha: Double = 0.2, k: Int = 0,
      trials: Long = 0): (Int, Long) = {
    val kk = if (k > 0) k else math.max(1, math.log((n + m).toDouble).toInt)
    val t = if (trials > 0) trials
      else (2.0 * kk * kk * math.pow(n.toDouble, 1 - 2 * alpha) * math.log(n.toDouble)).toLong.max(1)
    (kk, t)
  }

  def kPathCentrality(g: PropertyGraph, alpha: Double = 0.2, k: Int = 0,
      trials: Long = 0, seed: Long = 42): DataFrame = {
    val spark = g.edges.sparkSession
    val adj = g.adjacency.filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(min("weight").as("weight")).persist()
    val n = g.vertices.count()
    val m = adj.count() / 2
    val (kk, t) = kPathBudget(n, m, alpha, k, trials)
    // trial i starts at a hash-uniform node with hashed length ∈ [1, k];
    // nodes are ranked 0..n-1 so every trial matches exactly one start
    val starts = Ranks.zipRank(g.vertices.select("id"), Seq(col("id")), "slot")
    val trialsDf = spark.range(t).select(col("id").as("trial"),
        pmod(xxhash64(lit(seed), lit(1L), col("id")), lit(n)).as("slot"),
        (pmod(xxhash64(lit(seed), lit(2L), col("id")), lit(kk.toLong)) + 1).as("len"))
      .join(starts, "slot")
      .select(col("trial"), col("len"), col("id").as("node"),
        array(col("id")).as("path"))
    var frontier = trialsDf.localCheckpoint(true)
    var visits = frontier.sparkSession.emptyDataFrame
      .select(lit(0L).as("node")).limit(0)
    for (step <- 1 to kk) {
      val cand = frontier.filter(col("len") >= step)
        .join(adj, frontier("node") === adj("src"))
        .filter(!array_contains(col("path"), col("dst")))
        // u ∈ (0,1] from the hash; key −ln(u)·weight picks dst with
        // probability ∝ 1/weight (weight ≡ 1 → uniform)
        .withColumn("u",
          (pmod(xxhash64(lit(seed), col("trial"), lit(step), col("dst")),
            lit(2147483647L)) + 1).cast("double") / 2147483648.0)
        .withColumn("lottery", -log(col("u")) * col("weight"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("trial").orderBy(col("lottery").asc, col("dst").asc)
      val next = cand.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("trial"), col("len"), col("dst").as("node"),
          array_append(col("path"), col("dst")).as("path"))
        .localCheckpoint(true)
      visits = visits.unionAll(next.select("node")).localCheckpoint(true)
      frontier = next
    }
    adj.unpersist(false)
    val counts = visits.groupBy("node").agg(count(lit(1)).as("c"))
    g.vertices.select(col("id"))
      .join(counts.withColumnRenamed("node", "id"), Seq("id"), "left")
      .select(col("id"),
        (lit(kk.toDouble * n) * coalesce(col("c"), lit(0L)) / t.toDouble).as("score"))
  }
}
