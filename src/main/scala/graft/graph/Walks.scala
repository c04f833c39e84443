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
}
