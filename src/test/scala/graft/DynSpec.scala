package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Incremental (Dyn*) operators: DynBFS insertions and warm-started
  * DynKatz must be recompute-equivalent.
  */
class DynSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("updateBfsInsert equals from-scratch BFS after re-inserting removed edges") {
    val removed = karate.edges.orderBy(xxhash64(col("src"), col("dst"))).limit(6)
      .select("src", "dst").localCheckpoint(true)
    val oldEdges = karate.edges.join(removed, Seq("src", "dst"), "left_anti")
    val gOld = PropertyGraph(oldEdges, directed = false, Some(karate.vertices))
    val sources = Seq(0L, 5L, 33L).toDF("source")
    val oldDist = ShortestPaths.bfs(gOld, sources)
    val updated = ShortestPaths.updateBfsInsert(karate, oldDist, removed)
    val scratch = ShortestPaths.bfs(karate, sources)
    assert(updated.except(scratch).isEmpty && scratch.except(updated).isEmpty)
  }

  test("updateBfsInsert connects a previously unreachable component") {
    val old = PropertyGraph.fromEdges(
      Seq((0L, 1L), (2L, 3L)).toDF("src", "dst"), directed = false)
    val newG = PropertyGraph.fromEdges(
      Seq((0L, 1L), (2L, 3L), (1L, 2L)).toDF("src", "dst"), directed = false)
    val dist0 = ShortestPaths.bfs(old, Seq(0L).toDF("source"))
    val upd = ShortestPaths.updateBfsInsert(newG, dist0,
      Seq((1L, 2L)).toDF("src", "dst"))
      .select("id", "dist").as[(Long, Long)].collect().toMap
    assert(upd == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("katz warm start lands on the cold-recompute fixpoint") {
    val removed = karate.edges.orderBy(xxhash64(col("dst"), col("src"))).limit(8)
      .select("src", "dst").localCheckpoint(true)
    val gOld = PropertyGraph(
      karate.edges.join(removed, Seq("src", "dst"), "left_anti"),
      directed = false, Some(karate.vertices))
    val warm = PageRank.katzFrom(karate, Some(PageRank.katz(gOld)))
    val cold = PageRank.katz(karate)
    val maxDiff = warm.select(col("id"), col("score").as("w"))
      .join(cold.select(col("id"), col("score").as("c")), "id")
      .agg(max(abs(col("w") - col("c")))).as[Double].head()
    assert(maxDiff <= 1e-6, s"maxDiff=$maxDiff")
  }
}
