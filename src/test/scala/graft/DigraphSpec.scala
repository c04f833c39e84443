package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Directed-graph ops, walks, and DGS dynamics. */
class DigraphSpec extends SparkSpec {
  import spark.implicits._

  private def digraph(pairs: (Long, Long)*): PropertyGraph =
    PropertyGraph(pairs.toSeq.toDF("src", "dst")
      .withColumn("weight", lit(1.0)), directed = true)

  test("SCC: cycle + tail gives one 3-node component and singletons") {
    // 0→1→2→0 (cycle), 2→3→4 (tail)
    val g = digraph((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val scc = Digraph.stronglyConnectedComponents(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc(0L) == scc(1L) && scc(1L) == scc(2L))
    assert(scc(3L) != scc(0L) && scc(4L) != scc(3L))
  }

  test("topological sort: diamond DAG levels; cycle throws") {
    val dag = digraph((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val lv = Digraph.topologicalSort(dag).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv(0L) == 0 && lv(1L) == 1 && lv(2L) == 1 && lv(3L) == 2)
    val cyc = digraph((0L, 1L), (1L, 0L))
    intercept[IllegalArgumentException] { Digraph.topologicalSort(cyc) }
  }

  test("algebraic distance: intra-cluster edges score lower than the bridge") {
    // two triangles joined by one bridge edge
    val g = PropertyGraph(PropertyGraph.canonicalizeUndirected(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
        .toDF("src", "dst").withColumn("weight", lit(1.0))), directed = false)
    val d = Digraph.algebraicDistance(g, systems = 6, iters = 15).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val intra = (d((0L, 1L)) + d((1L, 2L)) + d((3L, 4L)) + d((4L, 5L))) / 4
    assert(d((2L, 3L)) > intra, s"bridge ${d((2L, 3L))} vs intra $intra")
  }

  test("SEIR: infection spreads from patient zero on karate") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val fin = Digraph.seir(karate, patientZero = 0L, steps = 12, beta = 0.5)
    val touched = fin.filter(col("state") > 0).count()
    assert(touched > 5, s"only $touched nodes left S")
    assert(fin.filter(col("id") === 0 && col("state") === 3).count() == 1) // p0 recovered
  }

  test("random walks: connected steps, deterministic per seed") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val w1 = Walks.randomWalks(karate, walksPerNode = 1, len = 5, seed = 9)
    // every consecutive (step, step+1) pair must be an edge
    val adj = karate.adjacency.select(col("src"), col("dst"))
    val steps = w1.as("a").join(w1.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
        col("b.step") === col("a.step") + 1)
      .select(col("a.node").as("src"), col("b.node").as("dst"))
    assert(steps.join(adj, Seq("src", "dst"), "left_anti").isEmpty)
    val w2 = Walks.randomWalks(karate, walksPerNode = 1, len = 5, seed = 9)
    assert(w1.except(w2).isEmpty)
    assert(w1.filter(col("step") === 0).count() == 34)
  }

  test("node2vec: embeddings exist for every node with the right dim") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val emb = Walks.node2vec(karate, dim = 8, walksPerNode = 2, len = 6)
    assert(emb.count() == 34)
    assert(emb.filter(size(col("vector")) =!= 8).isEmpty)
  }

  test("DGS reader + replay on the reference fixture") {
    val ev = GraphReaders.readDgs(spark, "/root/reference/input/example2.dgs")
    assert(ev.filter(col("type") === "TIME_STEP").count() == 1)
    assert(ev.filter(col("type") === "NODE_RESTORATION").count() == 1)
    val edges = GraphReaders.applyGraphEvents(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 1-2 was removed; nodes 1,2 removed; 3-4 (w=5) and 5-3 (w=2) remain;
    // node 6 removed then restored
    assert(edges == Map((3L, 4L) -> 5.0, (5L, 3L) -> 2.0))
  }
}
