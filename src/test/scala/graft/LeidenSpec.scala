package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Leiden refinement validation, mirroring the reference's topology
  * suite (`networkit/test/test_leiden_validation.py:66-203`: two
  * disconnected edges, triangle, 20-cycle, barbell) plus the flagship
  * Leiden invariant — every community is connected — which Louvain does
  * not guarantee.
  */
class LeidenSpec extends SparkSpec {

  private def graphOf(edges: Seq[(Long, Long)], n: Long): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(
      edges.map { case (u, v) => (u, v, 1.0) }.toDF("src", "dst", "weight"),
      directed = false, Some(spark.range(n).select(col("id"))))
  }

  private def nCommunities(p: DataFrame): Long =
    p.select("community").distinct().count()

  /** Every community induces a single connected component. */
  private def allConnected(g: PropertyGraph, p: DataFrame): Boolean = {
    val lbl = p.select(col("id"), col("community"))
    val intra = g.edges
      .join(lbl.select(col("id").as("src"), col("community").as("cs")), "src")
      .join(lbl.select(col("id").as("dst"), col("community").as("cd")), "dst")
      .filter(col("cs") === col("cd"))
      .select(col("src"), col("dst"), col("weight"))
    val cc = ConnectedComponents.run(PropertyGraph(intra, directed = false))
    lbl.join(cc, Seq("id"), "left")
      .groupBy("community")
      .agg(countDistinct(coalesce(col("component"), col("id"))).as("k"))
      .filter(col("k") > 1).isEmpty
  }

  test("two disconnected edges -> exactly 2 communities (reference test 1)") {
    val g = graphOf(Seq((0L, 1L), (2L, 3L)), 4)
    val p = Community.leiden(g)
    assert(nCommunities(p) == 2, s"got ${nCommunities(p)}")
    assert(allConnected(g, p))
  }

  test("triangle -> 1 community (reference test 2, skipped upstream as known issue)") {
    val g = graphOf(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 3)
    val p = Community.leiden(g)
    assert(nCommunities(p) == 1, s"got ${nCommunities(p)}")
  }

  test("20-cycle -> connected communities, Q >= singleton Q (reference test 3)") {
    val n = 20L
    val g = graphOf((0L until n).map(i => (i, (i + 1) % n)), n)
    val p = Community.leiden(g)
    assert(allConnected(g, p), "cycle communities must be contiguous arcs")
    val qS = Community.modularity(g,
      g.vertices.select(col("id"), col("id").as("community")))
    assert(Community.modularity(g, p) >= qS)
  }

  test("barbell (two K3 + bridge) -> the two cliques separate (reference test 4)") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L))
    val g = graphOf(edges, 6)
    val p = Community.leiden(g)
    assert(nCommunities(p) == 2, s"got ${nCommunities(p)}")
    // the two cliques must not be split across communities
    val byComm = p.groupBy("community")
      .agg(collect_set(col("id")).as("members"))
      .collect().map(_.getSeq[Long](1).toSet)
    assert(byComm.exists(_ == Set(0L, 1L, 2L)) && byComm.exists(_ == Set(3L, 4L, 5L)),
      s"got ${byComm.mkString(";")}")
    assert(allConnected(g, p))
  }

  test("karate: leiden Q >= louvain Q - 0.02 and all communities connected") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val pLeiden = Community.leiden(karate)
    val pLouvain = Community.louvain(karate)
    val qLeiden = Community.modularity(karate, pLeiden)
    val qLouvain = Community.modularity(karate, pLouvain)
    assert(qLeiden >= qLouvain - 0.02, s"leiden $qLeiden vs louvain $qLouvain")
    assert(qLeiden >= 0.35, s"leiden Q $qLeiden")
    assert(allConnected(karate, pLeiden))
  }

  test("partition similarity: NMI/ARI/Jaccard are 1 for identical, sane for mod partitions") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val p1 = karate.vertices.select(col("id"), (col("id") % 4).as("community"))
    val p2 = karate.vertices.select(col("id"), (col("id") % 6).as("community"))
    assert(math.abs(Community.nmi(p1, p1) - 1.0) < 1e-9)
    assert(math.abs(Community.adjustedRandIndex(p1, p1) - 1.0) < 1e-9)
    assert(math.abs(Community.jaccardMeasure(p1, p1) - 1.0) < 1e-9)
    val nmi12 = Community.nmi(p1, p2)
    assert(nmi12 > 0.0 && nmi12 < 1.0, s"nmi $nmi12")
    val ari12 = Community.adjustedRandIndex(p1, p2)
    assert(ari12 > -1.0 && ari12 < 1.0, s"ari $ari12")
    val j12 = Community.jaccardMeasure(p1, p2)
    assert(j12 >= 0.0 && j12 <= 1.0, s"jaccard $j12")
  }
}
