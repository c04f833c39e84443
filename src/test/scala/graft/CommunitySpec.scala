package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

/** Community detection on the karate golden graph: PLM beats the known
  * modularity floor (~0.40 optimum), quality measures are consistent.
  */
class CommunitySpec extends SparkSpec {
  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("louvain: karate modularity ≥ 0.35, 2..6 communities") {
    val part = Community.louvain(karate)
    val q = Community.modularity(karate, part)
    assert(q >= 0.35, s"modularity $q")
    val k = part.select("community").distinct().count()
    assert(k >= 2 && k <= 6, s"$k communities")
  }

  test("plp produces a valid partition, modularity > 0") {
    val part = Community.plp(karate)
    assert(part.count() == 34)
    assert(Community.modularity(karate, part) >= 0.0)
  }

  test("quality measures: singleton partition Q < louvain Q; coverage of one-block = 1") {
    val singleton = karate.vertices.select(col("id"), col("id").as("community"))
    val oneBlock = karate.vertices.select(col("id"), lit(0L).as("community"))
    assert(Community.coverage(karate, oneBlock) == 1.0)
    assert(Community.edgeCut(karate, oneBlock) == 0.0)
    val qS = Community.modularity(karate, singleton)
    val part = Community.louvain(karate)
    assert(Community.modularity(karate, part) > qS)
  }

  test("coarsening preserves total edge weight") {
    val part = Community.louvain(karate)
    val c = Community.coarsen(karate, part)
    val before = karate.edges.agg(sum("weight")).head.getDouble(0)
    val after = c.edges.agg(sum("weight")).head.getDouble(0)
    assert(math.abs(before - after) < 1e-9)
  }

  test("permanence matches hand-computed values on a 4-node graph") {
    val spark2 = spark
    import spark2.implicits._
    // triangle {1,2,3} in community 0, pendant 4 in community 1 via edge 3-4
    val g = PropertyGraph.fromEdges(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst"),
      directed = false)
    val part = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)).toDF("id", "community")
    val got = Community.permanence(g, part)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 1.0) < 1e-9)          // 2/1/2 - (1-1)
    assert(math.abs(got(2L) - 1.0) < 1e-9)
    assert(math.abs(got(3L) - 2.0 / 3.0) < 1e-9)    // 2/1/3 - (1-1)
    assert(math.abs(got(4L) - (-1.0)) < 1e-9)       // 0 - (1-0)
  }

  test("compact relabels to 0..k-1; rand index of identical partitions = 1") {
    val part = Community.louvain(karate)
    val cp = Community.compact(part)
    val ids = cp.select("community").distinct().orderBy("community")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == ids.indices.map(_.toLong))
    assert(math.abs(Community.randIndex(part, cp) - 1.0) < 1e-12)
  }

  test("agglomerative: valid partition on karate, Q within 0.15 of louvain") {
    val p = Community.agglomerative(karate)
    val n = karate.vertices.count()
    assert(p.count() == n)
    assert(p.select("id").distinct().count() == n)
    val k = p.select("community").distinct().count()
    assert(k >= 2 && k < n, s"$k communities")
    val q = Community.modularity(karate, p)
    val qLouvain = Community.modularity(karate, Community.louvain(karate))
    assert(q > 0.2, s"agglomerative Q=$q")
    assert(q >= qLouvain - 0.15, s"agglomerative Q=$q vs louvain Q=$qLouvain")
  }
}
