package graft

import org.apache.spark.sql.functions._
import graft.graph._

/** Local partition evaluation suite + structural rand + matching
  * coarsening. */
class PartMeasuresSpec extends SparkSpec {
  import spark.implicits._

  // two triangles joined by a bridge: 0-1-2 and 3-4-5, bridge 2-3
  lazy val twoTri: PropertyGraph = PropertyGraph.fromEdges(
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L))
      .toDF("src", "dst"), directed = false)
  lazy val goodPart = (0L to 5L).map(i => (i, i / 3)).toDF("id", "community")

  test("partitionHubDominance: triangles are fully dominated (1.0)") {
    assert(Community.partitionHubDominance(twoTri, goodPart) == 1.0)
  }

  test("intrapartitionDensity: triangle communities are complete (1.0)") {
    val (avg, global) = Community.intrapartitionDensity(twoTri, goodPart)
    assert(avg == 1.0 && global == 1.0)
  }

  test("isolated interpartition conductance and expansion on the bridge cut") {
    // each triangle: cut = 1, vol = 2·3 + 1 = 7, total vol = 14 →
    // conductance = 1/min(7, 7) = 1/7; expansion = 1/min(3, 3) = 1/3
    val c = Community.isolatedInterpartitionConductance(twoTri, goodPart)
    assert(math.abs(c - 1.0 / 7.0) < 1e-12, s"cond $c")
    val e = Community.isolatedInterpartitionExpansion(twoTri, goodPart)
    assert(math.abs(e - 1.0 / 3.0) < 1e-12, s"expn $e")
  }

  test("partitionFragmentation: whole-graph community split across components") {
    // remove the bridge → two components; one community spanning both
    // fragments to 1 − 3/6
    val noBridge = PropertyGraph.fromEdges(
      Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L))
        .toDF("src", "dst"), directed = false)
    val onePart = (0L to 5L).map(i => (i, 0L)).toDF("id", "community")
    val f = Community.partitionFragmentation(noBridge, onePart)
    assert(math.abs(f - 0.5) < 1e-12, s"frag $f")
    // aligned partition: no fragmentation
    assert(Community.partitionFragmentation(noBridge, goodPart) == 0.0)
  }

  test("graphStructuralRand: identical partitions → 0, split ups the distance") {
    assert(Community.graphStructuralRand(twoTri, goodPart, goodPart) == 0.0)
    val singletons = (0L to 5L).map(i => (i, i)).toDF("id", "community")
    // only the bridge edge agrees (separated in both) → 1 − 1/7
    val d = Community.graphStructuralRand(twoTri, goodPart, singletons)
    assert(math.abs(d - 6.0 / 7.0) < 1e-12, s"gsr $d")
  }

  test("matchingCoarsen contracts matched pairs only") {
    // path 0-1-2-3 with matching {(0,1), (2,3)} → 2 nodes, 1 edge
    val p4 = PropertyGraph.fromEdges(
      Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), directed = false)
    val m = Seq((0L, 1L), (2L, 3L)).toDF("u", "v")
    val coarse = Community.matchingCoarsen(p4, m)
    assert(coarse.vertices.count() == 2)
    assert(coarse.edges.filter(col("src") =!= col("dst")).count() == 1)
  }
}
