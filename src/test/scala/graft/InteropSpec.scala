package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.{GraphReaders, Interop}

/** pandas / networkx frame-interchange adapters (reference
  * `nxadapter.py:41,165`) — golden-graph round trip through the
  * pandas-shaped edge frame, including a driver-side `collect` leg
  * standing in for `toPandas()`. */
class InteropSpec extends SparkSpec {
  import spark.implicits._

  test("karate round-trips through the (u, v, weight) edge frame") {
    val karate = GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")
    val frame = Interop.toEdgeFrame(karate)
    assert(frame.columns.toSeq == Seq("u", "v", "weight"))
    assert(frame.count() == 78)
    // the toPandas() leg: collect rows driver-side (what a pandas /
    // networkx consumer does), then re-import the same shape
    val rows = frame.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val back0 = rows.toSeq.toDF("u", "v", "weight")
    val (back, mapping) = Interop.fromEdgeFrame(back0, directed = false)
    assert(back.vertices.count() == 34)
    // karate ids are already dense 0..33, so the sorted-label mapping
    // is the identity and the edge set must match exactly
    assert(mapping.filter(col("label") =!= col("id")).isEmpty)
    val a = karate.edges.select("src", "dst")
    val b = back.edges.select("src", "dst")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("arbitrary string labels densify by sorted-label rank; weights honored") {
    val df = Seq(("b", "a", 2.0), ("c", "a", 1.5), ("c", "b", 1.0))
      .toDF("u", "v", "weight")
    val (g, mapping) = Interop.fromEdgeFrame(df, directed = true)
    val m = mapping.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val got = g.edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 0L, 2.0), (2L, 0L, 1.5), (2L, 1L, 1.0)))
    // isolated vertices survive the node frame, not the edge frame
    val star = PropertyGraph(
      Seq((0L, 1L, 1.0)).toDF("src", "dst", "weight"), directed = false,
      Some(Seq(0L, 1L, 7L).toDF("id")))
    assert(Interop.toNodeFrame(star).count() == 3)
    assert(Interop.toEdgeFrame(star).count() == 1)
  }
}
