package graft

import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import graft.io.GephiStreaming

/** Gephi Streaming Protocol export (reference
  * `networkit/gephi/streaming.py`): line-exact event stream — clean
  * event first, `an` nodes on the deterministic √n grid, `ae` edges
  * with the reference's edge-id convention, `cn` value updates, and
  * the reference's drop rules for weight/time-step events. */
class GephiStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def readLines(path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq

  private def smallGraph(): PropertyGraph = {
    val e = Seq((0L, 1L, 1.0), (3L, 2L, 1.0), (2L, 4L, 1.0))
      .toDF("src", "dst", "weight")
    val v = (0L to 4L).toDF("id")
    PropertyGraph(e, directed = false, Some(v))
  }

  test("exportGraph: clean + grid nodes + edges, protocol payloads") {
    val p = "/tmp/graft_gephi_g"
    GephiStreaming.exportGraph(smallGraph(), p)
    val lines = readLines(p).map(_.stripSuffix("\r"))
    assert(lines.head === "{\"dn\": {\"filter\": \"ALL\"}}")
    // n=5 → side=3, step=2000/3; node rank = id here
    val step = 2000.0 / 3
    def xy(rank: Long): (Double, Double) =
      ((rank % 3) * step - 1000.0, (rank / 3) * step - 1000.0)
    for (id <- 0L to 4L) {
      val (x, y) = xy(id)
      val want = s"""{"an": {"$id": {"size": 2.0, "r": 0.6, "g": 0.6, "b": 0.6, "y": $y, "x": $x}}}"""
      assert(lines(1 + id.toInt) === want, s"node $id")
    }
    // undirected edge id = "min-max"; source/target keep the stored
    // orientation (the reference passes u, v through)
    val ae = lines.drop(6)
    assert(ae.contains("""{"ae": {"0-1": {"source": 0, "target": 1, "directed": false}}}"""))
    assert(ae.contains("""{"ae": {"2-3": {"source": 3, "target": 2, "directed": false}}}"""))
    assert(ae.contains("""{"ae": {"2-4": {"source": 2, "target": 4, "directed": false}}}"""))
    assert(lines.size === 1 + 5 + 3)
    // every line parses as a JSON object
    val parsed = lines.toDF("line")
      .select(from_json(col("line"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,map<string,string>>")).as("j"))
      .filter(col("j").isNull).count()
    assert(parsed === 0)
  }

  test("exportEventStream: reference drop rules, sequence order") {
    val events = Seq(
      (0L, "NODE_ADDITION", 7L, -1L, 0.0),
      (1L, "EDGE_ADDITION", 7L, 3L, 1.0),
      (2L, "EDGE_WEIGHT_UPDATE", 7L, 3L, 2.0), // dropped (streaming.py:166)
      (3L, "TIME_STEP", -1L, -1L, 0.0),        // flush → no line
      (4L, "EDGE_REMOVAL", 7L, 3L, 0.0),
      (5L, "NODE_REMOVAL", 7L, -1L, 0.0)
    ).toDF("seq", "type", "u", "v", "w")
    val p = "/tmp/graft_gephi_ev"
    GephiStreaming.exportEventStream(events, directed = false, p)
    val lines = readLines(p).map(_.stripSuffix("\r"))
    assert(lines === Seq(
      """{"an": {"7": {}}}""",
      """{"ae": {"3-7": {"source": 7, "target": 3, "directed": false}}}""",
      """{"de": {"3-7": {}}}""",
      """{"dn": {"7": {}}}"""))
  }

  test("exportNodeValues + exportCoordinates payloads") {
    val g = smallGraph()
    val vals = (0L to 4L).map(i => (i, i * 1.5)).toDF("id", "value")
    val p = "/tmp/graft_gephi_nv"
    GephiStreaming.exportNodeValues(g, vals, "betweenness", p)
    val lines = readLines(p).map(_.stripSuffix("\r"))
    assert(lines(2) === """{"cn": {"2": {"betweenness": 3.0}}}""")
    assert(lines.size === 5)
    val coords = (0L to 4L).map(i => (i, i * 0.5, -i * 0.5))
      .toDF("id", "c0", "c1")
    val p2 = "/tmp/graft_gephi_xy"
    GephiStreaming.exportCoordinates(g, coords, scale = 2.0, p2)
    val l2 = readLines(p2).map(_.stripSuffix("\r"))
    assert(l2.size === 10)
    assert(l2(1) === """{"cn": {"1": {"x": 1.0}}}""")
    assert(l2(6) === """{"cn": {"1": {"y": -1.0}}}""")
  }

  test("directed edge ids use u->v; exportEdgeValues carries Type") {
    val e = Seq((5L, 2L, 1.0)).toDF("src", "dst", "weight")
    val g = PropertyGraph(e, directed = true)
    val p = "/tmp/graft_gephi_d"
    GephiStreaming.exportGraph(g, p)
    val lines = readLines(p).map(_.stripSuffix("\r"))
    assert(lines.exists(_.contains(
      """{"ae": {"5->2": {"source": 5, "target": 2, "directed": true}}}""")))
    val ev = Seq((5L, 2L, 0.25)).toDF("src", "dst", "value")
    val p2 = "/tmp/graft_gephi_ce"
    GephiStreaming.exportEdgeValues(g, ev, "score", p2)
    val l2 = readLines(p2).map(_.stripSuffix("\r"))
    assert(l2 === Seq(
      """{"ce": {"5->2": {"score": 0.25, "Type": "Directed", "source": 5, "target": 2, "directed": true}}}"""))
  }
}
