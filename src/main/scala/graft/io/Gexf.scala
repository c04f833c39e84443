package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.w3c.dom.{Element, Node => XNode}
import graft.graph.PropertyGraph

/** GEXF (Graph Exchange XML Format) reader / writer (reference
  * `networkit/graphio.pyx:1713` `GEXFReader`, `:2030` `GEXFWriter` —
  * the reference's Python-layer format, exercised on its own
  * `.gexf` fixtures under `input/`).
  *
  * Semantics mirrored from the reference parser:
  *   - static mode: nodes map to 0..n−1 in DOCUMENT order; edges carry
  *     optional weights; `defaultedgetype="directed"` decides direction.
  *   - dynamic mode: spells / inline start–end attributes become the
  *     GraphEvent stream (`an/rn/dn`, `ae/re/de/ce`), events sort by
  *     time (numeric unless `timeformat="date"`, which sorts
  *     lexicographically — ISO dates), a TIME_STEP lands after each
  *     distinct timestamp, and dynamic nodes remap to
  *     nInitial + addition-order (`mapDynamicNodes`). The remap runs
  *     BEFORE edge parsing (the reference's order), so it only ever
  *     sees node events; edge events created afterwards keep the
  *     parsed integer ids even when those nodes were remapped — a
  *     reference quirk this port reproduces exactly.
  *   - a dynamic element with no start time joins the initial graph;
  *     a non-empty end still emits its removal event (rule 4).
  *
  * XML is unsplittable and the dynamic remap is inherently sequential,
  * so the file parses driver-side (bounded interchange fixture — the
  * same discipline as [[GraphReaders.writeGml]]); everything returned
  * is a DataFrame. Returns `(graph, events)` where `events` has the
  * [[GraphReaders.readDgs]] schema `(seq, type, u, v, w)`. */
object Gexf {

  private def children(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  def read(spark: SparkSession, path: String): (PropertyGraph, DataFrame) = {
    import spark.implicits._
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    val doc = dbf.newDocumentBuilder().parse(new java.io.File(path))
    val graphEl = doc.getElementsByTagName("graph").item(0).asInstanceOf[Element]
    val directed = graphEl.getAttribute("defaultedgetype") == "directed"
    val dynamic = graphEl.getAttribute("mode") == "dynamic"
    val timeFormat = if (dynamic) graphEl.getAttribute("timeformat") else ""
    val hasDynamicWeights = children(graphEl, "attribute")
      .exists(_.getAttribute("id") == "weight")

    // time values compare numerically unless timeformat="date"
    type T = (String, Double) // raw + numeric key
    def timeKey(s: String): T =
      if (timeFormat == "date") (s, 0.0)
      else (s, try s.toDouble catch { case _: Exception => 0.0 })
    val timeOrd: Ordering[T] =
      if (timeFormat == "date") Ordering.by(_._1) else Ordering.by(_._2)

    val mapping = scala.collection.mutable.HashMap[String, Long]()
    val intToFinal = scala.collection.mutable.HashMap[Long, Long]()
    var nInitial = 0L
    // (type, u, v, w, time); node events carry the PARSED int id until
    // the mapDynamicNodes pass
    val events = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Double, T)]()
    val initialEdges = scala.collection.mutable.ArrayBuffer[(String, String, String)]()

    def attr(e: Element, names: String*): String =
      names.map(e.getAttribute).find(_.nonEmpty).getOrElse("")

    def createEvent(time: String, kind: String, u: String, v: String,
        w: String): Unit = {
      val mu = mapping(u)
      val (mv, mw) =
        if (kind(1) == 'e') (mapping(v), w.toDouble) else (-1L, 0.0)
      val t = kind match {
        case "an" => "NODE_ADDITION"
        case "dn" => "NODE_REMOVAL"
        case "rn" => "NODE_RESTORATION"
        case "ae" | "re" => "EDGE_ADDITION"
        case "de" => "EDGE_REMOVAL"
        case "ce" => "EDGE_WEIGHT_UPDATE"
      }
      events += ((t, mu, mv, mw, timeKey(time)))
    }

    // the reference's parseDynamics, verbatim decision table
    // (graphio.pyx:1837; rules 1–3 are the two start/end blocks, rule 4
    // is the trailing startTime-empty block, rule 5 the weight loop —
    // which REASSIGNS startTime, so rule 4 sees the reassigned value)
    def parseDynamics(el: Element, kind: String,
        control: scala.collection.mutable.Map[String, Boolean],
        u: String, v: String = "0", w0: String = "1.0"): Unit = {
      var w = w0
      var startTime = attr(el, "start", "startopen")
      val endTime = attr(el, "end", "endopen")
      if (startTime.nonEmpty && endTime.nonEmpty) {
        val startsBefore =
          if (timeFormat == "date") startTime < endTime
          else timeKey(startTime)._2 < timeKey(endTime)._2
        if (startsBefore && !control("elementDeleted")) {
          createEvent(startTime, "a" + kind, u, v, w)
          control("elementAdded") = true
        } else createEvent(startTime, "r" + kind, u, v, w)
        createEvent(endTime, "d" + kind, u, v, w)
        control("elementDeleted") = true
      }
      if (startTime.nonEmpty && endTime.isEmpty) {
        if (control("elementDeleted")) createEvent(startTime, "r" + kind, u, v, w)
        else {
          createEvent(startTime, "a" + kind, u, v, w)
          control("elementAdded") = true
        }
      }
      if (kind == "e" && hasDynamicWeights) {
        var atts = children(el, "attvalue")
        if (atts.isEmpty)
          atts = children(el.getParentNode.getParentNode.asInstanceOf[Element],
            "attvalue")
        atts.filter(_.getAttribute("for") == "weight").foreach { a =>
          w = a.getAttribute("value")
          startTime = attr(a, "start", "startopen")
          if (!control("elementAdded")) {
            createEvent(startTime, "ae", u, v, w)
            control("elementAdded") = true
          } else createEvent(startTime, "ce", u, v, w)
        }
      }
      // rule 4: end before start, or no start at all → the element joins
      // the INITIAL graph; a non-empty end still emits its removal event
      // (so a node whose first spell is `<spell end="t"/>` is an initial
      // node that gets deleted at t and possibly restored later)
      if (startTime.isEmpty) {
        if (!control("elementAdded")) {
          if (kind == "n") { mapping(u) = nInitial; nInitial += 1 }
          else initialEdges += ((u, v, w))
          control("elementAdded") = true
        }
        if (endTime.nonEmpty) {
          createEvent(endTime, "d" + kind, u, v, w)
          control("elementDeleted") = true
        }
      }
    }

    children(graphEl, "node").foreach { n =>
      val u = n.getAttribute("id")
      if (dynamic) {
        val intId = try u.toLong catch { case _: Exception => u.drop(1).toLong }
        mapping(u) = intId
        val control = scala.collection.mutable.Map(
          "elementAdded" -> false, "elementDeleted" -> false)
        val spells = children(n, "spell")
        if (spells.nonEmpty) spells.foreach(parseDynamics(_, "n", control, u))
        else parseDynamics(n, "n", control, u)
      } else { mapping(u) = nInitial; nInitial += 1 }
    }
    // mapDynamicNodes: dynamic nodes take ids nInitial + addition order.
    // Runs before the edge loop (the reference's order), so every event
    // present is a node event — the NODE guard below is defensive, not a
    // behavioral filter; edge events created later keep parsed int ids
    // (the reference quirk, see header)
    if (dynamic) {
      val sorted = events.sortBy(_._5)(timeOrd)
      events.clear(); events ++= sorted
      var nNodes = nInitial
      val isMapped = Array.fill(events.length)(false)
      for (i <- events.indices) {
        val ev = events(i)
        if (!isMapped(i) && ev._1 == "NODE_ADDITION") {
          val intId = ev._2
          intToFinal(intId) = nNodes
          for (j <- i until events.length) {
            val e2 = events(j)
            if (!isMapped(j) && e2._2 == intId && e2._1.startsWith("NODE")) {
              events(j) = (e2._1, nNodes, -1L, 0.0, e2._5)
              isMapped(j) = true
            }
          }
          nNodes += 1
          isMapped(i) = true
        }
      }
    }

    children(graphEl, "edge").foreach { e =>
      val (u, v) = (e.getAttribute("source"), e.getAttribute("target"))
      val w = if (e.hasAttribute("weight")) e.getAttribute("weight") else "1.0"
      if (dynamic) {
        val control = scala.collection.mutable.Map(
          "elementAdded" -> false, "elementDeleted" -> false)
        val spells = children(e, "spell")
        if (spells.nonEmpty) spells.foreach(parseDynamics(_, "e", control, u, v, w))
        else parseDynamics(e, "e", control, u, v, w)
      } else initialEdges += ((u, v, w))
    }

    // TIME_STEP after every distinct timestamp boundary (appended with
    // the EARLIER time; stable sort lands it after that time's events)
    val sorted0 = events.sortBy(_._5)(timeOrd)
    val steps = (1 until sorted0.length)
      .filter(i => sorted0(i)._5 != sorted0(i - 1)._5)
      .map(i => ("TIME_STEP", -1L, -1L, 0.0, sorted0(i - 1)._5))
    val stream = (sorted0 ++ steps).sortBy(_._5)(timeOrd)
      .zipWithIndex
      .map { case ((t, u, v, w, _), seq) => (seq.toLong, t, u, v, w) }

    val edges = initialEdges.toSeq
      .map { case (u, v, w) => (mapping(u), mapping(v), w.toDouble) }
      .toDF("src", "dst", "weight")
    // undirected edges orient src ≤ dst but are NOT merged: the
    // reference keeps reciprocal file entries as distinct edges
    // (Graph.addEdge is a multigraph append), and celegans' staticTest
    // fixture has 197 such pairs
    val oriented =
      if (directed) edges
      else edges.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("weight"))
    val g = PropertyGraph(oriented, directed,
      Some(spark.range(nInitial).select(col("id"))))
    (g, stream.toSeq.toDF("seq", "type", "u", "v", "w"))
  }

  /** GraphML reader (reference `networkit/graphio.pyx:2179`
    * `GraphMLSAX`): nodes take ids 0..n−1 in document order;
    * `edgedefault="directed"` decides direction; the graph is weighted
    * iff a `<key for="edge" attr.name="weight" attr.type="double">`
    * declaration exists, and each edge's weight then comes from its
    * `<data key=…>` child. Driver-side DOM parse like [[read]]. */
  def readGraphMl(spark: SparkSession, path: String): PropertyGraph = {
    import spark.implicits._
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    val doc = dbf.newDocumentBuilder().parse(new java.io.File(path))
    val graphEl = doc.getElementsByTagName("graph").item(0).asInstanceOf[Element]
    val directed = graphEl.getAttribute("edgedefault") == "directed"
    val weightedId = {
      val keys = doc.getElementsByTagName("key")
      (0 until keys.getLength).map(keys.item(_).asInstanceOf[Element])
        .find(k => k.getAttribute("for") == "edge" &&
          k.getAttribute("attr.name") == "weight" &&
          k.getAttribute("attr.type") == "double")
        .map(_.getAttribute("id"))
    }
    val mapping = scala.collection.mutable.HashMap[String, Long]()
    var n = 0L
    children(graphEl, "node").foreach { nd =>
      mapping(nd.getAttribute("id")) = n; n += 1
    }
    val rows = children(graphEl, "edge").map { e =>
      // weighted file, edge with no <data>: the reference's SAX parser
      // adds it with its edgeweight accumulator still 0.0 — mirror that,
      // not a 1.0 default; unweighted files take addEdge's default 1.0
      val w = weightedId match {
        case Some(wid) => children(e, "data").find(_.getAttribute("key") == wid)
          .map(_.getTextContent.trim.toDouble).getOrElse(0.0)
        case None => 1.0
      }
      (mapping(e.getAttribute("source")), mapping(e.getAttribute("target")), w)
    }
    val edges = rows.toDF("src", "dst", "weight")
    PropertyGraph(
      if (directed) edges
      else edges.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("weight")),
      directed, Some(spark.range(n).select(col("id"))))
  }

  /** GraphML writer (reference `GraphMLWriter`, `graphio.pyx:2279`):
    * declares the weight key when any weight ≠ 1. Node and edge lines
    * are BUILT distributed (typed projections — Java `Double.toString`
    * rendering, exactly the old driver-side bytes — sorted by id /
    * (src, dst)); only the single-file sink streams through the driver
    * partition-at-a-time ([[GraphReaders.writeSectionedSingleFile]]). */
  def writeGraphMl(g: PropertyGraph, path: String): Unit = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val weighted = g.edges.filter(col("weight") =!= 1.0).limit(1).count() > 0
    val head = (Seq(
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">") ++
      (if (weighted)
        Seq("  <key id=\"d1\" for=\"edge\" attr.name=\"weight\" attr.type=\"double\"/>")
      else Nil) :+
      s"""  <graph id="G" edgedefault="${
        if (g.directed) "directed" else "undirected"}">""")
      .zipWithIndex.map { case (l, i) => (0, i.toLong, 0L, l) }
      .toDF("sec", "a", "b", "line")
    val nodes = g.vertices.select(col("id")).as[Long]
      .map(id => (1, id, 0L, s"""    <node id="n$id"/>"""))
      .toDF("sec", "a", "b", "line")
    val edges = g.edges.select(col("src"), col("dst"), col("weight"))
      .as[(Long, Long, Double)]
      .map { case (u, v, w) =>
        val l =
          if (weighted)
            s"""    <edge source="n$u" target="n$v"><data key="d1">$w</data></edge>"""
          else s"""    <edge source="n$u" target="n$v"/>"""
        (2, u, v, l)
      }.toDF("sec", "a", "b", "line")
    val foot = Seq((3, 0L, 0L, "  </graph>"), (3, 1L, 0L, "</graphml>"))
      .toDF("sec", "a", "b", "line")
    GraphReaders.writeSectionedSingleFile(
      head.unionAll(nodes).unionAll(edges).unionAll(foot), path)
  }

  /** Static GEXF writer (reference `GEXFWriter`, static path): nodes
    * 0..n−1, one `<edge>` per stored edge. Same distributed line-build
    * + streamed single-file sink discipline as [[writeGraphMl]]. */
  def write(g: PropertyGraph, path: String): Unit = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val head = Seq(
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        "<gexf xmlns=\"http://www.gexf.net/1.2draft\" version=\"1.2\">",
        s"""  <graph mode="static" defaultedgetype="${
          if (g.directed) "directed" else "undirected"}">""",
        "    <nodes>")
      .zipWithIndex.map { case (l, i) => (0, i.toLong, 0L, l) }
      .toDF("sec", "a", "b", "line")
    val nodes = g.vertices.select(col("id")).as[Long]
      .map(id => (1, id, 0L, s"""      <node id="$id"/>"""))
      .toDF("sec", "a", "b", "line")
    val mid = Seq((2, 0L, 0L, "    </nodes>"), (2, 1L, 0L, "    <edges>"))
      .toDF("sec", "a", "b", "line")
    val edges = g.edges.select(col("src"), col("dst"), col("weight"))
      .as[(Long, Long, Double)]
      .map { case (u, v, w) =>
        (3, u, v, s"""      <edge source="$u" target="$v" weight="$w"/>""") }
      .toDF("sec", "a", "b", "line")
    val foot = Seq((4, 0L, 0L, "    </edges>"), (4, 1L, 0L, "  </graph>"),
        (4, 2L, 0L, "</gexf>"))
      .toDF("sec", "a", "b", "line")
    GraphReaders.writeSectionedSingleFile(
      head.unionAll(nodes).unionAll(mid).unionAll(edges).unionAll(foot), path)
  }
}
