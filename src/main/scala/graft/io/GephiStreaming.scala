package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, Ranks}

/** Gephi Streaming Protocol export (reference
  * `networkit/gephi/streaming.py` + `pyclient.py`): the JSON-lines
  * graph-streaming event format the Gephi Streaming Plugin consumes —
  * one `{"an"|"cn"|"dn"|"ae"|"ce"|"de": {id: attrs}}` object per line,
  * `\r\n`-terminated (`pyclient.py:106`), node ids stringified, edge
  * ids `"u->v"` directed / `"min-max"` undirected
  * (`streaming.py:_edgeId:41`).
  *
  * The reference client POSTs the stream to a running Gephi master
  * over HTTP; this engine has no socket side-effects, so the SINK is a
  * file — the byte-identical stream a
  * `curl --data-binary @file http://host:8080/workspace0?operation=updateGraph`
  * would replay into Gephi. Event lines are BUILT distributed (one
  * projection per event class, python-`json.dumps` spacing); only the
  * final single-file sink is serial, the same discipline as every
  * line-ordered writer here ([[GraphReaders.writeMetis]] et al.).
  *
  * Weight-update events are dropped like the reference
  * (`streaming.py:166-169` prints "not yet supported" and sends
  * nothing); TIME_STEP maps to the client's `flush()`, a no-op for a
  * file sink. */
object GephiStreaming {

  private val CRLF = "\r" // text sink appends \n → protocol \r\n

  private def edgeIdCol(directed: Boolean, u: Column, v: Column): Column =
    if (directed) concat(u, lit("->"), v)
    else concat(least(u, v), lit("-"), greatest(u, v))

  /** `exportGraph` (`streaming.py:46-75`): a `clean` event
    * (`{"dn": {"filter": "ALL"}}`), one `an` per node with the default
    * style attributes and the deterministic √n×√n grid coordinates
    * (`streaming.py:80-91`: step 2000/⌈√n⌉, offset 1000, x by rank
    * modulo, y by rank division — rank = ascending node id, the
    * iterNodes order), then one `ae` per edge. */
  def exportGraph(g: PropertyGraph, path: String): Unit = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val n = g.vertices.count()
    val side = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val step = 2000.0 / side
    val clean = Seq((-1L, "{\"dn\": {\"filter\": \"ALL\"}}" + CRLF))
      .toDF("ord", "line")
    val ranked = Ranks.zipRank(g.vertices.select("id"), Seq(col("id")), "rank")
    val an = ranked.select(col("rank").as("ord"),
      concat(lit("{\"an\": {\""), col("id"),
        lit("\": {\"size\": 2.0, \"r\": 0.6, \"g\": 0.6, \"b\": 0.6, \"y\": "),
        (floor(col("rank") / side) * step - 1000.0).cast("double"),
        lit(", \"x\": "),
        (pmod(col("rank"), lit(side)) * step - 1000.0).cast("double"),
        lit("}}}"), lit(CRLF)).as("line"))
    val eRank = Ranks.zipRank(g.edges.select("src", "dst"),
      Seq(col("src"), col("dst")), "rank", base = n)
    val ae = eRank.select(col("rank").as("ord"),
      concat(lit("{\"ae\": {\""), edgeIdCol(g.directed, col("src"), col("dst")),
        lit("\": {\"source\": "), col("src"),
        lit(", \"target\": "), col("dst"),
        lit(", \"directed\": "), lit(if (g.directed) "true" else "false"),
        lit("}}}"), lit(CRLF)).as("line"))
    GraphReaders.writeOrderedLines(clean.unionAll(an).unionAll(ae), path)
  }

  /** `exportEventStream` (`streaming.py:138-175`): GraphEvent rows
    * `(seq, type, u, v, w)` → protocol events in sequence order.
    * Weight updates/increments are dropped (the reference sends
    * nothing), TIME_STEP is a flush (no line for a file sink). */
  def exportEventStream(events: DataFrame, directed: Boolean,
      path: String): Unit = {
    val line = when(col("type") === "NODE_ADDITION",
        concat(lit("{\"an\": {\""), col("u"), lit("\": {}}}")))
      .when(col("type") === "NODE_REMOVAL",
        concat(lit("{\"dn\": {\""), col("u"), lit("\": {}}}")))
      .when(col("type") === "EDGE_ADDITION",
        concat(lit("{\"ae\": {\""), edgeIdCol(directed, col("u"), col("v")),
          lit("\": {\"source\": "), col("u"), lit(", \"target\": "), col("v"),
          lit(", \"directed\": "), lit(if (directed) "true" else "false"),
          lit("}}}")))
      .when(col("type") === "EDGE_REMOVAL",
        concat(lit("{\"de\": {\""), edgeIdCol(directed, col("u"), col("v")),
          lit("\": {}}}")))
    GraphReaders.writeOrderedLines(
      events.select(col("seq").as("ord"), line.as("line"))
        .filter(col("line").isNotNull)
        .select(col("ord"), concat(col("line"), lit(CRLF)).as("line")),
      path)
  }

  /** `exportNodeValues` (`streaming.py:180-206`): one `cn` per node in
    * node order setting `attributeName` from `values` (`(id, value)`). */
  def exportNodeValues(g: PropertyGraph, values: DataFrame,
      attributeName: String, path: String): Unit =
    GraphReaders.writeOrderedLines(nodeValueLines(g, values, attributeName, 0L), path)

  private def nodeValueLines(g: PropertyGraph, values: DataFrame,
      attributeName: String, base: Long): DataFrame = {
    val ranked = Ranks.zipRank(g.vertices.select("id"), Seq(col("id")), "rank",
      base = base)
    // inner join: a node absent from `values` emits no cn event (a null
    // value would null the whole concat'd line)
    ranked.join(values, Seq("id"))
      .select(col("rank").as("ord"),
        concat(lit("{\"cn\": {\""), col("id"),
          lit("\": {\"" + attributeName + "\": "), col("value"),
          lit("}}}"), lit(CRLF)).as("line"))
  }

  /** `exportCoordinates` (`streaming.py:208-229`): the x node values
    * then the y node values, scaled. `coords` is `(id, c0, c1)` —
    * the [[graft.viz.MaxentLayout]] / PivotMDS output shape. */
  def exportCoordinates(g: PropertyGraph, coords: DataFrame,
      scale: Double, path: String): Unit = {
    val n = g.vertices.count()
    val xs = nodeValueLines(g,
      coords.select(col("id"), (col("c0") * scale).as("value")), "x", 0L)
    val ys = nodeValueLines(g,
      coords.select(col("id"), (col("c1") * scale).as("value")), "y", n)
    GraphReaders.writeOrderedLines(xs.unionAll(ys), path)
  }

  /** `exportEdgeValues` (`streaming.py:231-262`): one `ce` per edge
    * with the attribute, the `Type` marker, and the endpoint fields the
    * client appends. `values` is `(src, dst, value)`. */
  def exportEdgeValues(g: PropertyGraph, values: DataFrame,
      attributeName: String, path: String): Unit = {
    val tpe = if (g.directed) "Directed" else "Undirected"
    val ranked = Ranks.zipRank(
      g.edges.select("src", "dst").join(values, Seq("src", "dst")),
      Seq(col("src"), col("dst")), "rank")
    GraphReaders.writeOrderedLines(
      ranked.select(col("rank").as("ord"),
        concat(lit("{\"ce\": {\""), edgeIdCol(g.directed, col("src"), col("dst")),
          lit("\": {\"" + attributeName + "\": "), col("value"),
          lit(", \"Type\": \"" + tpe + "\", \"source\": "), col("src"),
          lit(", \"target\": "), col("dst"),
          lit(", \"directed\": "), lit(if (g.directed) "true" else "false"),
          lit("}}}"), lit(CRLF)).as("line")),
      path)
  }
}
