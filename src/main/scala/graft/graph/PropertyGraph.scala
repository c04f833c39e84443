package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Property graph on DataFrames — the engine's core data model
  * (SURVEY.md §1.1; reference: `include/networkit/graph/Graph.hpp:110`,
  * `GraphR.hpp:25` Arrow-CSR read-only graph).
  *
  * The canonical distributed layout is a normalized edge table
  * `(src LONG, dst LONG, weight DOUBLE)`; undirected graphs store each
  * edge once, canonically `src < dst`, and expand to both directions via
  * [[adjacency]] for neighborhood operators. Immutability (= GraphR
  * semantics) is inherent to DataFrames; GraphW-style mutation maps to
  * union/except graph-construction ops in [[GraphOps]].
  *
  * Scale note: `edges` is expected to be Parquet-backed; all operators
  * formulate joins/aggregations declaratively so Catalyst keeps pushdown,
  * pruning and AQE. Nothing here collects edges to the driver.
  */
final case class PropertyGraph(
    edges: DataFrame,
    directed: Boolean,
    verticesOpt: Option[DataFrame] = None) {

  /** Vertex table `(id LONG, …attrs)`: explicit, or derived from endpoints. */
  def vertices: DataFrame = verticesOpt.getOrElse(
    edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id")))
      .distinct())

  /** Directed adjacency view: for undirected graphs, both directions of
    * every canonical edge (reference iterates `forNeighborsOf` over CSR
    * rows, `Graph.hpp:1431`); for directed graphs, out-edges as stored.
    * Column ORDER is normalized by name first: a USING join (e.g. an
    * anti-join on `dst`) reorders a DataFrame's columns, and a positional
    * union over reordered edges would silently build a broken graph. */
  def adjacency: DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight"))
    if (directed) e
    else e.unionAll(
      e.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
  }

  /** In-adjacency (transpose view for directed; same as adjacency for
    * undirected). */
  def inAdjacency: DataFrame =
    if (!directed) adjacency
    else edges.select(col("dst").as("src"), col("src").as("dst"), col("weight"))

  def numberOfNodes: Long = vertices.count()
  def numberOfEdges: Long = edges.count()

  /** Out-degree per node, including zero-degree vertices when a vertex
    * table is attached. `(id, degree)` */
  def degrees: DataFrame = {
    val d = adjacency.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
    verticesOpt match {
      case Some(v) => v.select("id").join(d, Seq("id"), "left")
        .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree"))
      case None => d
    }
  }

  /** Weighted degree (sum of incident edge weights). `(id, wdegree)` */
  def weightedDegrees: DataFrame =
    adjacency.groupBy(col("src").as("id")).agg(sum("weight").as("wdegree"))
}

object PropertyGraph {
  /** Build from an arbitrary pair DataFrame; missing weight column → 1.0
    * (reference `defaultEdgeWeight`, `Globals.hpp`). */
  def fromEdges(
      df: DataFrame,
      directed: Boolean,
      src: String = "src",
      dst: String = "dst",
      weight: Option[String] = None): PropertyGraph = {
    val base = df.select(
      col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst"),
      weight.map(w => col(w).cast("double")).getOrElse(lit(1.0)).as("weight"))
    PropertyGraph(base, directed)
  }

  /** Canonicalize an undirected edge list: `src < dst`, self-loops kept,
    * duplicate edges collapsed (weights summed). */
  def canonicalizeUndirected(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"),
        col("weight"))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
}
