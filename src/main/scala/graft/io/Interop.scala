package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, Ranks}

/** pandas / networkx interchange adapters (reference
  * `networkit/nxadapter.py:41` `nk2nx`, `:165` `nx2nk`).
  *
  * The reference converts in-process between its Graph and a networkx
  * graph object. The Spark-native equivalent is FRAME interchange: a
  * graph exports to the canonical `(u, v, weight)` edge frame — the
  * exact shape `df.toPandas()` (or Arrow) hands to pandas /
  * `networkx.from_pandas_edgelist` — and imports from any
  * arbitrarily-labelled edge frame. Both directions are pure
  * DataFrame projections: nothing collects, so the export scales to
  * any graph the downstream consumer can hold (`toPandas` itself is
  * the consumer's driver-side step, exactly like nx2nk's in-memory
  * graph build is the reference's).
  */
object Interop {

  /** `nk2nx` equivalent: the interchange edge frame `(u, v, weight)`.
    * Feed `toEdgeFrame(g).toPandas()` to
    * `networkx.from_pandas_edgelist(df, 'u', 'v', 'weight')` for the
    * reference's round-trip. */
  def toEdgeFrame(g: PropertyGraph): DataFrame =
    g.edges.select(col("src").as("u"), col("dst").as("v"), col("weight"))

  /** The node frame `(id)` — carries isolated vertices, which the edge
    * frame cannot (the same reason nk2nx calls `add_nodes_from`). */
  def toNodeFrame(g: PropertyGraph): DataFrame = g.vertices.select("id")

  /** `nx2nk` equivalent: build a graph from an edge frame with
    * ARBITRARY labels (strings, sparse longs — whatever networkx /
    * pandas carried). Labels densify to 0..n−1 by sorted-label rank —
    * the reference's `idmap` is likewise a dense re-id, keyed on nx
    * document order, which has no distributed analog; sorted order is
    * the deterministic replacement (`Ranks.zipRank`, never a
    * single-partition window). A `weight` column is honored when
    * present. Returns `(graph, mapping(label, id))`. */
  def fromEdgeFrame(df: DataFrame, directed: Boolean): (PropertyGraph, DataFrame) = {
    val labels = df.select(col("u").as("label"))
      .unionAll(df.select(col("v").as("label"))).distinct()
    val mapping = Ranks.zipRank(labels, Seq(col("label")), "id")
    val w =
      if (df.columns.contains("weight")) col("weight").cast("double")
      else lit(1.0)
    val edges = df.select(col("u"), col("v"), w.as("weight"))
      .join(mapping.select(col("label").as("u"), col("id").as("src")), "u")
      .join(mapping.select(col("label").as("v"), col("id").as("dst")), "v")
      .select(col("src"), col("dst"), col("weight"))
    val oriented =
      if (directed) edges else PropertyGraph.canonicalizeUndirected(edges)
    (PropertyGraph(oriented, directed, Some(mapping.select("id"))), mapping)
  }
}
