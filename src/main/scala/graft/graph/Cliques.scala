package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-clique enumeration (reference `clique/MaximalCliques.hpp:28` —
  * degeneracy-ordered Bron-Kerbosch; here the Spark-natural fixed-k
  * variant: orient every edge by (degree, id) and extend cliques one
  * ordered join per level, the same O(m·α)-style fan-out bound that
  * makes the triangle join skew-safe at scale, `Triangles.scala:32`).
  */
object Cliques {

  /** Edges oriented low→high by (degree, id) — each clique is
    * enumerated exactly once, and fan-out per node is bounded by the
    * degeneracy-ish ordering rather than raw degree. */
  private def oriented(g: PropertyGraph): DataFrame = {
    val e = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst"))).select("src", "dst")
    val adj = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    adj
      .join(deg.select(col("id").as("src"), col("d").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("d").as("dd")), "dst")
      .filter(col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select("src", "dst")
  }

  /** All k-cliques as rows `(n1 … nk)` in orientation order, k ∈ 2..5.
    * Each level joins the frontier with the oriented adjacency of the
    * FIRST member and semi-joins the remaining pairs — one shuffle per
    * level, no driver-side state. */
  def cliques(g: PropertyGraph, k: Int): DataFrame = {
    require(k >= 2 && k <= 5, "k-clique join unrolled for k in 2..5")
    val o = oriented(g).persist()
    o.count()
    var cur = o.select(col("src").as("n1"), col("dst").as("n2"))
    for (level <- 3 to k) {
      val prev = (1 until level).map(i => s"n$i")
      val cand = cur.join(
        o.select(col("src").as(prev.head), col("dst").as(s"n$level")),
        prev.head)
      // the candidate must be an oriented out-neighbor of EVERY member
      cur = prev.tail.foldLeft(cand) { (df, m) =>
        df.join(
          o.select(col("src").as(m), col("dst").as(s"n$level")),
          Seq(m, s"n$level"), "left_semi")
      }
    }
    o.unpersist(blocking = false)
    cur
  }

  /** Clique counts per size 2..maxK: `(k, n_cliques)`. */
  def cliqueCounts(g: PropertyGraph, maxK: Int = 4): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    (2 to maxK).map(k => (k.toLong, cliques(g, k).count()))
      .toDF("k", "n_cliques")
  }
}
