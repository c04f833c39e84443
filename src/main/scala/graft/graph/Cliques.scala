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

  /** ALL maximal cliques (reference `clique/MaximalCliques.hpp:28`,
    * Eppstein–Löffler–Strash degeneracy-ordered Bron–Kerbosch), fully
    * distributed: one subproblem per vertex v, holding v's neighborhood
    * (split by a (degree, id) total order into later = P-candidates and
    * earlier = X-exclusions) plus the intra-neighborhood edges — the
    * per-vertex induced subgraph every BK(v) call needs and nothing
    * more. Each subproblem runs sequential BK with pivoting inside
    * `mapPartitions`; a maximal clique is emitted exactly once, by its
    * minimum-order member (any other member sees that vertex in X).
    * Shuffle cost: the intra-neighborhood edge multiset is Σ_e
    * |commonNbrs(e)| = 3·triangles rows, grouped by owner — the same
    * skew-safe wedge-join shape as `Triangles`. Returns one row per
    * clique, `members` sorted ascending. */
  def maximalCliques(g: PropertyGraph): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    val spark = g.edges.sparkSession
    val e = PropertyGraph.canonicalizeUndirected(
      g.adjacency.filter(col("src") =!= col("dst")))
      .select("src", "dst").distinct()
    val adj = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val rank = deg.withColumn("rnk",
      row_number().over(Window.orderBy(col("d"), col("id"))).cast("long"))
      .select("id", "rnk")
    val nbrs = adj
      .join(rank.select(col("id").as("dst"), col("rnk").as("nrnk")), "dst")
      .groupBy(col("src").as("id"))
      .agg(collect_list(struct(col("dst"), col("nrnk"))).as("nbrs"))
    // intra-neighborhood edges, owner v: wedge (v,a),(v,b) that closes
    val intra = adj.select(col("src").as("v"), col("dst").as("a"))
      .join(adj.select(col("src").as("v"), col("dst").as("b")), "v")
      .filter(col("a") < col("b"))
      .join(e.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"), "left_semi")
      .groupBy(col("v").as("id"))
      .agg(collect_list(struct(col("a"), col("b"))).as("intra"))
    val sub = nbrs.join(intra, Seq("id"), "left").join(rank, "id")
      .select(col("id"), col("rnk"), col("nbrs"), col("intra"))

    val outSchema = StructType(Seq(
      StructField("members", ArrayType(LongType), nullable = false)))
    val rdd = sub.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val v = r.getLong(0); val vRnk = r.getLong(1)
        val nb = r.getSeq[SRow](2).map(s => (s.getLong(0), s.getLong(1)))
        val ie = if (r.isNullAt(3)) Seq.empty[(Long, Long)]
          else r.getSeq[SRow](3).map(s => (s.getLong(0), s.getLong(1)))
        val local = scala.collection.mutable.HashMap[Long, scala.collection.mutable.HashSet[Long]]()
        def link(a: Long, b: Long): Unit = {
          local.getOrElseUpdate(a, scala.collection.mutable.HashSet()) += b
          local.getOrElseUpdate(b, scala.collection.mutable.HashSet()) += a
        }
        nb.foreach { case (w, _) => link(v, w) }
        ie.foreach { case (a, b) => link(a, b) }
        val later = nb.filter(_._2 > vRnk).map(_._1).toSet
        val earlier = nb.filter(_._2 < vRnk).map(_._1).toSet
        val out = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
        def bk(rS: List[Long], pS: Set[Long], xS: Set[Long]): Unit = {
          if (pS.isEmpty && xS.isEmpty) { out += rS.sorted; return }
          val pivot = (pS ++ xS).maxBy(u => (pS & local(u).toSet).size)
          var p = pS; var x = xS
          (pS -- local(pivot)).toSeq.sorted.foreach { w =>
            val nw = local(w).toSet
            bk(w :: rS, p & nw, x & nw)
            p -= w; x += w
          }
        }
        bk(List(v), later, earlier)
        out.iterator.map(m => SRow(m))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
