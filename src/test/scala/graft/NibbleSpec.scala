package graft

import org.apache.spark.sql.functions._
import graft.graph._
import graft.io.GraphReaders

class NibbleSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate: PropertyGraph =
    GraphReaders.readMetis(spark, "/root/reference/input/karate.graph")

  test("pageRankNibble: sweep finds a low-conductance set around the hub") {
    val sw = PageRankNibble.sweep(karate, 0L)
    val best = sw.orderBy(col("conductance").asc, col("k").asc).limit(1).head()
    val (k, cond) = (best.getLong(0), best.getDouble(2))
    assert(k >= 2 && k < 34, s"best_k=$k")
    // karate's two-faction structure: a real sweep cut is well under 0.5
    assert(cond < 0.5, s"conductance=$cond")
    // the seed must rank first in its own PPR sweep
    assert(sw.filter(col("k") === 1).select("id").as[Long].head() == 0L)
  }

  test("pageRankNibble: two communities from the two faction leaders differ") {
    val a = PageRankNibble.bestPrefix(karate, 0L).head().getLong(0)
    val b = PageRankNibble.bestPrefix(karate, 33L).head().getLong(0)
    assert(a >= 2 && b >= 2)
  }

  test("barbell: nibble cuts exactly at the bridge") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
      .toDF("src", "dst")
    val g = PropertyGraph.fromEdges(edges, directed = false)
    val best = PageRankNibble.bestPrefix(g, 0L).head()
    assert(best.getLong(0) == 3L, s"best_k=${best.getLong(0)}")
    // cut 1, vol 7 → conductance 1/7
    assert(math.abs(best.getDouble(1) - 1.0 / 7.0) < 1e-4)
  }
}
