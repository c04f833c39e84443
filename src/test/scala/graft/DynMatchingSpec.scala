package graft

import org.apache.spark.sql.functions._
import graft.graph.{Matching, PropertyGraph}

/** Dynamic b-suitor (`matching/DynamicBSuitorMatcher.hpp:19`): folding
  * edge insertions into an existing b-matching must land on the SAME
  * matching a from-scratch run computes — exact when edge weights are
  * distinct (strict preferences ⇒ the stable b-matching is unique). */
class DynMatchingSpec extends SparkSpec {

  /** Deterministic distinct-weight graph on n nodes: ring + chords. */
  private def distinctGraph(n: Int) = {
    import spark.implicits._
    val edges = (0 until n).map { i =>
      (i.toLong, ((i + 1) % n).toLong, 1.0 + (i * 37 % 101) / 101.0)
    } ++ (0 until n by 3).map { i =>
      (i.toLong, ((i + n / 2) % n).toLong, 2.0 + (i * 53 % 97) / 97.0)
    }
    edges.toDF("src", "dst", "weight")
  }

  test("bSuitorInsert equals from-scratch bSuitor after insertions (b=1 and b=2)") {
    import spark.implicits._
    val all = distinctGraph(40)
    // the 8 heaviest edges arrive late — they displace existing matches
    val late = all.orderBy(col("weight").desc).limit(8)
    val early = all.except(late)
    for (b <- Seq(1, 2)) {
      val before = Matching.bSuitor(PropertyGraph(early, directed = false), b)
      val after = Matching.bSuitorInsert(
        PropertyGraph(all, directed = false), before, b)
      val scratch = Matching.bSuitor(PropertyGraph(all, directed = false), b)
      assert(after.except(scratch).isEmpty && scratch.except(after).isEmpty,
        s"b=$b: insert-repaired matching must equal from-scratch")
      // capacity respected
      val over = after.select(col("u").as("id")).unionAll(after.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("c")).filter(col("c") > b)
      assert(over.isEmpty)
    }
  }

  test("bSuitorInsert with no new blocking edge is a no-op") {
    import spark.implicits._
    val all = distinctGraph(30)
    val m = Matching.bSuitor(PropertyGraph(all, directed = false), 1)
    val again = Matching.bSuitorInsert(PropertyGraph(all, directed = false), m, 1)
    assert(again.except(m).isEmpty && m.except(again).isEmpty)
  }
}
