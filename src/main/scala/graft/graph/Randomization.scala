package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Degree-preserving graph randomization (reference
  * `randomization/EdgeSwitching.hpp`, `GlobalCurveball.hpp:24` — both
  * sample the fixed-degree-sequence ensemble).
  *
  * Spark-first realization of edge switching: each round hash-pairs the
  * edges, proposes the double-edge swap (a,b)+(c,d) → (a,d)+(c,b), and
  * REJECTS any proposal that would create a self-loop, a duplicate of
  * an existing edge, or collide with another simultaneous proposal —
  * rejected pairs keep their original edges. Every accepted swap is a
  * local degree-preserving rewiring and rejections change nothing, so
  * the degree sequence is invariant by construction (the oracle checks
  * exactly that). All checks are joins/group-bys; no sequential swap
  * list (the documented deviation from the reference's sequential
  * Markov chain — same stationary ensemble, parallel-safe steps).
  */
object Randomization {

  /** Salted pairing buckets: windows are PARTITIONED by bucket, so the
    * per-round rank sort never funnels through one task; sized off the
    * session's parallelism so each bucket holds ~|E|/(4·cores) rows. */
  private def pairBuckets(df: DataFrame): Int =
    math.max(32, df.sparkSession.sparkContext.defaultParallelism * 4)

  private[graft] def round(edges: DataFrame, seed: Long): DataFrame = {
    // pair edges by hashed rank WITHIN salted buckets: 2k with 2k+1;
    // (bucket, k) folded into one unique pair id. An odd bucket leaves
    // its last edge unpaired (kept verbatim) — pairing choice has no
    // semantic weight, any matching samples the same swap ensemble.
    val nB = pairBuckets(edges)
    val ranked = edges
      .withColumn("bkt", pmod(
        xxhash64(lit(seed ^ 3), col("src"), col("dst")), lit(nB.toLong)))
      .withColumn("r", row_number().over(
        Window.partitionBy("bkt").orderBy(
          xxhash64(lit(seed), col("src"), col("dst")), col("src"), col("dst")))
        .cast("long") - 1)
      .withColumn("p", expr("r div 2") * nB + col("bkt"))
    val a = ranked.filter(col("r") % 2 === 0)
      .select(col("p"), col("src").as("a"), col("dst").as("b"))
    val bDf = ranked.filter(col("r") % 2 === 1)
      .select(col("p"), col("src").as("c"), col("dst").as("d"))
    val pairs = a.join(bDf, "p")
    val unpaired = a.join(bDf, Seq("p"), "left_anti")
      .select(col("a").as("src"), col("b").as("dst"))

    // proposal: swap targets, direction chosen by a hash bit
    val prop = pairs.withColumn("flip",
        pmod(xxhash64(lit(seed + 1), col("p")), lit(2)) === 0)
      .withColumn("n1s", when(col("flip"), col("a")).otherwise(col("a")))
      .withColumn("n1d", when(col("flip"), col("d")).otherwise(col("c")))
      .withColumn("n2s", when(col("flip"), col("c")).otherwise(col("b")))
      .withColumn("n2d", when(col("flip"), col("b")).otherwise(col("d")))
      .withColumn("e1s", least(col("n1s"), col("n1d")))
      .withColumn("e1d", greatest(col("n1s"), col("n1d")))
      .withColumn("e2s", least(col("n2s"), col("n2d")))
      .withColumn("e2d", greatest(col("n2s"), col("n2d")))
      // structural validity: 4 distinct endpoints, no self loops, and the
      // two proposed edges differ
      .withColumn("valid",
        col("n1s") =!= col("n1d") && col("n2s") =!= col("n2d") &&
          !(col("e1s") === col("e2s") && col("e1d") === col("e2d")) &&
          col("a") =!= col("c") && col("a") =!= col("d") &&
          col("b") =!= col("c") && col("b") =!= col("d"))

    // reject proposals whose new edges already exist in the graph
    val existing = edges.select(col("src").as("es"), col("dst").as("ed"))
    val hit1 = prop.join(existing,
      col("e1s") === col("es") && col("e1d") === col("ed"), "left_semi")
      .select(col("p")).withColumn("badExisting", lit(true))
    val hit2 = prop.join(existing,
      col("e2s") === col("es") && col("e2d") === col("ed"), "left_semi")
      .select(col("p")).withColumn("badExisting", lit(true))
    val badExisting = hit1.unionAll(hit2).distinct()

    // reject proposals whose new edges collide with other proposals
    val proposed = prop.filter(col("valid"))
      .select(col("p"), col("e1s").as("s"), col("e1d").as("d2"))
      .unionAll(prop.filter(col("valid"))
        .select(col("p"), col("e2s").as("s"), col("e2d").as("d2")))
    val collisions = proposed.groupBy("s", "d2").agg(collect_list("p").as("ps"))
      .filter(size(col("ps")) > 1)
      .select(explode(col("ps")).as("p")).distinct()

    val rejected = badExisting.select("p").unionAll(collisions).distinct()
    val accepted = prop.filter(col("valid"))
      .join(rejected, Seq("p"), "left_anti")
    val keptPairs = prop.join(accepted.select("p"), Seq("p"), "left_anti")
      .select(col("a").as("src"), col("b").as("dst"))
      .unionAll(prop.join(accepted.select("p"), Seq("p"), "left_anti")
        .select(col("c").as("src"), col("d").as("dst")))
    val swapped = accepted.select(col("e1s").as("src"), col("e1d").as("dst"))
      .unionAll(accepted.select(col("e2s").as("src"), col("e2d").as("dst")))
    swapped.unionAll(keptPairs).unionAll(unpaired)
  }

  /** `rounds` simultaneous edge-switching rounds; node set and degree
    * sequence preserved exactly. */
  def edgeSwitching(g: PropertyGraph, rounds: Int = 5,
      seed: Long = 42): PropertyGraph = {
    var edges = PropertyGraph.canonicalizeUndirected(
        g.edges.filter(col("src") =!= col("dst")))
      .select("src", "dst").distinct()
      .localCheckpoint(true)
    for (r <- 0 until rounds)
      edges = round(edges, seed + 1000L * r).localCheckpoint(true)
    PropertyGraph(edges.withColumn("weight", lit(1.0)),
      directed = false, g.verticesOpt)
  }

  /** One global curveball trade round, parallel-safe
    * (reference `GlobalCurveball.hpp:24`): nodes are hash-paired; each
    * pair (u,v) trades the neighbors adjacent to exactly one of them,
    * re-dealing the disjoint pool uniformly while u keeps its count.
    *
    * Parallel-safety deviations from the sequential reference, same
    * fixed-degree ensemble: (a) each edge is OWNED by one endpoint per
    * round (hash bit), so two pairs never trade the same edge; (b) a
    * pooled neighbor adjacent to the partner under *any* ownership is
    * treated as common and kept — exactly curveball's common-neighbor
    * rule, extended to unowned adjacency so re-deals cannot create
    * multi-edges. All steps are keyed joins/group-bys. */
  private[graft] def curveballRound(edges: DataFrame, seed: Long): DataFrame = {
    // pair nodes by hashed rank WITHIN salted buckets: 2k with 2k+1
    // (odd ones out keep their edges via the n===2 pair filter below)
    val nodes = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct()
    val nB = pairBuckets(edges)
    val ranked = nodes
      .withColumn("bkt", pmod(xxhash64(lit(seed ^ 5), col("id")), lit(nB.toLong)))
      .withColumn("r", row_number().over(
        Window.partitionBy("bkt").orderBy(xxhash64(lit(seed), col("id")), col("id")))
        .cast("long") - 1)
    val pairAss = ranked.select(col("id"),
      (expr("r div 2") * nB + col("bkt")).as("p"), (col("r") % 2).as("side"))
    val maxPair = pairAss.groupBy("p").agg(count(lit(1)).as("n"))
      .filter(col("n") === 2).select("p")
    val inPair = pairAss.join(maxPair, "p") // drop the unpaired node

    // edge ownership: one endpoint per round, hash bit
    val owned = edges.withColumn("ownSrc",
      pmod(xxhash64(lit(seed ^ 7), col("src"), col("dst")), lit(2L)) === 0)
    val ownRows = owned.select(
        when(col("ownSrc"), col("src")).otherwise(col("dst")).as("owner"),
        when(col("ownSrc"), col("dst")).otherwise(col("src")).as("nbr"))

    // owned rows of paired nodes, tagged with pair + side + partner
    val partners = inPair.as("a").join(inPair.as("b"),
        col("a.p") === col("b.p") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("a.p").as("p"),
        col("a.side").as("side"), col("b.id").as("partner"))
    val ownedOfPaired = ownRows.join(partners, ownRows("owner") === partners("id"))
      .select(col("p"), col("side"), col("owner"), col("partner"), col("nbr"))
    // the partner edge itself never trades
    val partnerEdges = ownedOfPaired.filter(col("nbr") === col("partner"))
    val tradable = ownedOfPaired.filter(col("nbr") =!= col("partner"))

    // common rule: nbr adjacent (any ownership) to the partner → fixed
    val sym = edges.select(col("src").as("x"), col("dst").as("y"))
      .unionAll(edges.select(col("dst").as("x"), col("src").as("y")))
    val fixedCommon = tradable.join(sym,
      tradable("partner") === sym("x") && tradable("nbr") === sym("y"), "left_semi")
    val pool = tradable.join(sym,
      tradable("partner") === sym("x") && tradable("nbr") === sym("y"), "left_anti")

    // re-deal the pool: side-0's member keeps its original slot count,
    // slots assigned by hashed shuffle within the pair
    val members = partners.filter(col("side") === 0)
      .select(col("p"), col("id").as("m0"), col("partner").as("m1"))
    val dealt = pool.withColumn("ku",
        sum(when(col("side") === 0, 1L).otherwise(0L)).over(Window.partitionBy("p")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy(xxhash64(lit(seed ^ 13), col("p"), col("nbr")), col("nbr"))))
      .join(members, "p")
      .select(when(col("rn") <= col("ku"), col("m0")).otherwise(col("m1")).as("owner"),
        col("nbr"))

    // rebuild: owned rows of unpaired nodes + partner edges + fixed
    // common neighbors + the re-dealt pool
    val untouched = ownRows.join(partners, ownRows("owner") === partners("id"), "left_anti")
    val rebuilt = untouched.select("owner", "nbr")
      .unionAll(partnerEdges.select("owner", "nbr"))
      .unionAll(fixedCommon.select("owner", "nbr"))
      .unionAll(dealt)
    rebuilt.select(least(col("owner"), col("nbr")).as("src"),
      greatest(col("owner"), col("nbr")).as("dst"))
  }

  /** `trades` global curveball rounds; degree sequence invariant. */
  def globalCurveball(g: PropertyGraph, trades: Int = 5,
      seed: Long = 42): PropertyGraph = {
    var edges = PropertyGraph.canonicalizeUndirected(
        g.edges.filter(col("src") =!= col("dst")))
      .select("src", "dst").distinct()
      .localCheckpoint(true)
    for (r <- 0 until trades)
      edges = curveballRound(edges, seed + 777L * r).localCheckpoint(true)
    PropertyGraph(edges.withColumn("weight", lit(1.0)),
      directed = false, g.verticesOpt)
  }

  /** DegreePreservingShuffle (reference
    * `randomization/DegreePreservingShuffle.hpp:32`): permute node ids
    * WITHIN equal-degree classes (equal (in, out) pairs when directed),
    * so every id keeps its exact degree while the labeling randomizes —
    * the unbiased null model for id-correlated structure. Distributed
    * shape: one degree aggregation, then two keyed rankings inside each
    * degree class (by id, and by a seeded hash) zipped rank-to-rank —
    * windows PARTITIONED by the degree key, never a global sort.
    * Returns the relabeled graph; `degreePreservingPermutation` exposes
    * the `(id, newId)` mapping itself. */
  def degreePreservingPermutation(g: PropertyGraph, seed: Long = 42): DataFrame = {
    val deg =
      if (g.directed) {
        val out = g.edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("dout"))
        val in = g.edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("din"))
        g.vertices.select("id")
          .join(out, Seq("id"), "left").join(in, Seq("id"), "left")
          .select(col("id"),
            concat_ws("_", coalesce(col("din"), lit(0L)),
              coalesce(col("dout"), lit(0L))).as("dkey"))
      } else
        g.vertices.select("id")
          .join(g.adjacency.groupBy(col("src").as("id"))
            .agg(count(lit(1)).as("d")), Seq("id"), "left")
          .select(col("id"), coalesce(col("d"), lit(0L)).cast("string").as("dkey"))
    val byId = Window.partitionBy("dkey").orderBy("id")
    val byHash = Window.partitionBy("dkey")
      .orderBy(xxhash64(lit(seed), col("id")), col("id"))
    deg.withColumn("r", row_number().over(byId))
      .select(col("dkey"), col("r"), col("id"))
      .join(deg.withColumn("r", row_number().over(byHash))
        .select(col("dkey"), col("r"), col("id").as("newId")),
        Seq("dkey", "r"))
      .select("id", "newId")
  }

  /** Apply [[degreePreservingPermutation]] to the edge table. */
  def degreePreservingShuffle(g: PropertyGraph, seed: Long = 42): PropertyGraph = {
    val m = degreePreservingPermutation(g, seed)
    val e = g.edges
      .join(m.withColumnRenamed("id", "src"), "src")
      .withColumnRenamed("newId", "nsrc")
      .join(m.withColumnRenamed("id", "dst"), "dst")
      .withColumnRenamed("newId", "ndst")
      .select(col("nsrc").as("src"), col("ndst").as("dst"), col("weight"))
    PropertyGraph(
      if (g.directed) e else PropertyGraph.canonicalizeUndirected(e),
      g.directed, g.verticesOpt)
  }
}
