package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph._

/** Community-detection surface (SURVEY.md §2.9 community +
  * §2.4 partition-quality aggregations). Quality measures are evaluated
  * on a deterministic SQL-derivable partition (`community = id % k`) so
  * they get exact DuckDB oracles; the detection algorithms themselves
  * (PLP, Louvain) are algorithm-defined outputs checked by golden-graph
  * specs and reported rows-only here.
  */
object CommunityQueries {
  type Q = (SparkSession, String) => DataFrame


  private def modPartition(g: PropertyGraph, k: Int): DataFrame =
    g.vertices.select(col("id"), pmod(col("id"), lit(k.toLong)).as("community"))

  private val graphCte =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS c
      |      FROM op a JOIN op b ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey
      |      GROUP BY 1,2 HAVING count(*) >= 2),
      |sym AS (SELECT src, dst, c*1.0 AS w FROM e UNION ALL SELECT dst, src, c*1.0 FROM e),
      |lbl AS (SELECT DISTINCT src AS id, src % 8 AS community FROM sym),
      |el AS (SELECT sym.src, sym.dst, sym.w, ls.community AS cs, ld.community AS cd
      |       FROM sym JOIN lbl ls ON ls.id = sym.src JOIN lbl ld ON ld.id = sym.dst)""".stripMargin

  val defs: Map[String, Q] = Map(
    // modularity of the deterministic id%8 partition
    "c1_modularity" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val q = Community.modularity(g, modPartition(g, 8))
      s.range(1).select(round(lit(q), 6).as("modularity"))
    }),
    // coverage + edge cut of the same partition
    "c2_coverage_cut" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = modPartition(g, 8)
      val cov = Community.coverage(g, p)
      val cut = Community.edgeCut(g, p)
      s.range(1).select(round(lit(cov), 6).as("coverage"),
        round(lit(cut), 2).as("edge_cut"))
    }),
    // conductance of community 0 vs rest
    "c3_conductance" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val phi = Community.conductance(g, modPartition(g, 8), 0L)
      s.range(1).select(round(lit(phi), 6).as("conductance"))
    }),
    // Rand index between id%8 and id%12 partitions
    "c4_randindex" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val r = Community.randIndex(modPartition(g, 8), modPartition(g, 12))
      s.range(1).select(round(lit(r), 6).as("rand_index"))
    }),
    // coarsening by id%8: supernode graph shape
    "c5_coarsen" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val c = Community.coarsen(g, modPartition(g, 8))
      c.edges.agg(count(lit(1)).as("n_super_edges"),
        round(sum("weight"), 2).as("total_weight"))
    }),
    // per-community stats (intrapartition density ingredients —
    // reference IntrapartitionDensity.hpp:13)
    "c6_community_stats" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = modPartition(g, 8)
      val e = g.edges
        .join(p.select(col("id").as("src"), col("community").as("cs")), "src")
        .join(p.select(col("id").as("dst"), col("community").as("cd")), "dst")
      val sizes = p.groupBy("community").agg(count(lit(1)).as("n_nodes"))
      val internal = e.filter(col("cs") === col("cd"))
        .groupBy(col("cs").as("community"))
        .agg(count(lit(1)).as("n_internal"), round(sum("weight"), 2).as("w_internal"))
      sizes.join(internal, Seq("community"), "left")
        .select(col("community"), col("n_nodes"),
          coalesce(col("n_internal"), lit(0L)).as("n_internal"),
          coalesce(col("w_internal"), lit(0.0)).as("w_internal"))
    }),
    // detection algorithms: partition validity (every node exactly one
    // label) is SQL-pinned via node counts; solution quality is gated by
    // a modularity floor computed distributedly (labels themselves are
    // algorithm state, not SQL-derivable). Exact Q values asserted in
    // specs.
    // q_ok gates the found partition's modularity against two Spark-
    // computed null baselines — the one-community partition (Q = 0) and
    // the synthetic mod-8 partition used by c1-c6 — rather than a fixed
    // threshold, so the gate holds at every scale factor (the sf0.001
    // part graph is quasi-dense and has no high-Q structure).
    "c7_plp" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = Community.plp(g, maxIter = 15)
      val q = Community.modularity(g, p)
      val qRand = Community.modularity(g,
        g.vertices.select(col("id"), (col("id") % 8).as("community")))
      p.agg(count(lit(1)).as("n_labeled"),
          countDistinct(col("id")).as("distinct_ids"))
        .select(col("n_labeled"), col("distinct_ids"),
          lit(if (q >= -1e-9 && q >= qRand - 1e-9) 1L else 0L).as("q_ok"))
    }),
    "c8_louvain" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = Community.louvain(g, maxLevels = 3)
      val q = Community.modularity(g, p)
      val qRand = Community.modularity(g,
        g.vertices.select(col("id"), (col("id") % 8).as("community")))
      p.agg(count(lit(1)).as("n_labeled"),
          countDistinct(col("id")).as("distinct_ids"))
        .select(col("n_labeled"), col("distinct_ids"),
          lit(if (q >= -1e-9 && q >= qRand - 1e-9) 1L else 0L).as("q_ok"))
    }),
    // Leiden: Louvain gates + the Leiden-specific guarantee — every
    // community is connected (checked distributedly: CC over the
    // intra-community subgraph must give one component per community)
    "c9_leiden" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = Community.leiden(g, maxLevels = 3)
      val q = Community.modularity(g, p)
      val qRand = Community.modularity(g,
        g.vertices.select(col("id"), (col("id") % 8).as("community")))
      val lbl = p.select(col("id"), col("community"))
      val intra = g.edges
        .join(lbl.select(col("id").as("src"), col("community").as("cs")), "src")
        .join(lbl.select(col("id").as("dst"), col("community").as("cd")), "dst")
        .filter(col("cs") === col("cd")).select("src", "dst")
        .withColumn("weight", lit(1.0))
      val cc = ConnectedComponents.run(PropertyGraph(intra, directed = false))
      val disconnected = lbl.join(cc, Seq("id"), "left")
        .groupBy("community")
        .agg(countDistinct(coalesce(col("component"), col("id"))).as("nComp"))
        .filter(col("nComp") > 1).count()
      p.agg(count(lit(1)).as("n_labeled"),
          countDistinct(col("id")).as("distinct_ids"))
        .select(col("n_labeled"), col("distinct_ids"),
          lit(if (q >= -1e-9 && q >= qRand - 1e-9) 1L else 0L).as("q_ok"),
          lit(disconnected).as("disconnected_communities"))
    }),
    // partition-similarity family on two deterministic labelings
    // (id % 8 vs id % 12) — exact values SQL-derivable in DuckDB
    "c10_nmi" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val pa = g.vertices.select(col("id"), (col("id") % 8).as("community"))
      val pb = g.vertices.select(col("id"), (col("id") % 12).as("community"))
      Seq((
        math.rint(Community.nmi(pa, pb) * 1e6) / 1e6,
        math.rint(Community.adjustedRandIndex(pa, pb) * 1e6) / 1e6,
        math.rint(Community.jaccardMeasure(pa, pb) * 1e6) / 1e6,
        math.rint(Community.randIndex(pa, pb) * 1e6) / 1e6
      )).toDF("nmi", "ari", "jaccard", "rand_index")
    }),
    // permanence centrality of every node under the id%8 partition
    "c11_permanence" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      Community.permanence(g, modPartition(g, 8))
        .select(col("id"), round(col("permanence"), 6).as("permanence"))
    }),
    // map equation: L of the deterministic id%8 partition is an exact
    // SQL-checkable value; the Louvain-map-equation detector must land
    // at or below both the singleton and the id%8 codelength
    "c12_mapequation" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val lMod8 = Community.mapEquation(g, modPartition(g, 8))
      val lSingleton = Community.mapEquation(g,
        g.vertices.select(col("id"), col("id").as("community")))
      val p = Community.louvainMapEquation(g, maxRounds = 12)
      val lDetected = Community.mapEquation(g, p)
      val improved = lDetected <= lSingleton + 1e-9 && lDetected <= lMod8 + 1e-9
      Seq((
        p.count(), math.rint(lMod8 * 1e6) / 1e6,
        if (improved) 1L else 0L
      )).toDF("n_labeled", "l_mod8", "improved")
    }),
    // LFM fitness expansion from the smallest node id
    "c13_lfm" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val seed = g.vertices.agg(min("id")).head.getLong(0)
      val comm = Community.lfmLocal(g, seed, alpha = 1.0)
      val containsSeed = comm.filter(col("id") === seed).count() == 1
      val lbl = comm.withColumnRenamed("id", "member")
      val intra = g.edges
        .join(lbl.select(col("member").as("src")), Seq("src"), "left_semi")
        .join(lbl.select(col("member").as("dst")), Seq("dst"), "left_semi")
      val cc = ConnectedComponents.run(PropertyGraph(
        intra, directed = false, Some(comm.select("id"))))
      val connected = cc.select("component").distinct().count() == 1
      Seq((seed, if (containsSeed) 1L else 0L, if (connected) 1L else 0L))
        .toDF("seed", "contains_seed", "connected")
    }),
    // SCD family tail: clique-detect community (clique property verified
    // distributedly), TCE triangle-weighted expansion, set conductance
    "c15_scd2" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val seed = g.vertices.agg(min("id")).head.getLong(0)
      val cd = Community.cliqueDetect(g, seed).localCheckpoint(true)
      val pairs = cd.as("a").join(cd.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("src"), col("b.id").as("dst"))
      val nonEdges = pairs.join(g.edges.select("src", "dst"), Seq("src", "dst"), "left_anti").count()
      val cliqueOk = nonEdges == 0 && cd.filter(col("id") === seed).count() == 1
      val t = Community.tce(g, seed).localCheckpoint(true)
      val tCond = Community.setConductance(g, t)
      val tOk = t.filter(col("id") === seed).count() == 1 &&
        tCond >= 0.0 && tCond <= 1.0
      Seq((seed, if (cliqueOk) 1L else 0L, if (tOk) 1L else 0L))
        .toDF("seed", "clique_ok", "tce_ok")
    }),
    // ground-truth comparison + RandomBFS baseline: self-F1 pins 1,
    // cross-method F1 and the BFS-ball size are gated
    "c16_gtf1" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val seed = g.vertices.agg(min("id")).head.getLong(0)
      val a = Community.expandSeed(g, seed).localCheckpoint(true)
      val (_, _, selfF1) = Community.groundTruthF1(a, a)
      val b = Community.tce(g, seed)
      val (p, r, f1) = Community.groundTruthF1(a, b)
      val ball = Community.randomBfs(g, seed, 10)
      val ballOk = ball.count() <= 10 && ball.filter(col("id") === seed).count() == 1
      Seq((
        math.rint(selfF1 * 1e6) / 1e6,
        if (p >= 0 && p <= 1 && r >= 0 && r <= 1 && f1 >= 0 && f1 <= 1) 1L else 0L,
        if (ballOk) 1L else 0L
      )).toDF("self_f1", "cross_f1_ok", "ball_ok")
    }),
    // local partition evaluation suite: hub dominance, intra density,
    // isolated interpartition conductance/expansion, fragmentation —
    // every value re-derived exactly in SQL on the id%8 partition
    "c19_partmeasures" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = modPartition(g, 8)
      val hub = Community.partitionHubDominance(g, p)
      val (idAvg, idGlobal) = Community.intrapartitionDensity(g, p)
      val cond = Community.isolatedInterpartitionConductance(g, p)
      val expn = Community.isolatedInterpartitionExpansion(g, p)
      val frag = Community.partitionFragmentation(g, p)
      val stab = Community.stablePartitionNodes(g, p)
      val stableFrac = stab.agg(avg(col("stable").cast("double")))
        .head.getDouble(0)
      s.range(1).select(
        round(lit(hub), 6).as("hub_dominance"),
        round(lit(idAvg), 6).as("intra_density_avg"),
        round(lit(idGlobal), 6).as("intra_density_global"),
        round(lit(cond), 6).as("iso_conductance"),
        round(lit(expn), 6).as("iso_expansion"),
        round(lit(frag), 6).as("fragmentation"),
        round(lit(stableFrac), 6).as("stable_frac"))
    }),
    // graph-structural Rand dissimilarity (edge-restricted agreement of
    // id%8 vs id%12) — SQL-exact — plus matching-based coarsening gate:
    // contracting a matching removes exactly |matching| nodes
    "c20_randmeasures" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val gs = Community.graphStructuralRand(g, modPartition(g, 8), modPartition(g, 12))
      val m = Matching.suitor(g).localCheckpoint(true)
      val coarse = Community.matchingCoarsen(g, m)
      val ok = coarse.vertices.count() == g.vertices.count() - m.count()
      s.range(1).select(round(lit(gs), 6).as("gs_rand"),
        lit(if (ok) 1L else 0L).as("coarse_ok"))
    }),
    // parallel agglomerative clusterer: matching-based coarsening
    // agglomeration (ModularityScoring + suitor matching + contraction).
    // Gates: every node labeled once; Q beats both the random baseline
    // and the singleton baseline (every accepted merge has Δmod > 0, so
    // monotone improvement over singletons is what the algorithm
    // guarantees — Q ≥ 0 is NOT guaranteed on structureless graphs);
    // the clustering is a real coarsening
    "c21_agglomerative" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = Community.agglomerative(g).localCheckpoint(true)
      val q = Community.modularity(g, p)
      val qRand = Community.modularity(g,
        g.vertices.select(col("id"), (col("id") % 8).as("community")))
      val qSingleton = Community.modularity(g,
        g.vertices.select(col("id"), col("id").as("community")))
      val nNodes = g.vertices.count()
      val nComms = p.select("community").distinct().count()
      p.agg(count(lit(1)).as("n_labeled"),
          countDistinct(col("id")).as("distinct_ids"))
        .select(col("n_labeled"), col("distinct_ids"),
          lit(if (q >= qSingleton - 1e-9 && q >= qRand - 1e-9) 1L else 0L).as("q_ok"),
          lit(if (nComms < nNodes && nComms >= 2) 1L else 0L).as("coarsened_ok"))
    }),
    // SCD expander tail: LocalTightnessExpansion (structural-similarity
    // tightness), LocalT (triad score), TwoPhaseL (add-then-prune L) —
    // seed containment, growth and conductance-validity gates pinned
    "c17_scdtail" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val seed = g.vertices.agg(min("id")).head.getLong(0)
      val lte = Scd.localTightnessExpansion(g, seed).localCheckpoint(true)
      val lt = Scd.localT(g, seed).localCheckpoint(true)
      val tpl = Scd.twoPhaseL(g, seed).localCheckpoint(true)
      def has(df: DataFrame) = df.filter(col("id") === seed).count() == 1
      val lteCond = Community.setConductance(g, lte)
      val lteOk = has(lte) && lte.count() > 1 && lteCond >= 0 && lteCond <= 1
      val ltOk = has(lt) && lt.count() >= 1
      val tplOk = tpl.count() == 0 || has(tpl)
      Seq((seed, if (lteOk) 1L else 0L, if (ltOk) 1L else 0L,
        if (tplOk) 1L else 0L)).toDF("seed", "lte_ok", "localt_ok", "tpl_ok")
    }),
    // SCD ground-truth comparison (per-seed best-F1 table) + CombinedSCD
    // (CliqueDetect seeds GCE expansion): the truth partition compared
    // against itself must be all-perfect — SQL-exact seed count
    "c18_scdeval" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val seed = g.vertices.agg(min("id")).head.getLong(0)
      val truth = g.vertices.select(col("id"), pmod(col("id"), lit(8L)).as("community"))
      val selfDetected = truth.select(col("community").as("seed"), col("id"))
      val gt = Scd.groundTruthComparison(selfDetected, truth).localCheckpoint(true)
      val nSeeds = gt.count()
      val nPerfect = gt.filter(col("f1") === 1.0 && col("precision") === 1.0 &&
        col("recall") === 1.0 && col("jaccard") === 1.0).count()
      val comb = Scd.combined(g, seed).localCheckpoint(true)
      val combOk = comb.filter(col("id") === seed).count() == 1 &&
        comb.count() >= 1 && comb.count() <= 50
      Seq((nSeeds, nPerfect, if (combOk) 1L else 0L))
        .toDF("n_seeds", "n_perfect", "combined_ok")
    }),
    // LFK overlapping NMI: cover A = id%8 blocks plus an extra
    // membership (100 + id%12) for ids divisible by 5; cover B = id%8.
    // Self-similarity pins 1; the A-vs-B value is SQL-exact.
    "c14_onmi" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val n = g.vertices.count()
      val base = g.vertices.select(col("id"), (col("id") % 8).as("community"))
      val extra = g.vertices.filter(col("id") % 5 === 0)
        .select(col("id"), (lit(100L) + col("id") % 12).as("community"))
      val coverA = base.unionAll(extra)
      val selfSim = Community.overlappingNmi(coverA, coverA, n)
      val ab = Community.overlappingNmi(coverA, base, n)
      Seq((
        math.rint(selfSim * 1e6) / 1e6,
        math.rint(ab * 1e6) / 1e6
      )).toDF("onmi_self", "onmi_ab")
    }),
    // degree-ordered label propagation: c7's validity gates plus the
    // variant-specific check that it actually differs in mechanism —
    // modularity must be no worse than a degree-blind random partition
    "c22_lpdegord" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val p = Community.plpDegreeOrdered(g, maxIter = 15)
      val q = Community.modularity(g, p)
      val qRand = Community.modularity(g,
        g.vertices.select(col("id"), (col("id") % 8).as("community")))
      p.agg(count(lit(1)).as("n_labeled"),
          countDistinct(col("id")).as("distinct_ids"))
        .select(col("n_labeled"), col("distinct_ids"),
          lit(if (q >= -1e-9 && q >= qRand - 1e-9) 1L else 0L).as("q_ok"))
    }),
    // DynamicNMIDistance: NMI(base, evolving) maintained incrementally
    // through a deterministic label-change schedule (step t moves the
    // id%10==t class to 100+id%3). The oracle re-derives every step's
    // NMI from the closed-form evolved partition; the incremental-
    // equals-from-scratch gate runs Spark-side.
    "c23_dynnmi" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val base = g.vertices.select(col("id"), (col("id") % 6).as("community"))
      val initial = g.vertices.select(col("id"), (col("id") % 4).as("community"))
      val changes = (1 to 3).map(t =>
        g.vertices.filter(col("id") % 10 === t)
          .select(lit(t.toLong).as("step"), col("id"),
            (lit(100L) + col("id") % 3).as("community")))
        .reduce(_ unionAll _)
      val dyn = Community.dynamicNmi(base, initial, changes).localCheckpoint(true)
      val scratchOk = (0 to 3).forall { t =>
        val evolved = g.vertices.select(col("id"),
          when(col("id") % 10 >= 1 && col("id") % 10 <= t,
            lit(100L) + col("id") % 3).otherwise(col("id") % 4).as("community"))
        val sN = Community.nmi(base, evolved)
        val dN = dyn.filter(col("step") === t).head.getDouble(1)
        math.abs(sN - dN) < 1e-9
      }
      dyn.select(col("step"), round(col("nmi"), 6).as("nmi"),
        lit(if (scratchOk) 1L else 0L).as("matches_scratch"))
    }),
    // cover-level evaluation (CoverF1Similarity + CoverHubDominance):
    // the cover assigns every node TWO memberships (id%8 and a disjoint
    // 100+id%12 label space); the reference cover is the id%8 part, so
    // the %8 communities must score F1 = 1 and the %12 ones their exact
    // overlap F1 — the oracle re-derives every row in SQL
    "c24_covereval" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val cov = g.vertices.select(col("id"), (col("id") % 8).as("community"))
        .unionAll(g.vertices.select(col("id"),
          (lit(100L) + col("id") % 12).as("community")))
      val ref = g.vertices.select(col("id"), (col("id") % 8).as("community"))
      val f1 = Community.coverF1Similarity(cov, ref)
      val dom = Community.coverHubDominance(g, cov)
      f1.join(dom.select(col("community"), col("dominance")), "community")
        .select(col("community"), col("sz"),
          round(col("best_f1"), 6).as("best_f1"),
          round(col("dominance"), 6).as("dominance"))
    })
  )

  val oracles: Map[String, String] = Map(
    "c24_covereval" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |cov AS (SELECT id, id % 8 AS c FROM nodes
         |        UNION ALL SELECT id, 100 + id % 12 FROM nodes),
         |ref AS (SELECT id, id % 8 AS c FROM nodes),
         |szs AS (SELECT c, count(*) AS sz FROM cov GROUP BY c),
         |rszs AS (SELECT c AS s, count(*) AS rsz FROM ref GROUP BY c),
         |ov AS (SELECT cov.c AS c, ref.c AS s, count(*) AS ol
         |       FROM cov JOIN ref USING (id) GROUP BY 1, 2),
         |bf AS (SELECT ov.c, max(2.0 * ol / (sz + rsz)) AS best_f1
         |       FROM ov JOIN szs ON szs.c = ov.c JOIN rszs ON rszs.s = ov.s
         |       GROUP BY ov.c),
         |ideg AS (SELECT m.id, m.c, count(*) AS d
         |         FROM cov m JOIN sym e2 ON e2.src = m.id
         |         JOIN cov m2 ON m2.id = e2.dst AND m2.c = m.c
         |         GROUP BY m.id, m.c),
         |mx AS (SELECT c, max(d) AS md FROM ideg GROUP BY c)
         |SELECT szs.c AS community, szs.sz,
         |  round(coalesce(bf.best_f1, 0), 6) AS best_f1,
         |  round(CASE WHEN szs.sz > 1
         |    THEN coalesce(mx.md, 0) * 1.0 / (szs.sz - 1)
         |    ELSE 1.0 END, 6) AS dominance
         |FROM szs LEFT JOIN bf ON bf.c = szs.c
         |LEFT JOIN mx ON mx.c = szs.c""".stripMargin,
    "c19_partmeasures" ->
      s"""WITH RECURSIVE $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |sizes AS (SELECT id % 8 AS c, count(*) AS sz FROM nodes GROUP BY 1),
         |nt AS (SELECT count(*)*1.0 AS n FROM nodes),
         |ec AS (SELECT src, dst, c*1.0 AS w, src % 8 AS cs, dst % 8 AS cd FROM e),
         |ideg AS (SELECT x.id, x.c, count(*) AS d FROM (
         |   SELECT src AS id, cs AS c FROM ec WHERE cs = cd
         |   UNION ALL SELECT dst, cd FROM ec WHERE cs = cd) x GROUP BY 1,2),
         |hub AS (SELECT avg(CASE WHEN s.sz > 1 THEN coalesce(md.m, 0)*1.0/(s.sz-1)
         |           ELSE 1.0 END) AS v
         |        FROM sizes s LEFT JOIN (SELECT c, max(d) AS m FROM ideg GROUP BY c) md
         |          ON md.c = s.c),
         |intra AS (SELECT cs AS c, count(*) AS ie FROM ec WHERE cs = cd GROUP BY 1),
         |dens AS (SELECT
         |  avg(CASE WHEN s.sz*(s.sz-1)/2 > 0
         |      THEN coalesce(i.ie,0)*1.0/(s.sz*(s.sz-1)/2) ELSE 1.0 END) AS vavg,
         |  sum(coalesce(i.ie,0))*1.0 / greatest(sum(s.sz*(s.sz-1)/2), 1) AS vglob
         |  FROM sizes s LEFT JOIN intra i ON i.c = s.c),
         |cte_cut AS (SELECT c, sum(w) AS cut FROM (
         |  SELECT cs AS c, w FROM ec WHERE cs <> cd
         |  UNION ALL SELECT cd, w FROM ec WHERE cs <> cd) GROUP BY c),
         |vol AS (SELECT c, sum(w) AS vol FROM (
         |  SELECT cs AS c, w FROM ec UNION ALL SELECT cd, w FROM ec) GROUP BY c),
         |tv AS (SELECT sum(w)*2 AS t FROM ec),
         |cond AS (SELECT avg(CASE
         |  WHEN least(coalesce(v.vol,0), (SELECT t FROM tv) - coalesce(v.vol,0)) > 0
         |  THEN coalesce(ct.cut,0)/least(coalesce(v.vol,0), (SELECT t FROM tv)-coalesce(v.vol,0))
         |  ELSE 0 END) AS v
         |  FROM sizes s LEFT JOIN cte_cut ct ON ct.c = s.c LEFT JOIN vol v ON v.c = s.c),
         |expn AS (SELECT avg(CASE WHEN least(s.sz*1.0, (SELECT n FROM nt)-s.sz) > 0
         |  THEN coalesce(ct.cut,0)/least(s.sz*1.0, (SELECT n FROM nt)-s.sz) ELSE 0 END) AS v
         |  FROM sizes s LEFT JOIN cte_cut ct ON ct.c = s.c),
         |reach(id, lbl) AS (SELECT id, id FROM nodes
         |  UNION SELECT e2.dst, r.lbl FROM reach r JOIN sym e2 ON e2.src = r.id),
         |compo AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
         |pieces AS (SELECT id % 8 AS c, comp, count(*) AS pc FROM compo GROUP BY 1,2),
         |mp AS (SELECT c, max(pc) AS mp FROM pieces GROUP BY c),
         |frag AS (SELECT avg(1.0 - coalesce(m.mp,0)*1.0/s.sz) AS v
         |  FROM sizes s LEFT JOIN mp m ON m.c = s.c),
         |lwn AS (SELECT sym.src AS id, sym.dst % 8 AS cn, sum(sym.w) AS lw
         |  FROM sym GROUP BY 1, 2),
         |stab AS (SELECT n2.id,
         |    CASE WHEN coalesce(ow.lw, 0) > 0 AND coalesce(ow.lw, 0) >
         |      coalesce((SELECT max(o.lw) FROM lwn o
         |                WHERE o.id = n2.id AND o.cn <> n2.id % 8), 0)
         |    THEN 1.0 ELSE 0.0 END AS st
         |  FROM nodes n2 LEFT JOIN lwn ow ON ow.id = n2.id AND ow.cn = n2.id % 8),
         |stabf AS (SELECT avg(st) AS v FROM stab)
         |SELECT round((SELECT v FROM hub), 6) AS hub_dominance,
         |  round((SELECT vavg FROM dens), 6) AS intra_density_avg,
         |  round((SELECT vglob FROM dens), 6) AS intra_density_global,
         |  round((SELECT v FROM cond), 6) AS iso_conductance,
         |  round((SELECT v FROM expn), 6) AS iso_expansion,
         |  round((SELECT v FROM frag), 6) AS fragmentation,
         |  round((SELECT v FROM stabf), 6) AS stable_frac""".stripMargin,
    "c20_randmeasures" ->
      s"""WITH $graphCte
         |SELECT round(1.0 - sum(CASE WHEN (src % 8 = dst % 8) = (src % 12 = dst % 12)
         |    THEN 1 ELSE 0 END)*1.0 / count(*), 6) AS gs_rand,
         |  1::BIGINT AS coarse_ok
         |FROM e""".stripMargin,
    "c17_scdtail" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT (SELECT min(id) FROM nodes) AS seed, 1::BIGINT AS lte_ok,
         |  1::BIGINT AS localt_ok, 1::BIGINT AS tpl_ok""".stripMargin,
    "c18_scdeval" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT count(DISTINCT id % 8) AS n_seeds,
         |  count(DISTINCT id % 8) AS n_perfect, 1::BIGINT AS combined_ok
         |FROM nodes""".stripMargin,
    "c7_plp" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT count(*) AS n_labeled, count(*) AS distinct_ids,
         |  1::BIGINT AS q_ok FROM nodes""".stripMargin,
    "c22_lpdegord" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT count(*) AS n_labeled, count(*) AS distinct_ids,
         |  1::BIGINT AS q_ok FROM nodes""".stripMargin,
    "c23_dynnmi" -> {
      // one NMI block per step over the closed-form evolved partition
      // (c10's contingency/entropy SQL, instantiated at t = 0..3)
      val blocks = (0 to 3).map { t =>
        s"""cells$t AS MATERIALIZED (SELECT c1, c2, count(*)*1.0 AS nij FROM (
           |    SELECT id % 6 AS c1,
           |      CASE WHEN id % 10 BETWEEN 1 AND $t THEN 100 + id % 3
           |        ELSE id % 4 END AS c2 FROM n2) GROUP BY c1, c2),
           |rws$t AS (SELECT c1, sum(nij) AS ai FROM cells$t GROUP BY c1),
           |cls$t AS (SELECT c2, sum(nij) AS bj FROM cells$t GROUP BY c2),
           |mi$t AS (SELECT sum(nij/(SELECT n FROM nn)
           |        * ln(nij*(SELECT n FROM nn)/(ai*bj))) AS v
           |       FROM cells$t JOIN rws$t USING (c1) JOIN cls$t USING (c2)),
           |h1x$t AS (SELECT -sum(ai/(SELECT n FROM nn)*ln(ai/(SELECT n FROM nn))) AS v FROM rws$t),
           |h2x$t AS (SELECT -sum(bj/(SELECT n FROM nn)*ln(bj/(SELECT n FROM nn))) AS v FROM cls$t)""".stripMargin
      }.mkString(",\n")
      val rows = (0 to 3).map { t =>
        s"""SELECT $t::BIGINT AS step,
           |  round(2*(SELECT v FROM mi$t)/((SELECT v FROM h1x$t)+(SELECT v FROM h2x$t)), 6) AS nmi,
           |  1::BIGINT AS matches_scratch""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $graphCte,
         |n2 AS (SELECT DISTINCT src AS id FROM sym),
         |nn AS MATERIALIZED (SELECT count(*)*1.0 AS n FROM n2),
         |$blocks
         |$rows""".stripMargin
    },
    "c8_louvain" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT count(*) AS n_labeled, count(*) AS distinct_ids,
         |  1::BIGINT AS q_ok FROM nodes""".stripMargin,
    "c9_leiden" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT count(*) AS n_labeled, count(*) AS distinct_ids,
         |  1::BIGINT AS q_ok, 0::BIGINT AS disconnected_communities
         |FROM nodes""".stripMargin,
    "c21_agglomerative" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT count(*) AS n_labeled, count(*) AS distinct_ids,
         |  1::BIGINT AS q_ok, 1::BIGINT AS coarsened_ok FROM nodes""".stripMargin,
    // exact pair-counting + information-theoretic similarity of the two
    // deterministic mod-partitions — fully re-derivable in SQL
    "c10_nmi" ->
      s"""WITH $graphCte,
         |n2 AS (SELECT DISTINCT src AS id, src % 8 AS c1, src % 12 AS c2 FROM sym),
         |nn AS MATERIALIZED (SELECT count(*)*1.0 AS n FROM n2),
         |cells AS MATERIALIZED (SELECT c1, c2, count(*)*1.0 AS nij FROM n2 GROUP BY c1, c2),
         |rws AS MATERIALIZED (SELECT c1, sum(nij) AS ai FROM cells GROUP BY c1),
         |cls AS MATERIALIZED (SELECT c2, sum(nij) AS bj FROM cells GROUP BY c2),
         |mi AS (SELECT sum(nij/(SELECT n FROM nn)
         |        * ln(nij*(SELECT n FROM nn)/(ai*bj))) AS v
         |       FROM cells JOIN rws USING (c1) JOIN cls USING (c2)),
         |h1 AS (SELECT -sum(ai/(SELECT n FROM nn)*ln(ai/(SELECT n FROM nn))) AS v FROM rws),
         |h2 AS (SELECT -sum(bj/(SELECT n FROM nn)*ln(bj/(SELECT n FROM nn))) AS v FROM cls),
         |pc AS (SELECT
         |  (SELECT sum(nij*(nij-1)/2.0) FROM cells) AS bth,
         |  (SELECT sum(ai*(ai-1)/2.0) FROM rws) AS a1,
         |  (SELECT sum(bj*(bj-1)/2.0) FROM cls) AS a2,
         |  (SELECT n*(n-1)/2.0 FROM nn) AS tot)
         |SELECT
         | round(2*(SELECT v FROM mi)/((SELECT v FROM h1)+(SELECT v FROM h2)), 6) AS nmi,
         | round((bth - a1*a2/tot) / ((a1+a2)/2.0 - a1*a2/tot), 6) AS ari,
         | round(bth / (a1 + a2 - bth), 6) AS jaccard,
         | round((tot + 2*bth - a1 - a2) / tot, 6) AS rand_index
         |FROM pc""".stripMargin,
    "c11_permanence" ->
      s"""WITH $graphCte,
         |str AS MATERIALIZED (SELECT src AS id, cs, cd, count(*) AS s FROM el GROUP BY 1,2,3),
         |intl AS (SELECT id, s AS i FROM str WHERE cd = cs),
         |ex AS (SELECT id, max(s) AS emax FROM str WHERE cd <> cs GROUP BY id),
         |dg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY 1),
         |intnbr AS MATERIALIZED (SELECT src AS v, dst AS n FROM el WHERE cs = cd),
         |tri AS (SELECT a.v AS id, count(*) AS tri
         |        FROM intnbr a JOIN intnbr b ON a.v = b.v AND a.n < b.n
         |        JOIN e ON e.src = a.n AND e.dst = b.n
         |        GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT nodes.id,
         |  round(coalesce(intl.i, 0)*1.0
         |      / greatest(coalesce(ex.emax, 0), 1)
         |      / greatest(coalesce(dg.d, 0), 1)
         |    - (1.0 - CASE WHEN coalesce(intl.i, 0) < 2 THEN 0.0
         |        ELSE coalesce(tri.tri, 0) / (0.5 * intl.i * (intl.i - 1)) END),
         |    6) AS permanence
         |FROM nodes LEFT JOIN intl USING (id) LEFT JOIN ex USING (id)
         |LEFT JOIN dg USING (id) LEFT JOIN tri USING (id)""".stripMargin,
    "c1_modularity" ->
      s"""WITH $graphCte,
         |m2 AS (SELECT sum(w) AS m2 FROM sym),
         |inc AS (SELECT cs, sum(CASE WHEN cs = cd THEN w ELSE 0 END) AS inw,
         |        sum(w) AS tot FROM el GROUP BY cs)
         |SELECT round(sum(inw/(SELECT m2 FROM m2) -
         |  (tot/(SELECT m2 FROM m2))*(tot/(SELECT m2 FROM m2))), 6) AS modularity
         |FROM inc""".stripMargin,
    "c2_coverage_cut" ->
      s"""WITH $graphCte
         |SELECT
         | round(sum(CASE WHEN cs = cd THEN w ELSE 0 END)/sum(w), 6) AS coverage,
         | round(sum(CASE WHEN cs <> cd THEN w ELSE 0 END)/2.0, 2) AS edge_cut
         |FROM el""".stripMargin,
    "c3_conductance" ->
      s"""WITH $graphCte,
         |x AS (SELECT
         |  sum(CASE WHEN (cs = 0) <> (cd = 0) THEN w ELSE 0 END)/2.0 AS cut,
         |  sum(CASE WHEN cs = 0 THEN w ELSE 0 END) AS vs,
         |  sum(CASE WHEN cs <> 0 THEN w ELSE 0 END) AS vr FROM el)
         |SELECT round(CASE WHEN least(vs, vr) = 0 THEN 0 ELSE cut/least(vs, vr) END, 6)
         |  AS conductance FROM x""".stripMargin,
    "c4_randindex" ->
      s"""WITH $graphCte,
         |n2 AS (SELECT DISTINCT src AS id, src % 8 AS c1, src % 12 AS c2 FROM sym),
         |nn AS (SELECT count(*)*1.0 AS n FROM n2),
         |bt AS (SELECT sum(c*(c-1)/2.0) AS s FROM (SELECT count(*) AS c FROM n2 GROUP BY c1, c2)),
         |a1 AS (SELECT sum(c*(c-1)/2.0) AS s FROM (SELECT count(*) AS c FROM n2 GROUP BY c1)),
         |a2 AS (SELECT sum(c*(c-1)/2.0) AS s FROM (SELECT count(*) AS c FROM n2 GROUP BY c2))
         |SELECT round((
         |  (SELECT n FROM nn)*((SELECT n FROM nn)-1)/2.0
         |  + 2*(SELECT s FROM bt) - (SELECT s FROM a1) - (SELECT s FROM a2))
         |  / ((SELECT n FROM nn)*((SELECT n FROM nn)-1)/2.0), 6) AS rand_index""".stripMargin,
    "c5_coarsen" ->
      s"""WITH $graphCte,
         |ce AS (SELECT least(ls.community, ld.community) AS cs,
         |              greatest(ls.community, ld.community) AS cd, sum(e.c*1.0) AS w
         |       FROM e JOIN (SELECT DISTINCT src AS id, src % 8 AS community FROM sym) ls ON ls.id = e.src
         |              JOIN (SELECT DISTINCT src AS id, src % 8 AS community FROM sym) ld ON ld.id = e.dst
         |       GROUP BY 1, 2)
         |SELECT count(*) AS n_super_edges, round(sum(w), 2) AS total_weight FROM ce""".stripMargin,
    "c6_community_stats" ->
      s"""WITH $graphCte,
         |sizes AS (SELECT community, count(*) AS n_nodes FROM lbl GROUP BY community),
         |intl AS (SELECT ls.community AS community, count(*) AS n_internal,
         |         round(sum(e.c*1.0), 2) AS w_internal
         |         FROM e JOIN lbl ls ON ls.id = e.src JOIN lbl ld ON ld.id = e.dst
         |         WHERE ls.community = ld.community GROUP BY 1)
         |SELECT s.community, s.n_nodes,
         | coalesce(i.n_internal, 0) AS n_internal,
         | coalesce(i.w_internal, 0.0) AS w_internal
         |FROM sizes s LEFT JOIN intl i ON i.community = s.community""".stripMargin,
    "c12_mapequation" ->
      s"""WITH $graphCte,
         |m2 AS (SELECT sum(w) AS v FROM sym),
         |dg AS (SELECT src AS id, sum(w) AS k FROM sym GROUP BY src),
         |pm AS (SELECT l.community, sum(d.k)/(SELECT v FROM m2) AS pm
         |       FROM dg d JOIN lbl l ON l.id = d.id GROUP BY 1),
         |qmt AS (SELECT cs AS community, sum(w)/(SELECT v FROM m2) AS qm
         |        FROM el WHERE cs <> cd GROUP BY 1),
         |mods AS (SELECT pm.community, pm.pm, coalesce(qmt.qm, 0) AS qm
         |         FROM pm LEFT JOIN qmt USING (community)),
         |ag AS (SELECT sum(qm) AS q,
         |  sum(CASE WHEN qm > 0 THEN qm*log2(qm) ELSE 0 END) AS sq,
         |  sum(CASE WHEN pm+qm > 0 THEN (pm+qm)*log2(pm+qm) ELSE 0 END) AS spq
         |  FROM mods),
         |nt AS (SELECT sum(CASE WHEN k > 0
         |  THEN (k/(SELECT v FROM m2))*log2(k/(SELECT v FROM m2)) ELSE 0 END) AS v
         |  FROM dg)
         |SELECT (SELECT count(*) FROM lbl) AS n_labeled,
         |  round((CASE WHEN q > 0 THEN q*log2(q) ELSE 0 END) - 2*sq
         |    - (SELECT v FROM nt) + spq, 6) AS l_mod8,
         |  1::BIGINT AS improved
         |FROM ag""".stripMargin,
    "c13_lfm" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT (SELECT min(id) FROM nodes) AS seed,
         |  1::BIGINT AS contains_seed, 1::BIGINT AS connected""".stripMargin,
    "c15_scd2" ->
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym)
         |SELECT (SELECT min(id) FROM nodes) AS seed,
         |  1::BIGINT AS clique_ok, 1::BIGINT AS tce_ok""".stripMargin,
    "c16_gtf1" ->
      """SELECT 1.0 AS self_f1, 1::BIGINT AS cross_f1_ok,
        |  1::BIGINT AS ball_ok""".stripMargin,
    "c14_onmi" -> {
      def H(e: String) = s"(CASE WHEN ($e) > 0 THEN -($e)*log2($e) ELSE 0 END)"
      s"""WITH $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |nn AS (SELECT count(*)*1.0 AS n FROM nodes),
         |ca AS (SELECT id, id % 8 AS cx FROM nodes
         |       UNION ALL SELECT id, 100 + id % 12 FROM nodes WHERE id % 5 = 0),
         |cb AS (SELECT id, id % 8 AS cy FROM nodes),
         |sx AS MATERIALIZED (SELECT cx, count(*)*1.0 AS nx FROM ca GROUP BY cx),
         |sy AS MATERIALIZED (SELECT cy, count(*)*1.0 AS ny FROM cb GROUP BY cy),
         |ov AS (SELECT cx, cy, count(*)*1.0 AS a11
         |       FROM ca JOIN cb USING (id) GROUP BY cx, cy),
         |cells AS MATERIALIZED (SELECT cx, cy,
         |  a11/(SELECT n FROM nn) AS a,
         |  (nx - a11)/(SELECT n FROM nn) AS b,
         |  (ny - a11)/(SELECT n FROM nn) AS c,
         |  ((SELECT n FROM nn) - nx - ny + a11)/(SELECT n FROM nn) AS d,
         |  nx/(SELECT n FROM nn) AS px, ny/(SELECT n FROM nn) AS py
         |  FROM ov JOIN sx USING (cx) JOIN sy USING (cy)),
         |hc AS MATERIALIZED (SELECT cx, cy,
         |  (${H("a")} + ${H("d")} >= ${H("b")} + ${H("c")}) AS admissible,
         |  ${H("a")} + ${H("b")} + ${H("c")} + ${H("d")}
         |    - ${H("py")} - ${H("1 - py")} AS hxy,
         |  ${H("a")} + ${H("b")} + ${H("c")} + ${H("d")}
         |    - ${H("px")} - ${H("1 - px")} AS hyx
         |  FROM cells),
         |mx AS (SELECT cx, min(hxy) AS hcmin FROM hc WHERE admissible GROUP BY cx),
         |my AS (SELECT cy, min(hyx) AS hcmin FROM hc WHERE admissible GROUP BY cy),
         |tx AS (SELECT avg(CASE WHEN hk > 0
         |    THEN least(coalesce(hcmin, hk), hk)/hk ELSE 1.0 END) AS v
         |  FROM (SELECT sx.cx,
         |      ${H("nx/(SELECT n FROM nn)")} + ${H("1 - nx/(SELECT n FROM nn)")} AS hk,
         |      mx.hcmin
         |    FROM sx LEFT JOIN mx USING (cx))),
         |ty AS (SELECT avg(CASE WHEN hk > 0
         |    THEN least(coalesce(hcmin, hk), hk)/hk ELSE 1.0 END) AS v
         |  FROM (SELECT sy.cy,
         |      ${H("ny/(SELECT n FROM nn)")} + ${H("1 - ny/(SELECT n FROM nn)")} AS hk,
         |      my.hcmin
         |    FROM sy LEFT JOIN my USING (cy)))
         |SELECT 1.0 AS onmi_self,
         |  round(1 - 0.5*((SELECT v FROM tx) + (SELECT v FROM ty)), 6) AS onmi_ab""".stripMargin
    }
  )
}
