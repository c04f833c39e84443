package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph._
import graft.algebra.Coo
import graft.ml.Multimodal

/** Queries for the extended operator families: algebra (semiring
  * matmul), sparsification, spanning forest, matching, MIS, ANF
  * sketches, generators, multimodal plumbing. SQL-expressible ones get
  * DuckDB oracles; the rest are rows-only with invariants asserted in
  * ScalaTest.
  */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame


  private val graphCte =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS c
      |      FROM op a JOIN op b ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey
      |      GROUP BY 1,2 HAVING count(*) >= 2),
      |sym AS (SELECT src, dst, c FROM e UNION ALL SELECT dst, src, c FROM e),
      |deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)""".stripMargin

  val defs: Map[String, Q] = Map(
    // semiring MxV: adjacency × degree vector (arithmetic semiring)
    "x1_mxv" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val a = Coo.adjacencyMatrix(g)
      val x = g.degrees.select(col("id").as("i"), col("degree").cast("double").as("v"))
      Coo.mxv(a, x).select(col("i"), round(col("v"), 6).as("v"))
    }),
    // semiring MxV min-plus: one relaxation step of shortest paths
    "x2_mxv_minplus" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val a = Coo.adjacencyMatrix(g)
      val x = g.vertices.select(col("id").as("i"), lit(0.0).as("v"))
      Coo.mxv(a, x, Coo.minPlus).select(col("i"), round(col("v"), 6).as("v"))
    }),
    // Laplacian row sums must be 0 — emitted per node for hashing
    "x3_laplacian" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      Coo.laplacianMatrix(g).groupBy("i")
        .agg(round(sum("v"), 6).as("rowsum"), count(lit(1)).as("nnz"))
    }),
    // triangle edge score + threshold sparsification
    "x4_sparsify" -> ((s, dir) => {
      val scored = Sparsification.triangleScore(DerivedGraphs.partGraph(s, dir, 2))
      scored.filter(col("score") >= 1)
        .agg(count(lit(1)).as("kept_edges"), round(sum("weight"), 2).as("kept_weight"))
    }),
    // MSF: total weight + edge count (weight multiset of any MSF is
    // unique, but not SQL-derivable → rows-only, invariants in spec)
    "x5_msf" -> ((s, dir) =>
      SpanningForest.totalWeight(DerivedGraphs.partGraph(s, dir, 2))),
    // suitor matching: summary (rows-only; validity in spec)
    "x6_matching" -> ((s, dir) => {
      val m = Matching.suitor(DerivedGraphs.partGraph(s, dir, 2))
      m.agg(count(lit(1)).as("n_pairs"), round(sum("weight"), 2).as("total_weight"))
    }),
    // Luby MIS: members (rows-only; validity in spec)
    "x7_mis" -> ((s, dir) =>
      IndependentSet.luby(DerivedGraphs.partGraph(s, dir, 2)).orderBy("id")),
    // ANF sketch neighborhood function (approximate → rows-only;
    // accuracy asserted vs exact BFS in spec)
    "x8_anf" -> ((s, dir) =>
      NeighborhoodFunction.approximate(DerivedGraphs.partGraph(s, dir, 2), maxH = 12)),
    // generator determinism surface (hash-based → rows-only)
    "x9_generators" -> ((s, dir) => {
      val er = Generators.erdosRenyi(s, 500, 0.02)
      val ws = Generators.wattsStrogatz(s, 500, 4, 0.1)
      val rm = Generators.rmat(s, 9, 4)
      er.edges.agg(count(lit(1)).as("n")).select(lit("er").as("gen"), col("n"))
        .unionAll(ws.edges.agg(count(lit(1)).as("n")).select(lit("ws").as("gen"), col("n")))
        .unionAll(rm.edges.agg(count(lit(1)).as("n")).select(lit("rmat").as("gen"), col("n")))
    }),
    // multimodal: media stats per kind (byte lengths SQL-checkable)
    "x10_media" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      media.groupBy("kind").agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("content"))).as("total_bytes"),
        sum("meta_duration_ms").as("total_ms"))
    }),
    // multimodal: frame-sampling plan size per video
    "x11_frames" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      Multimodal.sampleFrames(media, 1000L)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
    }),
    // multimodal: stub decode features (deterministic fake → rows-only)
    "x12_features" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      Multimodal.featureStats(Multimodal.extractFeatures(media))
    }),
    // harmonic closeness for 5 sources (recursive-CTE oracle)
    "x13_harmonic" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val sources = g.vertices.orderBy("id").limit(5).select(col("id").as("source"))
      ShortestPaths.harmonicCloseness(ShortestPaths.bfs(g, sources))
        .select(col("id"), round(col("harmonic"), 6).as("harmonic"))
    }),
    // hashed random walks: per-step node-visit counts (hash-determined
    // transitions → deterministic, but not SQL-derivable → rows-only;
    // edge-validity of every transition is spec-checked)
    "x15_walks" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      Walks.randomWalks(g, walksPerNode = 1, len = 4)
        .groupBy("step").agg(count(lit(1)).as("n"),
          countDistinct(col("node")).as("n_distinct"))
    }),
    // SCC on the directed customer→supplier purchase graph (bipartite ⇒
    // every SCC is a singleton — exact oracle on the component count)
    "x16_scc" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val ord = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val e = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst"))
        .distinct().withColumn("weight", lit(1.0))
      val g = PropertyGraph(e, directed = true)
      val scc = Digraph.stronglyConnectedComponents(g)
      scc.agg(count(lit(1)).as("n_nodes"),
        countDistinct(col("component")).as("n_components"))
    }),
    // hub-labeling distances (reference PrunedLandmarkLabeling): top-5
    // degree hubs, queried on all pairs of the 10 smallest node ids
    "x17_hublabel" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val labels = HubLabeling.build(g, 5)
      val ids = g.vertices.orderBy("id").limit(10)
      val pairs = ids.as("a").join(ids.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("u"), col("b.id").as("v"))
      HubLabeling.query(labels, pairs)
    }),
    // eccentricity of 5 sources (recursive-CTE oracle)
    "x14_ecc" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val sources = g.vertices.orderBy("id").limit(5).select(col("id").as("source"))
      ShortestPaths.eccentricity(ShortestPaths.bfs(g, sources))
        .select(col("source").as("id"), col("ecc"), col("reached"))
    })
  )

  val oracles: Map[String, String] = Map(
    "x1_mxv" ->
      s"""WITH $graphCte
         |SELECT sym.src AS i, round(sum(sym.c * d.d * 1.0), 6) AS v
         |FROM sym JOIN deg d ON d.id = sym.dst GROUP BY sym.src""".stripMargin,
    "x2_mxv_minplus" ->
      s"""WITH $graphCte
         |SELECT src AS i, round(min(c + 0.0), 6) AS v FROM sym GROUP BY src""".stripMargin,
    "x3_laplacian" ->
      s"""WITH $graphCte,
         |a AS (SELECT src AS i, dst AS j, -(c*1.0) AS v FROM sym),
         |d AS (SELECT src AS i, src AS j, sum(c*1.0) AS v FROM sym GROUP BY src),
         |l AS (SELECT i, j, sum(v) AS v FROM (SELECT * FROM a UNION ALL SELECT * FROM d) GROUP BY i, j)
         |SELECT i, round(sum(v), 6) AS rowsum, count(*) AS nnz FROM l GROUP BY i""".stripMargin,
    "x4_sparsify" ->
      s"""WITH $graphCte,
         |adj AS (SELECT src, dst FROM sym),
         |cn AS (SELECT a.dst AS u, b.dst AS v, count(*) AS score
         |       FROM adj a JOIN adj b ON a.src=b.src AND a.dst < b.dst GROUP BY 1,2)
         |SELECT count(*) AS kept_edges, round(sum(e.c*1.0), 2) AS kept_weight
         |FROM e JOIN cn ON cn.u=e.src AND cn.v=e.dst WHERE cn.score >= 1""".stripMargin,
    "x10_media" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        | count(*) AS n,
        | sum(octet_length(text::BLOB)) AS total_bytes,
        | sum(n_chars * 10) AS total_ms
        |FROM documents GROUP BY 1""".stripMargin,
    "x11_frames" ->
      """SELECT doc_id AS media_id, count(*) AS n_frames
        |FROM documents, unnest(range(0, greatest(n_chars*10 - 1, 0) + 1, 1000)) AS t(f)
        |WHERE doc_id % 3 = 2 GROUP BY doc_id""".stripMargin,
    "x16_scc" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
        |SELECT count(*) AS n_nodes, count(*) AS n_components FROM n""".stripMargin,
    "x13_harmonic" ->
      s"""WITH RECURSIVE $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |srcs AS (SELECT id FROM nodes ORDER BY id LIMIT 5),
         |reach(s, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN sym e2 ON e2.src=r.id WHERE r.dist < 20),
         |d AS (SELECT s, id, min(dist) AS dist FROM reach GROUP BY s, id)
         |SELECT s AS id, round(sum(1.0/dist), 6) AS harmonic
         |FROM d WHERE id <> s GROUP BY s""".stripMargin,
    "x17_hublabel" ->
      s"""WITH RECURSIVE $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |hubs AS (SELECT id FROM deg ORDER BY d DESC, id LIMIT 5),
         |reach(h, id, dist) AS (
         |  SELECT id, id, 0 FROM hubs
         |  UNION
         |  SELECT r.h, e2.dst, r.dist+1 FROM reach r JOIN sym e2 ON e2.src=r.id WHERE r.dist < 20),
         |lab AS (SELECT h, id, min(dist) AS d FROM reach GROUP BY h, id),
         |ids AS (SELECT id FROM nodes ORDER BY id LIMIT 10),
         |pairs AS (SELECT a.id AS u, b.id AS v FROM ids a JOIN ids b ON a.id < b.id)
         |SELECT u, v, min(la.d + lb.d)::BIGINT AS dist
         |FROM pairs JOIN lab la ON la.id = u JOIN lab lb ON lb.id = v AND la.h = lb.h
         |GROUP BY u, v""".stripMargin,
    "x14_ecc" ->
      s"""WITH RECURSIVE $graphCte,
         |nodes AS (SELECT DISTINCT src AS id FROM sym),
         |srcs AS (SELECT id FROM nodes ORDER BY id LIMIT 5),
         |reach(s, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN sym e2 ON e2.src=r.id WHERE r.dist < 20),
         |d AS (SELECT s, id, min(dist) AS dist FROM reach GROUP BY s, id)
         |SELECT s AS id, max(dist)::BIGINT AS ecc, count(*) AS reached
         |FROM d GROUP BY s""".stripMargin
  )
}
