package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph._

/** Graph operator surface (SURVEY.md §2.9) exercised on graphs derived
  * deterministically from the driver's tables, so every operator gets a
  * DuckDB oracle (plain SQL for aggregates, recursive CTEs for
  * traversals, unrolled iterations for power methods).
  *
  * Graph: parts are vertices; parts are adjacent iff they co-occur in at
  * least `minShared` distinct orders (edge weight = co-occurrence count).
  * `minShared = 1` → dense graph (~116k edges @ sf0.01); `minShared = 2`
  * → sparse graph (~3.4k edges, 9 components) used for traversal ops.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame


  /** Shared SQL prologue: canonical edges `e(src,dst,c)`, symmetric view
    * `sym`, weighted symmetric view `symw`, `nodes`, `deg`. */
  private def graphCte(minShared: Int): String =
    s"""op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS c
       |      FROM op a JOIN op b ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey
       |      GROUP BY 1,2 HAVING count(*) >= $minShared),
       |sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
       |symw AS (SELECT src, dst, c FROM e UNION ALL SELECT dst, src, c FROM e),
       |nodes AS (SELECT DISTINCT src AS id FROM sym),
       |deg AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY src)""".stripMargin

  /** Brandes betweenness oracle: BFS distances by recursive CTE, then
    * the layered DP unrolled per level — σ(w) = Σ_{v∈N(w), d(v)=d(w)−1}
    * σ(v) forward, δ(v) = Σ_{w∈N(v), d(w)=d(v)+1} σ(v)/σ(w)(1+δ(w))
    * backward. Validated cell-exact against an in-memory Brandes.
    * Every level CTE is referenced more than once → MATERIALIZED. */
  /** Exact σ path-count oracle (single source, HUGEINT arithmetic —
    * DuckDB's 128-bit integer mirrors our DECIMAL(38,0)): BFS levels by
    * recursive CTE, then σ(w) = Σ_{v∈N(w), d(v)=d(w)−1} σ(v) unrolled
    * per level. */
  private def pathCountSql(minShared: Int, depth: Int): String = {
    val sigLevels = (1 to depth).map { k =>
      s"""sig$k AS MATERIALIZED (
         |  SELECT d.id, sum(sp.sigma) AS sigma
         |  FROM dm d JOIN symm e ON e.dst = d.id
         |  JOIN sig${k - 1} sp ON sp.id = e.src
         |  JOIN dm dp ON dp.id = e.src AND dp.dist = ${k - 1}
         |  WHERE d.dist = $k GROUP BY d.id)""".stripMargin
    }.mkString(",\n")
    val allSig = (0 to depth).map(k => s"SELECT * FROM sig$k").mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${graphCte(minShared)},
       |symm AS MATERIALIZED (SELECT src, dst FROM sym),
       |srcs AS (SELECT id FROM nodes ORDER BY id LIMIT 1),
       |reach(id, dist) AS (
       |  SELECT id, 0 FROM srcs
       |  UNION
       |  SELECT e2.dst, r.dist+1 FROM reach r JOIN symm e2 ON e2.src=r.id
       |  WHERE r.dist < $depth),
       |dm AS MATERIALIZED (SELECT id, min(dist) AS dist FROM reach GROUP BY id),
       |sig0 AS MATERIALIZED (SELECT id, 1::HUGEINT AS sigma FROM dm WHERE dist = 0),
       |$sigLevels,
       |sig AS ($allSig)
       |SELECT dm.id, dm.dist::BIGINT AS dist, sig.sigma::VARCHAR AS sigma
       |FROM dm JOIN sig ON sig.id = dm.id""".stripMargin
  }

  /** Unrolled 3-step greedy group-closeness oracle (farness with
    * unreachable penalty P): replays GroupCentrality.groupCloseness's
    * A − C + T + P·uncovered decomposition per step. */
  private def groupClosenessSql(minShared: Int, pool: Int): String = {
    val P = 1000000L
    s"""WITH RECURSIVE ${graphCte(minShared)},
       |symm AS MATERIALIZED (SELECT src, dst FROM sym),
       |cand AS MATERIALIZED (SELECT id FROM deg ORDER BY d DESC, id LIMIT $pool),
       |reach(s, id, dist) AS (
       |  SELECT id, id, 0 FROM cand
       |  UNION
       |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN symm e2 ON e2.src = r.id
       |  WHERE r.dist < 20),
       |dm AS MATERIALIZED (SELECT s, id, min(dist) AS dist FROM reach GROUP BY s, id),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |s1 AS (SELECT s, sum(dist) + $P*((SELECT n FROM nn) - count(*)) AS farness
       |       FROM dm GROUP BY s),
       |b1 AS MATERIALIZED (SELECT s, farness FROM s1 ORDER BY farness ASC, s ASC LIMIT 1),
       |d1 AS MATERIALIZED (SELECT dm.id, dm.dist AS d FROM dm JOIN b1 ON dm.s = b1.s),
       |t1 AS (SELECT sum(d) AS ts, count(*) AS rs FROM d1),
       |s2 AS (SELECT dm.s,
       |    sum(least(dm.dist, coalesce(d1.d, $P)))
       |    - sum(CASE WHEN d1.d IS NOT NULL THEN d1.d ELSE 0 END)
       |    + (SELECT ts FROM t1)
       |    + $P*((SELECT n FROM nn) - (count(*) + (SELECT rs FROM t1)
       |        - sum(CASE WHEN d1.d IS NOT NULL THEN 1 ELSE 0 END))) AS farness
       |  FROM dm LEFT JOIN d1 ON d1.id = dm.id
       |  WHERE dm.s NOT IN (SELECT s FROM b1) GROUP BY dm.s),
       |b2 AS MATERIALIZED (SELECT s, farness FROM s2 ORDER BY farness ASC, s ASC LIMIT 1),
       |dn2 AS MATERIALIZED (SELECT dm.id, dm.dist FROM dm JOIN b2 ON dm.s = b2.s),
       |d2 AS MATERIALIZED (SELECT coalesce(d1.id, dn2.id) AS id,
       |    least(coalesce(d1.d, $P), coalesce(dn2.dist, $P)) AS d
       |  FROM d1 FULL JOIN dn2 ON dn2.id = d1.id),
       |t2 AS (SELECT sum(d) AS ts, count(*) AS rs FROM d2),
       |s3 AS (SELECT dm.s,
       |    sum(least(dm.dist, coalesce(d2.d, $P)))
       |    - sum(CASE WHEN d2.d IS NOT NULL THEN d2.d ELSE 0 END)
       |    + (SELECT ts FROM t2)
       |    + $P*((SELECT n FROM nn) - (count(*) + (SELECT rs FROM t2)
       |        - sum(CASE WHEN d2.d IS NOT NULL THEN 1 ELSE 0 END))) AS farness
       |  FROM dm LEFT JOIN d2 ON d2.id = dm.id
       |  WHERE dm.s NOT IN (SELECT s FROM b1 UNION SELECT s FROM b2) GROUP BY dm.s),
       |b3 AS MATERIALIZED (SELECT s, farness FROM s3 ORDER BY farness ASC, s ASC LIMIT 1)
       |SELECT 1::BIGINT AS rank, s AS id, farness::BIGINT AS farness FROM b1
       |UNION ALL SELECT 2, s, farness::BIGINT FROM b2
       |UNION ALL SELECT 3, s, farness::BIGINT FROM b3""".stripMargin
  }

  /** Unrolled 2-step greedy GedWalk oracle: φ-gain via total-walks minus
    * walks-avoiding-R DPs, α-weights emitted as exact Scala doubles so
    * both engines multiply identical literals. */
  private def gedWalkSql(minShared: Int, pool: Int, alpha: Double, maxLen: Int): String = {
    def a(l: Int) = math.pow(alpha, l).toString
    // total-walk DP t_l and S={b1}-avoiding DP a_l over all nodes;
    // candidate-keyed DPs w_l (R={cand}) and v_l (R={b1, cand})
    val tLevels = (1 to maxLen).map { l =>
      s"""t$l AS MATERIALIZED (SELECT s.src AS id, sum(t.x) AS x
         |  FROM t${l - 1} t JOIN symm s ON s.dst = t.id GROUP BY s.src)""".stripMargin
    }.mkString(",\n")
    val wLevels = (1 to maxLen).map { l =>
      s"""w$l AS MATERIALIZED (SELECT w.cand, s.src AS id, sum(w.x) AS x
         |  FROM w${l - 1} w JOIN symm s ON s.dst = w.id
         |  WHERE s.src <> w.cand GROUP BY w.cand, s.src)""".stripMargin
    }.mkString(",\n")
    val aLevels = (1 to maxLen).map { l =>
      s"""a$l AS MATERIALIZED (SELECT s.src AS id, sum(a.x) AS x
         |  FROM a${l - 1} a JOIN symm s ON s.dst = a.id
         |  WHERE s.src <> (SELECT s FROM b1) GROUP BY s.src)""".stripMargin
    }.mkString(",\n")
    val vLevels = (1 to maxLen).map { l =>
      s"""v$l AS MATERIALIZED (SELECT v.cand, s.src AS id, sum(v.x) AS x
         |  FROM v${l - 1} v JOIN symm s ON s.dst = v.id
         |  WHERE s.src <> v.cand AND s.src <> (SELECT s FROM b1)
         |  GROUP BY v.cand, s.src)""".stripMargin
    }.mkString(",\n")
    val tScore = (1 to maxLen).map(l => s"(SELECT coalesce(sum(x),0)*${a(l)} FROM t$l)").mkString(" + ")
    val wScore = (1 to maxLen).map(l => s"coalesce((SELECT sum(x) FROM w$l w WHERE w.cand = c.id),0)*${a(l)}").mkString(" + ")
    val aScore = (1 to maxLen).map(l => s"(SELECT coalesce(sum(x),0)*${a(l)} FROM a$l)").mkString(" + ")
    val vScore = (1 to maxLen).map(l => s"coalesce((SELECT sum(x) FROM v$l v WHERE v.cand = c.id),0)*${a(l)}").mkString(" + ")
    s"""WITH ${graphCte(minShared)},
       |symm AS MATERIALIZED (SELECT src, dst FROM sym),
       |cand AS MATERIALIZED (SELECT id FROM deg ORDER BY d DESC, id LIMIT $pool),
       |t0 AS (SELECT id, 1.0 AS x FROM nodes),
       |$tLevels,
       |w0 AS MATERIALIZED (SELECT c.id AS cand, n.id, 1.0 AS x
       |  FROM cand c JOIN nodes n ON n.id <> c.id),
       |$wLevels,
       |g1 AS (SELECT c.id, ($tScore) - ($wScore) AS gain FROM cand c),
       |b1 AS MATERIALIZED (SELECT id AS s, gain FROM g1 ORDER BY gain DESC, id ASC LIMIT 1),
       |a0 AS (SELECT id, 1.0 AS x FROM nodes WHERE id <> (SELECT s FROM b1)),
       |$aLevels,
       |v0 AS MATERIALIZED (SELECT c.id AS cand, n.id, 1.0 AS x
       |  FROM cand c JOIN nodes n ON n.id <> c.id
       |  WHERE c.id <> (SELECT s FROM b1) AND n.id <> (SELECT s FROM b1)),
       |$vLevels,
       |g2 AS (SELECT c.id, ($aScore) - ($vScore) AS gain FROM cand c
       |  WHERE c.id <> (SELECT s FROM b1)),
       |b2 AS MATERIALIZED (SELECT id AS s, gain FROM g2 ORDER BY gain DESC, id ASC LIMIT 1)
       |SELECT 1::BIGINT AS rank, s AS id, round(gain, 6) AS gain FROM b1
       |UNION ALL SELECT 2, s, round(gain, 6) FROM b2""".stripMargin
  }

  /** PageRank-Nibble oracle: `iters` unrolled personalized-PageRank
    * steps from the min-id seed, then the rounded r/deg sweep with two
    * window cumsums — the exact replay of PageRankNibble.sweep. */
  private def nibbleSql(minShared: Int, alpha: Double, iters: Int, maxSweep: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT d.id,
         | ${1.0 - alpha}*(CASE WHEN d.id = (SELECT sd FROM seed) THEN 1.0 ELSE 0 END)
         |   + $alpha*coalesce(ctr.s, 0) AS r
         | FROM dgw d LEFT JOIN (
         |   SELECT s.dst AS id, sum(p.r*s.c/dg.d) AS s
         |   FROM p${i - 1} p JOIN symw s ON s.src = p.id JOIN dgw dg ON dg.id = p.id
         |   GROUP BY s.dst) ctr USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCte(minShared)},
       |dgw AS MATERIALIZED (SELECT src AS id, sum(c*1.0) AS d FROM symw GROUP BY src),
       |seed AS (SELECT min(id) AS sd FROM nodes),
       |m2t AS (SELECT sum(d) AS m2 FROM dgw),
       |p0 AS (SELECT id, CASE WHEN id = (SELECT sd FROM seed) THEN 1.0 ELSE 0 END AS r
       |       FROM dgw),
       |$steps,
       |rk AS MATERIALIZED (SELECT p.id, d.d,
       |    row_number() OVER (ORDER BY round(p.r/d.d, 9) DESC, p.id ASC) AS rnk
       |  FROM p$iters p JOIN dgw d ON d.id = p.id WHERE p.r > 0),
       |rk2 AS MATERIALIZED (SELECT * FROM rk WHERE rnk <= $maxSweep),
       |iw AS (SELECT greatest(a.rnk, b.rnk) AS rnk, sum(e.c*1.0) AS iw
       |  FROM e JOIN rk2 a ON a.id = e.src JOIN rk2 b ON b.id = e.dst GROUP BY 1),
       |sw AS (SELECT rk2.rnk, rk2.id,
       |    sum(rk2.d) OVER (ORDER BY rk2.rnk) AS vol,
       |    sum(coalesce(iw.iw, 0)) OVER (ORDER BY rk2.rnk) AS iwc
       |  FROM rk2 LEFT JOIN iw ON iw.rnk = rk2.rnk),
       |cond AS (SELECT rnk, id,
       |    CASE WHEN least(vol, (SELECT m2 FROM m2t) - vol) > 0
       |      THEN (vol - 2.0*iwc)/least(vol, (SELECT m2 FROM m2t) - vol)
       |      ELSE 1.0 END AS conductance
       |  FROM sw)
       |SELECT (SELECT sd FROM seed) AS seed, rnk::BIGINT AS best_k,
       |  round(conductance, 6) AS best_conductance
       |FROM cond ORDER BY conductance ASC, rnk ASC LIMIT 1""".stripMargin
  }

  private def brandesSql(minShared: Int, nSources: Int, depth: Int): String = {
    val sigLevels = (1 to depth).map { k =>
      s"""sig$k AS MATERIALIZED (
         |  SELECT d.s, d.id, sum(sp.sigma) AS sigma
         |  FROM dm d JOIN symm e ON e.dst = d.id
         |  JOIN sig${k - 1} sp ON sp.s = d.s AND sp.id = e.src
         |  JOIN dm dp ON dp.s = d.s AND dp.id = e.src AND dp.dist = ${k - 1}
         |  WHERE d.dist = $k GROUP BY d.s, d.id)""".stripMargin
    }.mkString(",\n")
    val delLevels = (s"delL$depth AS MATERIALIZED (SELECT s, id, 0.0 AS delta FROM dm WHERE dist = $depth)" +:
      (depth - 1 to 0 by -1).map { k =>
        s"""delL$k AS MATERIALIZED (
           |  SELECT v.s, v.id,
           |    coalesce(sum(sv.sigma / sw.sigma * (1.0 + dw.delta)), 0.0) AS delta
           |  FROM dm v
           |  JOIN sig sv ON sv.s = v.s AND sv.id = v.id
           |  LEFT JOIN symm e ON e.src = v.id
           |  LEFT JOIN dm w ON w.s = v.s AND w.id = e.dst AND w.dist = ${k + 1}
           |  LEFT JOIN sig sw ON sw.s = v.s AND sw.id = w.id
           |  LEFT JOIN delL${k + 1} dw ON dw.s = v.s AND dw.id = w.id
           |  WHERE v.dist = $k
           |  GROUP BY v.s, v.id)""".stripMargin
      }).mkString(",\n")
    val allDel = (0 to depth).map(k => s"SELECT * FROM delL$k").mkString(" UNION ALL ")
    val allSig = (0 to depth).map(k => s"SELECT * FROM sig$k").mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${graphCte(minShared)},
       |symm AS MATERIALIZED (SELECT src, dst FROM sym),
       |srcs AS (SELECT id FROM nodes ORDER BY id LIMIT $nSources),
       |reach(s, id, dist) AS (
       |  SELECT id, id, 0 FROM srcs
       |  UNION
       |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN symm e2 ON e2.src=r.id
       |  WHERE r.dist < $depth),
       |dm AS MATERIALIZED (SELECT s, id, min(dist) AS dist FROM reach GROUP BY s, id),
       |sig0 AS MATERIALIZED (SELECT s, id, 1.0 AS sigma FROM dm WHERE dist = 0),
       |$sigLevels,
       |sig AS MATERIALIZED ($allSig),
       |$delLevels,
       |alldel AS ($allDel)
       |SELECT n.id,
       |  round(coalesce(sum(CASE WHEN a.id <> a.s THEN a.delta END), 0.0) / 2.0, 4) AS score
       |FROM nodes n LEFT JOIN alldel a ON a.id = n.id
       |GROUP BY n.id""".stripMargin
  }

  /** Unrolled k-core peel oracle: each round keeps nodes with ≥ k
    * neighbors inside the surviving set; `rounds` is sized to the
    * measured convergence at sf0.01 (11) plus slack — extra rounds are
    * idempotent at the fixpoint. */
  private def kcorePeelSql(minShared: Int, k: Int, rounds: Int): String = {
    // each round references the previous one twice: MATERIALIZED stops
    // DuckDB's default CTE inlining from doubling the plan per round
    val steps = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (SELECT s.src AS id FROM symm s
         | JOIN c${i - 1} a ON a.id = s.src JOIN c${i - 1} b ON b.id = s.dst
         | GROUP BY s.src HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCte(minShared)},
       |symm AS MATERIALIZED (SELECT src, dst FROM sym),
       |c0 AS (SELECT id FROM nodes),
       |$steps
       |SELECT id FROM c$rounds ORDER BY id""".stripMargin
  }

  /** Unrolled PageRank oracle: `iters` pull iterations, damping 0.85,
    * no sinks (undirected graph from edges), rounded to 6 decimals. */
  private def pagerankSql(minShared: Int, iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT d.id,
         | 0.15/(SELECT n FROM nn) + 0.85*coalesce(ctr.s, 0) AS r
         | FROM deg d LEFT JOIN (
         |   SELECT s.dst AS id, sum(r.r/dg.d) AS s
         |   FROM r${i - 1} r JOIN sym s ON s.src=r.id JOIN deg dg ON dg.id=r.id
         |   GROUP BY s.dst) ctr USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCte(minShared)},
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT id, 1.0/(SELECT n FROM nn) AS r FROM deg),
       |$steps
       |SELECT id, round(r, 6) AS pagerank FROM r$iters""".stripMargin
  }

  /** Unrolled Katz oracle: x ← α·Ax + β on the symmetric adjacency. */
  private def katzSql(minShared: Int, iters: Int, alpha: Double, beta: Double): String = {
    val steps = (1 to iters).map { i =>
      s"""k$i AS (SELECT d.id, $alpha*coalesce(ctr.s, 0) + $beta AS x
         | FROM deg d LEFT JOIN (
         |   SELECT s.dst AS id, sum(k.x) AS s
         |   FROM k${i - 1} k JOIN sym s ON s.src=k.id GROUP BY s.dst) ctr USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCte(minShared)},
       |k0 AS (SELECT id, 0.0 AS x FROM deg),
       |$steps
       |SELECT id, round(x, 6) AS katz FROM k$iters""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    // ---- dense graph (minShared = 1) ----
    "g1_degree" -> ((s, dir) =>
      DerivedGraphs.partGraph(s, dir, 1).degrees),
    "g2_stats" -> ((s, dir) =>
      GraphOps.stats(DerivedGraphs.partGraph(s, dir, 1))),
    "g3_assortativity" -> ((s, dir) =>
      GraphOps.assortativity(DerivedGraphs.partGraph(s, dir, 1))
        .select(round(col("assortativity"), 6).as("assortativity"))),

    // ---- sparse graph (minShared = 2) ----
    "g4_cc" -> ((s, dir) =>
      ConnectedComponents.run(DerivedGraphs.partGraph(s, dir, 2))),
    "g5_cc_sizes" -> ((s, dir) =>
      ConnectedComponents.sizes(ConnectedComponents.run(DerivedGraphs.partGraph(s, dir, 2)))),
    "g6_bfs" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val src = g.vertices.agg(min("id").as("source"))
      ShortestPaths.bfs(g, src).select(col("id"), col("dist"))
    }),
    "g7_pagerank" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      PageRank.run(g, damping = 0.85, tol = 0.0, maxIter = 10)
        .select(col("id"), round(col("rank"), 6).as("pagerank"))
    }),
    "g8_triangles" -> ((s, dir) =>
      Triangles.triangleCount(DerivedGraphs.partGraph(s, dir, 2))),
    "g9_lcc" -> ((s, dir) =>
      Triangles.localClusteringCoefficient(DerivedGraphs.partGraph(s, dir, 2))
        .select(col("id"), round(col("lcc"), 6).as("lcc"))),
    "g10_jaccard" -> ((s, dir) =>
      LinkPrediction.jaccard(DerivedGraphs.partGraph(s, dir, 2))
        .select(col("u"), col("v"), round(col("jaccard"), 6).as("jaccard"))),
    "g11_adamicadar" -> ((s, dir) =>
      LinkPrediction.adamicAdar(DerivedGraphs.partGraph(s, dir, 2))
        .select(col("u"), col("v"), round(col("adamic_adar"), 6).as("adamic_adar"))),
    "g12_commonneighbors" -> ((s, dir) =>
      LinkPrediction.commonNeighbors(DerivedGraphs.partGraph(s, dir, 2))),
    "g13_closeness" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val sources = g.vertices.orderBy("id").limit(5).select(col("id").as("source"))
      ShortestPaths.closeness(ShortestPaths.bfs(g, sources))
        .select(col("id"), round(col("closeness"), 6).as("closeness"))
    }),
    "g14_twohop" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val adj = g.adjacency.select("src", "dst")
      val wedge = adj.as("a").join(adj.as("b"), col("a.dst") === col("b.src"))
        .filter(col("b.dst") =!= col("a.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      adj.unionAll(wedge).distinct()
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("n2hop"))
    }),
    "g15_wdegree" -> ((s, dir) =>
      DerivedGraphs.partGraph(s, dir, 2).weightedDegrees
        .select(col("id"), round(col("wdegree"), 6).as("wdegree"))),
    "g16_katz" -> ((s, dir) => {
      val g = GraphOps.toUnweighted(DerivedGraphs.partGraph(s, dir, 2))
      PageRank.katz(g, alpha = 0.1, beta = 1.0, tol = 0.0, maxIter = 10)
        .select(col("id"), round(col("score"), 6).as("katz"))
    }),
    // k-core: oracle = unrolled peel (kcorePeelSql), rounds sized to
    // measured convergence + slack
    "g17_kcore3" -> ((s, dir) => {
      val core = GraphOps.kCore(DerivedGraphs.partGraph(s, dir, 2), 3)
      core.edges.select(col("src").as("id")).unionAll(core.edges.select(col("dst").as("id")))
        .distinct().orderBy("id")
    }),
    // degree-distribution fit surface (reference
    // PowerlawDegreeSequence.hpp:12): histogram + CDF via window cumsum
    // Laplacian centrality — exact closed-form oracle
    "g25_laplacian" -> ((s, dir) =>
      PageRank.laplacianCentrality(DerivedGraphs.partGraph(s, dir, 2))),
    // local square clustering coefficient — exact per-wedge oracle
    "g24_squarecc" -> ((s, dir) =>
      Triangles.localSquareClusteringCoefficient(DerivedGraphs.partGraph(s, dir, 2))
        .select(col("id"), round(col("sqcc"), 6).as("sqcc"))),
    // greedy group-degree members (k = 3), exact unrolled-greedy oracle
    "x23_groupdegree" -> ((s, dir) =>
      GroupCentrality.groupDegree(DerivedGraphs.partGraph(s, dir, 2), 3)
        .select(col("rank").cast("long").as("rank"), col("id"),
          col("marginal_gain"))),
    // greedy group harmonic closeness (k = 3, top-16 degree candidates)
    "x24_groupharmonic" -> ((s, dir) =>
      GroupCentrality.groupHarmonicCloseness(DerivedGraphs.partGraph(s, dir, 2), 3)
        .select(col("rank").cast("long").as("rank"), col("id"),
          round(col("group_score"), 6).as("group_score"))),
    // greedy group closeness = farness minimization (k = 3, top-16 pool)
    "x37_groupcloseness" -> ((s, dir) =>
      GroupCentrality.groupCloseness(DerivedGraphs.partGraph(s, dir, 2), 3)
        .select(col("rank").cast("long").as("rank"), col("id"), col("farness"))),
    // greedy GedWalk (k = 2, α=0.1, walks ≤ 4, top-8 pool)
    "x38_gedwalk" -> ((s, dir) =>
      GroupCentrality.gedWalk(DerivedGraphs.partGraph(s, dir, 2), 2)
        .select(col("rank").cast("long").as("rank"), col("id"),
          round(col("gain"), 6).as("gain"))),
    // DynBFS: distances on the thr≥3 graph updated incrementally with
    // the thr≥2 edge insertions must hash-match a from-scratch BFS on
    // the thr≥2 graph (which the oracle computes by recursive CTE)
    "x41_dynbfs" -> ((s, dir) => {
      val gOld = DerivedGraphs.partGraph(s, dir, 3)
      val gNew = DerivedGraphs.partGraph(s, dir, 2)
      val sources = gNew.vertices.orderBy("id").limit(3).select(col("id").as("source"))
      val oldDist = ShortestPaths.bfs(gOld, sources)
      val added = gNew.edges.select("src", "dst")
        .except(gOld.edges.select("src", "dst"))
      ShortestPaths.updateBfsInsert(gNew, oldDist, added)
        .select(col("source"), col("id"), col("dist"))
    }),
    // DynKatz: warm-started Katz on the grown graph must land on the
    // same fixpoint as a cold recompute (constants-if-valid gate)
    "x42_dynkatz" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val gOld = DerivedGraphs.partGraph(s, dir, 3)
      val gNew = DerivedGraphs.partGraph(s, dir, 2)
      // contraction needs α·λmax < 1; λmax ≤ max weighted degree
      val maxDeg = gNew.weightedDegrees.agg(max("wdegree")).as[Double].head()
      val a = 0.9 / maxDeg
      val old = PageRank.katz(gOld, alpha = a)
      val warm = PageRank.katzFrom(gNew, Some(old), alpha = a)
      val cold = PageRank.katz(gNew, alpha = a)
      val maxDiff = warm.select(col("id"), col("score").as("w"))
        .join(cold.select(col("id"), col("score").as("c")), "id")
        .agg(max(abs(col("w") - col("c")))).as[Double].head()
      // the cold scores are re-derived by the oracle's unrolled weighted
      // power iteration (same α = 0.9/maxWeightedDegree, re-derived too)
      cold.select(col("id"), round(col("score"), 6).as("score"))
        .withColumn("same_fixpoint", lit(if (maxDiff <= 1e-6) 1L else 0L))
        .withColumn("ran", lit(1L))
    }),
    // PageRank-Nibble sweep from the smallest node id: best prefix size
    // and conductance, exactly replayed by unrolled PPR + window SQL
    "x40_nibble" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val seed = g.vertices.agg(min("id")).head.getLong(0)
      PageRankNibble.bestPrefix(g, seed)
        .select(lit(seed).as("seed"), col("best_k"), col("best_conductance"))
    }),
    // k-clique counts (k = 2,3,4) via degree-oriented ordered joins
    "x19_cliques" -> ((s, dir) =>
      Cliques.cliqueCounts(DerivedGraphs.partGraph(s, dir, 2), maxK = 4)),
    // full link-prediction index sheet over candidate pairs: cn, total
    // neighbors, U/V degree, neighborhood distance, preferential
    // attachment, same-community (mod-8 labels) — all SQL-exact
    "g23_linkpred" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val sheet = LinkPrediction.indexSheet(g)
      val part = g.vertices.select(col("id"), (col("id") % 8).as("community"))
      LinkPrediction.sameCommunity(sheet, part)
        .select(col("u"), col("v"), col("cn"), col("total_nbrs"),
          col("u_degree"), col("v_degree"),
          round(col("nbr_distance"), 6).as("nbr_distance"),
          col("pref_attach"), col("same_community"))
    }),
    // adjusted Rand link-prediction index over candidate pairs
    "g26_adjustedrand" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      LinkPrediction.adjustedRand(g)
        .select(col("u"), col("v"),
          round(col("adjusted_rand"), 6).as("adjusted_rand"))
    }),
    // power-law exponent fitted to the degree sequence by average-degree
    // bisection (the oracle replays the 13-step search in SQL)
    "g27_powerlaw" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      Generators.powerlawFit(g.degrees)
    }),
    // sfigality + local partition coverage per node (id%8 partition)
    "g28_sfigality" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val part = g.vertices.select(col("id"), (col("id") % 8).as("community"))
      GraphOps.sfigality(g)
        .join(Community.localPartitionCoverage(g, part), "id")
        .select(col("id"), round(col("sfigality"), 6).as("sfigality"),
          round(col("lpc"), 6).as("lpc"))
    }),
    // Brandes betweenness from the 5 smallest node ids, unscaled (the
    // oracle replays the exact layered σ/δ DP in SQL)
    "x18_betweenness" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val spark = s
      import spark.implicits._
      val ids = g.vertices.orderBy("id").limit(5).select("id").as[Long].collect().toSeq
      Betweenness.run(g, sourceIds = Some(ids))
        .select(col("id"), round(col("score"), 4).as("score"))
    }),
    "g19_degdist" -> ((s, dir) => {
      val deg = DerivedGraphs.partGraph(s, dir, 2).degrees
      val hist = deg.groupBy("degree").agg(count(lit(1)).as("cnt"))
      val win = org.apache.spark.sql.expressions.Window
      val w = win.orderBy("degree").rowsBetween(win.unboundedPreceding, win.currentRow)
      val n = deg.count().toDouble
      hist.withColumn("cdf", round(sum("cnt").over(w) / n, 6))
    }),
    // missing links: 2-hop pairs that are NOT edges (reference
    // MissingLinksFinder.hpp:26) — anti-join of wedges against edges
    "g20_missinglinks" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val adj = g.adjacency.select("src", "dst")
      val wedge = adj.as("a").join(adj.as("b"), col("a.dst") === col("b.src"))
        .filter(col("a.src") < col("b.dst"))
        .select(col("a.src").as("u"), col("b.dst").as("v")).distinct()
      wedge.join(g.edges.select(col("src").as("u"), col("dst").as("v")),
          Seq("u", "v"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
    }),
    // graph difference → edit events (reference GraphDifference.hpp:22):
    // thr≥2 graph vs thr≥3 graph = removals only
    "g21_graphdiff" -> ((s, dir) => {
      val e2 = DerivedGraphs.partGraph(s, dir, 2).edges.select("src", "dst")
      val e3 = DerivedGraphs.partGraph(s, dir, 3).edges.select("src", "dst")
      // aggregate each side separately: an empty side must still emit
      // its zero row (a groupBy would drop the empty group, the oracle
      // would not)
      e2.except(e3).agg(count(lit(1)).as("n")).select(lit("EDGE_REMOVAL").as("type"), col("n"))
        .unionAll(e3.except(e2).agg(count(lit(1)).as("n"))
          .select(lit("EDGE_ADDITION").as("type"), col("n")))
    }),
    // partition intersection (reference PartitionIntersection.hpp:12):
    // meet of id%8 and id%12 → number of non-empty joint blocks
    "g22_partmeet" -> ((s, dir) => {
      val v = DerivedGraphs.partGraph(s, dir, 2).vertices
      v.select(pmod(col("id"), lit(8L)).as("c1"), pmod(col("id"), lit(12L)).as("c2"))
        .groupBy("c1", "c2").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_blocks"), max("sz").as("max_block"))
    }),
    "g18_subgraph" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val small = Tables.load(s, dir, "part").filter(col("p_size") < 25)
        .select(col("p_partkey").as("id"))
      val sub = GraphOps.subgraphFromNodes(g, small)
      sub.edges.agg(count(lit(1)).as("n_edges"), round(sum("weight"), 2).as("w"))
    }),
    // shortest-path counts σ from the smallest node id in DECIMAL(38,0)
    // (reference bigfloat `SSSP.hpp:66`); emitted as VARCHAR so the
    // compare is digit-exact on both sides
    "g29_pathcounts" -> ((s, dir) => {
      val g = DerivedGraphs.partGraph(s, dir, 2)
      val src = g.vertices.orderBy("id").limit(1).select(col("id").as("source"))
      Paths.bfsCounted(g, src)
        .select(col("id"), col("dist"), col("sigma").cast("string").as("sigma"))
    })
  )

  val oracles: Map[String, String] = Map(
    "g1_degree" ->
      s"""WITH ${graphCte(1)}
         |SELECT id, d AS degree FROM deg""".stripMargin,
    "g2_stats" ->
      s"""WITH ${graphCte(1)}
         |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
         |  (SELECT count(*) FROM e) AS n_edges,
         |  0::BIGINT AS self_loops,
         |  (SELECT round(sum(c*1.0), 6) FROM e) AS total_weight,
         |  (SELECT max(d) FROM deg) AS max_degree,
         |  round((SELECT count(*) FROM e)*2.0 /
         |    ((SELECT count(*) FROM nodes)*((SELECT count(*) FROM nodes)-1)), 8) AS density""".stripMargin,
    "g3_assortativity" ->
      s"""WITH ${graphCte(1)}
         |SELECT round(corr(d1.d, d2.d), 6) AS assortativity
         |FROM sym JOIN deg d1 ON d1.id=sym.src JOIN deg d2 ON d2.id=sym.dst""".stripMargin,
    "g4_cc" ->
      s"""WITH RECURSIVE ${graphCte(2)},
         |lbl(id, comp) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.dst, l.comp FROM lbl l JOIN sym s ON s.src=l.id WHERE l.comp < s.dst)
         |SELECT id, min(comp) AS component FROM lbl GROUP BY id""".stripMargin,
    "g5_cc_sizes" ->
      s"""WITH RECURSIVE ${graphCte(2)},
         |lbl(id, comp) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.dst, l.comp FROM lbl l JOIN sym s ON s.src=l.id WHERE l.comp < s.dst),
         |cc AS (SELECT id, min(comp) AS component FROM lbl GROUP BY id)
         |SELECT component, count(*) AS size FROM cc GROUP BY component""".stripMargin,
    "g6_bfs" ->
      s"""WITH RECURSIVE ${graphCte(2)},
         |srcn AS (SELECT min(id) AS s FROM nodes),
         |bfs(id, dist) AS (
         |  SELECT s, 0 FROM srcn
         |  UNION
         |  SELECT s.dst, b.dist+1 FROM bfs b JOIN sym s ON s.src=b.id WHERE b.dist < 20)
         |SELECT id, min(dist)::BIGINT AS dist FROM bfs GROUP BY id""".stripMargin,
    "g7_pagerank" -> pagerankSql(2, 10),
    "g8_triangles" ->
      s"""WITH ${graphCte(2)}
         |SELECT count(*) AS triangles FROM e e1
         |JOIN e e2 ON e2.src=e1.dst JOIN e e3 ON e3.src=e1.src AND e3.dst=e2.dst""".stripMargin,
    "g9_lcc" ->
      s"""WITH ${graphCte(2)},
         |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c FROM e e1
         |        JOIN e e2 ON e2.src=e1.dst JOIN e e3 ON e3.src=e1.src AND e3.dst=e2.dst),
         |pern AS (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
         |tc AS (SELECT id, count(*) AS t FROM pern GROUP BY id)
         |SELECT d.id, CASE WHEN d.d < 2 THEN 0.0
         |  ELSE round(coalesce(tc.t, 0)*2.0/(d.d*(d.d-1.0)), 6) END AS lcc
         |FROM deg d LEFT JOIN tc USING (id)""".stripMargin,
    "g10_jaccard" ->
      s"""WITH ${graphCte(2)},
         |cn AS (SELECT a.dst AS u, b.dst AS v, count(*) AS cn FROM sym a
         |       JOIN sym b ON a.src=b.src AND a.dst < b.dst GROUP BY 1,2)
         |SELECT u, v, round(cn*1.0/(du.d + dv.d - cn), 6) AS jaccard
         |FROM cn JOIN deg du ON du.id=cn.u JOIN deg dv ON dv.id=cn.v""".stripMargin,
    "g11_adamicadar" ->
      s"""WITH ${graphCte(2)}
         |SELECT a.dst AS u, b.dst AS v, round(sum(1.0/ln(dw.d)), 6) AS adamic_adar
         |FROM sym a JOIN sym b ON a.src=b.src AND a.dst < b.dst
         |JOIN deg dw ON dw.id=a.src
         |GROUP BY a.dst, b.dst""".stripMargin,
    "g12_commonneighbors" ->
      s"""WITH ${graphCte(2)}
         |SELECT a.dst AS u, b.dst AS v, count(*) AS cn
         |FROM sym a JOIN sym b ON a.src=b.src AND a.dst < b.dst
         |GROUP BY a.dst, b.dst""".stripMargin,
    "g13_closeness" ->
      s"""WITH RECURSIVE ${graphCte(2)},
         |srcs AS (SELECT id FROM nodes ORDER BY id LIMIT 5),
         |reach(s, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN sym e2 ON e2.src=r.id WHERE r.dist < 20),
         |d AS (SELECT s, id, min(dist) AS dist FROM reach GROUP BY s, id)
         |SELECT s AS id, round(count(*)*1.0/sum(dist), 6) AS closeness
         |FROM d WHERE id <> s GROUP BY s""".stripMargin,
    "g14_twohop" ->
      s"""WITH ${graphCte(2)},
         |two AS (SELECT src, dst FROM sym
         |        UNION
         |        SELECT a.src, b.dst FROM sym a JOIN sym b ON a.dst=b.src WHERE b.dst <> a.src)
         |SELECT src AS id, count(*) AS n2hop FROM two GROUP BY src""".stripMargin,
    "g15_wdegree" ->
      s"""WITH ${graphCte(2)}
         |SELECT src AS id, round(sum(c*1.0), 6) AS wdegree FROM symw GROUP BY src""".stripMargin,
    "g16_katz" -> katzSql(2, 10, 0.1, 1.0),
    "g17_kcore3" -> kcorePeelSql(2, 3, 16),
    "x18_betweenness" -> brandesSql(2, 5, 12),
    "g29_pathcounts" -> pathCountSql(2, 16),
    "x37_groupcloseness" -> groupClosenessSql(2, 16),
    "x38_gedwalk" -> gedWalkSql(2, 8, 0.1, 4),
    "x40_nibble" -> nibbleSql(2, 0.85, 20, 50),
    "x41_dynbfs" ->
      s"""WITH RECURSIVE ${graphCte(2)},
         |symm AS MATERIALIZED (SELECT src, dst FROM sym),
         |srcs AS (SELECT id FROM nodes ORDER BY id LIMIT 3),
         |reach(s, id, dist) AS (
         |  SELECT id, id, 0 FROM srcs
         |  UNION
         |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN symm e2 ON e2.src=r.id
         |  WHERE r.dist < 20)
         |SELECT s AS source, id, min(dist)::BIGINT AS dist
         |FROM reach GROUP BY s, id""".stripMargin,
    "x42_dynkatz" -> {
      // cold Katz (x = αAx + β, β=1, weighted) re-derived by unrolled
      // power iterations; α·λmax ≤ 0.9 means tol=1e-9 is never met
      // before Spark's 100-iteration cap, and past ~iteration 60 the
      // tail moves scores < 1e-9 — invisible at round-6 either way
      val iters = 100
      val steps = (1 to iters).map { i =>
        s"""k$i AS MATERIALIZED (SELECT nodes.id,
           | (SELECT a FROM alpha) * coalesce(s.t, 0) + 1.0 AS x
           | FROM nodes LEFT JOIN (
           |   SELECT symw.src AS id, sum(k${i - 1}.x * symw.c) AS t
           |   FROM k${i - 1} JOIN symw ON symw.dst = k${i - 1}.id
           |   GROUP BY symw.src) s
           | USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH ${graphCte(2)},
         |wdeg AS (SELECT src AS id, sum(c)*1.0 AS wd FROM symw GROUP BY src),
         |alpha AS (SELECT 0.9 / max(wd) AS a FROM wdeg),
         |k0 AS (SELECT id, 0.0 AS x FROM nodes),
         |$steps
         |SELECT 1::BIGINT AS same_fixpoint, 1::BIGINT AS ran,
         |  id, round(x, 6) AS score FROM k$iters""".stripMargin
    },
    "g25_laplacian" ->
      s"""WITH ${graphCte(2)},
         |nd AS (SELECT s.src AS id, sum(dg.d) AS sn FROM sym s
         |       JOIN deg dg ON dg.id = s.dst GROUP BY s.src)
         |SELECT deg.id, (deg.d * deg.d + deg.d + 2 * nd.sn)::BIGINT AS lap_centrality
         |FROM deg JOIN nd ON nd.id = deg.id""".stripMargin,
    "g24_squarecc" ->
      s"""WITH ${graphCte(2)},
         |cn AS MATERIALIZED (SELECT a.dst AS v, b.dst AS w, count(*) AS c
         |  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst GROUP BY 1, 2),
         |wedges AS (SELECT a.src AS u, a.dst AS v, b.dst AS w
         |  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst),
         |terms AS (SELECT wg.u,
         |    coalesce(cn.c, 1) - 1 AS sq,
         |    du.d + dw.d - coalesce(cn.c, 1) - 1
         |      - CASE WHEN ex.src IS NOT NULL THEN 2 ELSE 0 END AS pot
         |  FROM wedges wg
         |  LEFT JOIN cn ON cn.v = wg.v AND cn.w = wg.w
         |  LEFT JOIN e ex ON ex.src = wg.v AND ex.dst = wg.w
         |  JOIN deg du ON du.id = wg.v JOIN deg dw ON dw.id = wg.w),
         |agg AS (SELECT u AS id, sum(sq) AS squares, sum(pot) AS potential
         |  FROM terms GROUP BY u)
         |SELECT n.id, round(CASE WHEN coalesce(a.potential, 0) > 0
         |  THEN a.squares * 1.0 / a.potential ELSE 0.0 END, 6) AS sqcc
         |FROM nodes n LEFT JOIN agg a ON a.id = n.id""".stripMargin,
    // unrolled 3-step greedy group degree — each step: gain = uncovered
    // out-neighbors, argmax (gain desc, id asc), cover the pick + nbrs
    "x23_groupdegree" ->
      s"""WITH ${graphCte(2)},
         |b1 AS MATERIALIZED (SELECT id, d AS gain FROM deg ORDER BY d DESC, id LIMIT 1),
         |cov1 AS MATERIALIZED (SELECT s.dst AS id FROM sym s JOIN b1 ON s.src = b1.id
         |  UNION SELECT id FROM b1),
         |g2 AS (SELECT s.src AS id, count(*) AS gain FROM sym s
         |  LEFT JOIN cov1 c ON c.id = s.dst WHERE c.id IS NULL GROUP BY s.src),
         |b2 AS MATERIALIZED (SELECT id, gain FROM g2
         |  WHERE id NOT IN (SELECT id FROM b1) ORDER BY gain DESC, id LIMIT 1),
         |cov2 AS MATERIALIZED (SELECT id FROM cov1
         |  UNION SELECT s.dst FROM sym s JOIN b2 ON s.src = b2.id
         |  UNION SELECT id FROM b2),
         |g3 AS (SELECT s.src AS id, count(*) AS gain FROM sym s
         |  LEFT JOIN cov2 c ON c.id = s.dst WHERE c.id IS NULL GROUP BY s.src),
         |b3 AS MATERIALIZED (SELECT id, gain FROM g3
         |  WHERE id NOT IN (SELECT id FROM b1 UNION SELECT id FROM b2)
         |  ORDER BY gain DESC, id LIMIT 1)
         |SELECT 1::BIGINT AS rank, id, gain::BIGINT AS marginal_gain FROM b1
         |UNION ALL SELECT 2, id, gain::BIGINT FROM b2
         |UNION ALL SELECT 3, id, gain::BIGINT FROM b3""".stripMargin,
    // unrolled 3-step greedy group harmonic closeness over the top-16
    // degree candidates; distances by one recursive multi-source BFS
    "x24_groupharmonic" ->
      s"""WITH RECURSIVE ${graphCte(2)},
         |symm AS MATERIALIZED (SELECT src, dst FROM sym),
         |cand AS MATERIALIZED (SELECT id FROM deg ORDER BY d DESC, id LIMIT 16),
         |reach(s, id, dist) AS (
         |  SELECT id, id, 0 FROM cand
         |  UNION
         |  SELECT r.s, e2.dst, r.dist+1 FROM reach r JOIN symm e2 ON e2.src = r.id
         |  WHERE r.dist < 20),
         |dm AS MATERIALIZED (SELECT s, id, min(dist) AS dist FROM reach GROUP BY s, id),
         |s1 AS (SELECT s, sum(1.0/dist) AS score FROM dm WHERE dist > 0 GROUP BY s),
         |b1 AS MATERIALIZED (SELECT s, score FROM s1 ORDER BY score DESC, s ASC LIMIT 1),
         |d1 AS MATERIALIZED (SELECT dm.id, dm.dist AS d FROM dm JOIN b1 ON dm.s = b1.s),
         |s2 AS (SELECT dm.s, sum(1.0/least(dm.dist, coalesce(d1.d, 1000000))) AS score
         |  FROM dm LEFT JOIN d1 ON d1.id = dm.id
         |  WHERE dm.s NOT IN (SELECT s FROM b1)
         |    AND least(dm.dist, coalesce(d1.d, 1000000)) > 0
         |  GROUP BY dm.s),
         |b2 AS MATERIALIZED (SELECT s, score FROM s2 ORDER BY score DESC, s ASC LIMIT 1),
         |dn2 AS MATERIALIZED (SELECT dm.id, dm.dist FROM dm JOIN b2 ON dm.s = b2.s),
         |d2 AS MATERIALIZED (SELECT coalesce(d1.id, dn2.id) AS id,
         |    least(coalesce(d1.d, 1000000), coalesce(dn2.dist, 1000000)) AS d
         |  FROM d1 FULL JOIN dn2 ON dn2.id = d1.id),
         |s3 AS (SELECT dm.s, sum(1.0/least(dm.dist, coalesce(d2.d, 1000000))) AS score
         |  FROM dm LEFT JOIN d2 ON d2.id = dm.id
         |  WHERE dm.s NOT IN (SELECT s FROM b1 UNION SELECT s FROM b2)
         |    AND least(dm.dist, coalesce(d2.d, 1000000)) > 0
         |  GROUP BY dm.s),
         |b3 AS MATERIALIZED (SELECT s, score FROM s3 ORDER BY score DESC, s ASC LIMIT 1)
         |SELECT 1::BIGINT AS rank, s AS id, round(score, 6) AS group_score FROM b1
         |UNION ALL SELECT 2, s, round(score, 6) FROM b2
         |UNION ALL SELECT 3, s, round(score, 6) FROM b3""".stripMargin,
    // clique counts by id-ordered joins — orientation-invariant, so the
    // degree-oriented Spark enumeration must agree exactly
    "x19_cliques" ->
      s"""WITH ${graphCte(2)},
         |c2 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e),
         |t AS MATERIALIZED (SELECT x.a, x.b, y.b AS c FROM c2 x
         |     JOIN c2 y ON y.a = x.a AND y.b > x.b
         |     JOIN c2 z ON z.a = x.b AND z.b = y.b),
         |f AS (SELECT t.a, t.b, t.c, x.b AS d FROM t
         |     JOIN c2 x ON x.a = t.a AND x.b > t.c
         |     JOIN c2 y ON y.a = t.b AND y.b = x.b
         |     JOIN c2 z ON z.a = t.c AND z.b = x.b)
         |SELECT 2::BIGINT AS k, (SELECT count(*) FROM c2) AS n_cliques
         |UNION ALL SELECT 3, (SELECT count(*) FROM t)
         |UNION ALL SELECT 4, (SELECT count(*) FROM f)""".stripMargin,
    "g23_linkpred" ->
      s"""WITH ${graphCte(2)},
         |cn AS (SELECT a.dst AS u, b.dst AS v, count(*) AS c
         |       FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
         |       GROUP BY 1, 2)
         |SELECT cn.u, cn.v, cn.c AS cn,
         | (du.d + dv.d - cn.c)::BIGINT AS total_nbrs,
         | du.d AS u_degree, dv.d AS v_degree,
         | round(cn.c / sqrt(du.d * dv.d), 6) AS nbr_distance,
         | (du.d * dv.d)::BIGINT AS pref_attach,
         | CASE WHEN cn.u % 8 = cn.v % 8 THEN 1 ELSE 0 END::BIGINT AS same_community
         |FROM cn JOIN deg du ON du.id = cn.u JOIN deg dv ON dv.id = cn.v""".stripMargin,
    "g26_adjustedrand" ->
      s"""WITH ${graphCte(2)},
         |cn AS (SELECT a.dst AS u, b.dst AS v, count(*) AS c
         |       FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
         |       GROUP BY 1, 2),
         |nn AS MATERIALIZED (SELECT count(*)*1.0 AS n FROM nodes),
         |t1 AS (SELECT cn.u, cn.v, cn.c*1.0 AS a,
         |        (du.d + dv.d - cn.c)*1.0 AS un,
         |        (SELECT n FROM nn) - (du.d + dv.d - cn.c) AS d2
         |       FROM cn JOIN deg du ON du.id = cn.u
         |       JOIN deg dv ON dv.id = cn.v),
         |t2 AS (SELECT u, v, a, un, d2,
         |        2*a*un + 2*a*d2 + 2*un*un + 2*un*d2 AS den FROM t1)
         |SELECT u, v, round(CASE WHEN den = 0 THEN 0.0
         |  ELSE 2*(a*d2 - un*un) / den END, 6) AS adjusted_rand
         |FROM t2""".stripMargin,
    "g27_powerlaw" -> {
      // 13 bisection steps over γ ∈ [-6,-1]: gap 5/2^12 = 0.00122 still
      // iterates, 5/2^13 = 0.00061 stops — mirrors the reference's
      // `while (gamma_l + 0.001 < gamma_r)` exactly
      val steps = (1 to 13).map { i =>
        s"""b$i AS MATERIALIZED (SELECT
           | CASE WHEN m.mavg > s.av THEN b.gl ELSE (b.gl+b.gr)/2 END AS gl,
           | CASE WHEN m.mavg > s.av THEN (b.gl+b.gr)/2 ELSE b.gr END AS gr,
           | CASE WHEN m.mavg > s.av THEN b.al ELSE m.mavg END AS al,
           | CASE WHEN m.mavg > s.av THEN m.mavg ELSE b.ar END AS ar
           |FROM b${i - 1} b CROSS JOIN st s CROSS JOIN LATERAL
           | (SELECT sum(k*power(k,(b.gl+b.gr)/2))/sum(power(k,(b.gl+b.gr)/2))
           |    AS mavg FROM ks) m)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${graphCte(2)},
         |st AS MATERIALIZED (SELECT min(d) AS mn, max(d) AS mx, avg(d) AS av FROM deg),
         |ks AS MATERIALIZED (SELECT k FROM range(1, 1000000) t(k)
         |      WHERE k >= (SELECT mn FROM st) AND k <= (SELECT mx FROM st)),
         |b0 AS MATERIALIZED (SELECT -6.0 AS gl, -1.0 AS gr,
         |  (SELECT sum(k*power(k,-6.0))/sum(power(k,-6.0)) FROM ks) AS al,
         |  (SELECT sum(k*power(k,-1.0))/sum(power(k,-1.0)) FROM ks) AS ar),
         |$steps
         |SELECT (SELECT mn FROM st)::BIGINT AS min_deg,
         | (SELECT mx FROM st)::BIGINT AS max_deg,
         | round((SELECT av FROM st), 6) AS avg_deg,
         | round(CASE WHEN s.av > z.ar THEN -1.0 WHEN s.av < z.al THEN -6.0
         |   WHEN s.av - f.al < f.ar - s.av THEN f.gl ELSE f.gr END, 3) AS gamma
         |FROM st s CROSS JOIN b0 z CROSS JOIN b13 f""".stripMargin
    },
    "g28_sfigality" ->
      s"""WITH ${graphCte(2)},
         |sf AS (SELECT a.src AS id,
         |        sum(CASE WHEN du.d < dv.d THEN 1 ELSE 0 END)*1.0/count(*) AS s
         |       FROM sym a JOIN deg du ON du.id = a.src
         |       JOIN deg dv ON dv.id = a.dst GROUP BY 1),
         |lp AS (SELECT src AS id,
         |        sum(CASE WHEN src % 8 = dst % 8 THEN c ELSE 0 END)*1.0/sum(c) AS l
         |       FROM symw GROUP BY 1)
         |SELECT n.id, round(coalesce(sf.s, 0), 6) AS sfigality,
         | round(coalesce(lp.l, 0), 6) AS lpc
         |FROM nodes n LEFT JOIN sf ON sf.id = n.id
         |LEFT JOIN lp ON lp.id = n.id""".stripMargin,
    "g19_degdist" ->
      s"""WITH ${graphCte(2)},
         |h AS (SELECT d AS degree, count(*) AS cnt FROM deg GROUP BY d),
         |n AS (SELECT count(*)*1.0 AS n FROM deg)
         |SELECT degree, cnt,
         | round(sum(cnt) OVER (ORDER BY degree
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / (SELECT n FROM n), 6) AS cdf
         |FROM h""".stripMargin,
    "g20_missinglinks" ->
      s"""WITH ${graphCte(2)},
         |wedge AS (SELECT DISTINCT a.src AS u, b.dst AS v FROM sym a
         |          JOIN sym b ON a.dst = b.src WHERE a.src < b.dst)
         |SELECT count(*) AS n_missing FROM wedge
         |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = wedge.u AND e.dst = wedge.v)""".stripMargin,
    "g21_graphdiff" ->
      s"""WITH ${graphCte(2)},
         |e3 AS (SELECT src, dst FROM e WHERE c >= 3),
         |rem AS (SELECT 'EDGE_REMOVAL' AS type, count(*) AS n FROM
         |        (SELECT src, dst FROM e EXCEPT SELECT src, dst FROM e3)),
         |a AS (SELECT 'EDGE_ADDITION' AS type, count(*) AS n FROM
         |        (SELECT src, dst FROM e3 EXCEPT SELECT src, dst FROM e))
         |SELECT type, n FROM rem UNION ALL SELECT type, n FROM a""".stripMargin,
    "g22_partmeet" ->
      s"""WITH ${graphCte(2)},
         |v AS (SELECT DISTINCT src AS id FROM sym),
         |b AS (SELECT id % 8 AS c1, id % 12 AS c2, count(*) AS sz FROM v GROUP BY 1, 2)
         |SELECT count(*) AS n_blocks, max(sz) AS max_block FROM b""".stripMargin,
    "g18_subgraph" ->
      s"""WITH ${graphCte(2)},
         |small AS (SELECT p_partkey AS id FROM part WHERE p_size < 25)
         |SELECT count(*) AS n_edges, round(sum(c*1.0), 2) AS w FROM e
         |WHERE src IN (SELECT id FROM small) AND dst IN (SELECT id FROM small)""".stripMargin
  )
}
