package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph-analytics gates over [[graft.operators.Graph]] — link-based
  * importance and local clustering, the two graph signals a web-scale
  * corpus pipeline computes besides dedup connectivity (d12).
  *
  * Both operators are integer-exact by design (fixed-point BIGINT ranks,
  * pure-count triangles), so unlike most distributed PageRank
  * implementations these gates carry FULL DuckDB oracles: the SQL mirror
  * unrolls the same five power-iteration rounds in BIGINT arithmetic and
  * reproduces every rank bit-for-bit.
  */
object GraphQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The customer↔supplier trade graph every g-gate builds on: one
    * DISTINCT (customer, supplier) pair per order-line relationship,
    * customers at even node ids (2·custkey), suppliers at odd
    * (2·suppkey+1) — disjoint id spaces in one BIGINT column. Extracted
    * once so the node-encoding scheme lives in exactly one place, and
    * MEMOIZED per (session, dir) as a shared checkpoint: ten g-gates
    * build on this identical orders⋈lineitem+distinct subtree, so in any
    * multi-query session (bench, verify, a user's analysis session) the
    * join is paid once per corpus, not once per gate. */
  private def tradePairs(spark: SparkSession, dir: String): DataFrame =
    graft.SharedPrep.cached(spark, s"tradePairs:$dir", dir) {
      graft.SharedPrep.checkpointShared(
        t(spark, dir, "orders")
          .join(t(spark, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("c"),
            (col("l_suppkey") * 2 + 1).as("s"))
          .distinct())
    }

  /** The PageRank pair's shared prep ([[Graph.PreparedEdges]]): g01 and
    * g03 iterate over the SAME symmetrized trade graph, so the
    * distinct+repartition+degree pass — the dominant cost of both gates —
    * is built once per (session, corpus) and both gates run their five
    * |V|-row rounds against the shared checkpoint. */
  private def tradeGraph(spark: SparkSession, dir: String)
      : Graph.PreparedEdges = {
    // built OUTSIDE the cached block: the pair list is its own shared
    // entry, and resolving it first keeps the cache calls sequential
    val pairs = tradePairs(spark, dir)
    graft.SharedPrep.cached(spark, s"tradeGraph:$dir", dir) {
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .union(pairs.select(col("s").as("src"), col("c").as("dst")))
      Graph.prepareEdges(edges, "src", "dst",
        graft.SharedPrep.checkpointShared)
    }
  }

  // ---------------------------------------------------------------- g01
  /** PageRank over the customer↔supplier trade graph: an edge per
    * DISTINCT (customer, supplier) pair that shares at least one order
    * line, symmetrized (both directions) so the graph has no dangling
    * mass. Customers map to even node ids (2·custkey), suppliers to odd
    * (2·suppkey+1) — disjoint id spaces in one BIGINT column. Five
    * fixed-point rounds at scale 1e6, damping 85/100; top 100 nodes by
    * (rank, node) with deterministic tiebreak. */
  def g01PageRank(spark: SparkSession, dir: String): DataFrame = {
    Graph.pageRankPrepared(tradeGraph(spark, dir), iterations = 5)
      .withColumnRenamed("rank", "rank_micro")
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(100)
      .orderBy("node")
  }

  /** Mirrors the five integer rounds exactly: `//` on BIGINT is the same
    * floor-toward-zero division as Spark's `div` for the non-negative
    * values here, and sums of BIGINT are order-independent. HUGEINT
    * intermediates (DuckDB widens SUM) are cast back to BIGINT at each
    * round boundary so the schema matches. */
  val g01Sql: String = {
    val round = (k: Int) =>
      s"""i$k AS (
         |  SELECT n.node,
         |    (150000 + (85 * COALESCE(m.in_mass, 0)) // 100)::BIGINT AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(rp.r // d.outdeg) AS in_mass
         |    FROM edges e
         |    JOIN deg d ON d.src = e.src
         |    JOIN i${k - 1} rp ON rp.node = e.src
         |    GROUP BY e.dst) m ON m.node = n.node)""".stripMargin
    s"""SELECT node, rank_micro FROM (
       |  WITH pairs AS (
       |    SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |  edges AS MATERIALIZED (
       |    SELECT c AS src, s AS dst FROM pairs
       |    UNION ALL
       |    SELECT s AS src, c AS dst FROM pairs),
       |  deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
       |  n AS (SELECT DISTINCT src AS node FROM edges),
       |  i0 AS (SELECT node, 1000000::BIGINT AS r FROM n),
       |  ${(1 to 5).map(round).mkString(",\n")}
       |  SELECT node, r AS rank_micro FROM i5
       |  ORDER BY rank_micro DESC, node LIMIT 100)
       |ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- g02
  /** Triangle counts on the NEAR-DUP PAIR GRAPH (the d04/d12 edge set):
    * a node's triangle count measures how clique-like its duplicate
    * cluster is — high-cohesion clusters (every member pairs with every
    * other) are safe to collapse aggressively, chain-shaped ones warrant
    * review. Degree-ordered orientation makes each triangle one closed
    * wedge — the Suri-Vassilvitskii formulation whose fan-out survives
    * celebrity nodes (a TPC-H co-occurrence projection measured here
    * is 141k edges over 1000 nodes, Σd² = 85M raw wedges; orientation is
    * what keeps such density tractable) — and the (degree, id) tiebreak
    * keeps it deterministic enough to mirror exactly. */
  def g02Triangles(spark: SparkSession, dir: String): DataFrame =
    triangleTable(spark, dir)
      .select(col("node"), col("triangles"))
      .orderBy("node")

  /** The per-node (deg, triangles, lcc) table over the 0.7 near-dup
    * graph — [[Graph.localClustering]]'s output is a strict superset of
    * g02's (node, triangles) and IS g12's result, so the degree-oriented
    * wedge-closure pass (the expensive part of both gates) runs once per
    * (session, corpus) as a shared checkpoint. */
  private def triangleTable(spark: SparkSession, dir: String): DataFrame =
    graft.SharedPrep.cached(spark, s"triangleTable:$dir", dir) {
      graft.SharedPrep.checkpointShared(
        Graph.localClustering(DedupQueries.neardupPairs(spark, dir, 0.7),
          "id_a", "id_b"))
    }

  /** Shared CTE chain for the triangle-based gates (g02, g12): near-dup
    * pairs → canonical undirected edges → degrees → degree-oriented
    * wedge closure → per-node triangle counts. Kept as one string so the
    * two oracles cannot drift apart. */
  private def triangleCtes: String =
    s"""WITH pairs AS MATERIALIZED (
      |${DedupQueries.all("d04_ngram_jaccard")._2}
      |),
      |canon AS MATERIALIZED (
      |  SELECT DISTINCT id_a AS a, id_b AS b FROM pairs),
      |deg AS MATERIALIZED (
      |  SELECT node, COUNT(*) AS d FROM (
      |    SELECT a AS node FROM canon
      |    UNION ALL
      |    SELECT b AS node FROM canon) GROUP BY 1),
      |oriented AS MATERIALIZED (
      |  SELECT
      |    CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND c.a < c.b)
      |         THEN c.a ELSE c.b END AS u,
      |    CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND c.a < c.b)
      |         THEN c.b ELSE c.a END AS v
      |  FROM canon c
      |  JOIN deg d1 ON d1.node = c.a
      |  JOIN deg d2 ON d2.node = c.b),
      |tri AS MATERIALIZED (
      |  SELECT l.u, l.v, r.v AS w
      |  FROM oriented l JOIN oriented r ON l.u = r.u AND l.v <> r.v
      |  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.u = l.v AND o.v = r.v)),
      |per AS (
      |  SELECT node, COUNT(*) AS triangles FROM (
      |    SELECT u AS node FROM tri
      |    UNION ALL SELECT v FROM tri
      |    UNION ALL SELECT w FROM tri) GROUP BY 1)""".stripMargin

  val g02Sql: String =
    s"""$triangleCtes
      |SELECT deg.node, COALESCE(per.triangles, 0)::BIGINT AS triangles
      |FROM deg LEFT JOIN per ON per.node = deg.node
      |ORDER BY deg.node""".stripMargin

  // ---------------------------------------------------------------- g03
  /** Personalized PageRank from a trusted seed set — every 10th supplier
    * — over the same symmetric trade graph as g01: the "expand from a
    * whitelist" primitive (rank customers/suppliers by proximity to the
    * seeds). Integer fixed-point again, so the oracle unrolls the same
    * five seeded rounds exactly; nodes unreachable from a seed hold rank
    * 0 and are filtered. */
  def g03PersonalizedPageRank(spark: SparkSession, dir: String): DataFrame = {
    val seeds = t(spark, dir, "supplier")
      .filter(pmod(col("s_suppkey"), lit(10)) === 0)
      .select((col("s_suppkey") * 2 + 1).as("node"))
    Graph.personalizedPageRankPrepared(tradeGraph(spark, dir), seeds, "node",
      iterations = 5)
      .filter(col("rank") > 0)
      .withColumnRenamed("rank", "rank_micro")
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(100)
      .orderBy("node")
  }

  val g03Sql: String = {
    val round = (k: Int) =>
      s"""i$k AS (
         |  SELECT n.node,
         |    (CASE WHEN n.is_seed THEN 150000 ELSE 0 END
         |     + (85 * COALESCE(m.in_mass, 0)) // 100)::BIGINT AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(rp.r // d.outdeg) AS in_mass
         |    FROM edges e
         |    JOIN deg d ON d.src = e.src
         |    JOIN i${k - 1} rp ON rp.node = e.src
         |    GROUP BY e.dst) m ON m.node = n.node)""".stripMargin
    s"""SELECT node, rank_micro FROM (
       |  WITH pairs AS (
       |    SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |    FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |  edges AS MATERIALIZED (
       |    SELECT c AS src, s AS dst FROM pairs
       |    UNION ALL
       |    SELECT s AS src, c AS dst FROM pairs),
       |  deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
       |  n AS (
       |    SELECT node,
       |      node % 2 = 1 AND ((node - 1) // 2) % 10 = 0
       |        AND EXISTS (SELECT 1 FROM supplier
       |                    WHERE s_suppkey = (node - 1) // 2) AS is_seed
       |    FROM (SELECT DISTINCT src AS node FROM edges)),
       |  i0 AS (SELECT node,
       |    CASE WHEN is_seed THEN 1000000 ELSE 0 END::BIGINT AS r FROM n),
       |  ${(1 to 5).map(round).mkString(",\n")}
       |  SELECT node, r AS rank_micro FROM i5 WHERE r > 0
       |  ORDER BY rank_micro DESC, node LIMIT 100)
       |ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- g04
  /** 2-core of the near-dup pair graph by six fixed peeling rounds:
    * nodes that survive belong to a CYCLE of near-duplicates (chains and
    * pendant copies peel away) — the "safe to auto-collapse" core,
    * complementary to g02's triangle cohesion. Fixed rounds keep the
    * result deterministic whether or not peeling has stabilized, so the
    * oracle unrolls the same six rounds. */
  def g04KCore(spark: SparkSession, dir: String): DataFrame = {
    val edges = DedupQueries.neardupPairs(spark, dir, 0.7)
    Graph.kCore(edges, "id_a", "id_b", k = 2, rounds = 6)
      .orderBy("node")
  }

  val g04Sql: String = {
    // AS MATERIALIZED is load-bearing: each round references the prior
    // round twice (degree count + semi-join) — inlined CTEs would
    // recompute the d04 pair join 2^rounds times
    val round = (r: Int) =>
      s"""keep$r AS MATERIALIZED (
         |  SELECT a AS node FROM e${r - 1} GROUP BY a HAVING COUNT(*) >= 2),
         |e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${r - 1} e
         |  JOIN keep$r ka ON ka.node = e.a
         |  JOIN keep$r kb ON kb.node = e.b)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |${DedupQueries.all("d04_ngram_jaccard")._2}
       |),
       |half AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a <> id_b),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM half UNION ALL SELECT b, a FROM half)),
       |n AS (SELECT DISTINCT a AS node FROM e0),
       |${(1 to 6).map(round).mkString(",\n")},
       |cd AS (SELECT a AS node, COUNT(*) AS core_degree FROM e6 GROUP BY a)
       |SELECT n.node, cd.node IS NOT NULL AS in_core,
       |  COALESCE(cd.core_degree, 0)::BIGINT AS core_degree
       |FROM n LEFT JOIN cd ON cd.node = n.node
       |ORDER BY n.node""".stripMargin
  }

  // ---------------------------------------------------------------- g05
  /** Label-propagation communities over the near-dup pair graph, four
    * fixed synchronous rounds with min-label tie-break: the community
    * structure complements d12's connected components — LPA splits a
    * weakly-bridged component into its dense parts, so a giant chained
    * cluster surfaces as several coherent communities instead of one
    * collapse-everything blob. Fixed rounds + deterministic tie-break
    * make every label exactly mirrorable. */
  def g05LabelPropagation(spark: SparkSession, dir: String): DataFrame =
    lpaLabels(spark, dir).orderBy("node")

  /** The 4-round LPA community table over the 0.7 near-dup graph — g05
    * EMITS it and g08 SCORES it (modularity), so the four iterative
    * rounds run once per (session, corpus) as a shared checkpoint
    * (the tradeGraph discipline; |V|-row artifact). */
  private def lpaLabels(spark: SparkSession, dir: String): DataFrame =
    graft.SharedPrep.cached(spark, s"lpaLabels:$dir", dir) {
      graft.SharedPrep.checkpointShared(
        Graph.labelPropagation(DedupQueries.neardupPairs(spark, dir, 0.7),
          "id_a", "id_b", rounds = 4))
    }

  val g05Sql: String = {
    // every l{r} is referenced twice (votes + keep-old fallback) and
    // every v{r} twice (max + argmin) — AS MATERIALIZED throughout or
    // DuckDB's CTE inlining recomputes the d04 base 2^rounds times
    val round = (r: Int) =>
      s"""v$r AS MATERIALIZED (
         |  SELECT e.b AS node, l.community AS lbl, COUNT(*) AS c
         |  FROM e0 e JOIN l${r - 1} l ON l.node = e.a
         |  GROUP BY 1, 2),
         |l$r AS MATERIALIZED (
         |  SELECT p.node, COALESCE(w.lbl, p.community) AS community
         |  FROM l${r - 1} p LEFT JOIN (
         |    SELECT c.node, MIN(c.lbl) AS lbl
         |    FROM v$r c JOIN (SELECT node, MAX(c) AS mc FROM v$r GROUP BY 1) m
         |      ON m.node = c.node AND c.c = m.mc
         |    GROUP BY 1) w ON w.node = p.node)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |${DedupQueries.all("d04_ngram_jaccard")._2}
       |),
       |half AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a <> id_b),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM half UNION ALL SELECT b, a FROM half)),
       |l0 AS MATERIALIZED (
       |  SELECT node, node AS community
       |  FROM (SELECT DISTINCT a AS node FROM e0)),
       |${(1 to 4).map(round).mkString(",\n")}
       |SELECT node, community FROM l4 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- g06
  /** Common-neighbor link prediction on the order↔supplier bipartite
    * graph (orders to even node ids, suppliers to odd, as in g01):
    * supplier pairs that co-fulfill orders, ranked by integer-exact
    * neighborhood Jaccard — the market-basket co-occurrence primitive.
    * `pivotDegCap = 10` is LOAD-BEARING here, not a formality: order
    * pivots have degree ≤ 7 (suppliers per order) and pass, supplier
    * pivots have degree in the thousands and are excluded — exactly the
    * hub-noise wedge blow-up the cap exists to stop, and because the cap
    * is part of the operator's deterministic contract the oracle mirrors
    * it bit-for-bit rather than approximating. */
  def g06LinkPrediction(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "lineitem")
      .select((col("l_orderkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    Graph.commonNeighborPairs(edges, "src", "dst", pivotDegCap = 10)
      .orderBy("id_a", "id_b")
  }

  val g06Sql: String =
    s"""WITH e AS (
       |  SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM e WHERE src <> dst),
       |sym AS MATERIALIZED (
       |  SELECT a, b FROM canon UNION ALL SELECT b AS a, a AS b FROM canon),
       |deg AS MATERIALIZED (
       |  SELECT a AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
       |piv AS MATERIALIZED (
       |  SELECT s.a, s.b FROM sym s
       |  JOIN deg d ON d.node = s.a AND d.deg <= 10),
       |cn AS MATERIALIZED (
       |  SELECT l.b AS v, r.b AS w, COUNT(*) AS common
       |  FROM piv l JOIN piv r ON l.a = r.a AND l.b < r.b
       |  GROUP BY 1, 2),
       |np AS (
       |  SELECT cn.v, cn.w, cn.common FROM cn
       |  LEFT JOIN canon c ON c.a = cn.v AND c.b = cn.w
       |  WHERE c.a IS NULL)
       |SELECT np.v AS id_a, np.w AS id_b, np.common,
       |  (dv.deg + dw.deg - np.common)::BIGINT AS union_deg,
       |  ((1000 * np.common) // (dv.deg + dw.deg - np.common))::BIGINT
       |    AS jaccard_milli
       |FROM np
       |JOIN deg dv ON dv.node = np.v
       |JOIN deg dw ON dw.node = np.w
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- g07
  /** 3-truss of the near-dup pair graph by four fixed peeling rounds
    * ([[Graph.kTruss]]): surviving edges are corroborated by at least
    * one triangle in the survivor graph — the edge-level strengthening
    * of g04's node-level 2-core, and the "collapse only third-party-
    * confirmed links" policy for aggressive dedup. The engine computes
    * per-round support by degree-ordered oriented wedge enumeration
    * (bounded fan-out); the oracle unrolls the same rounds with the
    * naive common-neighbor join, which must agree exactly. */
  def g07KTruss(spark: SparkSession, dir: String): DataFrame = {
    val edges = DedupQueries.neardupPairs(spark, dir, 0.7)
    Graph.kTruss(edges, "id_a", "id_b", k = 3, rounds = 4)
      .orderBy("id_a", "id_b")
  }

  val g07Sql: String = {
    // AS MATERIALIZED throughout: each round reads the prior edge set
    // three times (edge list + both sym probes) — inlining would
    // recompute the d04 base exponentially
    val round = (r: Int) =>
      s"""sup$r AS MATERIALIZED (
         |  SELECT l.a, l.b, COUNT(*) AS sup
         |  FROM e${r - 1} l
         |  JOIN sym${r - 1} x ON x.a = l.a
         |  JOIN sym${r - 1} y ON y.a = l.b AND y.b = x.b
         |  GROUP BY l.a, l.b),
         |e$r AS MATERIALIZED (
         |  SELECT l.a, l.b FROM e${r - 1} l
         |  JOIN sup$r s ON s.a = l.a AND s.b = l.b AND s.sup >= 1),
         |sym$r AS MATERIALIZED (
         |  SELECT a, b FROM e$r UNION ALL SELECT b, a FROM e$r)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |${DedupQueries.all("d04_ngram_jaccard")._2}
       |),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT LEAST(id_a, id_b) AS a, GREATEST(id_a, id_b) AS b
       |  FROM pairs WHERE id_a <> id_b),
       |sym0 AS MATERIALIZED (
       |  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
       |${(1 to 4).map(round).mkString(",\n")},
       |supF AS (
       |  SELECT l.a, l.b, COUNT(*) AS sup
       |  FROM e4 l
       |  JOIN sym4 x ON x.a = l.a
       |  JOIN sym4 y ON y.a = l.b AND y.b = x.b
       |  GROUP BY l.a, l.b)
       |SELECT e.a AS id_a, e.b AS id_b,
       |  COALESCE(s.sup, 0)::BIGINT AS support
       |FROM e4 e LEFT JOIN supF s ON s.a = e.a AND s.b = e.b
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------- g08
  /** Modularity scoring of the g05 label-propagation communities
    * ([[Graph.modularity]]): the Newman Q statistic per community, the
    * quality number that tells a pipeline whether its community split of
    * the near-dup graph is real structure or noise. Composes the exact
    * same edge set and 4-round LPA labeling as g05, so the oracle embeds
    * g05's full replay as a CTE and scores it with the identical integer
    * algebra (×10⁶-scaled division by m2², truncate-toward-zero in both
    * engines; q_num may be legitimately negative for an internally
    * edge-free community). */
  def g08Modularity(spark: SparkSession, dir: String): DataFrame = {
    // the edge list feeds BOTH the LPA rounds and the modularity scoring;
    // it arrives ALREADY materialized (the shared near-dup pair
    // checkpoint), so each replay is a block read + the 0.7 filter — a
    // second localCheckpoint here would just duplicate the blocks
    val edges = DedupQueries.neardupPairs(spark, dir, 0.7)
    val labels = lpaLabels(spark, dir)
    Graph.modularity(edges, "id_a", "id_b", labels).orderBy("community")
  }

  val g08Sql: String =
    s"""WITH labels AS MATERIALIZED (
       |${g05Sql}
       |),
       |opairs AS MATERIALIZED (
       |${DedupQueries.all("d04_ngram_jaccard")._2}
       |),
       |ohalf AS (
       |  SELECT id_a AS a, id_b AS b FROM opairs WHERE id_a <> id_b),
       |oe0 AS MATERIALIZED (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a, b FROM ohalf UNION ALL SELECT b, a FROM ohalf)),
       |odeg AS (SELECT a, COUNT(*) AS deg FROM oe0 GROUP BY 1),
       |om2 AS (SELECT COUNT(*)::BIGINT AS m2 FROM oe0),
       |oint AS (
       |  SELECT la.community, COUNT(*)::BIGINT AS ipairs
       |  FROM oe0 e
       |  JOIN labels la ON la.node = e.a
       |  JOIN labels lb ON lb.node = e.b
       |  WHERE la.community = lb.community GROUP BY 1),
       |ods AS (
       |  SELECT l.community, COUNT(*)::BIGINT AS n_nodes,
       |    SUM(d.deg)::BIGINT AS degree_sum
       |  FROM labels l JOIN odeg d ON d.a = l.node GROUP BY 1)
       |SELECT s.community, s.n_nodes,
       |  (COALESCE(i.ipairs, 0) // 2)::BIGINT AS internal_edges,
       |  s.degree_sum,
       |  (COALESCE(i.ipairs, 0)::HUGEINT * m.m2
       |   - s.degree_sum::HUGEINT * s.degree_sum)::BIGINT AS q_num,
       |  CAST(((COALESCE(i.ipairs, 0)::HUGEINT * m.m2
       |         - s.degree_sum::HUGEINT * s.degree_sum) * 1000000)
       |       // (m.m2::HUGEINT * m.m2) AS BIGINT) AS q_micro
       |FROM ods s LEFT JOIN oint i USING (community) CROSS JOIN om2 m
       |ORDER BY s.community""".stripMargin

  // ---------------------------------------------------------------- g09
  /** Multi-source BFS over the customer↔supplier trade graph
    * ([[Graph.multiSourceBfs]]): exact hop distances from the seed set
    * {customer 0, supplier 0} within 4 rounds — the k-hop trust-radius /
    * landmark-distance primitive. The bipartite projection makes parity
    * informative (even hops = same side as a seed), and the oracle
    * unrolls the same four min-union relaxations. */
  def g09BfsDistances(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.multiSourceBfs(pairs, "c", "s", seeds = Seq(0L, 1L), rounds = 4)
      .orderBy("node")
  }

  val g09Sql: String = {
    val round = (r: Int) =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, MIN(dist)::BIGINT AS dist FROM (
         |    SELECT node, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT e.b, l.dist + 1
         |    FROM e0 e JOIN d${r - 1} l ON l.node = e.a)
         |  GROUP BY 1)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e0 AS MATERIALIZED (
       |  SELECT c AS a, s AS b FROM pairs
       |  UNION ALL
       |  SELECT s AS a, c AS b FROM pairs),
       |d0 AS (
       |  SELECT CAST(UNNEST([0, 1]) AS BIGINT) AS node,
       |         CAST(0 AS BIGINT) AS dist),
       |${(1 to 4).map(round).mkString(",\n")}
       |SELECT node, dist FROM d4 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- g10
  /** Degree-distribution audit ([[Graph.degreeAudit]]) of the trade
    * graph — the skew census run before any wedge/join algorithm is
    * chosen: power-of-two degree buckets (integer bit-length, no libm),
    * node counts, bucket degree ranges, and each bucket's exact share
    * of edge endpoints. The dense co-occurrence projection's heavy tail
    * is visible here — the evidence for g02's degree-ordered
    * orientation and the operator-level caps. */
  def g10DegreeAudit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.degreeAudit(pairs, "c", "s").orderBy("bucket")
  }

  val g10Sql: String =
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |e0 AS (
      |  SELECT c AS a, s AS b FROM pairs
      |  UNION ALL
      |  SELECT s AS a, c AS b FROM pairs),
      |deg AS (SELECT a, COUNT(*)::BIGINT AS deg FROM e0 GROUP BY 1),
      |tot AS (SELECT SUM(deg)::BIGINT AS m2 FROM deg)
      |SELECT LENGTH(BIN(deg))::BIGINT AS bucket,
      |  COUNT(*)::BIGINT AS n_nodes,
      |  MIN(deg) AS min_deg, MAX(deg) AS max_deg,
      |  SUM(deg)::BIGINT AS endpoints,
      |  CAST((SUM(deg)::HUGEINT * 1000000) // MIN(tot.m2) AS BIGINT)
      |    AS share_micro
      |FROM deg CROSS JOIN tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- g11
  /** Degree assortativity ([[Graph.assortativity]]) of the trade graph:
    * the bipartite customer↔supplier projection is structurally
    * DISASSORTATIVE (many low-degree customers attach to few
    * high-degree suppliers), so the gate's r < 0 is itself a semantic
    * check, not just an arithmetic one. Every moment is an integer and
    * the oracle replays the same scaled division. */
  def g11Assortativity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.assortativity(pairs, "c", "s")
  }

  val g11Sql: String =
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |e0 AS (
      |  SELECT c AS a, s AS b FROM pairs
      |  UNION ALL
      |  SELECT s AS a, c AS b FROM pairs),
      |deg AS (SELECT a, COUNT(*)::BIGINT AS deg FROM e0 GROUP BY 1),
      |m AS (
      |  SELECT COUNT(*)::BIGINT AS m2, SUM(dj.deg)::BIGINT AS sum_j,
      |    SUM(dj.deg::HUGEINT * dk.deg) AS sjk,
      |    SUM(dj.deg::HUGEINT * dj.deg) AS sj2
      |  FROM e0 e
      |  JOIN deg dj ON dj.a = e.a
      |  JOIN deg dk ON dk.a = e.b)
      |SELECT m2, sum_j, sjk::BIGINT AS sum_jk, sj2::BIGINT AS sum_j2,
      |  CAST(((m2 * sjk - sum_j::HUGEINT * sum_j) * 1000000)
      |       // NULLIF(m2 * sj2 - sum_j::HUGEINT * sum_j, 0) AS BIGINT)
      |    AS assort_micro
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- g12
  /** Per-node local clustering coefficient over the near-dup similarity
    * graph (same edges as g02): 2·tri/(deg·(deg−1)) as an exact integer
    * micro value — separates clique-member docs (template families,
    * mirrored sites) from hub docs that merely touch many unrelated
    * near-dup pairs. Reuses the g02 degree-oriented triangle plan plus
    * one node-keyed join; the oracle extends the shared triangle CTEs. */
  def g12LocalClustering(spark: SparkSession, dir: String): DataFrame =
    triangleTable(spark, dir).orderBy("node")

  val g12Sql: String =
    s"""$triangleCtes
      |SELECT deg.node, deg.d::BIGINT AS deg,
      |  COALESCE(per.triangles, 0)::BIGINT AS triangles,
      |  CASE WHEN deg.d >= 2 THEN
      |    (2000000 * COALESCE(per.triangles, 0)) // (deg.d * (deg.d - 1))
      |  ELSE 0 END::BIGINT AS lcc_micro
      |FROM deg LEFT JOIN per ON per.node = deg.node
      |ORDER BY deg.node""".stripMargin

  // ---------------------------------------------------------------- g13
  /** Sampled harmonic centrality ([[Graph.harmonicCentrality]]) of the
    * trade graph from four deterministic landmarks (customers 1–2 →
    * nodes 2,4; suppliers 1–2 → nodes 3,5), 3 BFS rounds: the
    * disconnected-safe closeness variant a web-corpus pipeline computes
    * to rank hub pages, landmark-sampled exactly as it would be at
    * 100 TB (all-pairs distances are never computed; the seed set
    * bounds per-round state). Scores are Σ⌊10⁶/d⌋ integers, so the
    * oracle unrolls the same three (node, src)-keyed min-union rounds
    * in BIGINT and reproduces every score bit-for-bit. */
  def g13Harmonic(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.harmonicCentrality(pairs, "c", "s",
      seeds = Seq(2L, 3L, 4L, 5L), rounds = 3)
      .orderBy("node")
  }

  val g13Sql: String = {
    val round = (r: Int) =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, src, MIN(dist)::BIGINT AS dist FROM (
         |    SELECT node, src, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT e.b, l.src, l.dist + 1
         |    FROM e0 e JOIN d${r - 1} l ON l.node = e.a)
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e0 AS MATERIALIZED (
       |  SELECT c AS a, s AS b FROM pairs
       |  UNION ALL
       |  SELECT s AS a, c AS b FROM pairs),
       |d0 AS (
       |  SELECT CAST(UNNEST([2, 3, 4, 5]) AS BIGINT) AS node,
       |         CAST(UNNEST([2, 3, 4, 5]) AS BIGINT) AS src,
       |         CAST(0 AS BIGINT) AS dist),
       |${(1 to 3).map(round).mkString(",\n")}
       |SELECT node, COUNT(*)::BIGINT AS reached,
       |  SUM(1000000 // dist)::BIGINT AS harmonic_micro
       |FROM d3 WHERE dist > 0
       |GROUP BY node ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- g15
  /** Ball-growth / effective-diameter curve from g13's landmark BFS
    * (seeds 2..5, 3 rounds) over the trade graph: cumulative (landmark,
    * node) pairs per hop with the coverage fraction at the horizon.
    * Exact for the landmark sample — the ANF question answered without
    * all-pairs distances. */
  def g15BallGrowth(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.ballGrowth(pairs, "c", "s", seeds = Seq(2L, 3L, 4L, 5L),
      rounds = 3)
  }

  val g15Sql: String = {
    val round = (r: Int) =>
      s"""d$r AS MATERIALIZED (
         |  SELECT node, src, MIN(dist)::BIGINT AS dist FROM (
         |    SELECT node, src, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT e.b, l.src, l.dist + 1
         |    FROM e0 e JOIN d${r - 1} l ON l.node = e.a)
         |  GROUP BY 1, 2)""".stripMargin
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e0 AS MATERIALIZED (
       |  SELECT c AS a, s AS b FROM pairs
       |  UNION ALL
       |  SELECT s AS a, c AS b FROM pairs),
       |d0 AS (
       |  SELECT CAST(UNNEST([2, 3, 4, 5]) AS BIGINT) AS node,
       |         CAST(UNNEST([2, 3, 4, 5]) AS BIGINT) AS src,
       |         CAST(0 AS BIGINT) AS dist),
       |${(1 to 3).map(round).mkString(",\n")},
       |hist AS (
       |  SELECT dist, COUNT(*)::BIGINT AS n_pairs FROM d3 GROUP BY 1),
       |tot AS (SELECT COUNT(*)::BIGINT AS n_total FROM d3)
       |SELECT dist, n_pairs,
       |  CAST(SUM(n_pairs) OVER (ORDER BY dist) AS BIGINT) AS cum_pairs,
       |  CAST(SUM(n_pairs) OVER (ORDER BY dist)::HUGEINT * 1000000
       |    // n_total AS BIGINT) AS coverage_micro
       |FROM hist, tot ORDER BY dist""".stripMargin
  }

  // ---------------------------------------------------------------- g14
  /** Average-neighbor-degree curve knn(k) over the customer–supplier
    * bipartite graph (g11's edge set) — the full degree-correlation
    * curve behind g11's single assortativity scalar. Exact integral
    * class means, micro-scaled. */
  def g14NeighborDegree(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.neighborDegreeCurve(pairs, "c", "s")
  }

  val g14Sql: String =
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |e0 AS (
      |  SELECT c AS a, s AS b FROM pairs
      |  UNION ALL
      |  SELECT s AS a, c AS b FROM pairs),
      |deg AS (SELECT a AS node, COUNT(*)::BIGINT AS deg FROM e0
      |        GROUP BY 1),
      |nbr AS (
      |  SELECT e.a AS node, SUM(d.deg)::BIGINT AS snd
      |  FROM e0 e JOIN deg d ON d.node = e.b GROUP BY 1),
      |cls AS (
      |  SELECT deg, COUNT(*)::BIGINT AS n_nodes, SUM(snd) AS snd
      |  FROM deg JOIN nbr USING (node) GROUP BY 1)
      |SELECT deg, n_nodes,
      |  CAST(snd::HUGEINT * 1000000 // (deg * n_nodes) AS BIGINT)
      |    AS knn_micro
      |FROM cls ORDER BY deg""".stripMargin

  // ---------------------------------------------------------------- g16
  /** Rich-club coefficient φ(k) at power-of-two degree thresholds over
    * the trade graph — do the high-degree customers/suppliers
    * preferentially interconnect? The edge list is scanned once for the
    * whole sweep (broadcast threshold join), never per k. */
  def g16RichClub(spark: SparkSession, dir: String): DataFrame = {
    val pairs = tradePairs(spark, dir)
    Graph.richClub(pairs, "c", "s", Seq(1L, 2L, 4L, 8L, 16L, 32L))
  }

  val g16Sql: String =
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |e0 AS (
      |  SELECT c AS a, s AS b FROM pairs
      |  UNION ALL
      |  SELECT s AS a, c AS b FROM pairs),
      |deg AS (SELECT a AS node, COUNT(*)::BIGINT AS deg FROM e0
      |        GROUP BY 1),
      |ann AS (
      |  SELECT p.c AS a, p.s AS b, da.deg AS da, db.deg AS db
      |  FROM pairs p
      |  JOIN deg da ON da.node = p.c
      |  JOIN deg db ON db.node = p.s),
      |thr AS (SELECT UNNEST([1, 2, 4, 8, 16, 32])::BIGINT AS k),
      |ek AS (
      |  SELECT k, COUNT(*)::BIGINT AS n_edges
      |  FROM thr JOIN ann ON da > k AND db > k GROUP BY 1),
      |nk AS (
      |  SELECT k, COUNT(*)::BIGINT AS n_nodes
      |  FROM thr JOIN deg ON deg > k GROUP BY 1)
      |SELECT t.k, COALESCE(nk.n_nodes, 0)::BIGINT AS n_nodes,
      |  COALESCE(ek.n_edges, 0)::BIGINT AS n_edges,
      |  CAST(COALESCE(ek.n_edges, 0)::HUGEINT * 2000000
      |    // NULLIF(COALESCE(nk.n_nodes, 0)
      |             * (COALESCE(nk.n_nodes, 0) - 1), 0) AS BIGINT)
      |    AS phi_micro
      |FROM thr t LEFT JOIN nk USING (k) LEFT JOIN ek USING (k)
      |ORDER BY t.k""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "g16_rich_club" -> (g16RichClub _, g16Sql),
    "g15_ball_growth" -> (g15BallGrowth _, g15Sql),
    "g14_neighbor_degree" -> (g14NeighborDegree _, g14Sql),
    "g13_harmonic" -> (g13Harmonic _, g13Sql),
    "g12_local_clustering" -> (g12LocalClustering _, g12Sql),
    "g11_assortativity" -> (g11Assortativity _, g11Sql),
    "g10_degree_audit" -> (g10DegreeAudit _, g10Sql),
    "g09_bfs_distances" -> (g09BfsDistances _, g09Sql),
    "g08_modularity" -> (g08Modularity _, g08Sql),
    "g07_ktruss" -> (g07KTruss _, g07Sql),
    "g01_pagerank" -> (g01PageRank _, g01Sql),
    "g02_triangles" -> (g02Triangles _, g02Sql),
    "g03_personalized_pagerank" -> (g03PersonalizedPageRank _, g03Sql),
    "g04_kcore" -> (g04KCore _, g04Sql),
    "g05_label_propagation" -> (g05LabelPropagation _, g05Sql),
    "g06_link_prediction" -> (g06LinkPrediction _, g06Sql),
  )
}
