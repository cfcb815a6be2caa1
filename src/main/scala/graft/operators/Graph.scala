package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over DataFrame edge lists — the graph
  * layer a corpus pipeline needs beyond dedup clustering
  * ([[DedupClusters]]): link-based importance scoring (PageRank drives
  * crawl prioritization and quality weighting, à la Common Crawl's
  * harmonic-centrality ranks) and triangle counting (the local-clustering
  * signal behind spam-farm and link-ring detection).
  *
  * Both operators use INTEGER-EXACT arithmetic on purpose: every rank is
  * a BIGINT in fixed-point micro-units and every per-edge contribution is
  * an integer division, so sums are order-independent and the results are
  * bit-reproducible on any engine — the same "mirrorable approximate"
  * policy as the quantized-LSH ANN path ([[Similarity]]): the fixed-point
  * quantization error (≤ outdeg micro-units per node per round, i.e.
  * ≤ 1e-6 relative) is far below any decision threshold a pipeline would
  * apply to the ranks, and in exchange the operator is fully
  * oracle-checkable.
  */
object Graph {

  /** Fixed-point PageRank over a directed edge list.
    *
    * Classic power iteration, r' = (1-d) + d·Σ r(u)/outdeg(u) over
    * in-neighbors u, expressed in micro-units (`scale` = 1e6): every node
    * starts at `scale`, each round a node's rank splits evenly across its
    * out-edges by INTEGER division, and damping applies as
    * `(dampNum · sum) / dampDen` — again integer. The tiny mass shaved by
    * the floor divisions (< outdeg units per node) is the price of exact
    * reproducibility.
    *
    * Scale shape: one co-partitioned shuffle join (edges ⋈ ranks on src)
    * plus one partial-aggregating groupBy per round — identical plan
    * skeleton to [[DedupClusters.connectedComponents]], with the same
    * driver discipline (`localCheckpoint` per round truncates lineage; no
    * row data reaches the driver — the round count is FIXED, so there is
    * no convergence scalar at all). Edges are pre-partitioned on `src`
    * once and persisted, so every round's join reuses one exchange.
    * Ranks stay (BIGINT, BIGINT) rows regardless of corpus width: at
    * 100 TB the per-round shuffle is |V| fixed-width rows, and BIGINT
    * overflow needs total mass ≥ 2^63 — i.e. > 9e12 nodes at the default
    * scale — before it is a concern.
    *
    * Nodes absent from `edges` have rank exactly `(dampDen-dampNum)·scale
    * /dampDen` after round 1 and contribute nothing; callers wanting them
    * in the output union them in. Dangling nodes (in-edges only) keep
    * receiving mass but stop re-emitting it — the standard
    * redistribute-to-all correction is deliberately omitted because it
    * makes every rank depend on a global scalar per round (an all-to-one
    * then one-to-all dependency that serializes the plan at scale);
    * symmetrize the edge list instead if mass conservation matters.
    *
    * @return (node BIGINT, rank BIGINT) — fixed-point micro-unit ranks
    *         for every node with at least one in- or out-edge.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame =
    prCore(edges, srcCol, dstCol, None, iterations, scale, dampNum, dampDen)

  /** PERSONALIZED PageRank (random walk with restart): the teleport mass
    * lands only on `seeds` instead of uniformly, so ranks measure
    * influence RELATIVE to the seed set — the "more like these" primitive
    * behind seed-based corpus expansion (find domains/documents central
    * to a trusted whitelist) and related-item graphs. Same integer
    * fixed-point semantics and plan shape as [[pageRank]]; seeds start
    * at `scale`, everything else at 0, and the per-round base term is
    * seed-only. Non-seed nodes unreachable from a seed stay exactly 0. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iterations: Int = 5,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame =
    prCore(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).cast("long").as("node")).distinct()),
      iterations, scale, dampNum, dampDen)

  private def prCore(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Option[DataFrame], iterations: Int, scale: Long,
      dampNum: Long, dampDen: Long): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    // out-degree rides along via a window over the src partitioning the
    // edges already have — no extra shuffle, no groupBy+join-back
    val eDeg = e.withColumn("outdeg",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"))))
      .persist()
    val allNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // is_seed rides on the node list once; uniform PR seeds everything.
    // localCheckpoint: the node list is re-joined EVERY round — without
    // it each round would recompute the distinct-union from scratch
    val nodes = (seeds match {
      case Some(s) => allNodes
        .join(s.withColumn("is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      case None => allNodes.withColumn("is_seed", lit(true))
    }).localCheckpoint()
    val base = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint()
    for (i <- 1 to iterations) {
      ranks = prRound(eDeg, nodes, ranks, base, dampNum, dampDen)
      // each round references the previous `ranks` exactly ONCE, so the
      // lazily-composed multi-round plan still executes every stage once
      // — unlike hash-min CC there is no per-round driver action forcing
      // materialization. Checkpoint only every third round (and at the
      // end): enough to bound plan depth for large iteration counts,
      // without paying an eager materialization job per round. The
      // per-round plan shape is pinned via prRound in PlanQualitySpec.
      if (i % 3 == 0 || i == iterations) ranks = ranks.localCheckpoint()
    }
    e.unpersist()
    eDeg.unpersist()
    ranks.select(col("node"), col("rank"))
  }

  /** One power-iteration round — exposed so its plan (co-partitioned
    * equi-join + partial-aggregating groupBy, no cartesian) can be
    * asserted directly; `localCheckpoint` otherwise erases it. */
  private[graft] def prRound(eDeg: DataFrame, nodes: DataFrame,
      ranks: DataFrame, base: Long, dampNum: Long,
      dampDen: Long): DataFrame = {
    val contribs = eDeg
      .join(ranks.select(col("node").as("src"), col("rank")), "src")
      .select(col("dst").as("node"),
        // `div` is Spark's integral division — `/` would detour through
        // DOUBLE and lose exactness past 2^53
        expr("rank div outdeg").as("c"))
      .groupBy("node")
      .agg(sum(col("c")).as("in_mass"))
    nodes
      .join(contribs, Seq("node"), "left")
      .select(col("node"), col("is_seed"),
        (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
          expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen"))
          .cast("long").as("rank"))
  }

  /** Fixed-round K-CORE peeling over an undirected edge list: each round
    * removes every node whose current degree is below `k` (and its
    * edges); after `rounds` rounds the survivors are a SUPERSET of the
    * true k-core that equals it once peeling has stabilized — and the
    * round count is part of the operator's contract (like [[pageRank]]'s
    * fixed iterations), so the result is deterministic and mirrorable
    * regardless of convergence. Near-dup graphs peel to fixpoint in a
    * handful of rounds (cluster shapes are shallow); adversarially deep
    * peeling chains would need `rounds` ≈ the chain length, which the
    * caller can raise.
    *
    * Per round: one partial-agg degree count + two semi-joins — all
    * equi-joins on node ids, fixed-width rows, `localCheckpoint` lineage
    * truncation, no driver scalars.
    *
    * @return (node, in_core, core_degree) for every node of the input
    *         graph; non-survivors carry core_degree 0. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym0 = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val allNodes = sym0.select(col("a").as("node")).distinct()
      .localCheckpoint()
    var sym = sym0.localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("a").as("node"))
      sym = sym
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
    }
    val coreDeg = sym.groupBy("a").agg(count(lit(1)).as("core_degree"))
      .select(col("a").as("node"), col("core_degree"))
    allNodes
      .join(coreDeg, Seq("node"), "left")
      .select(col("node"),
        col("core_degree").isNotNull.as("in_core"),
        coalesce(col("core_degree"), lit(0L)).as("core_degree"))
  }

  /** Per-node triangle counts over an undirected edge list, via
    * degree-ordered orientation (the standard scalable formulation:
    * Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    * Reducer", WWW'11).
    *
    * Edges are first canonicalized (undirected, deduped, self-loops
    * dropped), then ORIENTED from the lower-(degree, id) endpoint to the
    * higher — every triangle becomes exactly one directed wedge
    * u→v, u→w with an oriented closing edge v→w, found by one self-join
    * on the wedge pivot plus one semi-join against the oriented edge set.
    * The orientation is the entire scale story: each node's oriented
    * out-degree is O(√|E|) regardless of its raw degree, so the wedge
    * join's fan-out is bounded even for celebrity nodes — the raw-degree
    * formulation would square the hottest node's degree. The (degree, id)
    * tiebreak keeps the orientation total and deterministic, so the count
    * is exactly mirrorable in SQL.
    *
    * @return (node BIGINT, triangles BIGINT) for every node of the
    *         canonical edge list, 0 for triangle-free nodes.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient low-(deg, id) -> high-(deg, id)
    val oriented = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .persist()
    // wedges u -> (v, w) with v before w in orientation order; closing
    // edge must be v -> w (orientation order is total, so exactly one
    // direction can exist)
    val l = oriented.select(col("u"), col("v"))
    val r = oriented.select(col("u"), col("v").as("w"))
    val wedges = l.join(r, "u").filter(col("v") =!= col("w"))
    val degKeyed = deg
    val vw = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"), "left_semi")
    // each closed wedge (u, v, w) is one triangle touching all 3 nodes;
    // (v, w) pairs appear once per orientation, so no double counting
    val perNode = vw.select(col("u").as("node"))
      .union(vw.select(col("v").as("node")))
      .union(vw.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val out = degKeyed.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
    canon.unpersist()
    oriented.unpersist()
    out
  }
}
