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
    prCoreOneShot(edges, srcCol, dstCol, None,
      iterations, scale, dampNum, dampDen)

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
    prCoreOneShot(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).cast("long").as("node")).distinct()),
      iterations, scale, dampNum, dampDen)

  /** One-shot prep + run + deterministic release: the prep rides on
    * plain `persist()` (lazy — round 1 materializes it, rounds 2..n
    * reuse) and is unpersisted as soon as the eagerly-materialized
    * final ranks exist, so a caller looping one-shot pageRank calls
    * (specs, property tests, library users) does not accumulate
    * checkpoint blocks per call. Callers wanting prep REUSE across runs
    * use [[prepareEdges]] + the `*Prepared` entry points and own the
    * blocks' lifetime. */
  private def prCoreOneShot(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: Option[DataFrame], iterations: Int,
      scale: Long, dampNum: Long, dampDen: Long): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    val eDeg = e.withColumn("outdeg",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"))))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val out = prCore(PreparedEdges(eDeg, nodes), seeds,
      iterations, scale, dampNum, dampDen)
    // safe immediately: prCore's per-round localCheckpoints are EAGER,
    // so `out` is materialized rows, not a plan over eDeg
    e.unpersist()
    eDeg.unpersist()
    out
  }

  /** A PageRank-ready edge list, built ONCE and reusable across PR
    * variants and repeated runs: distinct `(src, dst)` pairs
    * pre-partitioned on `src` with `outdeg` attached, plus the distinct
    * node list — both eagerly materialized. g01 and g03 run over the
    * SAME symmetrized trade graph, and at 100 TB this prep (a distinct
    * over the raw relationship join plus one degree pass) dwarfs the
    * fixed five |V|-row iteration rounds, so paying it once per corpus
    * instead of once per query is the difference that matters. */
  final case class PreparedEdges(eDeg: DataFrame, nodes: DataFrame)

  /** Build [[PreparedEdges]] from a raw edge list. `materialize` is the
    * checkpoint spelling — defaults to a plain eager `localCheckpoint`;
    * pass [[graft.SharedPrep.checkpointShared]] to make the blocks
    * survive an inter-query drain. The node list derives from the
    * ALREADY-CHECKPOINTED eDeg so the distinct+repartition is computed
    * exactly once. */
  def prepareEdges(edges: DataFrame, srcCol: String, dstCol: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint())
      : PreparedEdges = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .repartition(col("src"))
    // out-degree rides along via a window over the src partitioning the
    // edges already have — no extra shuffle, no groupBy+join-back
    val eDeg = materialize(e.withColumn("outdeg",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")))))
    val nodes = materialize(
      eDeg.select(col("src").as("node"))
        .union(eDeg.select(col("dst").as("node")))
        .distinct())
    PreparedEdges(eDeg, nodes)
  }

  /** [[pageRank]] over [[PreparedEdges]] — the prep-reuse entry point. */
  def pageRankPrepared(prepared: PreparedEdges, iterations: Int = 5,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame =
    prCore(prepared, None, iterations, scale, dampNum, dampDen)

  /** [[personalizedPageRank]] over [[PreparedEdges]]. */
  def personalizedPageRankPrepared(prepared: PreparedEdges,
      seeds: DataFrame, seedCol: String, iterations: Int = 5,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame =
    prCore(prepared,
      Some(seeds.select(col(seedCol).cast("long").as("node")).distinct()),
      iterations, scale, dampNum, dampDen)

  private def prCore(prepared: PreparedEdges, seeds: Option[DataFrame],
      iterations: Int, scale: Long, dampNum: Long,
      dampDen: Long): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val eDeg = prepared.eDeg
    // is_seed rides on the node list once; uniform PR seeds everything.
    // localCheckpoint: the node list is re-joined EVERY round — without
    // it each round would recompute the seed join from scratch (the
    // underlying node list itself is already checkpointed by prepare)
    val nodes = (seeds match {
      case Some(s) => prepared.nodes
        .join(s.withColumn("is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      case None => prepared.nodes.withColumn("is_seed", lit(true))
    }).localCheckpoint()
    val base = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes
      .select(col("node"), col("is_seed"),
        when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      // localCheckpoint per round: truncates lineage AND (deliberately)
      // hides round N-1's plan from round N — the per-round plan shape
      // is pinned separately via prRound in PlanQualitySpec. Measured
      // A/B at sf0.1: checkpointing only every third round (deeper lazy
      // plans, fewer materialization jobs) is ~20% SLOWER — the adaptive
      // re-planning cost of the deeper composed plan exceeds the
      // per-round materialization it saves.
      ranks = prRound(eDeg, nodes, ranks, base, dampNum, dampDen)
        .localCheckpoint()
    }
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
    // localCheckpoint, NOT persist: this function runs no action before
    // returning, so a persist+unpersist pair is a no-op by the time the
    // caller executes the (lazy) result — and `oriented` feeds the final
    // plan THREE times, so without real materialization the entire
    // upstream edge-producing subtree (e.g. the g02 near-dup pair join)
    // re-executes per use. Eager localCheckpoint materializes the
    // canonical edge list once, here, and truncates lineage — the
    // project-wide discipline of the iterative graph ops.
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
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
      .localCheckpoint()
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
    degKeyed.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** LOCAL CLUSTERING COEFFICIENT per node: lcc = 2·tri / (deg·(deg−1)),
    * the fraction of a node's neighbor pairs that are themselves linked —
    * the standard per-node cohesion signal (Watts–Strogatz 1998) that
    * separates hub-of-strangers nodes from clique members. Reported as an
    * exact integer micro value (`(2 000 000·tri) div (deg·(deg−1))`, 0
    * for deg < 2) plus the raw deg/triangle integers, so the g12 oracle
    * mirrors it bit-exactly on top of the g02 triangle SQL.
    *
    * Scale shape: canonicalize + distinct once, then exactly the
    * [[triangleCounts]] degree-oriented wedge plan (the heavy part —
    * wedge fan-out is bounded by orientation, never deg²) plus one
    * node-keyed join of two already-node-partitioned frames. */
  def localClustering(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // eager localCheckpoint (not a persist/unpersist pair, which is a
    // no-op without an action): canon feeds BOTH the degree agg and the
    // triangle pass, so the upstream edge-producing subtree must
    // materialize exactly once
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tri = triangleCounts(canon, "a", "b")
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          expr("(2000000 * coalesce(triangles, 0)) DIV (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("lcc_micro"))
  }

  /** Synchronous LABEL-PROPAGATION community detection (Raghavan et al.
    * 2007) over an undirected edge list, with a FIXED round count — the
    * same determinism contract as [[pageRank]]'s fixed iterations and
    * [[kCore]]'s fixed peeling rounds: the result is a deterministic pure
    * function of the graph whether or not propagation has stabilized, so
    * it is exactly mirrorable. Each node starts labeled with its own id;
    * every round each node adopts the most frequent label among its
    * NEIGHBORS, ties broken by smallest label (the classic random
    * tie-break is replaced by min-label so the operator is
    * deterministic).
    *
    * Scale shape per round: one co-partitioned equi-join (edges ⋈ labels
    * on the source endpoint) + a (node, label) partial-aggregating count
    * + a per-node max/argmin resolution — all fixed-width BIGINT rows,
    * never any structure wider than the edge list. `localCheckpoint` per
    * round is load-bearing here (unlike [[pageRank]]): each round
    * references the previous labels twice (votes + keep-old fallback),
    * so a lazily-composed plan would double per round.
    *
    * @return (node BIGINT, community BIGINT) for every node with at
    *         least one edge; the community id is the min node id that
    *         propagated there. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "labelPropagation needs at least one round")
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("a"))
      .persist()
    var labels = sym.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("community"))
      .localCheckpoint()
    for (_ <- 1 to rounds)
      labels = lpRound(sym, labels).localCheckpoint()
    sym.unpersist()
    labels
  }

  /** One label-propagation round — exposed so the plan (equi-joins +
    * partial aggs, no cartesian) can be asserted directly. */
  private[graft] def lpRound(sym: DataFrame, labels: DataFrame): DataFrame = {
    val votes = sym
      .join(labels.select(col("node").as("a"), col("community").as("lbl")),
        "a")
      .groupBy(col("b").as("node"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    // argmax with min-label tie-break, as two exact aggregates (max
    // count, then min label at that count) — both mirror directly in SQL
    val top = votes.groupBy("node").agg(max(col("c")).as("mc"))
    val winner = votes.join(top, Seq("node"))
      .filter(col("c") === col("mc"))
      .groupBy("node").agg(min(col("lbl")).as("w"))
    labels.join(winner, Seq("node"), "left")
      .select(col("node"), coalesce(col("w"), col("community")).as("community"))
  }

  /** Common-neighbor LINK PREDICTION over an undirected edge list: for
    * every non-adjacent node pair sharing at least one neighbor, the
    * number of shared neighbors plus the integer-exact Jaccard of the two
    * neighborhoods — |N(a)∩N(b)| as `common`, |N(a)∪N(b)| as
    * `union_deg`, and `(1000·common) div union_deg` as `jaccard_milli`.
    * On a near-dup pair graph this surfaces TRANSITIVE duplicate
    * candidates the pairwise threshold missed (a–b and b–c matched but
    * a–c fell just short); on a bipartite interaction graph it is the
    * classic co-occurrence recommender primitive.
    *
    * The scale guard is `pivotDegCap`, this operator's [[Dedup]]-style
    * skew cap: wedges are generated through a PIVOT node, and a pivot of
    * degree d fans out to d·(d−1)/2 candidate pairs, so hub nodes (a
    * boilerplate document near-dup-linked to everything, a
    * sells-to-everyone supplier) would blow the wedge join up
    * quadratically while carrying no predictive signal — sharing a hub
    * neighbor is not evidence of similarity. Pivots above the cap are
    * excluded from wedge GENERATION (degrees and the Jaccard denominator
    * still count them), exactly how `dfCap` drops ubiquitous shingles
    * before [[Dedup.ngramJaccardPairs]]'s pair join.
    *
    * @return (id_a, id_b, common, union_deg, jaccard_milli), id_a < id_b,
    *         one row per predicted (non-edge) pair. */
  def commonNeighborPairs(edges: DataFrame, srcCol: String, dstCol: String,
      pivotDegCap: Long = 10000L): DataFrame = {
    require(pivotDegCap >= 1, "pivotDegCap must be positive")
    // eager localCheckpoint (not persist/unpersist, a no-op without an
    // action here): canon feeds the symmetrized wedge side, the anti-join
    // and (via deg) both degree probes of the final plan, so without real
    // materialization the upstream pair-producing subtree re-executes per
    // use. deg is node-count sized and probed twice — checkpoint it too.
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val sym = canon.union(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // materialized once (r21): both wedge sides read this frame, and the
    // v/w renames keep physical exchange reuse from deduplicating the
    // two otherwise-identical semi-join+repartition subtrees — without
    // the checkpoint the pivot-filter pipeline executes twice per run
    val pivotEdges = sym
      .join(deg.filter(col("deg") <= pivotDegCap)
        .select(col("node").as("a")), Seq("a"), "left_semi")
      .repartition(col("a"))
      .localCheckpoint()
    val l = pivotEdges.select(col("a").as("u"), col("b").as("v"))
    val r = pivotEdges.select(col("a").as("u"), col("b").as("w"))
    val cn = l.join(r, "u").filter(col("v") < col("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("common"))
    val predicted = cn
      .join(canon.select(col("a").as("v"), col("b").as("w")),
        Seq("v", "w"), "left_anti")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .join(deg.select(col("node").as("w"), col("deg").as("dw")), "w")
      .select(col("v").as("id_a"), col("w").as("id_b"), col("common"),
        (col("dv") + col("dw") - col("common")).as("union_deg"),
        expr("(1000 * common) div (dv + dw - common)").as("jaccard_milli"))
    predicted
  }

  /** k-TRUSS decomposition (Cohen 2008) by fixed peeling rounds: keep
    * only edges whose SUPPORT (number of triangles containing the edge)
    * is ≥ k−2, recompute support on the survivor graph, repeat. The
    * truss is the edge-level strengthening of [[kCore]]: a 3-truss edge
    * is embedded in at least one triangle of the surviving subgraph, so
    * truss edges mark relationships corroborated by a third party —
    * the "safe to trust this near-dup link" filter.
    *
    * Scale shape: support is computed by the SAME degree-ordered
    * orientation as [[triangleCounts]] (Suri–Vassilvitskii) — each
    * triangle is enumerated exactly once from bounded O(√E) oriented
    * fan-out and exploded into its three edge contributions, one
    * partial-agg rollup per round. Fixed `rounds` keeps the result a
    * deterministic pure function of the graph (the [[kCore]] contract),
    * so an oracle unrolls the same rounds.
    *
    * @return (id_a, id_b, support) — surviving canonical edges with
    *         their support in the final survivor graph */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int = 4): DataFrame = {
    require(k >= 3 && rounds >= 1)
    val canon0 = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // Orientation is fixed ONCE from the ORIGINAL degrees and carried on
    // the edge rows (r21): wedge enumeration counts each triangle exactly
    // once under ANY total node order, so support — and therefore the
    // result — is orientation-independent; the degree ordering is purely
    // the O(√E) fan-out bound, and original degrees only shrink under
    // peeling, so they stay a valid bound. This removes the per-round
    // degree aggregate + two degree joins (the measured wall was ~13
    // sequential AQE stage-jobs per round on a support-sized graph).
    val deg0 = canon0.select(col("a").as("node"))
      .union(canon0.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    var canon = canon0
      .join(deg0.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg0.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"), col("da"), col("db"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      canon = canon
        .join(triangleSupport(canon), Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= k - 2)
        .select(col("a"), col("b"), col("da"), col("db"))
        .localCheckpoint()
    }
    canon.join(triangleSupport(canon), Seq("a", "b"), "left")
      .select(col("a").as("id_a"), col("b").as("id_b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Per-edge triangle support over a canonical (a < b, deduped) edge
    * set that carries its orientation key (da, db — degrees under the
    * caller's FIXED ordering), via one oriented-wedge enumeration: each
    * closed wedge (u, v, w) is one triangle, exploded into its three
    * canonical edges. Edges in no triangle get no row (support 0 by
    * absence). */
  private def triangleSupport(canonDeg: DataFrame): DataFrame = {
    val oriented = canonDeg
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
    val wedges = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u"), col("v").as("w")), "u")
      .filter(col("v") =!= col("w"))
    val tri = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")),
      Seq("v", "w"), "left_semi")
    tri.select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .union(tri.select(least(col("u"), col("w")).as("a"),
        greatest(col("u"), col("w")).as("b")))
      .union(tri.select(least(col("v"), col("w")).as("a"),
        greatest(col("v"), col("w")).as("b")))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
  }

  /** Degree-distribution AUDIT of an undirected graph: per power-of-two
    * degree bucket (bucket = bit_length(degree), libm-free via
    * `length(bin(deg))` — the t17 integer-log2 trick), how many nodes
    * land there and the bucket's min/max degree, plus each bucket's
    * share of total edge endpoints. This is the structural pre-check
    * that decides whether a workload needs skew guards (a heavy tail ⇒
    * df-caps/orientation/salting) before any join runs — cheap enough
    * to run on every ingest.
    *
    * Scale shape: symmetrize+distinct (one shuffle), degree partial agg,
    * then a partial agg over ≤ 64 buckets; the endpoint total rides in
    * broadcast. All integers; the share is an exact scaled division. */
  def degreeAudit(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    val tot = deg.agg(sum(col("deg")).as("m2"))
    deg.withColumn("bucket", length(bin(col("deg"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"), sum(col("deg")).as("endpoints"))
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_nodes"), col("min_deg"),
        col("max_deg"), col("endpoints"),
        expr("""cast((cast(endpoints as decimal(38,0)) * 1000000)
                 div m2 as bigint)""").as("share_micro"))
  }

  /** Degree ASSORTATIVITY — the Newman (2002) degree-correlation
    * coefficient r ∈ [−1, 1]: do high-degree nodes attach to other
    * high-degree nodes (social graphs, r > 0) or to leaves
    * (hub-and-spoke / bipartite projections, r < 0)? Over the symmetric
    * directed edge list with endpoint degrees (j, k), the standard
    * simplification r = (S1·Σjk − (Σj)²) / (S1·Σj² − (Σj)²) holds with
    * every sum an INTEGER — so the statistic is one exact ×10⁶-scaled
    * DECIMAL division (negative numerators truncate toward zero in both
    * engines; a regular graph's zero denominator yields NULL, both
    * engines via NULLIF).
    *
    * Scale shape: degree partial agg, two co-partitioned joins to
    * attach (j, k) per edge, one scalar rollup. No iteration.
    *
    * @return one row: (m2, sum_j, sum_jk, sum_j2, assort_micro). */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("a"), col("deg").as("j")), "a")
      .join(deg.select(col("a").as("b"), col("deg").as("k")), "b")
      .agg(count(lit(1)).as("m2"), sum(col("j")).as("sum_j"),
        sum(expr("cast(j as decimal(38,0)) * k")).as("sjk"),
        sum(expr("cast(j as decimal(38,0)) * j")).as("sj2"))
      .select(col("m2"), col("sum_j"),
        col("sjk").cast("bigint").as("sum_jk"),
        col("sj2").cast("bigint").as("sum_j2"),
        expr("""cast(((m2 * sjk - cast(sum_j as decimal(38,0)) * sum_j)
                      * 1000000)
                 div nullif(m2 * sj2
                      - cast(sum_j as decimal(38,0)) * sum_j, 0)
                 as bigint)""").as("assort_micro"))
  }

  /** Multi-source BFS hop distances, `rounds` fixed synchronous
    * frontier expansions — the primitive behind "how far is every node
    * from the trusted seed set" (seed-based trust/contamination radius,
    * influence neighborhoods, landmark distance features). Returns every
    * node within `rounds` hops of ANY seed with its exact hop distance;
    * unreached nodes are absent, exactly like a k-hop ego query.
    *
    * Fixed-rounds discipline (the d12/g01 shape): each round is one
    * co-partitioned equi-join (frontier ⋈ pre-partitioned edges) plus a
    * min partial agg, localCheckpoint-ed so lineage stays flat and no
    * per-round driver scalar exists. Distance propagation by min-union
    * is idempotent, so re-relaxing already-settled nodes is harmless —
    * no visited-set state needed. */
  def multiSourceBfs(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "multiSourceBfs needs at least one round")
    require(seeds.nonEmpty, "multiSourceBfs needs at least one seed")
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("a"))
      .persist()
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = seeds.toDF("node")
      .select(col("node").cast("long").as("node"), lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val prop = sym
        .join(dist.select(col("node").as("a"), col("dist")), "a")
        .select(col("b").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.unionAll(prop)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    sym.unpersist()
    dist
  }

  /** Min-union landmark BFS shared by [[harmonicCentrality]] and
    * [[ballGrowth]]: (node, src, dist) with dist = min distance from
    * landmark `src` found within `rounds` hops. Co-partitioned edge
    * joins + (node, src) partial-min aggs per round, lineage truncated
    * with localCheckpoint each round. */
  private[operators] def minUnionBfs(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: Seq[Long], rounds: Int): DataFrame = {
    require(rounds >= 1, "minUnionBfs needs at least one round")
    require(seeds.nonEmpty, "minUnionBfs needs at least one seed")
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("a"))
      .persist()
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = seeds.toDF("node")
      .select(col("node").cast("long").as("node"),
        col("node").cast("long").as("src"), lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val prop = sym
        .join(dist.select(col("node").as("a"), col("src"), col("dist")), "a")
        .select(col("b").as("node"), col("src"),
          (col("dist") + 1L).as("dist"))
      dist = dist.unionAll(prop)
        .groupBy("node", "src").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    sym.unpersist()
    dist
  }

  /** Sampled HARMONIC CENTRALITY (Boldi & Vigna 2014's centrality of
    * choice for web-scale graphs — defined for disconnected graphs,
    * unlike closeness): H(v) = Σ_s 1/d(s,v) over a fixed landmark seed
    * set, distances from a per-source multi-BFS truncated at `rounds`
    * hops. Exact harmonic centrality needs all-pairs distances — never
    * computed at 100 TB; the landmark-sampled estimator (the
    * HyperBall/ANF lineage) is the production form, and a deterministic
    * seed set keeps it oracle-mirrorable.
    *
    * State is (node, src, dist) — frontier size multiplies by at most
    * |seeds|, so the seed set bounds memory exactly like the probe batch
    * bounds [[graft.operators.Similarity.knnJoin]]. Each round is one
    * co-partitioned equi-join plus a min partial agg over (node, src),
    * localCheckpoint-ed; min-union relaxation is idempotent (no visited
    * set). The final score is integer micro-units ⌊10⁶/d⌋ summed per
    * node — BIGINT arithmetic both engines reproduce bit-for-bit.
    *
    * @return (node, reached, harmonic_micro): landmarks reached within
    *         `rounds` hops (d ≥ 1) and Σ⌊10⁶/d⌋ over them; seeds score
    *         their OWN row too (d(s,s)=0 contributes nothing, matching
    *         the definition's s≠v sum). Nodes reaching no landmark are
    *         absent. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], rounds: Int = 4): DataFrame =
    minUnionBfs(edges, srcCol, dstCol, seeds, rounds)
      .filter(col("dist") > 0L)
      .groupBy("node")
      .agg(count(lit(1)).as("reached"),
        sum(expr("cast(1000000 as bigint) div dist")).as("harmonic_micro"))

  /** RICH-CLUB coefficient curve φ(k) (Colizza et al. 2006): among the
    * nodes of degree > k, the fraction of possible edges actually
    * present — rising φ(k) means hubs preferentially interconnect (a
    * "rich club"), the structural property behind crawl-graph cores.
    * Exact integral form: φ(k)·10⁶ = ⌊2·e_k·10⁶ / (n_k·(n_k−1))⌋.
    *
    * Scale shape: degrees are one partial agg; edges annotate both
    * endpoint degrees via two co-partitioned joins; then the whole
    * sweep is a broadcast |thresholds|-row join — the edge list is
    * scanned once for ALL thresholds, never per k. n_k < 2 → NULL.
    *
    * @return one row per threshold: k, n_nodes, n_edges, phi_micro. */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "richClub needs thresholds")
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // feeds degrees AND the annotated edge sweep
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint() // probed by the edge annotate AND the node sweep
    val annotated = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val thr = thresholds.toDF("k")
    val ek = annotated.crossJoin(broadcast(thr))
      .filter(col("da") > col("k") && col("db") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    val nk = deg.crossJoin(broadcast(thr))
      .filter(col("deg") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    thr.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .na.fill(0L, Seq("n_nodes", "n_edges"))
      .select(col("k"), col("n_nodes"), col("n_edges"),
        expr("""cast((cast(n_edges as decimal(38,0)) * 2000000)
                 div nullif(n_nodes * (n_nodes - 1), 0) as bigint)""")
          .as("phi_micro"))
      .orderBy("k")
  }

  /** BALL-GROWTH curve / effective-diameter probe (the ANF / HyperANF
    * question, Palmer et al. 2002, answered exactly for a landmark
    * sample): for each hop count d ≤ `rounds`, how many (landmark,
    * node) pairs lie within distance d, cumulatively, plus the
    * coverage fraction of all pairs reached at the horizon. The d where
    * coverage_micro crosses 900000 is the sampled effective diameter —
    * the number that says whether a crawl graph is a tight web or a
    * string of chains. Runs on [[minUnionBfs]]'s final state: a BFS
    * pair's distance is final the round it is found (min-stable), so
    * the curve needs no per-round snapshots — one ≤(rounds+1)-row
    * histogram + cumulative window over it. */
  def ballGrowth(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], rounds: Int = 4): DataFrame = {
    val dist = minUnionBfs(edges, srcCol, dstCol, seeds, rounds)
    val hist = dist.groupBy(col("dist"))
      .agg(count(lit(1)).as("n_pairs"))
    // GLOBAL-WINDOW: bounded — cumulative over the ≤(rounds+1)-row
    // distance histogram (scaladoc above), never the BFS state
    val w = org.apache.spark.sql.expressions.Window.orderBy("dist")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val total = dist.agg(count(lit(1)).as("n_total"))
    hist.withColumn("cum_pairs", sum(col("n_pairs")).over(w))
      .crossJoin(broadcast(total))
      .select(col("dist"), col("n_pairs"), col("cum_pairs"),
        expr("""cast((cast(cum_pairs as decimal(38,0)) * 1000000)
                 div n_total as bigint)""").as("coverage_micro"))
      .orderBy("dist")
  }

  /** Newman MODULARITY of a community assignment over an undirected
    * graph (Newman & Girvan 2004): per community c,
    * Q_c = e_c/m − (d_c/2m)², where e_c counts intra-community edges,
    * d_c sums member degrees, and m is the edge total. The score every
    * community detector (Louvain, Leiden, LPA quality checks) optimizes
    * — here as the exact evaluation pass over any (node, community)
    * labeling, e.g. [[labelPropagation]]'s output.
    *
    * Integer-exact: with m2 = 2m (directed symmetric pair count) and
    * i_c = 2e_c (directed intra pairs), Q_c·m2² = i_c·m2 − d_c², so the
    * gate emits `q_num` = that integer and `q_micro` = its ×10⁶ integral
    * division by m2² — both truncate-toward-zero in Spark's `div` and
    * DuckDB's `//` alike (q_num CAN be negative for an internally
    * edge-free community). Products run in DECIMAL(38,0) so d_c² can't
    * wrap once degree sums pass 2³¹·√2 at real scale.
    *
    * Scale shape: symmetrize + distinct (one shuffle), degree partial
    * agg, one co-partitioned labels⋈edges join per endpoint, then
    * community-keyed partial aggs; the edge total rides in as a
    * broadcast one-row scalar. No iteration, no driver values.
    *
    * @param labels (node, community) assignment — every edge endpoint
    *               must be labeled (inner joins drop unlabeled strays)
    * @return one row per community:
    *         (community, n_nodes, internal_edges, degree_sum, q_num,
    *         q_micro), where Σ q_micro ≈ 10⁶·Q. */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val half = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val m2 = sym.agg(count(lit(1)).as("m2"))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    val la = labels.select(col("node").as("a"), col("community"))
    val lb = labels.select(col("node").as("b"), col("community").as("cb"))
    val internal = sym.join(la, "a").join(lb, "b")
      .filter(col("community") === col("cb"))
      .groupBy("community").agg(count(lit(1)).as("ipairs"))
    val ds = la.join(deg, "a")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    ds.join(internal, Seq("community"), "left")
      .crossJoin(broadcast(m2))
      .select(col("community"), col("n_nodes"),
        expr("coalesce(ipairs, 0L) div 2").as("internal_edges"),
        col("degree_sum"),
        expr("""cast(cast(coalesce(ipairs, 0L) as decimal(38,0)) * m2
                 - cast(degree_sum as decimal(38,0)) * degree_sum
                 as bigint)""").as("q_num"),
        expr("""cast(((cast(coalesce(ipairs, 0L) as decimal(38,0)) * m2
                       - cast(degree_sum as decimal(38,0)) * degree_sum)
                      * 1000000)
                 div (cast(m2 as decimal(38,0)) * m2) as bigint)""")
          .as("q_micro"))
  }

  /** AVERAGE-NEIGHBOR-DEGREE curve knn(k) (Pastor-Satorras, Vázquez &
    * Vespignani 2001): for each degree class k, the mean degree of all
    * neighbors of degree-k nodes — the full degree-correlation CURVE
    * behind [[assortativity]]'s single scalar (rising = assortative
    * hubs-with-hubs, falling = disassortative hub-and-spoke, the usual
    * web/crawl-graph shape).
    *
    * Exact integral form: Σ neighbor degrees over a degree class divided
    * by the class's neighbor-slot count (k · n_nodes), micro-scaled.
    * Scale shape: canonical edge list is materialized once
    * (localCheckpoint — it feeds the symmetrization twice), then two
    * co-partitioned node-keyed joins + partial aggs; the final curve agg
    * runs over ≤|distinct degrees| rows. Nothing is ever all-pairs.
    *
    * @return one row per degree class: deg, n_nodes, knn_micro. */
  def neighborDegreeCurve(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val sym = canon.union(canon.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint() // feeds the neighbor probe AND the class agg
    val nbr = sym
      .join(deg.select(col("node").as("b"), col("deg").as("nbr_deg")), "b")
      .groupBy(col("a").as("node"))
      .agg(sum(col("nbr_deg")).as("snd"))
    deg.join(nbr, "node")
      .groupBy("deg")
      .agg(count(lit(1)).as("n_nodes"), sum(col("snd")).as("snd"))
      .select(col("deg"), col("n_nodes"),
        expr("""cast((cast(snd as decimal(38,0)) * 1000000)
                 div (deg * n_nodes) as bigint)""").as("knn_micro"))
      .orderBy("deg")
  }
}
