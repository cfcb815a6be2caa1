package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate PAIR graph — the cluster
  * step of corpus dedup: pairwise scorers (MinHash-LSH, n-gram Jaccard,
  * SimHash…) emit edges, but "keep one copy" needs the transitive
  * closure: if A~B and B~C, then {A,B,C} is one duplicate cluster with
  * one canonical survivor, even when A~C itself scored below threshold.
  *
  * Algorithm: iterative min-label propagation (the Pregel/GraphX
  * hash-min pattern expressed on DataFrames). Each round every node
  * takes the min of its own label and its neighbors' labels — one
  * co-partitioned shuffle join + one partial-aggregating groupBy per
  * round; rounds = graph diameter. Near-dup graphs are shallow (clusters
  * are cliques or near-cliques from banding, diameter 2-3 in practice),
  * so the round count is small and NOT data-scale-dependent; at 100 TB
  * each round is still two fixed-width shuffles of the edge list. For
  * adversarially deep graphs (long chains), the alternating star
  * contraction of Kiveris et al. ("Connected Components in MapReduce",
  * SOCC'14) drops rounds to O(log d) — noted as the escalation path; the
  * hash-min form is kept because dedup graphs never exhibit that shape
  * and the constant factor per round is half.
  *
  * Driver involvement per round is ONE scalar (the exact-decimal Σlabel
  * whose monotone decrease decides convergence — a single partial agg
  * over the fresh checkpoint, no join with the previous round) — no row
  * data ever reaches the driver, and `localCheckpoint` truncates the
  * growing lineage so round N's plan does not replay rounds 1..N-1.
  *
  * Returns (id, label): every vertex of the edge graph with its
  * cluster's minimum vertex id as the cluster label.
  */
object DedupClusters {

  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val half = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // undirected: both directions, pre-partitioned on the probe key so
    // every round's join reuses the same co-partitioning
    val und = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("b"))
      .persist()
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // Single-pass convergence probe (the d30 signature discipline,
    // r19 / VERDICT r18 #3): each round's new label is min(own ∪
    // neighbors'), so per-vertex labels are MONOTONE non-increasing over
    // a constant id set — Σlabel strictly decreases iff ANY label
    // changed, making the exact-decimal sum a deterministic convergence
    // test. This replaces the join-with-previous + count the loop used
    // to pay per round (one full extra shuffle join whose state-store/
    // shuffle IO was p25's dominant cost under IO pressure: 112.8 s in
    // the r18 driver window vs 4.5 s idle). DECIMAL(38,0): Σ of 64-bit
    // ids over any realistic corpus cannot overflow 38 digits.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(sum(col("label").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n")).head()
      val v = row.getDecimal(0)
      if (v == null) {
        // null-with-rows is decimal(38,0) overflow under non-ANSI SQL, not
        // emptiness — mapping it to ZERO would let two consecutive
        // overflow rounds compare equal and signal convergence with
        // silently wrong clusters (ADVICE r19). Practically unreachable
        // (needs ~1e19 id-weighted rows), but silent-wrong must be loud.
        require(row.getLong(1) == 0L,
          "connected-components label sum overflowed decimal(38,0) — " +
            "the convergence probe is invalid at this id scale")
        java.math.BigDecimal.ZERO
      } else v
    }
    var prevSum = labelSum(labels)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // node a's candidate labels: its own + each neighbor b's current
      val cand = und.join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint()
      val candSum = labelSum(cand)
      labels = cand
      done = candSum.compareTo(prevSum) == 0
      prevSum = candSum
      i += 1
    }
    und.unpersist()
    // partially-propagated labels LOOK like valid clusters — failing loudly
    // is the only safe behavior when the round budget runs out (a 100 TB
    // pathological chain graph would otherwise silently over-split clusters)
    if (!done)
      throw new org.apache.spark.SparkException(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "rounds (labels were still changing). The graph's diameter " +
          "exceeds the round budget — raise maxIter, or use " +
          "connectedComponentsStar (O(log d) rounds) for deep graphs.")
    labels
  }

  /** Alternating star contraction (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SOCC'14) — the deep-graph escalation path:
    * converges in O(log d) rounds where hash-min needs d, at roughly twice
    * the per-round constant (two edge-set rewrites + a stability check vs
    * one join+agg).
    *
    * Each round rewrites the edge set twice:
    *  - LARGE-STAR: every neighbor of u strictly larger than u re-links to
    *    min(Γ(u) ∪ {u}) — long tails fold onto local minima;
    *  - SMALL-STAR: with edges oriented u > v, u and all its smaller
    *    neighbors re-link to their minimum — stars flatten.
    * Both preserve connectivity and monotonically decrease a potential
    * function (paper, Thm 2-3), so the first round that leaves the edge
    * set unchanged has reached the terminal star graphs: every node holds
    * a direct edge to its component minimum.
    *
    * Same driver discipline as hash-min: fixed-width (u, v) long pairs in
    * every shuffle, `localCheckpoint` per round, ONE scalar-signature agg
    * per round to the driver, loud failure on round-budget exhaustion.
    *
    * Termination is detected by comparing a per-round SIGNATURE of the
    * edge set — (count, bit_xor of two independent xxhash64 spellings,
    * exact decimal Σv) computed in a single partial-aggregating pass over
    * the freshly checkpointed set — against the previous round's. This
    * replaces the two anti-joins + two actions the probe used to cost
    * (which doubled the per-round join count purely for termination
    * detection). Equal signatures on UNEQUAL sets would need a 64-bit
    * double-hash collision at equal cardinality and equal Σv
    * (≈2⁻¹²⁸-grade per round) — and the FIRST match additionally runs
    * one exact anti-join confirmation (a single extra join per RUN, not
    * per round), so a collision cannot terminate the loop: termination
    * is deterministic, the signature only decides WHEN to pay the exact
    * check. */
  def connectedComponentsStar(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 30): DataFrame = {
    val sig = edgeSetSignature _
    var e = edges.select(
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var prevSig = sig(e)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // large-star over the symmetric view
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u ≥ m: stays u > v
        .filter(col("u") =!= col("v")).distinct()
      // small-star on the (u > v)-oriented result
      val mins2 = ls.groupBy("u").agg(min(col("v")).as("m"))
      val withM = ls.join(mins2, "u")
      val next = withM.select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint()
      val nextSig = sig(next)
      // Signatures matching is NECESSARY for set equality (count, two
      // independent hashes, Σv all agree) but a ~2⁻¹²⁸ collision would
      // stop early and emit silently wrong components with no runtime
      // detection path. So the FIRST signature match triggers one exact
      // confirmation: with equal cardinalities (the signature pins
      // count), next ⊆ e ⇔ next = e, so a single left-anti join decides
      // it. Cost: one extra join per RUN (not per round); a refuted
      // match (never observed, by construction ~impossible) just keeps
      // iterating.
      done = nextSig == prevSig && {
        val prev = e.select(col("u").as("pu"), col("v").as("pv"))
        next.join(prev,
          col("u") === col("pu") && col("v") === col("pv"), "left_anti")
          .isEmpty
      }
      e = next
      prevSig = nextSig
      i += 1
    }
    if (!done)
      throw new org.apache.spark.SparkException(
        s"connectedComponentsStar did not converge within maxIter=$maxIter " +
          "rounds — for star contraction this indicates a pathological " +
          "graph far beyond O(log d) expectations; raise maxIter.")
    // terminal star graphs: u → its component minimum v; minima label
    // themselves
    e.select(col("u").as("id"), col("v").as("label"))
      .union(e.select(col("v").as("id"), col("v").as("label")))
      .distinct()
  }

  /** The star-contraction fixed-point signature: (count, bit_xor of two
    * independent xxhash64 spellings, exact decimal Σv) of a `(u, v)` edge
    * set, computed in ONE partial-aggregating distributed pass and ONE
    * driver row. Exposed so its per-round cost contract (a single Spark
    * job over the just-checkpointed set) and its discrimination behavior
    * are pinned directly in specs. `bit_xor` instead of an integer sum
    * because ANSI `sum(BIGINT)` overflows on full-range hash values;
    * XOR is overflow-free and order-independent, and the decimal Σv
    * (DECIMAL(38,0) headroom) adds an exact structural constraint. */
  private[graft] def edgeSetSignature(df: DataFrame)
      : (Long, Long, Long, java.math.BigDecimal) = {
    val r = df.agg(
      count(lit(1)),
      expr("bit_xor(xxhash64(u, v))"),
      expr("bit_xor(xxhash64(v, u, 7L))"),
      sum(col("v").cast("decimal(38,0)"))).head()
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2),
      if (r.isNullAt(3)) java.math.BigDecimal.ZERO else r.getDecimal(3))
  }
}
