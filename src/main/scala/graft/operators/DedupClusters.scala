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
  * Driver involvement per round is ONE scalar (the changed-label count
  * that decides convergence) — no row data ever reaches the driver, and
  * `localCheckpoint` truncates the growing lineage so round N's plan
  * does not replay rounds 1..N-1.
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
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // node a's candidate labels: its own + each neighbor b's current
      val cand = und.join(labels.withColumnRenamed("id", "b"), "b")
        .select(col("a").as("id"), col("label"))
        .union(labels)
        .groupBy("id").agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = cand
        .join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") < col("prev"))
        .count()
      labels = cand
      done = changed == 0
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
          "exceeds the round budget — raise maxIter, or pre-contract long " +
          "chains (star contraction) before labeling.")
    labels
  }
}
