package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-gate SHARED prep subtrees.
  *
  * Several gate families rebuild one identical, expensive preparation —
  * the symmetrized customer↔supplier trade graph feeds ten g-gates, the
  * near-dup pair list seventeen more, and the PageRank pair (g01/g03)
  * additionally shares the degree-annotated, src-partitioned edge list.
  * Recomputing that subtree per gate is pure waste in ANY multi-query
  * session (the bench, the Verify dump, a user running several queries
  * against one corpus), so the prep is memoized here per (session, key)
  * as an eagerly-materialized `localCheckpoint` and every caller after
  * the first reads the checkpointed blocks.
  *
  * The registry exists because materialization alone is not enough:
  * `Bench.drainLeaks()` unpersists every leaked RDD between queries (the
  * attribution-hygiene fix of r16), and a localCheckpoint whose blocks
  * are dropped is UNRECOVERABLE — its lineage was truncated by design.
  * Shared prep therefore registers its block ids in the keep-set, and
  * the drain spares exactly those. Ids are scoped by the owning
  * SparkContext's applicationId: RDD ids restart at 0 in every new
  * context, so an unscoped id registered by a stopped test session would
  * alias an unrelated RDD in a later one and silently exempt it from
  * draining.
  *
  * The memory this pins is the prep output itself (|E| fixed-width rows
  * — a few MB at sf0.1; at 100 TB a production session persists the same
  * artifact as a table), never per-round iteration state.
  *
  * CONTRACT: a cached entry assumes its corpus dir is immutable for the
  * session's lifetime — the gate corpora are (driver-written testdata) —
  * and entries live until [[invalidate]]/JVM exit. A caller that rewrites
  * a dir mid-session must invalidate its keys first or it will read the
  * pre-rewrite checkpoint.
  *
  * Thread-safety: `cached` is a reentrant get → synchronized
  * double-check → put (NOT `computeIfAbsent`: builders nest — tradeGraph
  * resolves tradePairs — and a nested `computeIfAbsent` on one
  * ConcurrentHashMap throws `IllegalStateException: Recursive update`
  * whenever the two keys share a bin, a per-JVM coin flip that silently
  * killed both PageRank gates in two full bench runs).
  */
object SharedPrep {

  private val cache = new ConcurrentHashMap[String, AnyRef]()
  private val kept = ConcurrentHashMap.newKeySet[String]()

  /** Is (this context's) `rddId` a registered shared-prep block set that
    * an inter-query drain must spare? */
  def isKept(spark: SparkSession, rddId: Int): Boolean =
    kept.contains(spark.sparkContext.applicationId + "#" + rddId)

  /** Memoize `build` per (session, key). The session identity is part of
    * the key so a test that stops its session and starts another over the
    * same fixture dir can never receive a DataFrame bound to a dead
    * session. `build` is responsible for materializing what it returns
    * (via [[checkpointShared]]) — the cache only deduplicates calls. */
  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    val k = System.identityHashCode(spark) + "#" + key
    val hit = cache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else synchronized {
      val again = cache.get(k)
      if (again != null) again.asInstanceOf[T]
      else { val v = build; cache.put(k, v); v }
    }
  }

  /** Drop every cached entry and kept-id registration for `spark` whose
    * key contains `keyPart` (empty string = all of the session's
    * entries). The blocks themselves are NOT unpersisted here — after
    * invalidation they are ordinary leaks and the next drain reclaims
    * them. For callers that rewrite a corpus dir mid-session. */
  def invalidate(spark: SparkSession, keyPart: String = ""): Unit =
    synchronized {
      val prefix = System.identityHashCode(spark) + "#"
      val it = cache.keySet.iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k.startsWith(prefix) && k.contains(keyPart)) it.remove()
      }
      if (keyPart.isEmpty) {
        val app = spark.sparkContext.applicationId + "#"
        val kit = kept.iterator()
        while (kit.hasNext) if (kit.next().startsWith(app)) kit.remove()
      }
    }

  /** Eager `localCheckpoint` whose blocks are REGISTERED as shared so an
    * inter-query drain spares them. The persisted RDD's id is read
    * straight off the returned Dataset's `LogicalRDD` plan — the id of
    * `df.rdd` is NOT the persisted one (that is a fresh deserializing
    * wrapper), and a before/after `getPersistentRDDs` diff (the previous
    * spelling) would also capture RDDs persisted concurrently by other
    * threads, permanently exempting foreign blocks from the drain. */
  def checkpointShared(df: DataFrame): DataFrame = synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    val app = sc.applicationId
    out.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        kept.add(app + "#" + lr.rdd.id)
      case _ =>
        // fallback: the plan shape changed across a Spark upgrade — use
        // the snapshot diff (single-threaded sessions only, which bench
        // and verify are)
        (sc.getPersistentRDDs.keySet -- before)
          .foreach(id => kept.add(app + "#" + id))
    }
    out
  }
}
