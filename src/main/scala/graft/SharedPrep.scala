package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-gate SHARED prep subtrees.
  *
  * Several gate families rebuild one identical, expensive preparation —
  * the symmetrized customer↔supplier trade graph feeds ten g-gates, and
  * the PageRank pair (g01/g03) additionally shares the degree-annotated,
  * src-partitioned edge list. Recomputing that subtree per gate is pure
  * waste in ANY multi-query session (the bench, the Verify dump, a user
  * running several graph queries against one corpus), so the prep is
  * memoized here per (session, key) as an eagerly-materialized
  * `localCheckpoint` and every caller after the first reads the
  * checkpointed blocks.
  *
  * The registry exists because materialization alone is not enough:
  * `Bench.drainLeaks()` unpersists every leaked RDD between queries (the
  * attribution-hygiene fix of r16), and a localCheckpoint whose blocks
  * are dropped is UNRECOVERABLE — its lineage was truncated by design.
  * Shared prep therefore registers its block ids in [[keepIds]], and the
  * drain spares exactly those. The memory this pins is the prep output
  * itself (the trade graph is |E| fixed-width rows — a few MB at sf0.1,
  * and at 100 TB a production session would persist the same artifact as
  * a table), never per-round iteration state.
  *
  * Thread-safety: `cached` is a `computeIfAbsent` over a concurrent map;
  * bench/verify run gates sequentially, and concurrent first-callers of
  * the same key would at worst serialize on the map entry.
  */
object SharedPrep {

  private val cache = new ConcurrentHashMap[String, AnyRef]()
  private val kept = ConcurrentHashMap.newKeySet[Integer]()

  /** RDD ids whose persisted blocks must survive an inter-query drain. */
  def isKept(rddId: Int): Boolean = kept.contains(Integer.valueOf(rddId))

  /** Memoize `build` per (session, key). The session identity is part of
    * the key so a test that stops its session and starts another over the
    * same fixture dir can never receive a DataFrame bound to a dead
    * session. `build` is responsible for materializing what it returns
    * (via [[checkpointShared]]) — the cache only deduplicates calls.
    *
    * NOT `computeIfAbsent`: builders NEST (tradeGraph builds on
    * tradePairs), and a nested `computeIfAbsent` on one ConcurrentHashMap
    * throws `IllegalStateException: Recursive update` whenever the two
    * keys land in the same bin — which, with the session hash in the key,
    * is a per-JVM coin flip (it silently killed both PageRank gates in
    * two full bench runs before being caught). A reentrant
    * get → synchronized double-check → put is nest-safe. */
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

  /** Eager `localCheckpoint` whose blocks are REGISTERED as shared so an
    * inter-query drain spares them. The persisted-RDD delta around the
    * checkpoint call is how the internal RDD's id is captured — the id of
    * `df.rdd` is NOT the persisted one (that is a fresh deserializing
    * wrapper), so a before/after snapshot is the reliable spelling. */
  def checkpointShared(df: DataFrame): DataFrame = synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint()
    (sc.getPersistentRDDs.keySet -- before)
      .foreach(id => kept.add(Integer.valueOf(id)))
    out
  }
}
