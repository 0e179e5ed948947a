package graft.accel

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Query result cache: serve a repeated query from its previously
  * materialized result instead of re-executing, invalidated when a base
  * lake table advances.
  *
  * Reference: the plan cache keyed on a normalized plan hash with
  * dataset-level invalidation (`exec/planner/plancache/PlanCache.java`,
  * `LegacyPlanCache.java`, invalidation via
  * `services/accelerator/.../plancache/PlanCacheInvalidationHelper.java`;
  * cleared by `ALTER ... CLEAR PLAN CACHE`,
  * `exec/planner/sql/parser/SqlAlterClearPlanCache.java`).
  *
  * Spark-first re-expression: caching a *physical plan* buys little in
  * Spark (Catalyst re-plans in milliseconds); the expensive thing to reuse
  * is the *result*, so entries pin the result RDD via `persist`
  * (MEMORY_AND_DISK — spills instead of OOMing on wide results). The key
  * is the canonicalized optimized-plan fingerprint (same hasher as
  * reflections — exprIds normalized, source paths folded in), so any
  * DataFrame with the same semantics hits regardless of how it was built.
  * Freshness mirrors reflection staleness: lake-table versions are pinned
  * at insert and checked at lookup; a stale entry is unpersisted and
  * recomputed. Non-lake sources have no version authority and are assumed
  * fresh — same contract as reflections.
  */
object ResultCache {

  private final case class Entry(fingerprint: String, df: DataFrame,
                                 baseVersions: Map[String, Long],
                                 hits: AtomicLong, insertedAtNs: Long,
                                 lastUsedNs: AtomicLong)

  private val cache = TrieMap.empty[String, Entry]
  private val hitCount = new AtomicLong()
  private val missCount = new AtomicLong()
  private val tick = new AtomicLong() // monotonic LRU clock (no wall time)

  /** Max cached results before LRU eviction (per JVM). */
  @volatile var maxEntries: Int = 32

  /** Run `df` through the cache: on a fresh hit, the previously
    * materialized result is returned; otherwise the query executes, its
    * result is persisted and registered. The returned DataFrame is always
    * semantically `df`. */
  def cached(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // fingerprint the ANALYZED plan: the optimized plan of a repeat query
    // already contains the InMemoryRelation the CacheManager substituted
    // for the first run's persist, so its fingerprint would never match
    val plan = df.queryExecution.analyzed
    val fp = Reflections.fingerprintPlan(plan)
    cache.get(fp) match {
      case Some(e) if isFresh(spark, e) =>
        hitCount.incrementAndGet(); e.hits.incrementAndGet()
        e.lastUsedNs.set(tick.incrementAndGet())
        e.df
      case stale =>
        stale.foreach { e => e.df.unpersist(blocking = false); cache.remove(fp, e) }
        missCount.incrementAndGet()
        val versions = Reflections.lakeBaseVersions(spark, plan)
        df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize eagerly: "cached" must mean computed once
        val now = tick.incrementAndGet()
        cache.put(fp, Entry(fp, df, versions, new AtomicLong(0), now,
          new AtomicLong(now)))
        evictIfOver()
        df
    }
  }

  private def isFresh(spark: org.apache.spark.sql.SparkSession, e: Entry): Boolean =
    e.baseVersions.forall { case (d, v) =>
      graft.sources.SnapshotTable.forPath(spark, d).latestVersion == v
    }

  private def evictIfOver(): Unit =
    while (cache.size > maxEntries) {
      val lru = cache.values.toSeq.minBy(_.lastUsedNs.get)
      if (cache.remove(lru.fingerprint, lru)) lru.df.unpersist(blocking = false)
    }

  /** ALTER CLEAR PLAN CACHE analogue. */
  def invalidateAll(): Unit = {
    cache.values.foreach(_.df.unpersist(blocking = false))
    cache.clear()
  }

  def stats: (Int, Long, Long) = (cache.size, hitCount.get, missCount.get)

  /** Live rows for sys_result_cache. */
  final case class CacheRow(fingerprint: String, hits: Long,
                            lakeDeps: Int, insertedAtNs: Long)
  def listEntries: Seq[CacheRow] = cache.values.toSeq.sortBy(_.insertedAtNs)
    .map(e => CacheRow(e.fingerprint, e.hits.get, e.baseVersions.size, e.insertedAtNs))

  /** Test/diagnostic hook: reset counters and entries. */
  def clearAll(): Unit = { invalidateAll(); hitCount.set(0); missCount.set(0) }
}
