package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-wide hit/miss counters for the engine's in-session caches
  * (FixtureCache, the IVF coarse-index cache, the PQ codebook
  * cache). Purpose: BENCH PROVENANCE (r15 verdict #3) — the shipped
  * artifact carries, per query, whether its recorded number consumed
  * warm caches or paid a cold fit, so a 10× outlier like r15's
  * ns153 is self-explaining instead of needing a forensic rerun.
  * Counters are monotone; readers diff snapshots around an
  * evaluation. Not a data path — two longs per cache name. */
object CacheStats {
  private val hits = new ConcurrentHashMap[String, AtomicLong]
  private val misses = new ConcurrentHashMap[String, AtomicLong]

  private def cell(m: ConcurrentHashMap[String, AtomicLong],
      cache: String): AtomicLong =
    m.computeIfAbsent(cache, _ => new AtomicLong)

  def hit(cache: String): Unit = cell(hits, cache).incrementAndGet(): Unit
  def miss(cache: String): Unit = cell(misses, cache).incrementAndGet(): Unit

  /** (total hits, total misses) across every cache. */
  def totals(): (Long, Long) = {
    var h = 0L; var m = 0L
    hits.forEach((_, v) => h += v.get())
    misses.forEach((_, v) => m += v.get())
    (h, m)
  }

  /** Per-cache (hits, misses), sorted by cache name. */
  def snapshot(): Seq[(String, Long, Long)] = {
    val names = scala.collection.mutable.SortedSet.empty[String]
    hits.forEach((k, _) => names += k: Unit)
    misses.forEach((k, _) => names += k: Unit)
    names.toSeq.map(n => (n,
      Option(hits.get(n)).map(_.get()).getOrElse(0L),
      Option(misses.get(n)).map(_.get()).getOrElse(0L)))
  }
}
