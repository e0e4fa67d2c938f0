package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.CopyOnWriteArrayList

/** Central registry for the session-lifetime derived-data caches
  * (TokenBitmap dictionaries/bitmaps, DedupOps simhash fingerprints and
  * cluster labels, TextOps BM25 per-doc stats).
  *
  * Staleness contract: every cache is keyed by (SparkSession, data dir
  * [, tokenizer]) and holds a persisted DataFrame built from the parquet
  * under that dir AT FIRST USE. If the files under a dir are rewritten
  * within a session, cached consumers (including the public
  * Pipeline.curateCorpus / publishCurated entry points) serve the
  * snapshot they first read until `invalidate(dir)` (or `clearAll()`) is
  * called — which unpersists the cached frames and releases their
  * executor memory (cluster results are persisted through an RDD handle
  * the cache owns, so their blocks release promptly too; only the
  * loop's INTERMEDIATE per-round checkpoints are left to the
  * ContextCleaner). This mirrors Spark's own `spark.catalog.
  * refreshTable` contract for cached file-backed tables: explicit
  * refresh, never mid-query invalidation (a query planned against a
  * half-invalidated snapshot would be worse than a stale-but-consistent
  * one). At 100 TB the dirs are immutable dated snapshots and
  * invalidation is a no-op by construction; this API exists for
  * long-lived sessions pointed at mutable staging dirs. */
object Caches {

  /** Each handler drops entries for one cache map: given Some(dir) only
    * that dir's entries, given None all of them. */
  private val handlers = new CopyOnWriteArrayList[Option[String] => Unit]()

  /** One size supplier per registered map — backs `totalEntries`. */
  private val sizers = new CopyOnWriteArrayList[() => Int]()

  /** One dir-scoped counter per registered map — backs `entriesFor`. */
  private val counters = new CopyOnWriteArrayList[String => Int]()

  private[graft] def register(h: Option[String] => Unit): Unit =
    handlers.add(h)

  /** Register a ConcurrentHashMap-backed cache. `dirOf` extracts the data
    * dir from the key; `release` unpersists whatever the value pins. */
  private[graft] def registerMap[K, V](map: ConcurrentHashMap[K, V],
      dirOf: K => String, release: V => Unit): Unit = {
    sizers.add(() => map.size)
    counters.add { (dir: String) =>
      var n = 0
      map.forEach((k, _) => if (dirOf(k) == dir) n += 1)
      n
    }
    register { dirOpt =>
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (dirOpt.forall(_ == dirOf(e.getKey))) {
          release(e.getValue)
          it.remove()
        }
      }
    }
  }

  /** Live entry count across every registered cache map. The bench's
    * stall re-time pass reports min-of-N per key, which is honest only
    * if a repeat evaluation repeats the first one's work — i.e. every
    * session cache is built by an UNTIMED warmup key, never by the
    * first timed consumer. CacheSpec's warmup-coverage audit asserts
    * that invariant through this census. */
  def totalEntries: Int = {
    var n = 0
    sizers.forEach(s => n += s())
    n
  }

  /** Live entry count for ONE data dir across every registered cache
    * map. The warmup-coverage audit runs against a private copy of the
    * test data so concurrent suites (which share the session and the
    * cache maps, but never that dir) cannot move the count it asserts
    * on. */
  def entriesFor(dir: String): Int = {
    var n = 0
    counters.forEach(c => n += c(dir))
    n
  }

  /** Drop every cached frame built from `dir` (all sessions, all
    * tokenizers), unpersisting them. The next query rebuilds from the
    * files as they are then. */
  def invalidate(dir: String): Unit = handlers.forEach(_(Some(dir)))

  /** Drop every registered cache entry (all dirs). */
  def clearAll(): Unit = handlers.forEach(_(None))
}
