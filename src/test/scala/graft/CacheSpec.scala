package graft

import java.nio.file.Files
import org.apache.spark.storage.StorageLevel

/** The derived-data cache invalidation API (graft.Caches): entries are
  * per-(session, dir[, tokenizer]) singletons, invalidate(dir) is
  * dir-scoped and unpersists what it drops, and rebuilds read the files
  * as they are at rebuild time.
  *
  * (Note: a SAME-session overwrite of the parquet path is auto-refreshed
  * by Spark's CacheManager.recacheByPath, so in-session writes never go
  * stale — the graft.Caches staleness contract is about files rewritten
  * OUTSIDE the session, which this spec simulates only through the
  * rebuild-after-invalidate behavior.) */
class CacheSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, n: Int): Unit =
    (0 until n).map(i => (i.toLong, s"alpha beta tok$i", "en", "t", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

  test("invalidate(dir) is dir-scoped, unpersists, and forces a rebuild") {
    val dir = Files.createTempDirectory("graft-cache").toString
    val tok = "split(text, ' ')"
    writeDocs(dir, 2)
    val first = operators.TokenBitmap.tokens(spark, dir, tok)
    // 2 docs x 3 distinct tokens (alpha, beta, tokI) each
    assert(first.count() === 6)
    assert(first.storageLevel !== StorageLevel.NONE)
    // cache hit: same persisted instance on repeat calls…
    assert(operators.TokenBitmap.tokens(spark, dir, tok) eq first)
    // …and invalidating a DIFFERENT dir doesn't touch this entry…
    Caches.invalidate(dir + "-other")
    assert(operators.TokenBitmap.tokens(spark, dir, tok) eq first)
    // …but invalidating THIS dir unpersists it and the next call
    // rebuilds from the files as they are now.
    writeDocs(dir, 5)
    Caches.invalidate(dir)
    assert(first.storageLevel === StorageLevel.NONE)
    val rebuilt = operators.TokenBitmap.tokens(spark, dir, tok)
    assert(!(rebuilt eq first))
    assert(rebuilt.select("doc_id").distinct().count() === 5)
  }

  test("clearAll drops every cached entry") {
    val dir = Files.createTempDirectory("graft-cache2").toString
    val tok = "split(text, ' ')"
    writeDocs(dir, 3)
    val first = operators.TokenBitmap.tokens(spark, dir, tok)
    assert(first.select("doc_id").distinct().count() === 3)
    writeDocs(dir, 1)
    Caches.clearAll()
    assert(first.storageLevel === StorageLevel.NONE)
    assert(operators.TokenBitmap.tokens(spark, dir, tok)
      .select("doc_id").distinct().count() === 1)
  }
}
