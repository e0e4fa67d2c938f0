package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary-encoded token-set bitmaps: each doc's distinct-token set
  * packed into ⌈|vocab|/64⌉ 64-bit words. Set intersection/union become
  * `bit_count(x & y)` folds — integer ops inside WholeStageCodegen —
  * instead of per-pair string-array hashing. Exact (not approximate): the
  * dictionary assigns every token a unique bit.
  *
  * Scale: the dictionary is |vocab| rows (bounded, broadcastable — at
  * 100 TB you'd build it offline like any vocab and bucket-join if it
  * outgrew broadcast); bitmap build is one explode + bit_or aggregate,
  * linear in corpus size. Word count scales as vocab/64 — a 1M-token
  * vocab is a 16 KB bitmap per doc, at which point MinHash (q_dedup_minhash)
  * takes over as the candidate generator and this stays the verifier.
  */
object TokenBitmap {

  /** (doc_id, bm: array<bigint>, sz: int) — bitmap + distinct-token count.
    * `tokensExpr` is any SQL expression producing array<string> from `text`
    * (unigrams by default; n-gram shingles for q_dedup_ngram). */
  def bitmaps(s: SparkSession, d: String,
      tokensExpr: String = "split(text, ' ')"): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(expr(tokensExpr))).as("tok"))
    // tiny global dictionary; deterministic ids (alphabetical)
    val vocab = tok.select("tok").distinct()
      .withColumn("id",
        (row_number().over(Window.orderBy("tok")) - 1).cast("long"))
    val nWords = // dictionary sizing — one scalar read, part of planning
      math.max(1, (vocab.count() + 63) / 64).toInt
    tok.join(broadcast(vocab), Seq("tok"))
      .withColumn("w", expr("CAST(id div 64 AS INT)"))
      .withColumn("bit", expr("shiftleft(1L, CAST(id % 64 AS INT))"))
      .groupBy("doc_id", "w")
      .agg(expr("bit_or(bit)").as("bits"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("wm"))
      .withColumn("bm",
        expr(s"transform(sequence(0, ${nWords - 1}), i -> coalesce(wm[i], 0L))"))
      .withColumn("sz",
        expr("aggregate(bm, 0, (acc, x) -> acc + bit_count(x))"))
      .select("doc_id", "bm", "sz")
  }

  /** |A ∩ B| via the native fused-loop expression
    * (graft.functions.BitmapIntersectCount). */
  def intersectExpr(a: String, b: String): String =
    s"graft_bitmap_inter($a, $b)"
}
