package graft.operators

import graft.Tables
import graft.Par.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path near-duplicate detection: MinHash+LSH banding and SimHash
  * (north-star LLM-pipeline operators; same public algorithms as Spark ML's
  * MinHashLSH / classic Charikar SimHash, re-expressed as declarative
  * DataFrame plans).
  *
  * Both use md5 as the hash family so every intermediate is deterministic
  * and cross-engine reproducible — the whole pipeline (signatures, bands,
  * candidates, verified pairs) is oracle-checked, not just spot-tested.
  *
  * Scale story (the reason these exist next to q_dedup_near's exact
  * all-pairs baseline): banding turns O(n²) candidate generation into
  * an equi self-join on (band, band_key) — a plain shuffle join whose
  * output is only the colliding pairs. At 100 TB: tokens explode map-side,
  * signatures are a 16-row-per-doc aggregate, bands a 4-row-per-doc
  * aggregate, and the candidate join keys on band_key (high cardinality,
  * salt-able if a band bucket ever gets hot).
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 16
  private val BandRows = 4 // → 4 bands of 4 rows

  /** MinHash(16) → LSH(4 bands × 4 rows) candidates → exact-Jaccard
    * verification at 0.8. Deterministic md5 hash family ⟹ identical
    * candidates (and therefore identical output) in Spark and DuckDB,
    * including any banding misses — recall behavior is itself pinned. */
  private val dedupMinhash: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    // h_i(tok) depends only on (i, tok): |vocab| × NumHashes values —
    // computed once on the tiny dictionary and broadcast, not per doc-token
    val tokHash = tok.select("tok").distinct()
      .withColumn("i", explode(expr(s"sequence(0, ${NumHashes - 1})")))
      .withColumn("h",
        md5(concat(col("i").cast("string"), lit(":"), col("tok"))))
    val sigs = tok.join(broadcast(tokHash), Seq("tok"))
      .groupBy("doc_id", "i").agg(min("h").as("sig"))
    // band key = md5 of the band's sigs in i-order; conditional scalar
    // aggs keep this a codegen'd HashAggregate (collect_list would fall
    // back to ObjectHashAggregate)
    val bandSigs = (0 until BandRows).map(k =>
      max(when(col("i") % BandRows === k, col("sig"))))
    val bands = sigs
      .withColumn("band", expr(s"i div $BandRows"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws("|", bandSigs: _*)).as("bkey"))
    val x = bands.select(col("doc_id").as("a"), col("band"), col("bkey"))
    val y = bands.select(col("doc_id").as("b"), col("band").as("band_y"),
      col("bkey").as("bkey_y"))
    // distinct on a packed 64-bit pair key (doc ids fit 32 bits at any
    // tested SF; beyond that, fall back to struct distinct) — one long
    // hashes/shuffles cheaper than a two-column row
    val cand = x.join(y,
        col("band") === col("band_y") && col("bkey") === col("bkey_y") &&
        col("a") < col("b"))
      .select(expr("shiftleft(a, 32) | b").as("pk")).distinct()
      // unsigned shift: arithmetic shiftright would sign-extend once
      // doc_id reaches 2^31 and silently corrupt the decoded pair
      .select(expr("shiftrightunsigned(pk, 32)").as("a"),
        expr("pk & 4294967295").as("b"))
    // exact verification on candidates only (bitmap bit_count fold)
    val base = TokenBitmap.bitmaps(s, d)
    cand
      .join(base.select(col("doc_id").as("a"), col("bm").as("ba"),
        col("sz").as("sa")), Seq("a"))
      .join(base.select(col("doc_id").as("b"), col("bm").as("bb"),
        col("sz").as("sb")), Seq("b"))
      .withColumn("inter", expr(TokenBitmap.intersectExpr("ba", "bb")))
      .withColumn("jacc",
        col("inter") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jacc") >= 0.8)
      .select(col("a"), col("b"), r6(col("jacc")).as("jacc_r"))
      .orderBy("a", "b")
  }

  /** Charikar SimHash: 64-bit fingerprint from token-frequency-weighted
    * md5 bit votes. Computed per *distinct token* (bit matrix is
    * |vocab|×64, broadcastable) then weighted by per-doc counts — linear
    * in corpus size. Output is the 64-char bit string per doc; hamming
    * distance between fingerprints ≈ cosine of frequency vectors. */
  private val dedupSimhash: Q = (s, d) => {
    val tokc = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val tokBits = tokc.select("tok").distinct()
      .withColumn("h", md5(col("tok")))
      .withColumn("j", explode(expr("sequence(0, 63)")))
      .withColumn("sgn", expr(
        """CASE WHEN ((position(substring(h, j div 4 + 1, 1),
          |'0123456789abcdef') - 1 >> (j % 4)) % 2) = 1
          |THEN 1 ELSE -1 END""".stripMargin))
      .select("tok", "j", "sgn")
    tokc.join(broadcast(tokBits), Seq("tok"))
      .groupBy("doc_id", "j")
      .agg(sum(col("cnt") * col("sgn")).as("s"))
      .withColumn("bit", when(col("s") >= 0, "1").otherwise("0"))
      .groupBy("doc_id")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(j, bit))), x -> x.bit), '')")
        .as("simhash"))
      .orderBy("doc_id")
  }

  /** Word-bigram shingles as array<string> (SQL, engine-portable shape). */
  private val bigramExpr =
    """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
      |         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
      |         (a, b) -> concat(a, ' ', b))""".stripMargin

  /** n-gram (word-bigram) Jaccard near-dup — order-sensitive where
    * token-set Jaccard (q_dedup_near) is bag-of-words: shuffled copies of
    * a doc stop matching. Same bitmap machinery, bigram dictionary
    * (≤ |vocab|² entries → ⌈/64⌉ words). Threshold 0.6: bigram overlap
    * runs lower than unigram overlap on the same corpus. */
  private val dedupNgram: Q = (s, d) => {
    val base = TokenBitmap.bitmaps(s, d, bigramExpr)
    val a = base.select(col("doc_id").as("a"), col("bm").as("ba"),
      col("sz").as("sa"))
    val b = base.select(col("doc_id").as("b"), col("bm").as("bb"),
      col("sz").as("sb"))
    a.join(b, col("a") < col("b") &&
        col("sa") * 3 <= col("sb") * 5 && col("sb") * 3 <= col("sa") * 5)
      .withColumn("inter", expr(TokenBitmap.intersectExpr("ba", "bb")))
      .withColumn("jacc",
        col("inter") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jacc") >= 0.6)
      .select(col("a"), col("b"), r6(col("jacc")).as("jacc_r"))
      .orderBy("a", "b")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_simhash" -> dedupSimhash,
    "q_dedup_ngram" -> dedupNgram)

  val oracle: Map[String, String] = Map(
    "q_dedup_minhash" ->
      s"""WITH tok AS (
           SELECT doc_id,
                  unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents),
         hs AS (
           SELECT doc_id, i, min(md5(i::VARCHAR || ':' || tok)) AS sig
           FROM tok, UNNEST(generate_series(0, ${NumHashes - 1})) AS t(i)
           GROUP BY doc_id, i),
         bands AS (
           SELECT doc_id, i // $BandRows AS band,
                  md5(string_agg(sig, '|' ORDER BY i)) AS bkey
           FROM hs GROUP BY doc_id, i // $BandRows),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bkey = y.bkey
            AND x.doc_id < y.doc_id),
         sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         inter AS (
           SELECT c.a, c.b, count(*) AS i
           FROM cand c
           JOIN tok x ON x.doc_id = c.a
           JOIN tok y ON y.doc_id = c.b AND y.tok = x.tok
           GROUP BY c.a, c.b)
         SELECT a, b,
                floor((i / (sa.n + sb.n - i)) * 1000000 + 0.5) / 1000000.0
                  AS jacc_r
         FROM inter
         JOIN sz sa ON sa.doc_id = a
         JOIN sz sb ON sb.doc_id = b
         WHERE i / (sa.n + sb.n - i) >= 0.8
         ORDER BY a, b""",
    "q_dedup_ngram" ->
      """WITH bg AS (
           SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    generate_series(1, len(string_split(text, ' ')) - 1),
                    i -> string_split(text, ' ')[i] || ' ' ||
                         string_split(text, ' ')[i + 1]))) AS tok
           FROM documents),
         sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
         inter AS (
           SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
           FROM bg x JOIN bg y ON x.tok = y.tok AND x.doc_id < y.doc_id
           GROUP BY x.doc_id, y.doc_id)
         SELECT a, b,
                floor((i / (sa.n + sb.n - i)) * 1000000 + 0.5) / 1000000.0
                  AS jacc_r
         FROM inter
         JOIN sz sa ON sa.doc_id = a
         JOIN sz sb ON sb.doc_id = b
         WHERE i / (sa.n + sb.n - i) >= 0.6
           AND sa.n * 3 <= sb.n * 5 AND sb.n * 3 <= sa.n * 5
         ORDER BY a, b""",
    "q_dedup_simhash" ->
      """WITH tokc AS (
           SELECT doc_id, tok, count(*) AS cnt
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents) t
           GROUP BY doc_id, tok),
         tb AS (SELECT DISTINCT tok, md5(tok) AS h FROM tokc),
         bits AS (
           SELECT tok, j,
                  CASE WHEN (((strpos('0123456789abcdef',
                               substring(h, j // 4 + 1, 1)) - 1)
                              >> (j % 4)) % 2) = 1
                       THEN 1 ELSE -1 END AS sgn
           FROM tb, UNNEST(generate_series(0, 63)) AS u(j)),
         sums AS (
           SELECT doc_id, j, sum(cnt * sgn) AS s
           FROM tokc JOIN bits USING (tok)
           GROUP BY doc_id, j)
         SELECT doc_id,
                string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                           ORDER BY j) AS simhash
         FROM sums GROUP BY doc_id ORDER BY doc_id""")
}
