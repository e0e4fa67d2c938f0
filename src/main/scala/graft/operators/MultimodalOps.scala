package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star): treat image/audio/video
  * payloads as opaque BINARY columns with typed metadata.
  *
  * No binary testdata ships with the image, so the oracle-checked query
  * materializes a binary column from documents.text (utf-8 bytes — the
  * bytes, lengths, and hashes are identical in both engines) and derives
  * deterministic "decoded" metadata from it. The actual decode/featurize
  * plumbing (schema, partitioning, batch shape, pluggable codec) lives in
  * graft.multimodal.Multimodal with a deterministic fake decoder —
  * real codecs drop in behind the same trait.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Binary ingestion + metadata extraction: cast text → BINARY, derive
    * byte length, fake-decoded dimensions, and a content signature. All
    * byte-level, so DuckDB's encode() view of the same parquet matches. */
  private val multimodalFeatures: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("asset", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("asset")).as("n_bytes"),
        (length(col("asset")) % 64 + 16).as("width"),
        (length(col("asset")) % 48 + 12).as("height"),
        // channels matches Multimodal.FakeDecoder (single-channel fake);
        // width/height formulas mirror FakeDecoder.decode — keep in sync
        lit(1).as("channels"),
        md5(col("text")).as("sig"))
      .orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> multimodalFeatures)

  val oracle: Map[String, String] = Map(
    "q_multimodal_features" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                CAST(octet_length(encode(text)) % 64 + 16 AS INTEGER)
                  AS width,
                CAST(octet_length(encode(text)) % 48 + 12 AS INTEGER)
                  AS height,
                1 AS channels,
                md5(text) AS sig
         FROM documents ORDER BY doc_id""")
}
