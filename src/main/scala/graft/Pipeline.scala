package graft

import graft.sources.{Sinks, SourceFactory}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference architecture end to end (SURVEY.md §3.5): message-bus
  * ingest → Spark transforms → search-index + relational serving.
  *
  * Batch mode builds the suggestion index from the documents corpus;
  * streaming mode runs the event pipeline with foreachBatch delivery so
  * one sink implementation serves both. Everything upstream of the sink is
  * the operator library — the pipeline is wiring, not logic.
  */
object Pipeline {

  /** Suggestion-index build: token frequencies + per-prefix ranking,
    * formatted as bulk-index documents. Pure batch; the DataFrame it
    * returns is what gets delivered to the index. */
  def suggestionIndex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("prefix", substring(col("token"), 1, 1))
      .select(col("token"), col("cnt"), col("prefix"))

  /** Deliver the suggestion index through an IndexWriter. */
  def publishSuggestions(spark: SparkSession, sfDir: String,
      writer: Sinks.IndexWriter): Unit =
    Sinks.writeToIndex(suggestionIndex(spark, sfDir), "suggestions",
      "token", writer)

  /** Training-corpus curation end to end: the q_pipeline_curate operator
    * (quality gate ∧ exact-dedup keeper ∧ near-dup cluster representative
    * ∧ deterministic hash sample) as a reusable API entry point.
    *
    * Staleness: the dedup stages read session-lifetime caches keyed by
    * (session, sfDir) — if the parquet under sfDir is rewritten mid-
    * session, call [[Caches.invalidate]] first or this serves the
    * previously cached snapshot (see graft.Caches for the contract). */
  def curateCorpus(spark: SparkSession, sfDir: String): DataFrame =
    operators.DedupOps.queries("q_pipeline_curate")(spark, sfDir)

  /** Deliver the curated corpus to the relational-store boundary —
    * df.write.jdbc when conf carries a url, replayable files offline
    * (Sinks.writeRelational). */
  def publishCurated(spark: SparkSession, sfDir: String,
      conf: Map[String, String], fallback: Sinks.TableWriter): Unit =
    Sinks.writeRelational(curateCorpus(spark, sfDir), "curated_docs",
      conf, fallback)

  /** Streaming corpus-curation pipeline: document stream → the shared
    * quality gate + within-watermark content dedup
    * (streaming.StreamingOps.curateStream) → foreachBatch into the
    * relational boundary. The online admission-control counterpart of
    * [[curateCorpus]]: what this admits is exactly what the batch gate
    * would keep (one shared score definition), so backfill and live
    * ingest agree. Same checkpoint/idempotence contract as
    * [[eventPipeline]]. */
  def curationPipeline(spark: SparkSession, docs: DataFrame,
      conf: Map[String, String], fallback: Sinks.TableWriter,
      checkpointDir: String): StreamingQuery =
    streaming.StreamingOps.curateStream(docs)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sinks.writeRelational(batch, "admitted_docs", conf, fallback,
          batchTag = Some(batchId))
      }
      .start()

  /** Live suggestion-index pipeline: document stream → running
    * per-(prefix, token) counts (streaming.StreamingOps.suggestStream,
    * complete mode — the state IS the |vocab|-bounded index) →
    * foreachBatch ranks top-`k` per prefix over the full counts and
    * upserts `(prefix, rank)`-keyed suggestion docs. The streaming twin
    * of [[suggestionIndex]]/[[publishSuggestions]]: what a user sees
    * after the stream has absorbed a corpus equals the batch build over
    * that corpus (proven by PipelineSpec), which is the
    * backfill-vs-live agreement the curation pipeline also pins. */
  def suggestionPipeline(spark: SparkSession, docs: DataFrame,
      writer: Sinks.IndexWriter, checkpointDir: String,
      k: Int = 3): StreamingQuery =
    streaming.StreamingOps.suggestStream(docs)
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("prefix")
          .orderBy(col("cnt").desc, col("token"))
        val top = batch
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .withColumn("sug_id",
            concat_ws("|", col("prefix"), col("rank").cast("string")))
        Sinks.writeToIndex(top, "suggestions_live", "sug_id", writer,
          batchId)
      }
      .start()

  /** Streaming event pipeline: source → hourly aggregates → foreachBatch
    * into the index writer. Checkpointing + idempotent (batchId,
    * partition) writes give end-to-end exactly-once to an idempotent
    * sink. */
  def eventPipeline(spark: SparkSession, source: SourceFactory,
      writer: Sinks.IndexWriter, checkpointDir: String): StreamingQuery = {
    val aggregated = streaming.StreamingOps.tumbling(source.stream(spark))
      .withColumn("agg_id",
        concat_ws("|", col("h").cast("string"), col("event_type")))
    aggregated.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sinks.writeToIndex(batch, "event_aggs", "agg_id", writer, batchId)
      }
      .start()
  }
}
