package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout writers for the 100 TB design point: at scale, tables
  * are laid out so that the dominant access patterns prune (partitioning)
  * or skip shuffles (bucketing) — the layout IS the index.
  *
  * - Events: hive-style partition by event date → time-range queries
  *   touch only matching directories (partition pruning shows up as
  *   `PartitionFilters` in the scan node).
  * - Facts co-bucketed on their join key → the lineitem⋈orders class of
  *   join needs no exchange at read time (bucketed tables require the
  *   table catalog, i.e. saveAsTable).
  */
object PartitionedWriter {

  /** Write events partitioned by event date (derived column). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  /** Read back with a date predicate — prunes to matching partitions. */
  def readEventsDay(spark: org.apache.spark.sql.SparkSession, path: String,
      day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day))

  /** Bucket two tables on their shared join key so subsequent sort-merge
    * joins between them are exchange-free. Catalog-backed (saveAsTable). */
  def writeCoBucketed(left: DataFrame, leftName: String, leftKey: String,
      right: DataFrame, rightName: String, rightKey: String,
      buckets: Int): Unit = {
    left.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, leftKey).sortBy(leftKey)
      .saveAsTable(leftName)
    right.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, rightKey).sortBy(rightKey)
      .saveAsTable(rightName)
  }
}
