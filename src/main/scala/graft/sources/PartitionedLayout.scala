package graft.sources

import java.util.concurrent.ConcurrentHashMap
import graft.Tables
import org.apache.spark.sql.SparkSession

/** Session-lifetime materializer for the partitioned physical layouts
  * PartitionedWriter defines, so query keys can exercise REAL partition
  * pruning (a scan with `PartitionFilters`) instead of simulating file
  * stats. The layout is written once per (JVM, data dir) under the temp
  * dir — the 100 TB analog is the one-time ETL that lays a fact table
  * out by date; every subsequent time-sliced query prunes to the
  * matching directories. */
object PartitionedLayout {
  private val built = new ConcurrentHashMap[String, String]()

  /** Day-partitioned events layout for `dir`'s events table; returns the
    * layout path, writing it on first use. */
  def eventsByDay(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_events_by_day_" +
          Integer.toHexString(dir.hashCode & 0x7fffffff)).toString
      PartitionedWriter.writeEventsByDay(
        Tables.events(spark, dir).drop("ts_ns"), path)
      path
    })
}
