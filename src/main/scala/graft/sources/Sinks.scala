package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Serving-side sinks (SURVEY.md §2.1, §3.5: the reference writes to a
  * search index and a relational store).
  *
  * Neither service is reachable offline, so each sink is split into the
  * testable part (document/batch formatting, partition-parallel delivery
  * loop, idempotent batch ids) and a transport trait a real client
  * implements. The bulk-index *format* — one action line + one document
  * line per row, the standard bulk-indexing wire shape — is produced with
  * codegen'd column ops and can be written to any filesystem for
  * inspection or replay.
  */
object Sinks {

  /** Transport boundary for a bulk index write. */
  trait IndexWriter extends Serializable {
    /** Deliver one bulk payload (many action+doc lines); must be
      * idempotent per (batchId, partitionId). */
    def writeBulk(batchId: Long, partitionId: Int, lines: Iterator[String]): Unit
  }

  /** Offline IndexWriter: drops bulk payloads as text files for replay. */
  class FileIndexWriter(dir: String) extends IndexWriter {
    def writeBulk(batchId: Long, partitionId: Int,
        lines: Iterator[String]): Unit = {
      val p = java.nio.file.Paths.get(dir, s"bulk-$batchId-$partitionId.jsonl")
      java.nio.file.Files.createDirectories(p.getParent)
      val w = java.nio.file.Files.newBufferedWriter(p)
      try lines.foreach { l => w.write(l); w.newLine() }
      finally w.close()
    }
  }

  /** Render rows to bulk-index lines: {"index":{"_index":…,"_id":…}}\n{doc}.
    * to_json is codegen'd; the id column keeps retries idempotent. */
  def toBulkLines(df: DataFrame, index: String, idCol: String): DataFrame =
    df.select(concat(
      lit(s"""{"index":{"_index":"$index","_id":""""),
      col(idCol).cast("string"), lit("\"}}\n"),
      to_json(struct(df.columns.map(col): _*))).as("bulk"))

  /** Batch (or foreachBatch) delivery: format + partition-parallel
    * transport. The only driver-side work is the final commit signal. */
  def writeToIndex(df: DataFrame, index: String, idCol: String,
      writer: IndexWriter, batchId: Long = 0L): Unit =
    toBulkLines(df, index, idCol).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        writer.writeBulk(batchId, pid, it.map(_.getString(0)))
        Iterator.single(1)
      }
      .count(): Unit

  /** Relational-store boundary; a JDBC client implements `writeRows`.
    * (df.write.jdbc is the production path — no database is reachable
    * offline, so the interface keeps the contract testable.) */
  trait TableWriter extends Serializable {
    def writeRows(table: String, partitionId: Int, rows: Iterator[Row]): Unit
  }

  /** Offline TableWriter: CSV-ish lines per partition, for inspection. */
  class FileTableWriter(dir: String) extends TableWriter {
    def writeRows(table: String, partitionId: Int,
        rows: Iterator[Row]): Unit = {
      val p = java.nio.file.Paths.get(dir, s"$table-$partitionId.csv")
      java.nio.file.Files.createDirectories(p.getParent)
      val w = java.nio.file.Files.newBufferedWriter(p)
      try rows.foreach { r => w.write(r.mkString(",")); w.newLine() }
      finally w.close()
    }
  }

  def writeToTable(df: DataFrame, table: String, writer: TableWriter): Unit =
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      writer.writeRows(table, pid, it)
      Iterator.single(1)
    }.count(): Unit

  /** Production JDBC write options — the testable half of the production
    * path (option assembly is pure; the actual network write is one
    * builder call below). batchsize/isolation defaults follow the
    * standard Spark JDBC sink tuning for bulk ETL loads. */
  def jdbcOptions(url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      driver: Option[String] = None): Map[String, String] =
    Map(
      "url" -> url,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolationLevel,
      "truncate" -> "true") ++
      user.map("user" -> _) ++ password.map("password" -> _) ++
      driver.map("driver" -> _)

  /** The production write: df.write.format("jdbc") with the assembled
    * options — partition-parallel inserts, batched statements, executor-
    * side connections (no driver funnel). Unreachable offline, hence
    * split from the option assembly it is one line of. */
  def writeJdbc(df: DataFrame, options: Map[String, String],
      mode: String = "append"): Unit =
    df.write.format("jdbc").options(options).mode(mode).save()

  /** Config-gated dispatch: a `url` in conf selects the real JDBC path;
    * otherwise rows go through the offline TableWriter boundary. This is
    * the one switch a deployment flips to go from replayable files to a
    * live relational store.
    *
    * `batchTag` (streaming foreachBatch callers): the JDBC branch appends
    * into ONE table regardless (dedup/upsert keys are the production
    * idempotence story), but the offline file writer truncates per
    * (table, partition) — without a per-batch tag a later empty
    * micro-batch (watermark advance) would overwrite an earlier batch's
    * rows. Same (batchId, partition) uniqueness idea as writeToIndex. */
  def writeRelational(df: DataFrame, table: String,
      conf: Map[String, String], fallback: TableWriter,
      batchTag: Option[Long] = None): Unit =
    conf.get("url") match {
      case Some(url) =>
        writeJdbc(df, jdbcOptions(url, table,
          conf.get("user"), conf.get("password"),
          conf.get("batchsize").map(_.toInt).getOrElse(10000),
          conf.getOrElse("isolationLevel", "READ_COMMITTED"),
          conf.get("driver")),
          conf.getOrElse("mode", "append"))
      case None =>
        writeToTable(df,
          table + batchTag.map(b => s"-b$b").getOrElse(""), fallback)
    }
}
