package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plain-SQL entry point — the "switch without rewriting" surface: one
  * call registers every testdata table as a temp view (with the events
  * `ts`/`ts_ns` contract applied, so the timestamp-unit sniffing is
  * invisible to SQL users), the graft_* codegen functions, and the
  * TopKPerGroup strategy; from there the whole engine drives with
  * `spark.sql(...)` alone. Views are lazy plans over the declared-schema
  * parquet reads, so SQL queries get the same pushdown/pruning as the
  * DataFrame API — nothing is materialized by registration. */
object Sql {

  /** Every relation the engine serves, in FK order. */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  /** Register all views + extensions for `sfDir`; returns the session
    * for chaining. Safe to call repeatedly (views are replaced). */
  def register(spark: SparkSession, sfDir: String): SparkSession = {
    Tables.configure(spark)
    tableNames.foreach { n =>
      Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    // events goes through Tables.events so SQL sees the unit-robust
    // two-column time contract (ts TIMESTAMP_NTZ µs + ts_ns BIGINT)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    spark
  }

  /** Convenience: register and run one statement. */
  def sql(spark: SparkSession, sfDir: String, statement: String): DataFrame =
    register(spark, sfDir).sql(statement)
}
