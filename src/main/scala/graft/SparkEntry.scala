package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §3
  * (lifecycle). Query keys are stable; each pack object contributes its
  * `queries` (Spark plans) and `oracle` (DuckDB 1.0.0 SQL) maps. */
object SparkEntry {

  private def packs = Seq(
    operators.RelationalOps.queries -> operators.RelationalOps.oracle,
    operators.ScalarOps.queries -> operators.ScalarOps.oracle,
    operators.EventOps.queries -> operators.EventOps.oracle,
    operators.TextOps.queries -> operators.TextOps.oracle,
    operators.VectorOps.queries -> operators.VectorOps.oracle,
    operators.FunctionOps.queries -> operators.FunctionOps.oracle,
    operators.DedupOps.queries -> operators.DedupOps.oracle,
    operators.GraphOps.queries -> operators.GraphOps.oracle,
    operators.StatsOps.queries -> operators.StatsOps.oracle,
    operators.MultimodalOps.queries -> operators.MultimodalOps.oracle)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
