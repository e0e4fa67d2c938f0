package graft

import org.apache.spark.sql.functions._

/** The plain-SQL surface: graft.Sql registers every table as a view
  * (events with the unit-robust ts/ts_ns contract) plus the graft_*
  * functions, so the engine drives with spark.sql(...) alone. */
class SqlSpec extends SparkSpec {

  test("sql views reproduce the flagship DataFrame result exactly") {
    Sql.register(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""").collect()
    val viaDf = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <=
        lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("events view carries the ts/ts_ns contract for SQL users") {
    Sql.register(spark, sfDir)
    val r = spark.sql(
      """SELECT min(ts) AS lo, max(ts) AS hi,
                sum(CAST(ts_ns = unix_micros(CAST(ts AS TIMESTAMP)) * 1000
                    AS INT)) AS n_exact,
                count(*) AS n
         FROM events""").collect().head
    assert(r.getAs[java.time.LocalDateTime]("lo").getYear == 2024)
    assert(r.getAs[java.time.LocalDateTime]("hi").getYear == 2024)
    // ts_ns is µs-exact (ns-sourced data keeps sub-µs digits, µs-sourced
    // is exactly ×1000 — either way floor-consistent with ts)
    assert(r.getAs[Long]("n") > 0)
  }

  test("graft codegen functions are callable from SQL") {
    Sql.register(spark, sfDir)
    val r = spark.sql(
      """SELECT vec_id,
                graft_dot(embedding, embedding) AS norm2
         FROM embeddings ORDER BY vec_id LIMIT 5""").collect()
    assert(r.length == 5)
    r.foreach(x => assert(math.abs(x.getDouble(1) - 1.0) < 1e-3,
      "unit-norm corpus: self-dot ~ 1"))
  }

  test("a registry query is expressible verbatim through the SQL facade") {
    // the same ANSI SQL the DuckDB oracle runs works on the Spark views
    val viaSql = Sql.sql(spark, sfDir, SparkEntry.oracleSql("q_set_union")
      .replaceAll("(?s)\\s+", " "))
    val viaDf = SparkEntry.queries("q_set_union")(spark, sfDir)
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }
}
