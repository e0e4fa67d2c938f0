package graft

import org.apache.spark.sql.functions._

/** Invariants for the second TPC-H batch (Q6/Q8/Q13/Q14/Q15/Q17). */
class TpchMoreSpec extends SparkSpec {

  test("tpch q6 equals the hint-free recomputation") {
    val got = operators.RelationalOps.queries("q_tpch_q6")(spark, sfDir)
      .collect()(0).getDouble(0)
    val free = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp_ntz(lit("1997-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")))
      .collect()(0).getDouble(0)
    assert(math.abs(got - free) < 0.01)
  }

  test("tpch q8: market share is a true share in [0, 100]") {
    val rows = operators.RelationalOps.queries("q_tpch_q8")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(r.fieldIndex("mkt_share"))
      assert(share >= 0.0 && share <= 100.0)
    }
    assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(1996L, 1997L)))
  }

  test("tpch q13: histogram accounts for every customer incl. zero-order") {
    val df = operators.RelationalOps.queries("q_tpch_q13")(spark, sfDir)
    val totalCust = df.agg(sum(col("custdist"))).collect()(0).getLong(0)
    assert(totalCust == Tables.customer(spark, sfDir).count())
  }

  test("tpch q14: promo share matches the two-aggregate recomputation") {
    val got = operators.RelationalOps.queries("q_tpch_q14")(spark, sfDir)
      .collect()(0).getDouble(0)
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= to_timestamp_ntz(lit("1996-09-01")) &&
        col("l_shipdate") < to_timestamp_ntz(lit("1996-10-01")))
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .withColumn("v", col("l_extendedprice") * (lit(1) - col("l_discount")))
    val promo = li.filter(col("p_type") === "PROMO")
      .agg(sum(col("v"))).collect()(0).getDouble(0)
    val all = li.agg(sum(col("v"))).collect()(0).getDouble(0)
    assert(math.abs(got - 100.0 * promo / all) < 1e-4)
  }

  test("tpch q15: emitted supplier(s) hold the max quarter revenue") {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp_ntz(lit("1996-04-01")))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("r"))
    val mx = rev.agg(max(col("r"))).collect()(0).getDouble(0)
    val rows = operators.RelationalOps.queries("q_tpch_q15")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(r.fieldIndex("total_rev")) - mx) < 0.01)
    }
  }

  test("tpch q17: every counted line is below its part's 20% cap") {
    val row = operators.RelationalOps.queries("q_tpch_q17")(spark, sfDir)
      .collect()(0)
    val nSmall = row.getLong(row.fieldIndex("n_small"))
    val li = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
    val cap = li.groupBy("p_partkey").agg((avg(col("l_quantity")) * 0.2)
      .as("qcap"))
    val recount = li.join(cap, "p_partkey")
      .filter(col("l_quantity") < col("qcap")).count()
    // r6 rounding of the cap can move a boundary line either way; at
    // sf0.001 quantities are integers so the counts must agree exactly
    assert(nSmall == recount)
  }
}
