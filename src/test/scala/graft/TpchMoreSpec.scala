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

  test("tpch q19: disjunctive bands match the union-of-filters count") {
    val r = operators.RelationalOps.queries("q_tpch_q19")(spark, sfDir)
      .collect()(0)
    val li = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
    val n = Seq(("Brand#12", 1, 11), ("Brand#23", 10, 20),
      ("Brand#34", 20, 30)).map { case (b, lo, hi) =>
      li.filter(col("p_brand") === b &&
        col("l_quantity") >= lo && col("l_quantity") <= hi).count()
    }.sum
    assert(r.getLong(r.fieldIndex("n_lines")) == n)
  }

  test("tpch q22: every counted customer is above average with no 2001 order") {
    val rows = operators.RelationalOps.queries("q_tpch_q22")(spark, sfDir)
      .collect()
    val ab = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).collect()(0).getDouble(0)
    val recount = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > ab)
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >= to_timestamp_ntz(lit("2001-01-01"))),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getLong(1)).sum == recount)
  }

  test("cohort ltv: curves are monotone nondecreasing per cohort") {
    val rows = operators.EventOps.queries("q_events_cohort_ltv")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val curve = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      curve.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9)
        case _ =>
      }
    }
  }

  test("bootstrap: replicate means cluster around the plain mean") {
    val rows = operators.StatsOps.queries("q_stats_bootstrap")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val plain = Tables.orders(spark, sfDir)
      .agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    val n = Tables.orders(spark, sfDir).count()
    rows.foreach { r =>
      // n_eff concentrates at n·E[k] where E[k] = 257/256 for the
      // floor(CDF·256) thresholds; replicate means deviate by
      // O(sd/sqrt(n))
      assert(math.abs(r.getLong(1).toDouble / n - 257.0 / 256) < 0.05)
      assert(math.abs(r.getDouble(2) - plain) / plain < 0.05)
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
