package graft

import org.apache.spark.sql.functions._

/** Sanity invariants for the StatsOps pack (cross-engine value parity is
  * the oracle's job; these pin the mathematical properties). */
class StatsSpec extends SparkSpec {

  test("welch t-test emits one finite row per segment with positive dof") {
    val rows = operators.StatsOps.queries("q_stats_ttest")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(!r.getDouble(r.fieldIndex("t_welch")).isNaN)
      assert(r.getDouble(r.fieldIndex("df_welch")) > 0)
      assert(r.getLong(r.fieldIndex("n_f")) > 0)
    }
  }

  test("chi-square covers the full segment x priority grid") {
    val r = operators.StatsOps.queries("q_stats_chisq")(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_cells")) == 25)
    assert(r.getLong(r.fieldIndex("dof")) == 16)
    assert(r.getDouble(r.fieldIndex("chi2")) >= 0.0)
  }

  test("entropy is bounded by ln(n_types) and zero for single-type users") {
    val df = operators.StatsOps.queries("q_stats_entropy")(spark, sfDir)
    val bad = df.filter(col("entropy") < -1e-9 ||
      col("entropy") > log(col("n_types").cast("double")) + 1e-6)
    assert(bad.count() == 0)
    // a user with one event type must have exactly zero entropy
    val single = df.filter(col("n_types") === 1)
    if (single.count() > 0)
      assert(single.filter(abs(col("entropy")) > 1e-9).count() == 0)
  }

  test("mad is nonnegative and outliers are a strict minority per type") {
    val rows = operators.StatsOps.queries("q_stats_mad")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("mad")) >= 0.0)
      assert(r.getLong(r.fieldIndex("n_outliers")) * 2 <
        r.getLong(r.fieldIndex("n")))
    }
  }
}
