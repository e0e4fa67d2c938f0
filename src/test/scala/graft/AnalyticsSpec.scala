package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-3 analytics additions (skyline, link
  * prediction, session quality rollup). */
class AnalyticsSpec extends SparkSpec {

  test("skyline equals the brute-force dominance anti-join") {
    val sky = operators.RelationalOps.queries("q_skyline")(spark, sfDir)
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val brute = p.as("p").join(p.as("q"),
      col("q.p_retailprice") <= col("p.p_retailprice") &&
        col("q.p_size") >= col("p.p_size") &&
        (col("q.p_retailprice") < col("p.p_retailprice") ||
          col("q.p_size") > col("p.p_size")), "left_anti")
    assert(sky.count() == brute.count())
    assert(sky.join(brute, Seq("p_partkey"), "left_anti").count() == 0)
  }

  test("link jaccard scores are in (0,1] and pairs are non-adjacent") {
    val df = operators.GraphOps.queries("q_graph_link_jaccard")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(r.fieldIndex("jacc"))
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(r.fieldIndex("cn")) >= 1)
    }
  }

  test("tpch q18: every emitted order really exceeds the quantity bar") {
    val df = operators.RelationalOps.queries("q_tpch_q18")(spark, sfDir)
    assert(df.count() > 0)
    assert(df.filter(col("total_qty") <= 250).count() == 0)
  }

  test("abc analysis: cumulative share is monotone and classes ordered") {
    val rows = operators.RelationalOps.queries("q_abc_analysis")(
      spark, sfDir).collect()
    val shares = rows.map(r => r.getDouble(r.fieldIndex("cum_share")))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-9 })
    val classes = rows.map(_.getString(rows.head.fieldIndex("abc_class")))
    assert(classes.mkString.matches("A*B*C*"), "classes interleaved")
  }

  test("rfm quintiles are 1..5 and roughly balanced") {
    val df = operators.RelationalOps.queries("q_customer_rfm")(spark, sfDir)
    val n = df.count()
    Seq("r_q", "f_q", "m_q").foreach { c =>
      val counts = df.groupBy(c).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(counts.keySet == Set(1, 2, 3, 4, 5), s"$c buckets: $counts")
      counts.values.foreach(v => assert(math.abs(v - n / 5.0) <= 1))
    }
  }

  test("attribution credits both channels with nonnegative revenue") {
    val rows = operators.EventOps.queries("q_events_attribution")(
      spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("click", "view"))
    rows.foreach(r =>
      assert(r.getDouble(r.fieldIndex("credited")) >= 0.0))
  }

  test("regression r2 is a valid fraction for every flag") {
    val rows = operators.StatsOps.queries("q_stats_regression")(
      spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val r2v = r.getDouble(r.fieldIndex("r2"))
      assert(r2v >= 0.0 && r2v <= 1.0)
    }
  }

  test("pca top-1 loading is unit-norm after rounding") {
    val v = operators.VectorOps.queries("q_embed_pca_top1")(spark, sfDir)
      .collect().map(r => r.getDouble(r.fieldIndex("loading")))
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"norm was $norm")
  }

  test("lsh recall is a valid fraction and hits never exceed either side") {
    val r = operators.VectorOps.queries("q_eval_lsh_recall")(spark, sfDir)
      .collect().head
    val (ne, nl, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh <= ne && nh <= nl)
    val rec = r.getDouble(r.fieldIndex("recall"))
    assert(rec >= 0.0 && rec <= 1.0)
  }

  test("graph components agree with a brute-force reachability check") {
    val comp = operators.GraphOps.queries("q_graph_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same-component nodes sharing an edge must share a label; a label
    // must be a member of its own component
    comp.foreach { case (_, rep) => assert(comp(rep) == rep) }
  }

  test("rolling uniques: 7d window is never smaller than the 1d count") {
    val df = operators.EventOps.queries("q_events_rolling_uniques")(
      spark, sfDir)
    assert(df.filter(col("uniques_7d") < col("uniques_1d")).count() == 0)
  }

  test("funnel time: percentiles are ordered and conversions exist") {
    val r = operators.EventOps.queries("q_events_funnel_time")(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_converted")) > 0)
    assert(r.getDouble(r.fieldIndex("p50_s")) <=
      r.getDouble(r.fieldIndex("p90_s")))
  }

  test("yoy growth: first year null, later years finite") {
    val rows = operators.RelationalOps.queries("q_yoy_growth")(spark, sfDir)
      .collect()
    assert(rows.length >= 5)
    assert(rows.head.isNullAt(rows.head.fieldIndex("yoy")))
    rows.tail.foreach(r =>
      assert(!r.isNullAt(r.fieldIndex("yoy"))))
  }

  test("relational division: qualifying customers truly cover all regions") {
    val div = operators.RelationalOps.queries("q_relational_division")(
      spark, sfDir)
    val n = div.count()
    assert(n > 0)
    // a customer in the answer must have >= 5 distinct supplier regions
    val cr = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .groupBy("o_custkey")
      .agg(countDistinct(col("n_regionkey")).as("k"))
    assert(div.join(cr, Seq("o_custkey")).filter(col("k") =!= 5)
      .count() == 0)
  }

  test("bursts: intervals are disjoint and peaks exceed the mean rate") {
    val rows = operators.EventOps.queries("q_events_bursts")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ends = rows.map(r => (r.getLong(0), r.getLong(1)))
    ends.zip(ends.tail).foreach { case ((_, e1), (s2, _)) =>
      assert(s2 > e1 + 1, "adjacent flagged hours must have merged")
    }
  }

  test("prop test: counts consistent and z finite on this corpus") {
    val r = operators.StatsOps.queries("q_stats_prop_test")(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("ca")) <= r.getLong(r.fieldIndex("na")))
    assert(r.getLong(r.fieldIndex("cb")) <= r.getLong(r.fieldIndex("nb")))
    assert(!r.isNullAt(r.fieldIndex("z")))
  }

  test("cluster sizes: every cluster has >= 2 members and totals agree") {
    val hist = operators.DedupOps.queries("q_dedup_cluster_sizes")(
      spark, sfDir).collect()
    assert(hist.nonEmpty)
    hist.foreach(r => assert(r.getLong(r.fieldIndex("size")) >= 2))
    val docsInClusters = hist.map(r =>
      r.getLong(0) * r.getLong(r.fieldIndex("n_clusters"))).sum
    val labeled = operators.DedupOps.queries("q_dedup_clusters")(
      spark, sfDir).count()
    assert(docsInClusters == labeled)
  }

  test("degree distribution mass equals the node count") {
    val hist = operators.GraphOps.queries("q_graph_degree_dist")(
      spark, sfDir).collect()
    val nodes = hist.map(r => r.getLong(r.fieldIndex("n_nodes"))).sum
    val comp = operators.GraphOps.queries("q_graph_components")(
      spark, sfDir).count()
    assert(nodes == comp, s"degree mass $nodes vs component nodes $comp")
  }

  test("gini is a valid inequality coefficient") {
    val r = operators.StatsOps.queries("q_stats_gini")(spark, sfDir)
      .collect().head
    val g = r.getDouble(r.fieldIndex("gini"))
    assert(g >= 0.0 && g < 1.0, s"gini $g")
  }

  test("churn: churned never exceed early buyers, rate in [0,1]") {
    val r = operators.EventOps.queries("q_events_churn")(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_churned")) <=
      r.getLong(r.fieldIndex("n_early_buyers")))
    val rate = r.getDouble(r.fieldIndex("churn_rate"))
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("rolling median: window never wider than 7 days, medians positive") {
    val df = operators.EventOps.queries("q_win_rolling_median")(
      spark, sfDir)
    assert(df.filter(col("n_days") > 7).count() == 0)
    assert(df.filter(col("med7") <= 0).count() == 0)
  }

  test("session stats: bounces never exceed sessions, durations nonneg") {
    val df = operators.EventOps.queries("q_events_session_stats")(spark, sfDir)
    assert(df.filter(col("n_bounce") > col("n_sessions") ||
      col("bounce_rate") < 0 || col("bounce_rate") > 1 ||
      col("avg_dur_s") < 0).count() == 0)
    assert(df.count() >= 25) // one month of events → ~30 day rows
  }

  test("equi-depth: counts within 1, boundaries strictly ordered") {
    val rows = operators.RelationalOps
      .queries("q_agg_equi_depth")(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 8))
    val counts = rows.map(_.getAs[Long]("n_rows"))
    assert(counts.max - counts.min <= 1, s"unbalanced: ${counts.toSeq}")
    assert(counts.sum == Tables.orders(spark, sfDir).count())
    rows.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
        "bucket boundaries must not interleave on distinct-heavy data")
    }
  }

  test("temporal join: every purchase lands in exactly one bucket") {
    val rows = operators.EventOps
      .queries("q_join_temporal")(spark, sfDir).collect()
    val totalPurchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    // a purchase matches AT MOST one [from, to) interval per user by
    // construction; the LEFT join + __NONE__ row makes it exactly one
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == totalPurchases)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_value") >= 0.0)
      assert(r.getString(0) == "__NONE__" || r.getString(0) != "purchase",
        "dimension statuses exclude the fact event type")
    }
  }
}
