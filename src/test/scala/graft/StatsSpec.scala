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

  test("benford: nine digits, shares sum to 1, expected masses exact") {
    val rows = operators.StatsOps.queries("q_stats_benford")(spark, sfDir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val shareSum = rows.map(r => r.getDouble(r.fieldIndex("share"))).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    val b1 = rows.head.getDouble(rows.head.fieldIndex("benford"))
    assert(math.abs(b1 - math.log10(2.0)) < 1e-6)
  }

  test("seasonality covers the full grid with shares summing to 1") {
    val df = operators.EventOps.queries("q_events_seasonality")(spark, sfDir)
    // sf0.001 leaves a cell or two empty; the grid is capped at 7×24
    val n = df.count()
    assert(n >= 160 && n <= 168, s"grid had $n cells")
    val s = df.agg(sum(col("share"))).collect().head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-3)
  }

  test("order gaps: percentiles ordered, mean positive") {
    val r = operators.EventOps.queries("q_orders_gap")(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_gaps")) > 0)
    assert(r.getDouble(r.fieldIndex("p50_days")) <=
      r.getDouble(r.fieldIndex("p90_days")))
    assert(r.getDouble(r.fieldIndex("mean_days")) > 0)
  }

  test("embed drift: split halves populated, cosine a valid similarity") {
    val rows = operators.VectorOps.queries("q_embed_drift")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_a")) > 0)
      assert(r.getLong(r.fieldIndex("n_b")) > 0)
      val c = r.getDouble(r.fieldIndex("cos_ab"))
      // this corpus's labels are isotropic (centroids ≈ 0), so the
      // alignment is noise around 0 — the monitor must still emit a
      // bounded similarity, and clustered labels would push it → 1
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"label ${r.get(0)} cos $c")
    }
  }

  test("ks statistic is a valid fraction with a valid p-value") {
    val r = operators.StatsOps.queries("q_stats_ks")(spark, sfDir)
      .collect().head
    val d = r.getDouble(r.fieldIndex("ks_d"))
    val p = r.getDouble(r.fieldIndex("p_approx"))
    assert(d >= 0.0 && d <= 1.0)
    assert(p >= 0.0 && p <= 2.0) // asymptotic form can slightly exceed 1
  }

  test("minhash recall audit: hits bounded by both sides, recall sane") {
    val r = operators.DedupOps.queries("q_eval_minhash_recall")(
      spark, sfDir).collect().head
    val (ne, nl, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh <= ne && nh <= nl)
    val rec = r.getDouble(r.fieldIndex("recall"))
    assert(rec >= 0.0 && rec <= 1.0)
    // 4×4 banding at j=0.8 must catch the vast majority of true pairs
    assert(rec > 0.5, s"recall collapsed: $rec")
  }

  test("langid confusion shares sum to 1 per actual language") {
    val df = operators.TextOps.queries("q_eval_langid")(spark, sfDir)
    val sums = df.groupBy("lang").agg(sum(col("share")).as("s")).collect()
    sums.foreach(r =>
      assert(math.abs(r.getDouble(r.fieldIndex("s")) - 1.0) < 1e-3))
  }

  test("mann-whitney U matches the brute-force pair count") {
    val r = operators.StatsOps.queries("q_stats_mannwhitney")(spark, sfDir)
      .collect().head
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val p = ev.filter(_._1 == "purchase").map(_._2)
    val c = ev.filter(_._1 == "click").map(_._2)
    val uBrute = p.iterator.map(x =>
      c.count(_ < x) + 0.5 * c.count(_ == x)).sum
    assert(r.getLong(r.fieldIndex("n_purchase")) == p.length)
    assert(r.getLong(r.fieldIndex("n_click")) == c.length)
    assert(math.abs(r.getDouble(r.fieldIndex("u_stat")) - uBrute) < 1e-6)
    assert(!r.getDouble(r.fieldIndex("z_stat")).isNaN)
  }

  test("kruskal-wallis H matches the brute-force rank computation") {
    val r = operators.StatsOps.queries("q_stats_kruskal")(spark, sfDir)
      .collect().head
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    // brute-force average ranks over the pooled sample
    val sorted = ev.map(_._2).sorted
    val rankOf = ev.map(_._2).distinct.map { v =>
      val lt = sorted.count(_ < v); val eq = sorted.count(_ == v)
      v -> (lt + (eq + 1) / 2.0)
    }.toMap
    val n = ev.length.toDouble
    val byG = ev.groupBy(_._1)
    val srr = byG.toSeq.sortBy(_._1).map { case (_, xs) =>
      val rg = xs.map(x => rankOf(x._2)).sum
      rg * rg / xs.length
    }.sum
    val ties = ev.map(_._2).groupBy(identity).values
      .map(g => g.length.toLong)
      .map(t => t * t * t - t).sum
    val hBrute = (12.0 / (n * (n + 1)) * srr - 3 * (n + 1)) /
      (1.0 - ties / (n * n * n - n))
    assert(r.getLong(r.fieldIndex("n_groups")) == byG.size)
    assert(r.getLong(r.fieldIndex("n_total")) == ev.length)
    assert(math.abs(r.getDouble(r.fieldIndex("h_stat")) - hBrute) < 1e-4)
  }

  test("mann-kendall S matches the brute-force sign census") {
    val r = operators.StatsOps.queries("q_stats_mann_kendall")(spark, sfDir)
      .collect().head
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val sBrute = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong).sum
    assert(r.getLong(r.fieldIndex("n_days")) == daily.length)
    assert(r.getLong(r.fieldIndex("s_stat")) == sBrute)
    val z = r.getDouble(r.fieldIndex("z_stat"))
    val trend = r.getString(r.fieldIndex("trend"))
    assert(if (z > 1.96) trend == "increasing"
           else if (z < -1.96) trend == "decreasing"
           else trend == "no_trend")
  }

  test("spearman rho matches the brute-force rank correlation") {
    val r = operators.StatsOps.queries("q_stats_spearman")(spark, sfDir)
      .collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("value"),
        get_json_object(col("props"), "$.k").cast("int"))
      .collect().map(x => (x.getDouble(0), x.getInt(1)))
    def avgRanks[T](xs: Array[T])(implicit o: Ordering[T]): Map[T, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val lt = sorted.count(o.lt(_, v)); val eq = sorted.count(o.equiv(_, v))
        v -> (lt + (eq + 1) / 2.0)
      }.toMap
    }
    val rx = avgRanks(ev.map(_._1)); val ry = avgRanks(ev.map(_._2))
    val pairs = ev.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val rho = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(r.getLong(r.fieldIndex("n")) == ev.length)
    assert(math.abs(r.getDouble(r.fieldIndex("rho_spearman")) - rho) < 1e-4)
  }

  test("dq gate: five checks, all green on the clean corpus") {
    val rows = operators.RelationalOps.queries("q_quality_dq_gate")(
      spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("observed")) == 0L,
        s"${r.getString(0)} observed nonzero")
      assert(r.getBoolean(r.fieldIndex("passed")))
    }
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

  test("runs test: census matches a driver-side replay of the sign walk") {
    val r = operators.StatsOps.queries("q_stats_runs_test")(spark, sfDir)
      .collect().head
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy("day").collect().map(_.getLong(1))
    val signs = daily.sliding(2).collect {
      case Array(a, b) if b != a => if (b > a) 1 else -1
    }.toSeq
    val runs = if (signs.isEmpty) 0
      else 1 + signs.sliding(2).count {
        case Seq(a, b) => a != b; case _ => false }
    assert(r.getAs[Long]("n_up") === signs.count(_ == 1).toLong)
    assert(r.getAs[Long]("n_down") === signs.count(_ == -1).toLong)
    assert(r.getAs[Long]("n_runs") === runs.toLong)
    // a z that large in magnitude would mean the walk is degenerate
    assert(math.abs(r.getAs[Double]("z")) < 6.0)
    assert(r.getAs[Double]("e_runs") > 0.0)
  }

  test("cuped: theta and reduction replay from exact per-user cents") {
    val rows = operators.StatsOps.queries("q_stats_cuped")(spark, sfDir)
      .collect()
    assert(rows.length === 2)
    val minDay = Tables.events(spark, sfDir)
      .agg(min(expr("(ts_ns div 1000) div 86400000000"))).collect()
      .head.getLong(0)
    val pu = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"),
        (expr("(ts_ns div 1000) div 86400000000") < minDay + 15)
          .as("pre"))
      .collect().groupBy(_.getLong(0)).map { case (_, rs) =>
        (rs.filter(_.getBoolean(2)).map(_.getLong(1)).sum,
          rs.filterNot(_.getBoolean(2)).map(_.getLong(1)).sum)
      }.toSeq
    // users with zero purchases still count: censused via all events
    val nAll = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val zeros = nAll - pu.size
    val xs = pu.map(_._1.toDouble) ++ Seq.fill(zeros.toInt)(0.0)
    val ys = pu.map(_._2.toDouble) ++ Seq.fill(zeros.toInt)(0.0)
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val cov = xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy / n
    val vx = xs.map(a => a * a).sum - sx * sx / n
    val vy = ys.map(a => a * a).sum - sy * sy / n
    val theta = cov / vx
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-3)
      val vr = r.getAs[Double]("var_reduction")
      assert(math.abs(vr - cov * cov / (vx * vy)) < 1e-3)
      assert(vr >= 0.0 && vr <= 1.0)
      assert(r.getAs[Double]("mean_y") >= 0.0)
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum === nAll)
  }

  test("seasonal mann-kendall: per-season S replays driver-side") {
    val r = operators.StatsOps.queries("q_stats_seasonal_mk")(spark, sfDir)
      .collect().head
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val bySeason = daily.groupBy(_._1 % 7)
    val s = bySeason.values.map { pts =>
      val sorted = pts.sortBy(_._1)
      (for { i <- sorted.indices; j <- i + 1 until sorted.length }
        yield math.signum(sorted(j)._2 - sorted(i)._2)).sum
    }.sum
    assert(r.getAs[Long]("s_stat") === s)
    assert(r.getAs[Long]("n_seasons") === bySeason.size.toLong)
    assert(r.getAs[Long]("n_days") === daily.length.toLong)
    assert(Set("increasing", "decreasing", "no_trend")
      .contains(r.getAs[String]("trend")))
  }

  test("granger: closed-form OLS replays from the daily census") {
    val r = operators.StatsOps.queries("q_stats_granger")(spark, sfDir)
      .collect().head
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .agg(count(when(col("event_type") === "click", 1)).as("x"),
        count(when(col("event_type") === "purchase", 1)).as("y"))
      .orderBy("day").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val lagged = daily.sliding(2).collect {
      case Array((d1, x1, y1), (d2, _, y0)) if d2 == d1 + 1 =>
        (y1.toDouble, x1.toDouble, y0.toDouble)
    }.toSeq
    val n = lagged.size.toDouble
    assert(r.getAs[Long]("n") === lagged.size.toLong)
    def c(f: ((Double, Double, Double)) => Double,
        g: ((Double, Double, Double)) => Double) =
      lagged.map(t => f(t) * g(t)).sum -
        lagged.map(f).sum * lagged.map(g).sum / n
    val (z1, z2, yv) = ((t: (Double, Double, Double)) => t._1,
      (t: (Double, Double, Double)) => t._2,
      (t: (Double, Double, Double)) => t._3)
    val (c11, c12, c22) = (c(z1, z1), c(z1, z2), c(z2, z2))
    val (c1y, c2y, cyy) = (c(z1, yv), c(z2, yv), c(yv, yv))
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val sseF = cyy - b1 * c1y - b2 * c2y
    val sseR = cyy - c1y * c1y / c11
    val f = (sseR - sseF) / (sseF / (n - 3))
    assert(math.abs(r.getAs[Double]("b_cross") - b2) < 1e-4)
    assert(math.abs(r.getAs[Double]("f_granger") - f) < 1e-3)
    val dr2 = r.getAs[Double]("delta_r2")
    assert(dr2 >= 0.0 && dr2 < 1.0,
      "SSE can only drop when adding a regressor")
  }

  test("anova: F from a driver-side replay of the rounded group moments") {
    val r = operators.StatsOps.queries("q_stats_anova")(spark, sfDir)
      .collect().head
    val g = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg("value").as("m"),
        var_samp("value").as("v"))
      .orderBy("event_type").collect()
      .map(x => (x.getLong(1),
        math.floor(x.getDouble(2) * 1e6 + 0.5) / 1e6,
        math.floor(x.getDouble(3) * 1e6 + 0.5) / 1e6))
    val k = g.length
    val nTot = g.map(_._1).sum
    val grand = g.map(x => x._1 * x._2).sum / nTot
    val ssb = g.map(x => x._1 * (x._2 - grand) * (x._2 - grand)).sum
    val ssw = g.map(x => (x._1 - 1) * x._3).sum
    val f = (ssb / (k - 1)) / (ssw / (nTot - k))
    assert(r.getAs[Long]("k") === k.toLong)
    assert(r.getAs[Long]("n_total") === nTot)
    assert(r.getAs[Long]("df1") === (k - 1).toLong)
    assert(r.getAs[Long]("df2") === nTot - k)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-4)
    val eta = ssb / (ssb + ssw)
    assert(math.abs(r.getAs[Double]("eta_sq") - eta) < 1e-6)
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("moments: closed forms agree with a driver-side exact replay") {
    val rows = operators.StatsOps.queries("q_stats_moments")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    // replay one group end-to-end from raw cents (BigInt = exact)
    val cents = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .collect().map(r => BigInt(r.getLong(0)))
    val n = cents.length.toDouble
    val Seq(s1, s2, s3, s4) = Seq(1, 2, 3, 4).map(p =>
      cents.map(_.pow(p)).sum.toDouble)
    val m1 = s1 / n
    val m2 = s2 / n - m1 * m1
    val m3 = s3 / n - 3 * m1 * (s2 / n) + 2 * m1 * m1 * m1
    val m4 = s4 / n - 4 * m1 * (s3 / n) + 6 * m1 * m1 * (s2 / n) -
      3 * m1 * m1 * m1 * m1
    val r = rows.find(_.getString(0) == "click").get
    assert(math.abs(r.getAs[Double]("skewness") -
      m3 / (m2 * math.sqrt(m2))) < 1e-5)
    assert(math.abs(r.getAs[Double]("ex_kurtosis") -
      (m4 / (m2 * m2) - 3.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("sd_val") -
      math.sqrt(m2) / 100.0) < 1e-4)
  }

  test("tost: verdict is the conjunction of its own pinned t bounds") {
    val rows = operators.StatsOps.queries("q_stats_tost")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val lo = r.getAs[Double]("t_low"); val hi = r.getAs[Double]("t_high")
      assert(lo > hi, "lower TOST t must exceed upper (margin > 0)")
      assert(r.getAs[Boolean]("equivalent") ==
        (lo > 1.6448536269514722 && hi < -1.6448536269514722))
      assert(r.getAs[Double]("margin") > 0)
    }
  }

  test("wilson: interval brackets p_hat and tightens with the arm size") {
    val rows = operators.StatsOps.queries("q_stats_wilson_ci")(spark, sfDir)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_hat")
      val lo = r.getAs[Double]("ci_low"); val hi = r.getAs[Double]("ci_high")
      assert(lo < p && p < hi, s"interval [$lo,$hi] must bracket $p")
      assert(lo > 0.0 && hi < 1.0, "thresholded conversion is interior")
      // non-degenerate: a real interval, but not vacuously [0,1]
      // (t1 arms are ~20 users, so the width can reach ~0.55)
      assert(hi - lo > 0.0 && hi - lo < 0.9)
    }
  }

  test("capture-recapture: estimate at least the overlap, audited ratio") {
    val r = operators.StatsOps
      .queries("q_stats_capture_recapture")(spark, sfDir).collect().head
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"))
    assert(m <= math.min(n1, n2), "overlap bounded by both captures")
    val nHat = r.getAs[Double]("n_hat")
    // Chapman is >= the union lower bound minus rounding
    assert(nHat >= math.max(n1, n2) - 1.0)
    val replay = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    assert(math.abs(nHat - replay) < 0.01)
    assert(math.abs(r.getAs[Double]("est_over_true") -
      nHat / r.getAs[Long]("n_true")) < 1e-4)
  }

  test("wilcoxon: W+ bounded by the rank total; z from its own census") {
    val r = operators.StatsOps.queries("q_stats_wilcoxon")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n")
    val w = r.getAs[Double]("w_plus")
    assert(n > 0 && r.getAs[Long]("n_pos") <= n)
    assert(w >= 0.0 && w <= n * (n + 1) / 2.0,
      "W+ must lie within [0, n(n+1)/2]")
    // z replay from the emitted census
    val z = (w - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0)
    assert(math.abs(r.getAs[Double]("z_wilcoxon") - z) < 1e-4)
  }

  test("rate ratio: log-CI brackets ln(rr); significance from own bounds") {
    val rows = operators.StatsOps.queries("q_stats_rate_ratio")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr")
      val lo = r.getAs[Double]("ln_rr_low")
      val hi = r.getAs[Double]("ln_rr_high")
      assert(rr > 0.0 && lo < hi)
      assert(lo < math.log(rr) + 1e-4 && math.log(rr) < hi + 1e-4)
      assert(r.getAs[Boolean]("significant") == (lo > 0.0 || hi < 0.0))
      assert(r.getAs[Long]("ta") > 0 && r.getAs[Long]("tb") > 0)
    }
  }

  test("argmax: top/bottom users replay the exact per-user totals") {
    val rows = operators.StatsOps.queries("q_agg_argmax")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val per = Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id")
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .as("tc")).collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val et = r.getString(0)
      val g = per(et).map(x => (x.getLong(2), x.getLong(1)))
      assert(r.getAs[Long]("top_user") == g.max._2)
      assert(r.getAs[Long]("bottom_user") == g.min._2)
      assert(r.getAs[Double]("top_total") >= r.getAs[Double]("bottom_total"))
      assert(r.getAs[Long]("n_users") == g.length)
    }
  }

  test("kendall: pair classes partition n0 and tau-b is bounded") {
    val r = operators.StatsOps.queries("q_stats_kendall_tau")(spark, sfDir)
      .collect().head
    val n0 = r.getAs[Long]("n0")
    val nc = r.getAs[Long]("nc"); val nd = r.getAs[Long]("nd")
    assert(nc + nd <= n0, "concordant + discordant cannot exceed pairs")
    // n0 = days choose 2
    val days = Tables.events(spark, sfDir)
      .select(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .distinct().count()
    assert(n0 == days * (days - 1) / 2)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9)
  }

  test("cramers v: bounded effect size sharing chisq's exact chi2") {
    val v = operators.StatsOps.queries("q_stats_cramers_v")(spark, sfDir)
      .collect().head
    val chi = operators.StatsOps.queries("q_stats_chisq")(spark, sfDir)
      .collect().head
    // same census chain → the pinned chi2 must agree exactly
    assert(v.getAs[Double]("chi2") == chi.getAs[Double]("chi2"))
    assert(v.getAs[Long]("min_dim") == 4L)
    val cv = v.getAs[Double]("cramers_v")
    assert(cv >= 0.0 && cv <= 1.0)
    val replay = math.sqrt(v.getAs[Double]("chi2") /
      (v.getAs[Long]("n_obs") * v.getAs[Long]("min_dim")))
    assert(math.abs(cv - replay) < 1e-5)
  }

  test("hill: positive tail index and the threshold is the 501st price") {
    val r = operators.StatsOps.queries("q_stats_hill_tail")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_tail") == 500L)
    assert(r.getAs[Double]("h_hill") > 0.0)
    assert(math.abs(r.getAs[Double]("alpha_hill") *
      r.getAs[Double]("h_hill") - 1.0) < 1e-3)
    val thr = Tables.orders(spark, sfDir)
      .select(col("o_totalprice")).orderBy(col("o_totalprice").desc)
      .limit(501).collect().map(_.getDouble(0)).min
    assert(math.abs(r.getAs[Double]("x_threshold") - thr) < 0.01)
  }

  test("jarque-bera: JB replays from the moments key's own S/K; uniform rejects") {
    val jb = operators.StatsOps.queries("q_stats_jarque_bera")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val mo = operators.StatsOps.queries("q_stats_moments")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(jb.keySet == mo.keySet)
    jb.foreach { case (t, r) =>
      // same census, same pinned S/K — must agree exactly
      assert(r.getAs[Double]("skew_r") == mo(t).getAs[Double]("skewness"))
      assert(r.getAs[Double]("kurt_r") == mo(t).getAs[Double]("ex_kurtosis"))
      val (n, sk, ku) = (r.getAs[Long]("n"),
        r.getAs[Double]("skew_r"), r.getAs[Double]("kurt_r"))
      val replay = n / 6.0 * (sk * sk + ku * ku / 4.0)
      assert(math.abs(r.getAs[Double]("jb_r") - replay) < 1e-5)
      // near-uniform values: ex-kurtosis ≈ −1.2 ⇒ JB huge ⇒ reject
      assert(r.getAs[Boolean]("reject_normal"), s"$t should reject")
    }
  }

  test("dw: in (0,4), pinned to the rho identity, white-ish residuals near 2") {
    val r = operators.StatsOps.queries("q_stats_dw")(spark, sfDir)
      .collect().head
    val dwv = r.getAs[Double]("dw_r")
    assert(dwv > 0.0 && dwv < 4.0)
    assert(math.abs(r.getAs[Double]("rho1_r") - (1.0 - dwv / 2.0)) < 1e-5)
    assert(r.getAs[Long]("n_pairs") == r.getAs[Long]("n_days") - 1)
    // ~uniform daily counts ⇒ residuals ≈ white noise
    assert(dwv > 1.0 && dwv < 3.0, s"dw=$dwv far from the white-noise 2")
  }

  test("breusch-pagan: nonneg LM on the same residual frame as dw") {
    val bp = operators.StatsOps.queries("q_stats_breusch_pagan")(
      spark, sfDir).collect().head
    val d = operators.StatsOps.queries("q_stats_dw")(spark, sfDir)
      .collect().head
    assert(bp.getAs[Long]("n_days") == d.getAs[Long]("n_days"))
    assert(bp.getAs[Double]("b_r") == d.getAs[Double]("b_r"))
    val lm = bp.getAs[Double]("lm_r")
    // LM = n·R² with R² in [0,1]
    assert(lm >= 0.0 && lm <= bp.getAs[Long]("n_days").toDouble + 1e-9)
    assert(bp.getAs[Boolean]("heteroscedastic") == (lm > 3.841458820694124))
  }

  test("pacf: lag-1 pacf equals acf-1, all three lags bounded by 1") {
    val rows = operators.StatsOps.queries("q_stats_pacf")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
    // Durbin–Levinson base case: φ11 = ρ1 by definition
    assert(rows(0).getDouble(1) == rows(0).getDouble(2))
    // cross-check ρ1 against the standalone lag-1 autocorr key (same
    // census, same mean-adjusted estimator at k=1 up to its own r6)
    val acf1 = operators.StatsOps.queries("q_stats_autocorr")(spark, sfDir)
      .collect().head.getAs[Double]("acf1")
    assert(math.abs(rows(0).getDouble(1) - acf1) < 0.05,
      s"pacf rho1 ${rows(0).getDouble(1)} vs autocorr $acf1")
  }

  test("cochran-armitage: priority-independent status yields no trend") {
    val r = operators.StatsOps.queries("q_stats_cochran_armitage")(
      spark, sfDir).collect().head
    assert(r.getAs[Long]("n_groups") == 5L)
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(r.getAs[Long]("n_total") == nOrders)
    assert(r.getAs[Long]("r_total") > 0 &&
      r.getAs[Long]("r_total") < nOrders)
    // TPC-H generates priority independent of status — the built-in null
    assert(r.getAs[String]("trend") == "no_trend",
      s"z=${r.getAs[Double]("z_ca_r")}")
  }

  test("k-anon: classes partition the users, at-risk share consistent") {
    val r = operators.StatsOps.queries("q_privacy_k_anon")(spark, sfDir)
      .collect().head
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    // every user lands in exactly one QI equivalence class
    assert(r.getAs[Long]("n_users") == nUsers)
    assert(r.getAs[Long]("k_min") >= 1L)
    assert(r.getAs[Long]("k_max") <= nUsers)
    assert(r.getAs[Long]("n_classes") >= 1L &&
      r.getAs[Long]("n_classes") <= 45L) // 5 types × 3 × 3 buckets
    val risk = r.getAs[Long]("users_at_risk")
    assert(risk >= 0L && risk <= nUsers)
    val pct = r.getAs[Double]("pct_at_risk_r")
    assert(math.abs(pct - risk.toDouble * 100 / nUsers) < 1e-5)
  }

  test("dp-count: seeded Laplace replays from the md5 slice, release adds pinned noise") {
    val rows = operators.StatsOps.queries("q_privacy_dp_count")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nTypes = rows.length
    rows.foreach { r =>
      assert(r.getAs[Double]("epsilon") == 1.0)
      assert(r.getAs[Long]("sensitivity") == nTypes.toLong)
      // replay the inverse CDF from the seed in plain JVM code
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("dp-v1:" + r.getString(0)).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      val expect = -(nTypes.toDouble / 1.0) * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      assert(math.abs(r.getAs[Double]("noise_r") - expect) < 2e-6,
        s"${r.getString(0)}: ${r.getAs[Double]("noise_r")} vs $expect")
      // round-then-replay: the release is the pinned noise plus n_true
      assert(math.abs(r.getAs[Double]("n_dp_r") -
        (r.getAs[Long]("n_true") + r.getAs[Double]("noise_r"))) < 1e-5)
      // Laplace(b = 5) noise should be modest relative to the counts
      assert(math.abs(r.getAs[Double]("noise_r")) < 100.0)
    }
  }

  test("l-diversity: grades the same partition as k-anon, l bounded by k and 4") {
    val ld = operators.StatsOps.queries("q_privacy_l_diversity")(
      spark, sfDir).collect().head
    val ka = operators.StatsOps.queries("q_privacy_k_anon")(
      spark, sfDir).collect().head
    // same QI partition: identical class and user censuses
    assert(ld.getAs[Long]("n_classes") == ka.getAs[Long]("n_classes"))
    assert(ld.getAs[Long]("n_users") == ka.getAs[Long]("n_users"))
    assert(ld.getAs[Long]("l_min") >= 1L)
    // l can never exceed the 4 sensitive bands nor the class size
    assert(ld.getAs[Long]("l_max") <= 4L)
    assert(ld.getAs[Long]("l_max") <= ka.getAs[Long]("k_max"))
    val exposed = ld.getAs[Long]("users_exposed")
    assert(exposed >= ld.getAs[Long]("n_classes_l1")) // each l=1 class has ≥1 user
    assert(math.abs(ld.getAs[Double]("pct_exposed_r") -
      exposed.toDouble * 100 / ld.getAs[Long]("n_users")) < 1e-5)
  }

  test("target-encode: out-of-fold means exclude the fold, shrink toward prior") {
    val rows = operators.StatsOps.queries("q_ml_target_encode")(
      spark, sfDir).collect()
    assert(rows.length == 25) // 5 segments × 5 folds
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("fold")).sorted.toSeq == (0L to 4L))
      // the 5 leave-one-out means differ (folds see different data)…
      assert(rs.map(_.getAs[Double]("enc_r")).distinct.length > 1)
      rs.foreach { r =>
        val enc = r.getAs[Double]("enc_r")
        val sm = r.getAs[Double]("enc_smooth_r")
        val prior = r.getAs[Double]("prior_r")
        // …and smoothing pulls every encode strictly toward the prior
        assert((sm - enc).abs <= (enc - prior).abs + 1e-9)
        assert((sm >= enc && sm <= prior) || (sm <= enc && sm >= prior) ||
          (enc - prior).abs < 1e-6)
        assert(r.getAs[Long]("n_out") > 0L)
      }
    }
    // replay one cell's closed form from raw data
    val seg0 = rows.minBy(r => (r.getString(0), r.getAs[Long]("fold")))
    val base = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .select("c_custkey", "c_mktsegment"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") ===
        seg0.getString(0))
      .selectExpr(
        "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 1)," +
          " 16, 10) AS BIGINT) % 5 AS fold",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
    val out = base.filter(_.getLong(0) != seg0.getAs[Long]("fold"))
    val expect = out.map(_.getLong(1)).sum.toDouble / (out.length * 100.0)
    assert(math.abs(seg0.getAs[Double]("enc_r") - expect) < 1e-5)
  }

  test("pettitt: U replays from ranks at the split, stationary series stays null") {
    val r = operators.StatsOps.queries("q_stats_pettitt")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_days")
    val k = r.getAs[Long]("k_stat")
    assert(n >= 3L && k >= 0L)
    // |U_t| is bounded by t(n-t) <= n^2/4 pairs, each contributing ±1
    assert(k <= n * n / 4 + n)
    // replay U at the reported split from raw daily counts + midranks
    val daily = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.expr(
        "(ts_ns div 1000) div 86400000000").as("day"))
      .count().collect().map(r2 => r2.getLong(0) -> r2.getLong(1))
      .sortBy(_._1)
    val cs = daily.map(_._2)
    // twice-midrank of each value: 2*(#below) + #equal + 1
    def mr2(v: Long) = 2L * cs.count(_ < v) + cs.count(_ == v) + 1
    val t = daily.indexWhere(_._1 == r.getAs[Long]("change_day")) + 1
    val u = daily.take(t).map(x => mr2(x._2)).sum - t.toLong * (cs.length + 1)
    assert(math.abs(u) == k, s"replayed |U|=${math.abs(u)} vs k=$k")
    assert(math.abs(r.getAs[Double]("p_r") -
      math.min(2.0 * math.exp(-6.0 * k * k /
        (n.toDouble * n * n + n.toDouble * n)), 1.0)) < 2e-6)
    // the synthetic stream is level-stationary: no change point
    assert(!r.getAs[Boolean]("change_detected"),
      s"p=${r.getAs[Double]("p_r")}")
  }

  test("cooks: leverage sums to p, endpoints carry it, D replays from h and s2") {
    val rows = operators.StatsOps.queries("q_stats_cooks_distance")(
      spark, sfDir).collect()
    val n = rows.length
    assert(n >= 3)
    val hs = rows.map(_.getAs[Double]("h_r"))
    // Σh_i = p = 2 for simple regression (trace of the hat matrix)
    assert(math.abs(hs.sum - 2.0) < 1e-3, s"trace=${hs.sum}")
    hs.foreach(h => assert(h >= 1.0 / n - 1e-9 && h < 1.0))
    // leverage is a U: the time-index endpoints dominate the middle
    val mid = rows(n / 2).getAs[Double]("h_r")
    assert(rows.head.getAs[Double]("h_r") > mid)
    assert(rows.last.getAs[Double]("h_r") > mid)
    // same residual frame as dw: replay D for the max-|e| day
    val worst = rows.maxBy(r => math.abs(r.getAs[Long]("e_m")))
    val s2 = rows.map(r => math.pow(r.getAs[Long]("e_m") / 1000.0, 2))
      .sum / (n - 2)
    val h = worst.getAs[Double]("h_r")
    val expect = math.pow(worst.getAs[Long]("e_m") / 1000.0, 2) /
      (2.0 * s2) * h / math.pow(1.0 - h, 2)
    assert(math.abs(worst.getAs[Double]("cook_r") - expect) < 0.01)
    rows.foreach(r => assert(r.getAs[Boolean]("influential") ==
      (r.getAs[Double]("cook_r") > 4.0 / n)))
  }

  test("did: identity replays from cell means, A/A-with-no-shock stays null") {
    val r = operators.StatsOps.queries("q_stats_did")(spark, sfDir)
      .collect().head
    val did = r.getAs[Double]("did_r")
    // DiD replays from the four pinned cell means
    val expect = (r.getAs[Double]("mean_t_post") -
      r.getAs[Double]("mean_t_pre")) -
      (r.getAs[Double]("mean_c_post") - r.getAs[Double]("mean_c_pre"))
    assert(math.abs(did - expect) < 1e-5)
    assert(r.getAs[Long]("n_events") ==
      Tables.events(spark, sfDir).count())
    assert(r.getAs[Double]("se_r") > 0.0)
    assert(math.abs(r.getAs[Double]("t_r") -
      did / r.getAs[Double]("se_r")) < 1e-4)
    // synthetic arms + stationary stream: no effect to detect
    assert(!r.getAs[Boolean]("significant"),
      s"t=${r.getAs[Double]("t_r")}")
    // parallel-trends sanity: both arms' pre means are near each other
    assert(math.abs(r.getAs[Double]("mean_c_pre") -
      r.getAs[Double]("mean_t_pre")) <
      5 * r.getAs[Double]("se_r"))
  }

  test("dp-quantile: gumbel replays from the seed, release lands near the median") {
    val r = operators.StatsOps.queries("q_privacy_dp_quantile")(
      spark, sfDir).collect().head
    assert(r.getAs[Double]("epsilon") == 1.0)
    val n = r.getAs[Long]("n_events")
    assert(n == Tables.events(spark, sfDir).count())
    // replay: recompute every bucket's score in plain JVM code and
    // confirm the released bucket is the argmax (ties → lowest b)
    val census = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.expr(
        "CAST(floor(value) AS BIGINT)").as("b"))
      .count().collect().map(x => x.getLong(0) -> x.getLong(1))
      .sortBy(_._1)
    var cum = 0L
    val scores = census.map { case (b, cnt) =>
      cum += cnt
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dpq-v1:$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val ug = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      val g = math.floor(-math.log(-math.log(ug)) * 1e6 + 0.5) / 1e6
      val score = math.floor(
        (-math.abs(2 * cum - n).toDouble / 4.0 + g) * 1e6 + 0.5) / 1e6
      (b, score)
    }
    val best = scores.map(_._2).max
    val expectB = scores.filter(_._2 == best).map(_._1).min
    assert(r.getAs[Long]("dp_med_b") == expectB)
    // with N >> 1/ε the utility term dominates: the release is within
    // a few buckets of the true median
    assert(r.getAs[Long]("err_buckets") <= 3L,
      s"err=${r.getAs[Long]("err_buckets")}")
  }

  test("msprt: p monotone non-increasing, identity replays, A/A never rejects") {
    val rows = operators.StatsOps.queries("q_stats_msprt")(spark, sfDir)
      .collect()
    assert(rows.length >= 3)
    val ps = rows.map(_.getAs[Double]("p_always_r"))
    // always-valid p is a running minimum: monotone non-increasing
    ps.zip(ps.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
    ps.foreach(p => assert(p > 0.0 && p <= 1.0))
    // n_eff grows with data
    val ns = rows.map(_.getAs[Long]("n_eff"))
    ns.zip(ns.tail).foreach { case (a, b) => assert(b >= a) }
    // the p at each day is bounded by exp(-llr) of that day
    rows.foreach { r =>
      val cap = math.min(1.0, math.exp(-r.getAs[Double]("llr_r")))
      assert(r.getAs[Double]("p_always_r") <= cap + 1e-6)
    }
    // A/A on a stationary stream: no day may ever reject — THE
    // always-valid guarantee the fixed-horizon tests cannot give
    rows.foreach(r => assert(!r.getAs[Boolean]("significant"),
      s"day ${r.getAs[Long]("day")} p=${r.getAs[Double]("p_always_r")}"))
  }

  test("dp-sum: clip bounds the true sum, noise replays from the seed") {
    val r = operators.StatsOps.queries("q_privacy_dp_sum")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_users")
    val st = r.getAs[Long]("sum_true_cents")
    // the clipped sum can never exceed n_users × clip
    assert(st <= n * 10000L && st > 0L)
    assert(r.getAs[Long]("n_clipped") >= 0 &&
      r.getAs[Long]("n_clipped") <= n)
    // clipped-away mass is exactly the bias the release accepts
    assert(r.getAs[Long]("clipped_away_cents") >= 0L)
    // replay the seeded Laplace draw in plain JVM code
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("dps-v1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
    val expect = -10000.0 * math.signum(u - 0.5) *
      math.log(1.0 - 2.0 * math.abs(u - 0.5))
    assert(math.abs(r.getAs[Double]("noise_r") - expect) < 2e-6)
    assert(math.abs(r.getAs[Double]("sum_dp_r") -
      (st + r.getAs[Double]("noise_r"))) < 1e-5)
  }

  test("fisher: X2 replays from the family's own p-values, A/A stays null") {
    val f = operators.StatsOps.queries("q_stats_fisher_combine")(
      spark, sfDir).collect().head
    val bh = operators.StatsOps.queries("q_stats_bh")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p_r"))
    assert(f.getAs[Long]("n_tests") == bh.length)
    assert(f.getAs[Long]("df") == 2L * bh.length)
    // replay: sum the pinned −2 ln p terms in family order
    val terms = bh.sortBy(_._1).map { case (_, p) =>
      math.floor(-2.0 * math.log(p) * 1e6 + 0.5) / 1e6 }
    val x2 = terms.sum
    assert(math.abs(f.getAs[Double]("x2_r") - x2) < 1e-4,
      s"${f.getAs[Double]("x2_r")} vs $x2")
    assert(f.getAs[Double]("chi2_crit_95") == 18.307038053275146)
    // the family is an A/A null: the combined test must not reject
    assert(!f.getAs[Boolean]("reject_global_null"))
  }

  test("holm: step-down at least as conservative as BH, monotone, A/A clean") {
    val holm = operators.StatsOps.queries("q_stats_holm")(spark, sfDir)
      .collect()
    val bh = operators.StatsOps.queries("q_stats_bh")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p_adj")).toMap
    assert(holm.length == bh.size)
    val adjs = holm.map(_.getAs[Double]("p_adj"))
    adjs.zip(adjs.tail).foreach { case (a, b) => assert(a <= b + 1e-12) }
    holm.foreach { r =>
      val (t, p, pAdj) = (r.getString(0), r.getAs[Double]("p_r"),
        r.getAs[Double]("p_adj"))
      assert(pAdj >= p - 1e-12 && pAdj <= 1.0)
      // FWER control is strictly tighter than FDR control
      assert(pAdj >= bh(t) - 1e-9, s"$t: holm $pAdj < bh ${bh(t)}")
      // the family is an A/A null by construction
      assert(!r.getAs[Boolean]("reject"))
    }
  }

  test("dailyOlsFold replays the SQL dailyOls frame bit-exactly") {
    // dw/breusch_pagan fold the OLS fit driver-side while cooks (and
    // the DuckDB oracle) still consume the SQL twin — this pins the
    // two implementations in ULP-exact lockstep so neither can drift
    // alone (round-9 review finding)
    val sqlRows = operators.StatsOps.dailyOls(spark, sfDir)
      .select("day", "x", "y", "e_m", "b_r")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    val (fold, n, bR) = operators.StatsOps.dailyOlsFold(spark, sfDir)
    assert(fold.length == sqlRows.length && n == sqlRows.length.toLong)
    sqlRows.zip(fold).foreach { case ((d1, x1, y1, e1, b1), (d2, x2, y2, e2)) =>
      assert(d1 == d2 && x1 == x2 && y1 == y2)
      assert(e1 == e2, s"e_m mismatch at day $d1: sql $e1 vs fold $e2")
      assert(b1 == bR)
    }
  }
}
