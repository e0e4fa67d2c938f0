package graft

import org.apache.spark.sql.functions._

/** Invariants for the EWMA / jackknife / k-core / interpolation batch. */
class SeriesGraphSpec extends SparkSpec {

  test("ewma: first day equals its count, later days stay in range") {
    val rows = operators.StatsOps.queries("q_stats_ewma")(spark, sfDir)
      .collect()
    assert(rows.length >= 14)
    val first = rows.head
    assert(math.abs(first.getDouble(2) - first.getLong(1)) < 1e-6)
    val counts = rows.map(_.getLong(1).toDouble)
    rows.foreach { r =>
      assert(r.getDouble(2) >= counts.min - 1e-6)
      assert(r.getDouble(2) <= counts.max + 1e-6)
    }
  }

  test("jackknife: CI brackets the mean and mean matches the plain avg") {
    val r = operators.StatsOps.queries("q_stats_jackknife")(spark, sfDir)
      .collect()(0)
    val mean = r.getDouble(r.fieldIndex("mean"))
    val lo = r.getDouble(r.fieldIndex("ci_lo"))
    val hi = r.getDouble(r.fieldIndex("ci_hi"))
    val se = r.getDouble(r.fieldIndex("se_jack"))
    assert(se > 0 && lo < mean && mean < hi)
    val plain = Tables.orders(spark, sfDir)
      .agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    // fold sums are r2-rounded so the reassembled mean drifts < 1e-4
    assert(math.abs(mean - plain) < 0.001)
  }

  test("kcore: matches the driver-side 3-round peel") {
    val got = operators.GraphOps.queries("q_graph_kcore")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val sup2 = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk"), col("b.pk")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var und = (sup2 ++ sup2.map(_.swap)).toSet
    for (_ <- 1 to 3) {
      val deg = und.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      und = und.filter(e => keep(e._1) && keep(e._2))
    }
    val expect = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got == expect)
  }

  test("hits: 20 per role, scores in (0,1], hubs are customers") {
    val rows = operators.GraphOps.queries("q_graph_hits")(spark, sfDir)
      .collect()
    val byRole = rows.groupBy(_.getString(0))
    assert(byRole.keySet == Set("authority", "hub"))
    byRole.foreach { case (role, rs) =>
      assert(rs.length == 20, s"$role had ${rs.length}")
      val pfx = if (role == "hub") "c" else "p"
      rs.foreach { r =>
        assert(r.getString(1).startsWith(pfx))
        val sc = r.getDouble(2)
        assert(sc > 0.0 && sc <= 1.0)
      }
      // within a role the dump is score-descending
      val scores = rs.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("clustering coefficient: bounded, zero iff zero triangles") {
    val rows = operators.GraphOps.queries("q_graph_clustering")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // 3 * total triangles = sum of per-node incidences
    val triTotal = operators.GraphOps.queries("q_graph_triangles")(
      spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == 3 * triTotal)
    rows.foreach { r =>
      val deg = r.getLong(1); val tri = r.getLong(2)
      val lcc = r.getDouble(3)
      assert(lcc >= 0.0 && lcc <= 1.0, s"lcc $lcc out of range")
      assert((tri == 0) == (lcc == 0.0) || deg < 2)
      // tri cannot exceed the neighborhood pair count
      assert(tri <= deg * (deg - 1) / 2)
    }
  }

  test("decompose: components re-sum to the observation") {
    val rows = operators.StatsOps.queries("q_stats_decompose")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getLong(1).toDouble
      val sum = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(c - sum) < 1e-4)
    }
  }

  test("theil sen: slope matches the scala median of pairwise slopes") {
    val r = operators.StatsOps.queries("q_stats_theil_sen")(spark, sfDir)
      .collect()(0)
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1)).sorted
    val n = slopes.length
    val med = if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - med) < 1e-6)
  }

  test("growth accounting: classes partition the daily actives") {
    val rows = operators.EventOps.queries("q_events_growth_acct")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dau = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("(ts_ns div 1000) div 86400000000").as("day"))
      .distinct().groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val day = r.getLong(0)
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == dau(day))
      assert(r.getLong(4) <= dau(day))
    }
    val totalNew = rows.map(_.getLong(1)).sum
    val users = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(totalNew == users)
  }

  test("ivf recall audit: hits are bounded and consistent with the probe") {
    val rows = operators.VectorOps.queries("q_eval_ivf_recall")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nExact = r.getLong(r.fieldIndex("n_exact"))
      val nHit = r.getLong(r.fieldIndex("n_hit"))
      val rec = r.getDouble(r.fieldIndex("recall"))
      assert(nExact == 3 && nHit >= 0 && nHit <= 3)
      assert(math.abs(rec - nHit.toDouble / nExact) < 1e-6)
    }
  }

  test("label noise: flags only true majority disagreements") {
    val rows = operators.VectorOps.queries("q_vec_label_noise")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("label")) !=
        r.getInt(r.fieldIndex("maj_label")))
      val v = r.getLong(r.fieldIndex("votes"))
      assert(v >= 1 && v <= 5)
    }
    // spot-check one flagged vector against a driver-side 5-NN vote
    val probe = rows.head.getLong(0)
    val all = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).toArray)
    }
    val me = all.find(_._1 == probe).get
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      math.floor(s * 1000000 + 0.5) / 1000000
    }
    val top5 = all.filter(_._1 != probe)
      .map(x => (x._1, x._2, dot(me._3, x._3)))
      .sortBy(x => (-x._3, x._1)).take(5)
    val maj = top5.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy(x => (-x._2, x._1)).head._1
    assert(maj == rows.head.getInt(rows.head.fieldIndex("maj_label")))
  }

  test("stl anomaly: top-5 by |z|, z consistent with residual/sd") {
    val rows = operators.StatsOps.queries("q_stats_anomaly_stl")(
      spark, sfDir).collect()
    assert(rows.length == 5)
    val zs = rows.map(r => math.abs(r.getDouble(3)))
    zs.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9)
      case _ =>
    }
    rows.foreach { r =>
      assert(math.signum(r.getDouble(2)) == math.signum(r.getDouble(3)))
    }
  }

  test("dispersion: hour census and moments are self-consistent") {
    val rows = operators.StatsOps.queries("q_stats_dispersion")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getDouble(r.fieldIndex("mean_c"))
      val varc = r.getDouble(r.fieldIndex("var_c"))
      val disp = r.getDouble(r.fieldIndex("dispersion"))
      assert(mean > 0 && varc >= 0)
      assert(math.abs(disp - varc / mean) < 1e-4)
    }
  }

  test("margin: every vector accounted, n_low bounded by n_vecs") {
    val rows = operators.VectorOps.queries("q_vec_margin")(spark, sfDir)
      .collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      assert(r.getDouble(2) >= 0.0) // best sim >= runner-up by rank order
    }
  }

  test("interpolate: full spine, no nulls, observed rows keep their value") {
    val df = operators.EventOps.queries("q_events_interpolate")(spark, sfDir)
    val rows = df.collect()
    val hrs = rows.map(_.getLong(0))
    assert(hrs.length == (hrs.max - hrs.min + 1))
    assert(rows.forall(!_.isNullAt(2)))
    val hourly = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("(ts_ns div 1000) div 3600000000").as("hr"))
      .agg(sum(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.filter(_.getInt(1) == 1).foreach { r =>
      assert(math.abs(r.getDouble(2) - hourly(r.getLong(0))) < 0.011)
    }
    assert(rows.count(_.getInt(1) == 1) == hourly.size)
  }

  test("closeness: min-id landmark census replays q_graph_reach exactly") {
    val cl = SparkEntry.queries("q_graph_closeness")(spark, sfDir).collect()
    assert(cl.length == 3)
    cl.foreach { r =>
      val nr = r.getAs[Long]("n_reached"); val sd = r.getAs[Long]("sum_dist")
      assert(nr >= 1 && sd >= nr, "dist >= 1 per reached node")
      assert(r.getAs[Double]("closeness") <= 1.0 + 1e-9)
      // harmonic <= n_reached (every 1/d term <= 1) and >= closeness
      assert(r.getAs[Double]("harmonic") <= nr + 1e-9)
    }
    // q_graph_reach runs the SAME 4-hop BFS from the same min-id seed —
    // its per-hop census must equal the min landmark's n1..n4 derivation
    val reach = SparkEntry.queries("q_graph_reach")(spark, sfDir).collect()
    val byHop = reach.filter(_.getAs[Long]("hops") > 0)
      .groupBy(_.getAs[Long]("hops")).view.mapValues(_.length.toLong).toMap
    val minLm = cl.map(_.getAs[Long]("lm")).min
    val row = cl.find(_.getAs[Long]("lm") == minLm).get
    assert(row.getAs[Long]("n_reached") == byHop.values.sum)
    assert(row.getAs[Long]("sum_dist") ==
      byHop.map { case (h, n) => h * n }.sum)
  }
}
