package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-3 batch-1 additions: bounded BFS reach,
  * TPC-H Q5, z-order layout keys, map functions, hard-negative mining,
  * centroid outliers, incremental dedup, per-domain caps. */
class BatchR3Spec extends SparkSpec {

  test("graph reach: seed at hops 0, hops bounded, matches driver BFS") {
    val rows = operators.GraphOps.queries("q_graph_reach")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(h => h >= 0 && h <= 4))
    val seed = rows.keys.min
    // rebuild the same support-2 co-purchase graph and BFS it in Scala
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk"), col("b.pk")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(seed == adj.keys.min)
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1L to 4L) {
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    assert(rows == dist)
  }

  test("tpch q5: revenue matches the hint-free spark recomputation") {
    val got = operators.RelationalOps.queries("q_tpch_q5")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val free = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" &&
        col("o_orderdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp_ntz(lit("1997-01-01")))
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == free.keySet)
    got.foreach { case (n, v) => assert(math.abs(v - free(n)) < 0.01) }
  }

  test("zorder: de-interleaving zval recovers both dimensions") {
    val rows = operators.RelationalOps.queries("q_layout_zorder")(spark, sfDir)
      .collect()
    assert(rows.length == 100)
    def unspread(z: Long): Long = {
      var v = 0L
      for (i <- 0 until 16) if ((z & (1L << (2 * i))) != 0) v |= 1L << i
      v
    }
    rows.foreach { r =>
      val (zx, zy, zv) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(unspread(zv) == zx && unspread(zv >> 1) == zy)
    }
    // sorted ascending by zval
    val zs = rows.map(_.getLong(4))
    assert(zs.zip(zs.tail).forall { case (a, b) => a <= b })
  }

  test("map funcs: single-key json map round-trips") {
    val rows = operators.RelationalOps.queries("q_map_funcs")(spark, sfDir)
      .collect()
    assert(rows.length == Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getString(1) == "k")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 99)
      assert(r.getLong(3) == 1L)
    }
  }

  test("hard negatives: 3 per query, labels differ, sims descend") {
    val df = operators.VectorOps.queries("q_sim_hard_negatives")(spark, sfDir)
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQ = df.collect().groupBy(_.getLong(0))
    assert(byQ.keySet == labels.keys.filter(_ < 10).toSet)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 3)
      rs.foreach(r => assert(labels(r.getLong(2)) != labels(qid)))
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("embed outliers: 20 rows, nonneg distances, descending") {
    val rows = operators.VectorOps.queries("q_embed_outliers")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    val ds = rows.map(_.getDouble(2))
    assert(ds.forall(_ >= 0.0))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
  }

  test("incremental dedup: exactly the cross-batch slice of minhash pairs") {
    val cutoff = (Tables.documents(spark, sfDir)
      .agg(max(col("doc_id"))).head().getLong(0) + 1) * 4 / 5
    val inc = operators.DedupOps.queries("q_dedup_incremental")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    inc.foreach { case (n, b) => assert(n >= cutoff && b < cutoff) }
    val all = operators.DedupOps.queries("q_dedup_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = all.collect {
      case (a, b) if a < cutoff && b >= cutoff => (b, a)
    }.toSet
    assert(inc == expected)
  }

  test("tpch q10: top returned-revenue customers, revenue positive") {
    val rows = operators.RelationalOps.queries("q_tpch_q10")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getDouble(4))
    assert(revs.forall(_ > 0))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("left interval join: clicks preserved, sentinel for unconverted") {
    val left = operators.EventOps.queries("q_stream_left_join")(spark, sfDir)
    val inner = operators.EventOps.queries("q_stream_interval_join")(
      spark, sfDir)
    val nClicks = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").count()
    val matched = left.filter(col("purchase_id") =!= -1L)
    // matched slice == inner join pairs; every click appears at least once
    assert(matched.count() == inner.count())
    assert(left.select("click_id").distinct().count() == nClicks)
    assert(left.filter(col("purchase_id") === -1L)
      .filter(col("lag_us") =!= -1L).count() == 0)
  }

  test("percent_rank and cume_dist bounds and extremes") {
    val rows = operators.RelationalOps.queries("q_win_pct")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, c) = (r.getDouble(3), r.getDouble(4))
      assert(p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0)
    }
    // each priority stratum has a 0 percent_rank (its minimum) and a
    // cume_dist that reaches exactly 1
    val byPrio = rows.groupBy(_.getString(1))
    byPrio.values.foreach { rs =>
      assert(rs.map(_.getDouble(3)).min == 0.0)
      assert(rs.map(_.getDouble(4)).max == 1.0)
    }
  }

  test("fk audit: clean star schema has zero orphans") {
    val rows = operators.RelationalOps.queries("q_quality_fk_audit")(
      spark, sfDir).collect()
    assert(rows.length == 4)
    val li = Tables.lineitem(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(2) == 0L, s"orphans in ${r.getString(0)}")
      assert(r.getLong(1) > 0L)
    }
    assert(rows.filter(_.getString(0).startsWith("lineitem_"))
      .forall(_.getLong(1) == li))
  }

  test("psi: 10 buckets, nonnegative, near zero for a parity split") {
    val r = operators.StatsOps.queries("q_stats_psi")(spark, sfDir).head()
    assert(r.getLong(0) == 10L)
    val psi = r.getDouble(1)
    // PSI is a sum of (p-q)ln(p/q) terms, each >= 0; a random parity
    // split of the same distribution should sit well under the 0.1
    // "no meaningful drift" convention
    assert(psi >= 0.0 && psi < 0.1, s"psi=$psi")
  }

  test("quality gate: reasons partition the corpus and order applies") {
    val rows = operators.TextOps.queries("q_text_quality_gate")(spark, sfDir)
      .collect()
    val byGate = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGate.keySet.subsetOf(
      Set("keep", "too_short", "no_stopwords", "repetitive")))
    assert(byGate.values.sum == Tables.documents(spark, sfDir).count())
    assert(byGate.getOrElse("keep", 0L) > 0L)
    // rule order: every too_short doc is counted there even if it also
    // has no stopwords (checked by recomputing the first rule alone)
    val short = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) < 20).count()
    assert(byGate.getOrElse("too_short", 0L) == short)
  }

  test("null-safe join: the nulled priority class joins itself") {
    val rows = operators.RelationalOps.queries("q_join_null_safe")(
      spark, sfDir).collect()
    assert(rows.length == 5) // 4 surviving priorities + the (null) class
    val m = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.contains("(null)"))
    val med = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "3-MEDIUM")
    assert(m("(null)")._1 == med.count())
    assert(m("(null)")._2 == med.filter(col("o_orderstatus") === "F").count())
  }

  test("nfc: combining marks compose; ascii fast path is identity") {
    import spark.implicits._
    val r = Seq(("cafe\u0301 A\u030A", "plain ascii")).toDF("dec", "asc")
      .select(expr("graft_nfc(dec)"), expr("graft_nfc(asc)")).head()
    assert(r.getString(0) == "caf\u00E9 \u00C5")
    assert(r.getString(1) == "plain ascii")
    val rows = operators.TextOps.queries("q_text_nfc")(spark, sfDir).collect()
    assert(rows.length == 500)
    // exactly the two appended combining marks compose away per row
    rows.foreach(r2 => assert(r2.getLong(1) - r2.getLong(2) == 2))
  }

  test("span dedup: 8-token spans, cross-doc only, count consistency") {
    val rows = operators.TextOps.queries("q_text_span_dedup")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getString(0).split(" ").length == 8)
      val (nDocs, nOcc) = (r.getLong(1), r.getLong(2))
      assert(nDocs >= 2 && nOcc >= nDocs)
    }
    val occs = rows.map(_.getLong(2))
    assert(occs.zip(occs.tail).forall { case (a, b) => a >= b })
  }

  test("domain cap: at most 15 per source and deterministic") {
    val df = operators.TextOps.queries("q_sample_domain_cap")(spark, sfDir)
    val perSource = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(perSource.nonEmpty)
    perSource.foreach { case (_, c) => assert(c <= 15) }
    val again = operators.TextOps.queries("q_sample_domain_cap")(spark, sfDir)
    assert(df.collect().toSeq == again.collect().toSeq)
  }

  test("ohlc: bar invariants hold and open/close pick the edge events") {
    val rows = operators.EventOps.queries("q_events_ohlc")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))
      assert(l <= o && o <= h && l <= c && c <= h && l <= h)
      assert(r.getLong(6) >= 1)
    }
    // single-event bars collapse: open == high == low == close
    rows.filter(_.getLong(6) == 1).foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3) &&
        r.getDouble(3) == r.getDouble(4) && r.getDouble(4) == r.getDouble(5))
    }
  }

  test("bpe pairs: counts match a driver-side recount of the corpus") {
    val got = operators.TextOps.queries("q_text_bpe_pairs")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 20)
    val words = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.length > 1)
    val counts = words.flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (p, n) => assert(counts(p) == n, s"pair $p") }
    // descending, tie-broken by pair
    assert(got.sliding(2).forall { case Array((p1, n1), (p2, n2)) =>
      n1 > n2 || (n1 == n2 && p1 < p2) })
  }

  test("temperature sampling: flattens the distribution, sums to ~1") {
    val rows = operators.TextOps.queries("q_sample_temperature")(
      spark, sfDir).collect()
    assert(rows.length >= 2)
    val (pRaw, pTemp) = (rows.map(_.getDouble(2)), rows.map(_.getDouble(3)))
    assert(math.abs(pRaw.sum - 1.0) < 1e-4 &&
      math.abs(pTemp.sum - 1.0) < 1e-4)
    // α<1 upsamples the tail and downsamples the head
    val head = rows.maxBy(_.getDouble(2))
    val tail = rows.minBy(_.getDouble(2))
    assert(head.getDouble(3) <= head.getDouble(2) + 1e-9)
    assert(tail.getDouble(3) >= tail.getDouble(2) - 1e-9)
  }

  test("count-min: estimate bounds exact from above") {
    val rows = operators.TextOps.queries("q_text_count_min")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("bag ops: except/intersect all match the count arithmetic") {
    val rows = operators.RelationalOps.queries("q_set_bag_ops")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = Tables.lineitem(spark, sfDir)
    val cntA = li.filter(col("l_quantity") < 10).groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cntB = li.filter(col("l_returnflag") === "R").groupBy("l_suppkey")
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (k, (ex, in)) =>
      val (a, b) = (cntA.getOrElse(k, 0L), cntB.getOrElse(k, 0L))
      assert(ex == math.max(0L, a - b), s"except $k")
      assert(in == math.min(a, b), s"intersect $k")
    }
  }

  test("backlog: prefix sums stay nonnegative and drain to zero") {
    val rows = operators.RelationalOps.queries("q_orders_backlog")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 0, s"day ${r.getLong(0)}"))
    assert(rows.last.getLong(2) == 0L) // every interval eventually closes
    assert(rows.map(_.getLong(1)).sum == 0L)
  }

  test("rendezvous: removing shard 7 moves exactly its docs") {
    val rows = operators.TextOps.queries("q_shard_rendezvous")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._2).sum ==
      Tables.documents(spark, sfDir).count())
    rows.foreach { case (shard, n, moved) =>
      if (shard == 7L) assert(moved == n) else assert(moved == 0L)
    }
  }

  test("vec project: 20x8 long form, deterministic, non-degenerate") {
    val df = operators.VectorOps.queries("q_vec_project")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 160)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 160)
    assert(rows.exists(_.getDouble(2) != 0.0))
    assert(df.collect().toSeq == rows.toSeq)
  }

  test("histo quantile: brackets the exact percentile within one bucket") {
    val rows = operators.RelationalOps.queries("q_agg_histo_quantile")(
      spark, sfDir).collect()
    assert(rows.length == 15) // 5 priorities x 3 quantiles
    val exact = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))")
        .as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val (prio, q, est) = (r.getString(0), r.getDouble(1), r.getDouble(3))
      val idx = Seq(0.5, 0.9, 0.99).indexOf(q)
      assert(math.abs(est - exact(prio)(idx)) <= 5000.0,
        s"$prio q=$q est=$est exact=${exact(prio)(idx)}")
    }
  }

  test("autocorr: single row, coefficient in [-1, 1]") {
    val r = operators.StatsOps.queries("q_stats_autocorr")(spark, sfDir)
      .head()
    assert(r.getLong(0) > 10)
    assert(math.abs(r.getDouble(1)) <= 1.0)
  }

  test("char entropy: uniform text maxes out, repeated text is zero") {
    import spark.implicits._
    val rows = operators.TextOps.queries("q_text_char_entropy")(spark, sfDir)
      .collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val (n, k, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-9,
        s"doc ${r.getLong(0)}: entropy $h outside [0, ln($k)]")
      assert(n >= k)
    }
  }

  test("rag chunks: strides cover every token and overlap by 8") {
    val rows = operators.TextOps.queries("q_text_rag_chunks")(spark, sfDir)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val nTok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // starts are 0, 24, 48, ... and the last chunk reaches the end
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(2) == i * 24L)
        assert(c.getLong(3) >= 1 && c.getLong(3) <= 32)
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == nTok(doc))
    }
  }

  test("merge days: weekly roll-up of partials equals the direct weekly") {
    val merged = operators.RelationalOps.queries("q_agg_merge_days")(
      spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val direct = Tables.orders(spark, sfDir)
      .groupBy(expr("(CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) " +
        "div 86400) div 7").as("week"))
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("tot"),
        min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(merged.keySet == direct.keySet && merged.nonEmpty)
    merged.foreach { case (w, (n, tot, mn, mx)) =>
      val (dn, dtot, dmn, dmx) = direct(w)
      assert(n == dn && mn == dmn && mx == dmx, s"week $w")
      assert(math.abs(tot - dtot) < 0.05, s"week $w total")
    }
  }

  test("winsorize: clipped mean sits inside the clip band") {
    val r = operators.StatsOps.queries("q_stats_winsorize")(spark, sfDir)
      .head()
    val (n, p05, p95, raw, win) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n == Tables.events(spark, sfDir).count())
    assert(p05 < p95)
    assert(win >= p05 && win <= p95)
    // this corpus is right-skewed: clipping the tail pulls the mean down
    assert(win < raw)
  }

  test("kmv error audit: small relative error, exact matches distinct") {
    val rows = operators.RelationalOps.queries("q_eval_kmv_error")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      // k=64 KMV: sub-50% error even at these tiny cardinalities
      assert(r.getDouble(3) < 0.5, s"${r.getString(0)}: ${r.getDouble(3)}")
    }
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("forecast backtest: mae/mape nonnegative, window sized right") {
    val r = operators.EventOps.queries("q_events_forecast_naive")(
      spark, sfDir).head()
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0)
  }

  test("cusum: five rows ranked by |cusum| descending") {
    val rows = operators.StatsOps.queries("q_stats_cusum")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    val mags = rows.map(r => math.abs(r.getDouble(2)))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
  }

  test("balanced sample: every language ends at the minority count") {
    val rows = operators.TextOps.queries("q_sample_balanced")(spark, sfDir)
      .collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val minCount = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(_.getLong(1)).min
    assert(perLang.values.toSet == Set(minCount.toInt))
    assert(rows.forall(_.getLong(2) <= minCount))
  }

  test("layout skipping: z-order prunes files, natural order cannot") {
    val rows = operators.RelationalOps.queries("q_layout_skipping")(
      spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val total = Tables.lineitem(spark, sfDir).count()
    val (nf, nskip, scanned) = rows("zorder")
    assert(nf == 16 && nskip > 0, "z-order must skip at least one file")
    assert(scanned < total)
    val (nfN, _, scannedN) = rows("natural")
    assert(nfN == 16)
    assert(scanned < scannedN, "z-order must scan less than natural order")
  }

  test("assortativity: bounded in [-1, 1] with symmetric end count") {
    val r = operators.GraphOps.queries("q_graph_assortativity")(
      spark, sfDir).head()
    assert(r.getLong(0) > 0 && r.getLong(0) % 2 == 0)
    assert(math.abs(r.getDouble(1)) <= 1.0)
  }

  test("centroid classify: every vector classified exactly once") {
    val rows = operators.VectorOps.queries("q_vec_centroid_classify")(
      spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum ==
      Tables.embeddings(spark, sfDir).count())
    // centroids must beat chance clearly (≥2×): with k labels, random
    // assignment gets 1/k of the diagonal
    val correct = rows.filter(r => r.get(0) == r.get(1))
      .map(_.getLong(2)).sum
    val total = rows.map(_.getLong(2)).sum
    val k = rows.map(_.get(0)).distinct.length
    assert(correct * k > total * 2,
      s"accuracy ${correct.toDouble / total} vs chance ${1.0 / k}")
  }

  test("zipf: slope is negative (frequency falls with rank)") {
    val r = operators.TextOps.queries("q_text_tok_zipf")(spark, sfDir)
      .head()
    assert(r.getLong(0) > 5)
    assert(r.getDouble(1) < 0.0)
  }

  test("tpch q7: both trade directions, revenue positive") {
    val rows = operators.RelationalOps.queries("q_tpch_q7")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(3) > 0))
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
  }

  test("time-range window: trailing-hour count bounded by user total") {
    val df = operators.RelationalOps.queries("q_win_time_range")(
      spark, sfDir)
    val rows = df.collect()
    assert(rows.length == Tables.events(spark, sfDir).count())
    val perUser = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= perUser(r.getLong(1)))
    }
  }

  test("feature hash: buckets in range, counts partition the tokens") {
    val df = operators.TextOps.queries("q_text_feature_hash")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    val perDoc = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val expected = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == expected)
  }
}
