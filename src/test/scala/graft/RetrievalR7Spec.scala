package graft

import org.apache.spark.sql.functions._

/** Round-7 retrieval/eval additions: RRF hybrid fusion, NDCG@10,
  * Cohen's kappa, and the IVF-PQ composition. These specs pin the
  * semantic invariants the DuckDB oracle cannot express (it only pins
  * value equality): fusion membership, metric ranges, chance-correction
  * identities, and candidate-set confinement. */
class RetrievalR7Spec extends SparkSpec {

  test("rrf: fused docs come from the arm top-20s; scores bounded and sorted") {
    val fused = SparkEntry.queries("q_search_rrf")(spark, sfDir).collect()
    assert(fused.length == 10)
    val lex = SparkEntry.queries("q_text_search_bm25")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    fused.foreach { r =>
      val (lr, dr) = (Option(r.get(1)), Option(r.get(2)))
      assert(lr.isDefined || dr.isDefined,
        "fused doc must appear in at least one arm")
      // lexical-arm membership is independently checkable against the
      // standalone BM25 key (same scoring, same top-20)
      if (lr.isDefined) assert(lex.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} claims a lex rank but is not in BM25 top-20")
      val rrf = r.getDouble(3)
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-12)
    }
    val scores = fused.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "fused list must be sorted by rrf desc")
  }

  test("rrf: a doc ranked by both arms outscores the same ranks held singly") {
    // 1/(60+r1) + 1/(60+r2) > max(1/(60+r1), 1/(60+r2)) — structural
    // sanity of the fusion formula as implemented (catches a coalesce
    // that silently zeroes a present rank)
    val fused = SparkEntry.queries("q_search_rrf")(spark, sfDir).collect()
    fused.filter(r => !r.isNullAt(1) && !r.isNullAt(2)).foreach { r =>
      val single = math.max(1.0 / (60 + r.getLong(1)), 1.0 / (60 + r.getLong(2)))
      assert(r.getDouble(3) > single)
    }
  }

  test("ndcg: in [0,1], dcg <= idcg, and idcg matches the closed form") {
    val rows = SparkEntry.queries("q_eval_ndcg")(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (nRel, dcg, idcg, ndcg) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(nRel > 0)
      assert(dcg >= 0.0 && dcg <= idcg + 1e-9)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      val m = math.min(10L, nRel).toInt
      val expected = (1 to m).map(i =>
        math.floor(math.log(2.0) / math.log(i + 1.0) * 1e6 + 0.5) / 1e6).sum
      assert(math.abs(idcg - expected) < 1e-9,
        s"idcg $idcg != closed form $expected for n_rel=$nRel")
    }
  }

  test("kappa: consistent with the confusion matrix and the po/pe identity") {
    val k = SparkEntry.queries("q_eval_kappa")(spark, sfDir).collect().head
    val (n, agree, sumRc) = (k.getLong(0), k.getLong(1), k.getLong(2))
    val (po, pe, kappa) = (k.getDouble(3), k.getDouble(4), k.getDouble(5))
    // the confusion census comes from the SAME shared prediction pass
    val conf = SparkEntry.queries("q_vec_centroid_classify")(spark, sfDir)
      .collect()
    assert(n == conf.map(_.getLong(2)).sum)
    assert(agree == conf.filter(r => r.get(0) == r.get(1))
      .map(_.getLong(2)).sum)
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1 && kappa <= 1.0)
    // kappa = (po - pe) / (1 - pe) up to the r6 rounding of each part
    val expect = (n.toDouble * agree - sumRc) / (n.toDouble * n - sumRc)
    assert(math.abs(kappa - math.floor(expect * 1e6 + 0.5) / 1e6) < 1e-12)
  }

  test("quality classifier: 17 buckets, self-consistent accuracy, beats majority") {
    val rows = SparkEntry.queries("q_text_quality_classifier")(spark, sfDir)
      .collect()
    assert(rows.length == 17)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 16L))
    val (nCorrect, nDocs, acc) =
      (rows.head.getLong(3), rows.head.getLong(4), rows.head.getDouble(5))
    assert(math.abs(acc - math.floor(
      nCorrect.toDouble / nDocs * 1e6 + 0.5) / 1e6) < 1e-12)
    // the trained linear filter must do at least as well on its own
    // training data as the best constant classifier (majority class) —
    // the minimum bar for "learned something"
    val lab = operators.TextOps.qualityLabel(spark, sfDir)
      .agg(avg(col("y").cast("double"))).collect().head.getDouble(0)
    val majority = math.max(lab, 1.0 - lab)
    assert(acc >= majority - 1e-9,
      s"trained accuracy $acc below majority baseline $majority")
  }

  test("ece: bins partition the corpus; ece is the doc-weighted mean gap") {
    val rows = SparkEntry.queries("q_eval_ece")(spark, sfDir).collect()
    val n = rows.map(_.getLong(1)).sum
    val nDocs = SparkEntry.queries("q_text_quality_classifier")(spark, sfDir)
      .collect().head.getLong(4)
    assert(n == nDocs, "ECE bins must partition the classifier's corpus")
    rows.foreach { r =>
      val (bin, nb, nPos, conf, acc) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(bin >= 0 && bin <= 9 && nPos <= nb)
      assert(conf >= 0.0 && conf <= 1.0 && acc >= 0.0 && acc <= 1.0)
      // a bin's confidences live inside the bin's probability range
      // (bin 9 also absorbs p=1.0)
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6)
    }
    val ece = rows.head.getDouble(5)
    val expect = rows.map(r => math.floor(math.abs(
      r.getDouble(4) - r.getDouble(3)) * r.getLong(1) * 1e6 + 0.5) / 1e6)
      .sum / n
    assert(math.abs(ece - math.floor(expect * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("bh: adjusted p monotone, >= raw p, and the A/A family rejects nothing") {
    val rows = SparkEntry.queries("q_stats_bh")(spark, sfDir).collect()
    assert(rows.length == 5, "one test per event type")
    val byRank = rows.sortBy(_.getLong(3))
    byRank.foreach { r =>
      assert(r.getDouble(4) >= r.getDouble(2) - 1e-9,
        "BH-adjusted p must not be below the raw p")
      assert(r.getDouble(4) <= 1.0)
      // the md5 split is a true null — FDR control must not reject
      assert(!r.getBoolean(5),
        s"A/A split rejected ${r.getString(0)} (p_adj=${r.getDouble(4)})")
    }
    val adj = byRank.map(_.getDouble(4))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b + 1e-12 },
      "adjusted p must be nondecreasing in rank")
  }

  test("kmv merge: day-sketch union reproduces the direct sketch exactly") {
    val rows = SparkEntry.queries("q_agg_kmv_merge")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3),
        s"${r.getString(0)}: merged ${r.getLong(2)} != direct ${r.getLong(1)}")
    }
    // and the direct column IS the standalone key (shared estimator)
    val standalone = SparkEntry.queries("q_agg_approx_distinct_kmv")(
      spark, sfDir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(standalone(r.getString(0)) == r.getLong(1)))
  }

  test("bigram perplexity: one score per multi-token doc, n_bigrams = n_tok - 1") {
    val ppl = SparkEntry.queries("q_text_perplexity_bigram")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val uni = SparkEntry.queries("q_text_perplexity")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = uni.filter(_._2 >= 2)
    assert(ppl.keySet == multi.keySet,
      "every doc with >= 2 tokens gets a bigram score, none else")
    multi.foreach { case (id, nTok) =>
      val (nBg, score) = ppl(id)
      assert(nBg == nTok - 1, s"doc $id: $nBg bigrams for $nTok tokens")
      assert(score > 0.0, "mean -ln p must be positive for p < 1")
    }
  }

  test("auroc: exact rank-sum AUC matches a brute-force pair count") {
    val r = SparkEntry.queries("q_eval_auroc")(spark, sfDir).collect().head
    val (n1, n0, auc, gini) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(auc > 0.5 && auc <= 1.0, "a working classifier ranks above chance")
    assert(math.abs(gini - (math.floor((2.0 * auc - 1) * 1e6 + 0.5) / 1e6))
      < 1e-12)
    // brute force: P(score_pos > score_neg) + 0.5 P(tie) over all pairs
    val st = operators.TextOps.qclfTrain(spark, sfDir)
    val sc = st.residuals(st.w).select("z_micros", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pos = sc.filter(_._2 == 1L).map(_._1)
    val neg = sc.filter(_._2 == 0L).map(_._1)
    assert(pos.length.toLong == n1 && neg.length.toLong == n0)
    var num = 0.0
    pos.foreach(p => neg.foreach(q =>
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)))
    val brute = num / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - math.floor(brute * 1e6 + 0.5) / 1e6) < 1e-9,
      s"rank-sum auc $auc != brute pair-count ${brute}")
  }

  test("schema drift: key column stays fully distinct, clean corpus flags no drift") {
    val rows = SparkEntry.queries("q_quality_schema_drift")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet ==
      Set("doc_id", "text", "lang", "source", "n_chars"))
    val id = rows("doc_id")
    // the id column's distinct count must equal the slice row count on
    // both sides — a broken loader (dup/null ids) trips exactly here
    assert(id.getLong(5) == id.getLong(1) && id.getLong(6) == id.getLong(2))
    rows.values.foreach { r =>
      assert(r.getLong(3) == 0 && r.getLong(4) == 0, "corpus has no nulls")
      assert(!r.getBoolean(9),
        s"${r.getString(0)}: two slices of one clean corpus must not drift")
    }
  }

  test("rate limit: matches an independent bucket replay; first event admitted") {
    val out = SparkEntry.queries("q_events_rate_limit")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.values.foreach { case (n, adm) =>
      assert(adm >= 1 && adm <= n, "bucket starts full: first event admits")
    }
    // independent replay (plain Scala loop, no Spark) for every user
    val ts = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts_ns div 1000 AS ts_us")
      .collect().groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)).sorted }
    ts.foreach { case (u, times) =>
      var last = 0L; var tokens = 1500000L; var adm = 0L
      times.foreach { t =>
        tokens = math.min(1500000L, tokens + (t - last) / 3600)
        last = t
        if (tokens >= 1000000L) { tokens -= 1000000L; adm += 1 }
      }
      assert(out(u) == (times.length.toLong, adm),
        s"user $u: plan ${out(u)} != replay (${times.length}, $adm)")
    }
  }

  test("ivfpq: results confined to the probed cluster, sorted, 8 subspaces each") {
    val out = SparkEntry.queries("q_ann_ivfpq")(spark, sfDir).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(2)).toSeq ==
      out.map(_.getLong(2)).sortBy(identity).toSeq,
      "ADC distances must ascend")
    assert(out.map(_.get(1)).distinct.length == 1,
      "all results must come from the single probed inverted list")
    // est_micros must be a sum of 8 per-subspace terms -> strictly
    // positive here (vec 0 is not its own neighbor, distances nonzero)
    assert(out.forall(_.getLong(2) > 0))
  }

  test("pr_auc: bounded, beats prevalence, and agrees with auroc's census") {
    val r = SparkEntry.queries("q_eval_pr_auc")(spark, sfDir).collect()
    assert(r.length == 1)
    val (nPos, nNeg, prev, ap) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2), r(0).getDouble(3))
    assert(ap > 0.0 && ap <= 1.0 + 1e-9)
    // a trained classifier must rank above the random baseline, whose
    // expected AP is the prevalence
    assert(ap > prev, s"AP $ap must beat the prevalence baseline $prev")
    assert(math.abs(prev -
      math.floor(nPos.toDouble / (nPos + nNeg) * 1e6 + 0.5) / 1e6) < 1e-12)
    val auc = SparkEntry.queries("q_eval_auroc")(spark, sfDir).collect()(0)
    assert(auc.getLong(0) == nPos && auc.getLong(1) == nNeg,
      "pr_auc and auroc must score the identical positive/negative census")
  }

  test("srm: chi2 and flag replay exactly; __ALL__ counts users once") {
    val rows = SparkEntry.queries("q_stats_srm")(spark, sfDir).collect()
    val crit = 3.8414588206941245
    rows.foreach { r =>
      val (na, nb, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == na + nb)
      val chi2 = math.floor((na - nb).toDouble * (na - nb) / n * 1e6 + 0.5) / 1e6
      assert(r.getDouble(4) == chi2)
      assert(r.getBoolean(5) == (chi2 > crit))
    }
    val all = rows.find(_.getString(0) == "__ALL__").get
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(all.getLong(3) == nUsers,
      "__ALL__ must count each user once, not once per event type")
    assert(rows.map(_.getLong(3)).sum > nUsers,
      "per-type rows re-count multi-type users — sanity of the census split")
  }

  test("levene: anova machinery on |x - median|, valid dofs, finite stat") {
    val r = SparkEntry.queries("q_stats_levene")(spark, sfDir).collect()
    assert(r.length == 1)
    val k = r(0).getLong(0)
    val nTypes = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(k == nTypes)
    assert(r(0).getLong(2) == k - 1 && r(0).getLong(3) == r(0).getLong(1) - k)
    val w = r(0).getDouble(4)
    assert(!w.isNaN && !w.isInfinite && w >= 0.0)
  }

  test("mrl recall: 10 exact neighbors per query, recall = hits/10 in (0,1]") {
    val rows = SparkEntry.queries("q_eval_mrl_recall")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 10)
      val (hits, rec) = (r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= 10)
      assert(rec == math.floor(hits / 10.0 * 1e6 + 0.5) / 1e6)
      assert(hits > 0,
        s"qid ${r.getLong(0)}: 16-dim prefix should keep SOME of the top-10")
    }
  }

  test("rouge: scores every cluster member against its rep; one pair replays by hand") {
    val rouge = SparkEntry.queries("q_eval_rouge")(spark, sfDir).collect()
    val expected = SparkEntry.queries("q_dedup_clusters")(spark, sfDir)
      .collect().filter(r => r.getLong(0) != r.getLong(1))
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(rouge.map(r => (r.getLong(0), r.getLong(1))).toSet == expected,
      "rouge must score exactly the (rep, member) pairs of the clusters")
    rouge.foreach { r =>
      val (na, nb, o1, o2) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(o1 <= math.min(na, nb), "clipped unigram overlap bound")
      assert(o2 <= math.max(0L, math.min(na, nb) - 1), "bigram overlap bound")
      assert(r.getDouble(6) <= 1.0 + 1e-9 && r.getDouble(7) <= 1.0 + 1e-9)
    }
    // hand-replay the clipped unigram overlap for the first pair
    val (a, b) = (rouge(0).getLong(0), rouge(0).getLong(1))
    val texts = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(a, b))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def counts(t: String) =
      t.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (ca, cb) = (counts(texts(a)), counts(texts(b)))
    val o1Hand = ca.keysIterator
      .map(k => math.min(ca(k), cb.getOrElse(k, 0L))).sum
    assert(rouge(0).getLong(4) == o1Hand,
      s"pair ($a,$b): plan o1 ${rouge(0).getLong(4)} != hand replay $o1Hand")
  }

  test("kmv intersect: all type pairs, union bounded, exact replayed for one pair") {
    val rows = SparkEntry.queries("q_agg_kmv_intersect")(spark, sfDir).collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2)
    rows.foreach { r =>
      val (estA, estB, estU, estI) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(estU <= estA + estB, "union estimate cannot exceed the sum")
      assert(estI == math.max(0L, estA + estB - estU),
        "inclusion-exclusion identity with clamp")
    }
    val (ta, tb) = (rows(0).getString(0), rows(0).getString(1))
    val ua = Tables.events(spark, sfDir)
      .filter(col("event_type") === ta && col("user_id").isNotNull)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val ub = Tables.events(spark, sfDir)
      .filter(col("event_type") === tb && col("user_id").isNotNull)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(rows(0).getLong(6) == (ua & ub).size.toLong,
      s"pair ($ta,$tb): exact intersection must replay")
  }

  test("ljung box: 7 lags, rho replays by hand, one shared q verdict") {
    val rows = SparkEntry.queries("q_stats_ljung_box")(spark, sfDir).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getDouble(3)).distinct.length == 1,
      "q_lb is a single statistic broadcast onto every lag row")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      assert(r.getBoolean(4) == (r.getDouble(3) > 14.067140449340169))
    }
    // hand replay of rho_k from the collected daily census
    val daily = Tables.events(spark, sfDir)
      .selectExpr("(ts_ns div 1000) div 86400000000 AS day")
      .groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = daily.size
    val mean = daily.values.sum.toDouble / n
    val sxx = daily.values.map(c => c.toDouble * c).sum - n * mean * mean
    rows.foreach { r =>
      val k = r.getLong(0)
      val pairs = daily.keys.toSeq.sorted
        .flatMap(t => daily.get(t + k).map(y => (daily(t), y)))
      val num = pairs.map { case (x, y) => x.toLong * y }.sum -
        mean * (pairs.map(_._1).sum + pairs.map(_._2).sum) +
        pairs.length * mean * mean
      val rho = math.floor(num / sxx * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getDouble(2) - rho) <= 1e-6,
        s"lag $k: plan rho ${r.getDouble(2)} != replay $rho")
    }
  }

  test("neyman: allocations replay from the census and stay near budget") {
    val rows = SparkEntry.queries("q_sample_neyman")(spark, sfDir).collect()
    val nTotal = rows.map(_.getLong(1)).sum
    val wh = rows.map(r =>
      math.floor(r.getLong(1) * r.getDouble(2) * 1e6).toLong)
    val z = wh.sum
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(4) ==
        math.floor(1000.0 * wh(i) / z).toLong, "alloc_neyman replay")
      assert(r.getLong(5) ==
        math.floor(1000.0 * r.getLong(1) / nTotal).toLong, "alloc_prop replay")
    }
    // floor rounding per stratum undershoots by < 1 each
    assert(1000L - rows.map(_.getLong(4)).sum < rows.length)
    assert(1000L - rows.map(_.getLong(5)).sum < rows.length)
  }

  test("bleu: same pairs as rouge, bp <= 1, score replays from the overlaps") {
    val bleu = SparkEntry.queries("q_eval_bleu")(spark, sfDir).collect()
    val rougePairs = SparkEntry.queries("q_eval_rouge")(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bleu.map(r => (r.getLong(0), r.getLong(1))).toSet == rougePairs)
    bleu.foreach { r =>
      val (na, nb, o1, o2) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val bp = math.floor((if (nb >= na) 1.0
        else math.exp(1.0 - na.toDouble / nb)) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(6) == bp, "brevity penalty replay")
      val expect = if (nb > 1)
        math.floor(bp * math.sqrt((o1.toDouble / nb) *
          (o2.toDouble / (nb - 1))) * 1e6 + 0.5) / 1e6
      else 0.0
      assert(r.getDouble(7) == expect, "bleu2 replay")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0 + 1e-9)
    }
  }

  test("lpa: a partition of the graph's nodes, at least as fine as components") {
    val lpa = SparkEntry.queries("q_graph_lpa")(spark, sfDir).collect()
    val comp = SparkEntry.queries("q_graph_components")(spark, sfDir).collect()
    val nodes = comp.map(_.getLong(0)).toSet
    assert(lpa.map(_.getLong(1)).sum == nodes.size,
      "community sizes must sum to the node count (each node one label)")
    assert(lpa.forall(r => nodes.contains(r.getLong(0))),
      "every community label is a node id (init = id, min-label ties)")
    val nComponents = comp.map(_.getLong(1)).distinct.length
    assert(lpa.length >= nComponents,
      "labels cannot cross components, so LPA is >= as fine as components")
  }

  test("binary recall: priced below exact, above random chance") {
    val rows = SparkEntry.queries("q_eval_binary_recall")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 10L)
      val rc = r.getAs[Double]("recall")
      assert(rc >= 0.0 && rc <= 1.0)
      assert(math.abs(rc - r.getAs[Long]("n_hit") / 10.0) < 1e-9)
    }
    // 1-bit codes must retain SOME signal: random top-10 overlap on
    // ~500 vectors has expectation 0.02 — demand better than chance
    // on aggregate, but also less than perfect (the 32x cut has a cost)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean > 0.05, s"binary codes carry no signal: $mean")
    assert(mean < 1.0)
  }

  test("cluster purity: bounded metrics consistent with their censuses") {
    val r = SparkEntry.queries("q_eval_cluster_purity")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n")
    assert(n > 0 && r.getAs[Long]("n_cells") > 0)
    val purity = r.getAs[Double]("purity")
    // majority share is at least 1/|labels| and at most 1
    assert(purity > 0.0 && purity <= 1.0)
    val hc = r.getAs[Double]("h_cluster"); val hl = r.getAs[Double]("h_label")
    assert(hc >= 0.0 && hl >= 0.0)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9, s"NMI out of range: $nmi")
    // entropy bounds: H <= ln(k) for k clusters (4) / labels
    assert(hc <= math.log(4.0) + 1e-6)
  }

  test("probe sweep: monotone recall; depth 1 replays q_eval_ivf_recall") {
    val rows = SparkEntry.queries("q_eval_probe_sweep")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be non-decreasing in nprobe: ${recalls.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
      val rc = r.getAs[Double]("recall")
      assert(rc >= 0.0 && rc <= 1.0)
    }
    // nprobe=1 is exactly the operating point q_eval_ivf_recall prices
    val ivf = SparkEntry.queries("q_eval_ivf_recall")(spark, sfDir)
      .collect()
    assert(rows.head.getAs[Long]("n_hit") ==
      ivf.map(_.getAs[Long]("n_hit")).sum)
    assert(rows.head.getAs[Long]("n_exact") ==
      ivf.map(_.getAs[Long]("n_exact")).sum)
  }

  test("local bridges: listed edges really have zero common neighbors") {
    val rows = SparkEntry.queries("q_graph_local_bridges")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sums = rows.map(r => r.getAs[Long]("deg_x") + r.getAs[Long]("deg_y"))
    assert(sums.zip(sums.tail).forall { case (a, b) => a >= b })
    // triangle-freeness replay for the reported edges: neighbors of x
    // and y must be disjoint (minus each other)
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("x", "y")
    val adj = e.union(e.select(col("y").as("x"), col("x").as("y")))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.take(5).foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      assert((adj(x) - y).intersect(adj(y) - x).isEmpty,
        s"edge ($x,$y) has a common neighbor")
    }
  }

  test("mmr: 5 picks/query, relevance-first, monotone scores, diversity bites") {
    val rows = SparkEntry.queries("q_sim_mmr")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 3 && byQ.values.forall(_.length == 5))
    // pure relevance top-5 per query (replayed independently)
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val rel = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("rel_r", graft.Par.r6(expr("graft_dot(v, qv)")))
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("rel_r").desc, col("vec_id"))))
    val top1 = rel.filter(col("rn") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    val top5 = rel.filter(col("rn") <= 5).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("vec_id")).toSet }
    byQ.foreach { case (qid, picks) =>
      val ordered = picks.sortBy(_.getLong(1))
      // step 1 is the pure-relevance argmax (empty diversity term)
      assert(ordered.head.getLong(2) == top1(qid))
      // greedy scores are non-increasing (later picks were available
      // earlier at a score only shrunk by a growing selected set)
      val scores = ordered.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(ordered.map(_.getLong(2)).distinct.length == 5)
    }
    // the engineered near-dup clusters make pure top-5 redundant — MMR
    // must actually trade some of it away for at least one query
    assert(byQ.exists { case (qid, picks) =>
      picks.map(_.getLong(2)).toSet != top5(qid) },
      "MMR selected exactly the pure-relevance top-5 for every query")
  }

  test("map: ap in (0,1], hits bounded by min(10, n_rel), drops 0-hit queries") {
    val rows = SparkEntry.queries("q_eval_map")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 3)
    rows.foreach { r =>
      val (nRel, nHits, ap) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // a row only exists when the query had >= 1 hit in the top 10,
      // and AP of any non-empty hit set is strictly positive
      assert(nHits >= 1 && nHits <= math.min(10L, nRel))
      assert(ap > 0.0 && ap <= 1.0 + 1e-9)
      // perfect-prefix upper bound: AP = 1 requires every hit at the
      // earliest possible rank AND all of min(10, n_rel) hits present
      if (ap >= 1.0 - 1e-9) assert(nHits == math.min(10L, nRel))
    }
  }

  test("lift-gains: deciles partition, gains monotone to 1, top lift beats random") {
    val rows = SparkEntry.queries("q_eval_lift_gains")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("decile")).forall(dd => dd >= 1 && dd <= 10))
    val nt = rows.map(_.getAs[Long]("n")).sum
    val npos = rows.map(_.getAs[Long]("n_pos")).sum
    // deciles partition the scored corpus: last cumulative = totals
    assert(rows.last.getAs[Long]("cum_n") == nt)
    assert(rows.last.getAs[Long]("cum_pos") == npos)
    // ceiling cut: every decile holds ~N/10 rows (± the largest tied block)
    rows.foreach(r => assert(r.getAs[Long]("n") <= nt / 10 + nt / 20 + 2))
    // gains are a cumulative share: monotone non-decreasing, ending at 1
    val gains = rows.map(_.getAs[Double]("gain_r"))
    gains.zip(gains.tail).foreach { case (a, b) => assert(a <= b + 1e-9) }
    assert(math.abs(gains.last - 1.0) < 1e-5)
    // the classifier ranks better than random (train acc 0.838): the
    // top decile concentrates positives, the bottom dilutes them
    assert(rows.head.getAs[Double]("lift_r") > 1.0)
    assert(rows.head.getAs[Double]("lift_r") >=
      rows.last.getAs[Double]("lift_r"))
    // lift and gain agree: lift_d = gain_d * nt / cum_n
    rows.foreach { r =>
      val expect = r.getAs[Double]("gain_r") * nt / r.getAs[Long]("cum_n")
      assert(math.abs(r.getAs[Double]("lift_r") - expect) < 1e-3)
    }
  }

  test("woe-iv: terms replay from the census, IV verdict is the A/A null") {
    val rows = SparkEntry.queries("q_ml_woe_iv")(spark, sfDir).collect()
    assert(rows.length == 5)
    val g = rows.map(_.getAs[Long]("n_good")).sum.toDouble
    val b = rows.map(_.getAs[Long]("n_bad")).sum.toDouble
    var iv = 0.0
    rows.sortBy(_.getString(0)).foreach { r =>
      val (pg, pb) = (r.getAs[Long]("n_good") / g, r.getAs[Long]("n_bad") / b)
      assert(math.abs(r.getAs[Double]("woe_r") - math.log(pg / pb)) < 2e-6)
      assert(math.abs(r.getAs[Double]("iv_term_r") -
        (pg - pb) * r.getAs[Double]("woe_r")) < 2e-6)
      iv += r.getAs[Double]("iv_term_r")
    }
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("iv_total_r") - iv) < 1e-5)
      // TPC-H status is independent of segment: the feature is useless
      assert(r.getAs[String]("verdict") == "useless",
        s"iv=${r.getAs[Double]("iv_total_r")}")
    }
  }

  test("ks-score: gap bounded by [gini, 1], located at a real score, p consistent") {
    val r = SparkEntry.queries("q_eval_ks_score")(spark, sfDir)
      .collect().head
    val ks = r.getAs[Double]("ks_r")
    assert(ks > 0.0 && ks <= 1.0)
    // a classifier that ranks (train acc 0.838) separates the CDFs
    assert(ks > 0.1, s"ks=$ks")
    // KS >= |2·AUC − 1| is NOT an identity, but KS >= max CDF gap
    // implies AUC-consistency: check both read the same ranking sign
    val auc = SparkEntry.queries("q_eval_auroc")(spark, sfDir)
      .collect().head.getAs[Double]("auc")
    assert((auc > 0.5) == true && ks >= (2 * auc - 1) - 0.25)
    val p = r.getAs[Double]("p_r")
    val (np, nn) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    assert(math.abs(p - math.min(2.0 * math.exp(
      -2.0 * ks * ks * np.toDouble * nn / (np + nn)), 1.0)) < 2e-6)
    assert(r.getAs[Boolean]("separable") == (p < 0.05))
  }

  test("calibration-slope: replays from the scored frame, positive ranking sign") {
    val r = SparkEntry.queries("q_eval_calibration_slope")(spark, sfDir)
      .collect().head
    val slope = r.getAs[Double]("slope_r")
    val icpt = r.getAs[Double]("intercept_r")
    // the classifier ranks correctly (AUC > 0.5) ⇒ cov(p, y) > 0
    assert(slope > 0.0, s"slope=$slope")
    // replay the OLS from the scored frame in plain JVM arithmetic
    val sc = operators.TextOps.qclfTrain(spark, sfDir)
    val rows = sc.residuals(sc.w)
      .selectExpr("CAST(floor(p_r * 1000000 + 0.5) AS BIGINT) AS pm", "y")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = rows.length.toLong
    val sp = rows.map(_._1).sum
    val spp = rows.map(x => BigInt(x._1) * x._1).sum
    val spy = rows.map(x => x._1 * x._2).sum
    val sy = rows.map(_._2).sum
    val eSlope = (BigInt(n) * spy - BigInt(sp) * sy).toDouble /
      (BigInt(n) * spp - BigInt(sp) * sp).toDouble * 1e6
    assert(math.abs(slope - eSlope) < 1e-4, s"$slope vs $eSlope")
    val eIcpt = (sy.toDouble - slope * (sp.toDouble / 1e6)) / n
    assert(math.abs(icpt - eIcpt) < 1e-4)
    // fitted mean matches prevalence: ŷ at p̄ equals ȳ by OLS identity
    val yhat = icpt + slope * (sp.toDouble / 1e6 / n)
    assert(math.abs(yhat - sy.toDouble / n) < 1e-3)
    assert(r.getAs[Boolean]("well_calibrated") ==
      (math.abs(slope - 1.0) < 0.25 && math.abs(icpt) < 0.1))
  }

  test("slice-audit: census partitions the corpus, z replays, flags one-sided") {
    val rows = SparkEntry.queries("q_eval_slice_audit")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs)
    val accAll = rows.head.getAs[Double]("acc_all_r")
    val ctTot = rows.map(_.getAs[Long]("n_correct")).sum
    assert(math.abs(accAll - ctTot.toDouble / nDocs) < 1e-5)
    rows.foreach { r =>
      val (n, nc) = (r.getAs[Long]("n"), r.getAs[Long]("n_correct"))
      assert(nc >= 0 && nc <= n)
      val acc = r.getAs[Double]("acc_r")
      assert(math.abs(acc - nc.toDouble / n) < 1e-5)
      val z = (acc - accAll) / math.sqrt(accAll * (1 - accAll) / n)
      assert(math.abs(r.getAs[Double]("z_r") - z) < 1e-4)
      // one-sided: an OVERperforming slice never flags
      if (acc >= accAll) assert(!r.getAs[Boolean]("underperforms"))
      assert(r.getAs[Boolean]("underperforms") ==
        (r.getAs[Double]("z_r") < -1.9599639845400545))
    }
  }

  test("ess: bounded by (1, n], replays from the weights, clip priced") {
    val r = SparkEntry.queries("q_sample_ess")(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_docs")
    assert(n == Tables.documents(spark, sfDir).count())
    val ess = r.getAs[Double]("ess_r")
    // ESS ∈ (0, n]; equality only under exactly uniform weights
    assert(ess > 0.0 && ess <= n + 1e-6)
    assert(math.abs(r.getAs[Double]("ess_frac_r") - ess / n) < 1e-5)
    assert(r.getAs[Long]("n_clipped") >= 0 &&
      r.getAs[Long]("n_clipped") <= n)
    // replay from the top-50 chain's own scores on a sample: weights
    // are a deterministic function of score_r, so ESS must be at most
    // n and strictly less than n when any two scores differ
    val scores = SparkEntry.queries("q_sample_dsir")(spark, sfDir)
      .select("score_r").collect().map(_.getDouble(0))
    if (scores.distinct.length > 1) assert(ess < n - 1e-6)
    assert(r.getAs[Boolean]("degenerate") == (ess / n < 0.1))
  }

  test("rbo: bounded by the truncated-sum maximum; zero iff no depth-10 overlap") {
    val rows = SparkEntry.queries("q_eval_rbo")(spark, sfDir).collect()
    assert(rows.length == 3)
    // (1-p) * sum_{d=1..10} p^(d-1) = 1 - 0.9^10 — the depth-truncated
    // RBO of two IDENTICAL rankings; nothing can score above it
    val maxRbo = 1.0 - math.pow(0.9, 10)
    rows.foreach { r =>
      val (overlap10, rbo) = (r.getLong(1), r.getDouble(2))
      assert(overlap10 >= 0 && overlap10 <= 10)
      assert(rbo >= 0.0 && rbo <= maxRbo + 1e-9)
      // X_d is monotone non-decreasing in d, so any overlap at all
      // surfaces at depth 10, and RBO > 0 exactly then
      assert((rbo > 0.0) == (overlap10 > 0),
        s"rbo=$rbo with overlap10=$overlap10")
    }
  }
}
