package graft

import org.apache.spark.sql.functions._

/** Round-6 training-data-pipeline additions: SemDeDup-style semantic
  * dedup, repetition-aware sampling weights, DSIR importance selection,
  * quality-aware cluster representatives, leakage-free group split.
  * Invariant tests here; exact values are oracle-checked by Verify. */
class PipelineR6Spec extends SparkSpec {

  test("q_dedup_semantic partitions the corpus and drops within clusters only") {
    val r = SparkEntry.queries("q_dedup_semantic")(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("members")).sum === nVecs,
      "cluster members must partition the corpus")
    r.foreach { row =>
      val (m, p, dr) = (row.getAs[Long]("members"),
        row.getAs[Long]("n_pairs"), row.getAs[Long]("n_dropped"))
      assert(dr <= p, "each dropped vec needs at least one pair")
      assert(dr < m, "a cluster always keeps at least one representative")
    }
  }

  test("q_sample_rep_weight covers every doc once with weight 1/size") {
    val r = SparkEntry.queries("q_sample_rep_weight")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "size buckets must cover the corpus exactly once")
    r.foreach { row =>
      val expected = math.floor(1.0 / row.getAs[Long]("size") * 1e6 + 0.5) / 1e6
      assert(row.getAs[Double]("weight_r") === expected)
    }
  }

  test("q_sample_dsir ranks target-likelier docs first, deterministically") {
    val df = SparkEntry.queries("q_sample_dsir")(spark, sfDir)
    val r = df.collect()
    assert(r.length === 50)
    val scores = r.map(_.getAs[Double]("score_r"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "selection must be ordered by descending importance score")
    val again = SparkEntry.queries("q_sample_dsir")(spark, sfDir).collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "hash-bucket scoring must be run-to-run deterministic")
  }

  test("q_dedup_keep_best keeps the max-quality member of every cluster") {
    val keep = SparkEntry.queries("q_dedup_keep_best")(spark, sfDir).collect()
    val clus = SparkEntry.queries("q_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep"))
    val qual = SparkEntry.queries("q_text_quality")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val members = clus.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(keep.length === members.size, "one keeper per cluster")
    keep.foreach { row =>
      val ms = members(row.getAs[Long]("cluster_rep"))
      val kd = row.getAs[Long]("keep_doc")
      assert(ms.contains(kd), "keeper must be a cluster member")
      assert(row.getAs[Long]("n_members") === ms.length.toLong)
      val best = ms.map(qual).max
      assert(qual(kd) === best, "keeper must have the max quality")
      assert(row.getAs[Double]("keep_quality_r") === best)
      assert(kd === ms.filter(m => qual(m) == best).min,
        "ties must break to the smallest doc_id")
    }
  }

  test("q_sample_split_leakfree: groups never straddle splits; naive split leaks") {
    def firstHex(x: Long): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
    }
    def splitOf(c: Char): String =
      if (c == 'c' || c == 'd') "val"
      else if (c == 'e' || c == 'f') "test" else "train"
    val clus = SparkEntry.queries("q_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_rep"))
    val r = SparkEntry.queries("q_sample_split_leakfree")(spark, sfDir)
      .collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "splits must cover the corpus exactly once")
    // every group lands in ONE split by construction (its key is the
    // shared cluster rep), so group counts must partition exactly:
    // clusters + singleton docs
    val nClusters = clus.map(_._2).distinct.length.toLong
    val nSingles = nDocs - clus.length
    assert(r.map(_.getAs[Long]("n_groups")).sum === nClusters + nSingles)
    // and per split, the docs of that split's clusters all hash with the
    // rep: replay the assignment in Scala and compare the census
    val repOf = clus.toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val expected = docs.groupBy(d =>
      splitOf(firstHex(repOf.getOrElse(d, d))))
      .view.mapValues(_.length.toLong).toMap
    r.foreach { row =>
      assert(row.getAs[Long]("n_docs") ===
        expected(row.getAs[String]("split")))
    }
    // the property only matters if the naive per-doc split would leak:
    // this corpus must have at least one cluster whose members straddle
    val naiveLeaky = clus.groupBy(_._2).values
      .count(ms => ms.map(m => splitOf(firstHex(m._1))).toSet.size > 1)
    assert(naiveLeaky > 0,
      "corpus no longer exhibits naive-split leakage — test lost its bite")
  }

  test("q_events_lateness buckets census the stream with bounded lateness") {
    val r = SparkEntry.queries("q_events_lateness")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n")).sum === nEvents,
      "lateness buckets must cover every event exactly once")
    assert(math.abs(r.map(_.getAs[Double]("pct")).sum - 1.0) < 1e-3)
    val ids = r.map(_.getAs[Int]("bucket_id"))
    assert(ids.sorted.sameElements(ids) && ids.distinct.length === ids.length)
    // bucket upper bounds in µs (bucket 0 = exactly on time); the
    // injected network delay is < 120 s so bucket 5 must be empty
    val hi = Map(0 -> 0L, 1 -> 1000000L, 2 -> 10000000L,
      3 -> 60000000L, 4 -> 120000000L)
    r.foreach { row =>
      val b = row.getAs[Int]("bucket_id")
      assert(b <= 4, "jitter < 120 s can never produce >120 s lateness")
      assert(row.getAs[Long]("max_late_us") <= hi(b))
    }
    // disorder must actually be injected, or the audit audits nothing
    assert(r.exists(row => row.getAs[Int]("bucket_id") > 0))
  }

  test("q_sample_global_shuffle is a balanced deterministic permutation") {
    val r = SparkEntry.queries("q_sample_global_shuffle")(spark, sfDir)
      .collect()
    val n = r.length.toLong
    assert(r.map(_.getAs[Long]("pos")).sorted.sameElements(1L to n),
      "positions must be a permutation of 1..N")
    r.foreach { row =>
      val pos = row.getAs[Long]("pos")
      assert(row.getAs[Int]("shard") === ((pos - 1) % 8).toInt)
      assert(row.getAs[Long]("shard_pos") === (pos - 1) / 8)
    }
    val sizes = r.groupBy(_.getAs[Int]("shard")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, "round-robin shards balance to ±1")
    // the shuffle must not be the identity order (that would mean the
    // md5 key degenerated)
    assert(!r.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id"))
      .sameElements(r.map(_.getAs[Long]("doc_id")).sorted))
    val again = SparkEntry.queries("q_sample_global_shuffle")(spark, sfDir)
      .collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q_text_token_budget cells census the corpus and shares sum to 1") {
    val r = SparkEntry.queries("q_text_token_budget")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "every doc lands in exactly one (source, band) cell")
    assert(r.map(_.getAs[String]("band")).toSet
      .subsetOf(Set("high", "mid", "low")))
    assert(math.abs(r.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    r.foreach(row => assert(row.getAs[Long]("n_tokens") > 0))
  }

  test("q_text_dataset_diff statuses replay the md5 snapshot slices") {
    val r = SparkEntry.queries("q_text_dataset_diff")(spark, sfDir)
      .collect().map(row => row.getAs[String]("status") ->
        row.getAs[Long]("n_docs")).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val oldD = "0123456789ab".toSet
    val newD = "456789abcdef".toSet
    var exp = Map("added" -> 0L, "removed" -> 0L, "modified" -> 0L,
      "unchanged" -> 0L)
    ids.foreach { id =>
      val h = md5hex(id.toString)
      val (inOld, inNew) = (oldD(h(0)), newD(h(0)))
      val st =
        if (inOld && !inNew) "removed"
        else if (!inOld && inNew) "added"
        else if (h(1) == '0') "modified"
        else "unchanged"
      exp = exp.updated(st, exp(st) + 1)
    }
    exp.filter(_._2 > 0).foreach { case (st, n) =>
      assert(r.getOrElse(st, 0L) === n, s"status $st")
    }
    assert(r.values.sum === ids.length.toLong,
      "old ∪ new covers the whole corpus by construction")
  }

  test("q_embed_pq codes partition every vector in every subspace") {
    val r = SparkEntry.queries("q_embed_pq")(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    val byM = r.groupBy(_.getAs[Long]("m"))
    assert(byM.keySet === (0L to 7L).toSet, "8 subspaces of 8 dims")
    byM.foreach { case (m, rows) =>
      assert(rows.map(_.getAs[Long]("n_vecs")).sum === nVecs,
        s"subspace $m: every vector takes exactly one code")
      assert(rows.map(_.getAs[Long]("code")).forall(c => c >= 0 && c < 4))
      rows.foreach(row => assert(row.getAs[Double]("mse_r") >= 0.0))
    }
    val again = SparkEntry.queries("q_embed_pq")(spark, sfDir).collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "codebook training must be run-to-run deterministic")
  }

  test("q_text_vocab_drift internal identities hold") {
    val r = SparkEntry.queries("q_text_vocab_drift")(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (vo, vn) = (row.getAs[Long]("n_vocab_old"),
      row.getAs[Long]("n_vocab_new"))
    assert(vo > 0 && vn > 0)
    assert(row.getAs[Long]("n_oov") <= vn)
    assert(row.getAs[Long]("n_lost") <= vo)
    assert(row.getAs[Double]("oov_rate_r") ===
      math.floor(row.getAs[Long]("n_oov").toDouble / vn * 1e6 + 0.5) / 1e6)
    val tv = row.getAs[Double]("tv_drift_r")
    assert(tv >= 0.0 && tv <= 1.0, "total variation lives in [0, 1]")
  }

  test("q_eval_pq_recall audits ADC retrieval against the exact top-10") {
    val r = SparkEntry.queries("q_eval_pq_recall")(spark, sfDir).collect()
    assert(r.length === 1)
    val hits = r.head.getAs[Long]("n_hits")
    assert(hits >= 0L && hits <= 10L)
    assert(r.head.getAs[Double]("recall_r") ===
      math.floor(hits / 10.0 * 1e6 + 0.5) / 1e6)
    val again = SparkEntry.queries("q_eval_pq_recall")(spark, sfDir)
      .collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("q_join_fuzzy resolves every record; clean ones to themselves") {
    val r = SparkEntry.queries("q_join_fuzzy")(spark, sfDir).collect()
    val nSup = Tables.supplier(spark, sfDir).count()
    assert(r.length.toLong === nSup,
      "blocking must never lose a record (block key is edit-stable)")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    r.foreach { row =>
      val id = row.getAs[Long]("rec_id")
      val perturbed = "01234567".contains(md5hex(id.toString)(0))
      if (perturbed) {
        assert(row.getAs[Int]("lev") === 1, s"rec $id: corrupted name is 1 edit away")
      } else {
        assert(row.getAs[Long]("resolved_key") === id,
          s"rec $id: clean name must resolve to itself")
        assert(row.getAs[Int]("lev") === 0)
      }
      assert(row.getAs[Long]("n_candidates") >= 1L)
    }
  }

  test("q_pipeline_export lays out exactly the curated corpus") {
    val exp = SparkEntry.queries("q_pipeline_export")(spark, sfDir).collect()
    val cur = SparkEntry.queries("q_pipeline_curate")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exp.map(_.getAs[Long]("doc_id")).toSet === cur,
      "export manifest must cover the curated docs exactly")
    val n = exp.length.toLong
    assert(exp.map(_.getAs[Long]("pos")).sorted.sameElements(1L to n))
    exp.foreach { row =>
      val pos = row.getAs[Long]("pos")
      assert(row.getAs[Int]("shard") === ((pos - 1) % 4).toInt)
      assert(row.getAs[Long]("shard_pos") === (pos - 1) / 4)
      assert(row.getAs[Int]("n_tok") > 0)
    }
    val sizes = exp.groupBy(_.getAs[Int]("shard")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("q_eval_quantile_sample estimates carry their own error audit") {
    val r = SparkEntry.queries("q_eval_quantile_sample")(spark, sfDir)
      .collect()
    assert(r.length === 1)
    val row = r.head
    def g(c: String) = row.getAs[Double](c)
    assert(g("err_p50") ===
      math.floor(math.abs(g("est_p50") - g("true_p50")) * 1e6 + 0.5) / 1e6)
    assert(g("err_p95") ===
      math.floor(math.abs(g("est_p95") - g("true_p95")) * 1e6 + 0.5) / 1e6)
    // a uniform 256-sample of a smooth price distribution lands within
    // ~10% of the exact quantile — calibration, not luck
    assert(g("err_p50") / g("true_p50") < 0.1)
    assert(g("err_p95") / g("true_p95") < 0.1)
  }
}
