package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-3 text-quality additions (repetition
  * scoring, keyword extraction, containment subsumption). */
class TextQualitySpec extends SparkSpec {

  test("repetition ratios are in [0,1] and keep is a real split") {
    val df = operators.TextOps.queries("q_text_repetition")(spark, sfDir)
    assert(df.filter(col("dup_ratio") < -1e-9 || col("dup_ratio") > 1.0 ||
      col("top_bigram_frac") < -1e-9 || col("top_bigram_frac") > 1.0)
      .count() == 0)
    val keeps = df.groupBy("keep").count().collect().map(_.getInt(0)).toSet
    assert(keeps == Set(0, 1), s"keep flag is degenerate: $keeps")
  }

  test("keywords: exactly <=3 per doc, rank contiguous, score nonneg") {
    val df = operators.TextOps.queries("q_text_keywords")(spark, sfDir)
    val byDoc = df.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max(col("rk")).as("mx"))
    assert(byDoc.filter(col("k") =!= col("mx") || col("k") > 3).count() == 0)
    assert(df.filter(col("score") < 0).count() == 0)
  }

  test("containment: subsumed iff n_super>0; engineered near-dups exist") {
    val df = operators.TextOps.queries("q_dedup_containment")(spark, sfDir)
    assert(df.filter((col("subsumed") === 1) =!= (col("n_super") > 0))
      .count() == 0)
    // the corpus has engineered near-duplicates → some doc is subsumed
    assert(df.filter(col("subsumed") === 1).count() > 0)
  }

  test("mcnemar: 2x2 partitions the corpus, agrees with classifier acc") {
    val m = operators.TextOps.queries("q_eval_mcnemar")(spark, sfDir)
      .collect().head
    val cells = Seq("n_agree_keep", "n_agree_drop", "n_b", "n_c")
      .map(m.getAs[Long](_))
    val clf = operators.TextOps
      .queries("q_text_quality_classifier")(spark, sfDir).collect().head
    // the four cells partition the docs; diagonal = classifier accuracy
    assert(cells.sum == clf.getAs[Long]("n_docs"))
    assert(cells(0) + cells(1) == clf.getAs[Long]("n_correct"))
    val b = cells(2).toDouble; val c = cells(3).toDouble
    if (b + c > 0) {
      val chi2 = (b - c) * (b - c) / (b + c)
      assert(math.abs(m.getAs[Double]("chi2_r") - chi2) < 1e-4)
      assert(m.getAs[Boolean]("asymmetric") ==
        (m.getAs[Double]("chi2_r") > 3.8414588206941245))
    }
  }

  test("cms audit: estimates never undercount; census covers the vocab") {
    val r = operators.TextOps.queries("q_eval_cms_error")(spark, sfDir)
      .collect().head
    val nTok = r.getAs[Long]("n_tokens")
    assert(nTok > 0 && r.getAs[Long]("n_stream") > nTok)
    // CMS overestimates only: max_err >= avg_err >= 0
    assert(r.getAs[Long]("max_err") >= 0L)
    assert(r.getAs[Double]("avg_err") >= 0.0)
    assert(r.getAs[Long]("max_err") >= r.getAs[Double]("avg_err").toLong)
    assert(r.getAs[Long]("n_exact") <= nTok)
    assert(r.getAs[Long]("n_within_bound") <= nTok)
    // vocab census equals the corpus' distinct whitespace tokens
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).collect().head.getLong(0)
    assert(nTok == vocab)
  }

  test("llr: nonnegative, sorted, min support, and volume-aware vs pmi") {
    val rows = operators.TextOps.queries("q_text_llr")(spark, sfDir)
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("k11") >= 5L)
      assert(r.getAs[Double]("llr") >= -1e-6, "Dunning LLR is nonnegative")
    }
    val scores = rows.map(_.getAs[Double]("llr"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // LLR favors volume: its top pair must carry at least the bigram
    // count of PMI's top pair (PMI maxes out on rare-word pairs)
    val pmiTop = operators.TextOps.queries("q_text_pmi")(spark, sfDir)
      .collect().head.getAs[Long]("cab")
    assert(rows.head.getAs[Long]("k11") >= pmiTop)
  }

  test("readability: censuses consistent, FORCAST grade from its inputs") {
    val df = operators.TextOps.queries("q_text_readability")(spark, sfDir)
    assert(df.count() > 0)
    // mono words are a subset of words; each word has >= 1 vowel group
    // in this vocab, so syllables >= words >= mono
    assert(df.filter(col("n_mono") > col("n_words") ||
      col("n_syll") < col("n_words")).count() == 0)
    assert(df.filter(col("syll_per_word") < 1.0).count() == 0)
    // grade = 20 - 15*mono/words replayed row-wise
    val bad = df.filter(abs(col("forcast_grade") -
      (lit(20.0) - lit(15.0) * col("n_mono").cast("double") /
        col("n_words"))) > 1e-5)
    assert(bad.count() == 0)
    assert(df.filter(col("forcast_grade") < 5.0 ||
      col("forcast_grade") > 20.0).count() == 0)
  }
}
