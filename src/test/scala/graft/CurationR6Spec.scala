package graft

import org.apache.spark.sql.functions._

/** Round-6 session-3 additions: weighted median, mixing planner,
  * prefix-filtered set-similarity join. Invariants and cross-operator
  * parity here; exact values are oracle-checked by Verify. */
class CurationR6Spec extends SparkSpec {

  test("q_agg_weighted_median matches a brute-force weighted median") {
    val rows = SparkEntry.queries("q_agg_weighted_median")(spark, sfDir)
      .collect()
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("price"),
        col("l_quantity").cast("long").as("wq"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val grp = li.filter(_._1 == flag).sortBy(_._2)
      val tot = grp.map(_._3).sum
      var cum = 0L
      val expect = grp.find { case (_, _, w) =>
        cum += w; 2 * cum >= tot
      }.get._2
      val expectR2 = math.floor(expect * 100 + 0.5) / 100
      assert(r.getAs[Double]("wmedian") === expectR2, s"flag $flag")
      assert(r.getAs[Long]("totw") === tot)
    }
  }

  test("q_pipeline_mix plan respects the epoch cap and the budget") {
    val rows = SparkEntry.queries("q_pipeline_mix")(spark, sfDir).collect()
    val planned = rows.map(_.getAs[Long]("planned_tokens")).sum
    val targets = rows.map(_.getAs[Long]("target_tokens")).sum
    val avail = rows.map(_.getAs[Long]("avail_tokens")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("planned_tokens") <=
        4 * r.getAs[Long]("avail_tokens"), "epoch cap")
      assert(r.getAs[Double]("epochs") <= 4.0001)
      assert(r.getAs[Double]("mix_share") > 0.0)
    }
    // per-source targets are floors of budget shares: their sum cannot
    // exceed the budget (= half the gated pool), and redistribution
    // never plans more than was targeted
    assert(targets <= avail / 2 + rows.length, "targets within budget")
    assert(planned <= targets + rows.length, "redistribution is bounded")
    val shares = rows.map(_.getAs[Double]("mix_share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to 1, got $shares")
  }

  test("q_text_search_phrase finds exactly the brute-force adjacencies") {
    val hits = SparkEntry.queries("q_text_search_phrase")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits"))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    docs.foreach { r =>
      val toks = r.getAs[String]("text").split(" ")
      val n = toks.indices.dropRight(1)
        .count(i => toks(i) == "hash" && toks(i + 1) == "join").toLong
      assert(hits.getOrElse(r.getAs[Long]("doc_id"), 0L) === n,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("q_text_search_boolean matches brute-force boolean retrieval") {
    val got = SparkEntry.queries("q_text_search_boolean")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .filter { r =>
        val t = r.getAs[String]("text").split(" ").toSet
        t("spark") && t("vector") && !t("dup")
      }.map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("q_stats_changepoint scores match brute force over the day census") {
    val rows = SparkEntry.queries("q_stats_changepoint")(spark, sfDir)
      .collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(rows.length === daily.length - 1, "one candidate per non-first day")
    rows.foreach { r =>
      val day = r.getAs[Long]("split_day")
      val (before, after) = daily.partition(_._1 < day)
      val (n1, n2) = (before.length.toLong, after.length.toLong)
      val m1 = before.map(_._2).sum.toDouble / n1
      val m2 = after.map(_._2).sum.toDouble / n2
      val score = n1 * n2 / (n1 + n2).toDouble * (m1 - m2) * (m1 - m2)
      assert(r.getAs[Long]("n1") === n1 && r.getAs[Long]("n2") === n2)
      assert(r.getAs[Double]("score") ===
        math.floor(score * 1e6 + 0.5) / 1e6, s"day $day")
    }
  }

  test("q_sample_kcenter: k distinct centers, non-increasing radii") {
    val rows = SparkEntry.queries("q_sample_kcenter")(spark, sfDir)
      .collect()
    assert(rows.length === 8)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === 8,
      "centers are distinct points")
    val radii = rows.sortBy(_.getAs[Int]("round")).map(_.getAs[Double]("radius"))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"coverage radius must be non-increasing: $a -> $b")
    }
    val minId = Tables.embeddings(spark, sfDir)
      .agg(min(col("vec_id"))).head().getLong(0)
    assert(rows.minBy(_.getAs[Int]("round")).getAs[Long]("vec_id") === minId,
      "deterministic smallest-id start")
  }

  test("q_sample_neyman allocations stay within budget and favor variance") {
    val rows = SparkEntry.queries("q_sample_neyman")(spark, sfDir).collect()
    val neyman = rows.map(_.getAs[Long]("alloc_neyman")).sum
    val prop = rows.map(_.getAs[Long]("alloc_prop")).sum
    assert(neyman <= 1000 && neyman > 1000 - rows.length,
      "floored allocations sum to within one unit per stratum of budget")
    assert(prop <= 1000 && prop > 1000 - rows.length)
    val shares = rows.map(_.getAs[Double]("w_share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("q_graph_modularity: component partition accounts for every edge") {
    val rows = SparkEntry.queries("q_graph_modularity")(spark, sfDir)
      .collect()
    val m = rows.map(_.getAs[Long]("intra_edges")).sum
    val degSum = rows.map(_.getAs[Long]("deg_sum")).sum
    assert(degSum === 2 * m,
      "degree sum over all communities must equal 2m (handshake lemma; " +
        "for a component partition every edge is intra)")
    rows.foreach { r =>
      assert(r.getAs[Double]("contribution") <= 1.0)
      assert(r.getAs[Long]("n_nodes") >= 2, "components come from edges")
    }
  }

  test("q_dedup_prefix_filter is bit-identical to the all-pairs baseline") {
    val pruned = SparkEntry.queries("q_dedup_prefix_filter")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val full = SparkEntry.queries("q_dedup_near")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(pruned === full,
      "prefix filtering must be a complete candidate generator")
  }
}
