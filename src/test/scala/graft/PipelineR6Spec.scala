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
}
