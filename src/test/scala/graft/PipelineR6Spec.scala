package graft

import org.apache.spark.sql.functions._

/** Round-6 training-data-pipeline additions: SemDeDup-style semantic
  * dedup, repetition-aware sampling weights, DSIR importance selection.
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
}
