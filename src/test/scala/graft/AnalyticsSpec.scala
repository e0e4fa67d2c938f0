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

  test("session stats: bounces never exceed sessions, durations nonneg") {
    val df = operators.EventOps.queries("q_events_session_stats")(spark, sfDir)
    assert(df.filter(col("n_bounce") > col("n_sessions") ||
      col("bounce_rate") < 0 || col("bounce_rate") > 1 ||
      col("avg_dur_s") < 0).count() == 0)
    assert(df.count() >= 25) // one month of events → ~30 day rows
  }
}
