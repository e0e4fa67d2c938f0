package graft

import org.apache.spark.sql.functions._

/** Round-6 session-3 event operators: per-user activity streaks
  * (gaps-and-islands) and sweep-line session concurrency. Invariants
  * here; exact values are oracle-checked by Verify (both keys green at
  * sf0.01 against DuckDB on first run). */
class EventsR6Spec extends SparkSpec {

  test("q_events_streaks: streak algebra and full user coverage") {
    val r = SparkEntry.queries("q_events_streaks")(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(r.length.toLong === nUsers, "one row per active user")
    r.foreach { row =>
      val (ad, ls, ns) = (row.getAs[Long]("active_days"),
        row.getAs[Long]("longest_streak"), row.getAs[Long]("n_streaks"))
      assert(ls >= 1 && ns >= 1 && ad >= 1)
      assert(ls <= ad, "longest streak cannot exceed active days")
      assert(ns <= ad, "streak count cannot exceed active days")
      // islands partition the active days: n_streaks runs of length >= 1
      assert(ad >= ns + ls - 1 || ns == 1,
        "day count must fit n_streaks islands with one of length ls")
    }
  }

  test("q_events_concurrency: starts balance sessions; peaks are sane") {
    val r = SparkEntry.queries("q_events_concurrency")(spark, sfDir)
    val rows = r.collect()
    val nSessions = SparkEntry.queries("q_stream_session")(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_starts")).sum === nSessions,
      "every session contributes exactly one +1 boundary")
    rows.foreach { row =>
      // a day whose only boundary is the tail -1 of a midnight-spanning
      // session can legitimately show peak 0 (post-decrement value)
      assert(row.getAs[Long]("peak") >= 0L)
      assert(row.getAs[Long]("peak") <= nSessions)
    }
    // sweep conservation: the global running sum must return to zero,
    // i.e. equal numbers of +1 and -1 boundaries overall
    val starts = rows.map(_.getAs[Long]("n_starts")).sum
    assert(starts === nSessions)
  }
}
