package graft

import java.sql.Timestamp
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

case class Doc(doc_id: Long, ts: Timestamp, text: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** The sf0.001 events corpus as Ev rows, in event-time order. The NTZ
    * wall time is pinned to UTC explicitly — Timestamp.valueOf would
    * interpret it in the host JVM's default zone, making event order
    * DST-dependent on non-UTC hosts. */
  private def loadEvs(): Seq[Ev] = Tables.events(spark, sfDir)
    .orderBy("ts_ns", "event_id")
    .select("event_id", "ts", "user_id", "event_type", "value", "props")
    .collect()
    .map(r => Ev(r.getLong(0),
      java.sql.Timestamp.from(r.getAs[java.time.LocalDateTime](1)
        .toInstant(java.time.ZoneOffset.UTC)),
      r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
    .toSeq

  private def t(s: String) = Timestamp.valueOf(s)
  private def ev(id: Long, ts: String, uid: Long = 1, typ: String = "click",
      v: Double = 1.0) = Ev(id, t(ts), uid, typ, v, "{\"k\": 1}")

  test("tumbling streaming aggregation counts per hour/type") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("t_tumbling")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:45:00"),
        ev(3, "2024-01-01 11:05:00", typ = "view"))
      q.processAllAvailable()
      val rows = spark.table("t_tumbling")
        .select("h", "event_type", "cnt").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows === Set(
        ("2024-01-01 10:00:00.0", "click", 2L),
        ("2024-01-01 11:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("watermark drops late data beyond 10 minutes") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("t_late")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      ms.addData(ev(2, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      // late row for the 10:00 window — must be dropped
      ms.addData(ev(3, "2024-01-01 10:06:00"))
      q.processAllAvailable()
      val cnt10 = spark.table("t_late")
        .filter(col("h") === t("2024-01-01 10:00:00"))
        .select("cnt").as[Long].collect().max
      assert(cnt10 === 1L, "late event must not update the closed window")
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases within 30 minutes") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.intervalJoin(ms.toDF())
      .writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    try {
      ms.addData(
        ev(1, "2024-01-01 10:00:00", uid = 1, typ = "click"),
        ev(2, "2024-01-01 10:20:00", uid = 1, typ = "purchase", v = 9.5),
        ev(3, "2024-01-01 11:30:00", uid = 1, typ = "purchase", v = 1.0),
        ev(4, "2024-01-01 10:10:00", uid = 2, typ = "purchase", v = 3.0))
      q.processAllAvailable()
      // advance both watermarks so joined results are emitted (append mode
      // holds rows until the state can no longer change)
      ms.addData(ev(9, "2024-01-01 13:00:00", uid = 9, typ = "click"),
        ev(10, "2024-01-01 13:00:00", uid = 9, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("t_ssjoin")
        .select("user_id", "click_id", "purchase_id", "amount").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // in-band purchase joins; the 90-min-later one and the other-user
      // one do not (user 9's same-instant pair also joins — it advances
      // the watermark)
      assert(rows === Set((1L, 1L, 2L, 9.5), (9L, 9L, 10L, 1.0)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks after watermark") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.intervalJoinLeft(ms.toDF())
      .writeStream.format("memory").queryName("t_ssjoin_left")
      .outputMode("append").start()
    try {
      ms.addData(
        ev(1, "2024-01-01 10:00:00", uid = 1, typ = "click"),
        ev(2, "2024-01-01 10:20:00", uid = 1, typ = "purchase", v = 9.5),
        ev(3, "2024-01-01 10:00:00", uid = 2, typ = "click")) // never converts
      q.processAllAvailable()
      // push the watermark far past 10:30 so user 2's click provably has
      // no in-band purchase and the null-extended row can be emitted
      ms.addData(ev(9, "2024-01-01 15:00:00", uid = 9, typ = "click"),
        ev(10, "2024-01-01 15:00:00", uid = 9, typ = "purchase"))
      q.processAllAvailable()
      ms.addData(ev(11, "2024-01-01 20:00:00", uid = 8, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("t_ssjoin_left")
        .select("user_id", "click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, 1L, 2L)), s"matched click missing: $rows")
      assert(rows.contains((2L, 3L, -1L)), s"unmatched click missing: $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dedup(ms.toDF())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:00"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      ms.addData(ev(1, "2024-01-01 10:00:30")) // replay within watermark
      q.processAllAvailable()
      assert(spark.table("t_dedup").count() === 2)
    } finally q.stop()
  }

  test("batch lateness-audit predicate predicts streaming watermark drops") {
    implicit val sc = spark.sqlContext
    // Dense synthetic burst under the SAME md5 jitter law as
    // q_events_lateness: 10 s event spacing, arrival delay in [0, 120 s)
    // — jitter ≫ spacing, so the replay is heavily out of order.
    def jitterUs(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 120000000L
    }
    val baseUs = t("2024-01-01 10:00:00").getTime * 1000L
    val evs = (1L to 60L)
      .map(i => (i, baseUs + i * 10000000L))
      .map { case (i, tsUs) => (i, tsUs, tsUs + jitterUs(i)) }
      .sortBy { case (i, _, arrUs) => (arrUs, i) }
    // The audit's predicate, replayed sequentially: an event is dropped
    // iff its lateness (running max of event time over arrival order,
    // minus its own event time) reaches the candidate delay. Spark's
    // watermark arithmetic runs in ms, and the admission check is
    // INCLUSIVE (event time == watermark is already late) — pinned here
    // deliberately: the 10 s event grid makes some lateness hit the 30 s
    // boundary exactly, so a strict `<` prediction undercounts.
    val delayMs = 30000L
    var maxMs = Long.MinValue
    var predicted = 0
    evs.foreach { case (_, tsUs, _) =>
      val tsMs = tsUs / 1000
      if (maxMs != Long.MinValue && tsMs <= maxMs - delayMs) predicted += 1
      maxMs = math.max(maxMs, tsMs)
    }
    assert(predicted > 5, "burst must actually produce late arrivals")
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dedup(ms.toDF(), "30 seconds")
      .writeStream.format("memory").queryName("t_lateness_parity")
      .outputMode("append").start()
    try {
      // numRowsDroppedByWatermark is per-batch; fold recentProgress into
      // a batchId-keyed map after every event so no batch's count is
      // lost to the bounded progress retention window
      val drops = scala.collection.mutable.Map.empty[Long, Long]
      evs.foreach { case (i, tsUs, _) =>
        val ts = new Timestamp(tsUs / 1000)
        ts.setNanos(((tsUs % 1000000L) * 1000L).toInt)
        ms.addData(Ev(i, ts, 1L, "click", 1.0, "{}"))
        q.processAllAvailable()   // one event per micro-batch: the
                                  // watermark advances between every event,
                                  // matching the audit's per-event replay
        q.recentProgress.foreach { p =>
          drops(p.batchId) = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        }
      }
      val dropped = drops.values.sum
      assert(dropped === predicted.toLong,
        s"streaming dropped $dropped, audit predicted $predicted")
      assert(spark.table("t_lateness_parity").count() === 60L - predicted)
    } finally q.stop()
  }

  test("session_window streaming matches batch gaps-and-islands sessions") {
    // batch parity: the same semantics through two implementations
    val events = Tables.events(spark, sfDir)
    val batchSessions = operators.EventOps.queries("q_stream_session")(
      spark, sfDir)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val swSessions = events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n_events"))
      .collect().map(_.toSeq).toSet
    // session_window end = last_ts + gap; gaps-and-islands end = last_ts.
    // Compare on (user, start, count) which both define identically.
    def key(s: Set[Seq[Any]]) = s.map(r => (r.head, r(1), r(3)))
    assert(key(batchSessions) === key(swSessions))
    assert(batchSessions.nonEmpty)
  }

  test("streaming ohlc bars match the batch resample") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.ohlc(ms.toDF())
      .writeStream.format("memory").queryName("t_ohlc")
      .outputMode("append").start()
    try {
      ms.addData(loadEvs(): _*)
      // sentinel far in the future closes every corpus bar
      ms.addData(ev(999999999L, "2030-01-01 00:00:00"))
      q.processAllAvailable()
      val stream = spark.table("t_ohlc").collect()
        .map(r => (r.getTimestamp(0).getTime / 3600000L, r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6), r.getDouble(7)))
        .toMap
        .filter(_._1._1 < 1893456000000L / 3600000L) // drop the sentinel bar
      val batch = operators.EventOps.queries("q_events_ohlc")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6), r.getDouble(7)))
        .toMap
      assert(batch.nonEmpty && stream.keySet == batch.keySet)
      batch.foreach { case (k, (o, h, l, c, n, vol)) =>
        val (so, sh, sl, scl, sn, svol) = stream(k)
        assert((so, sh, sl, scl, sn) == (o, h, l, c, n), s"bar $k")
        assert(math.abs(svol - vol) < 0.02, s"volume $k")
      }
    } finally q.stop()
  }

  test("streaming session_window emits sessions") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    // session-window streaming aggregation emits closed sessions in
    // append mode as the watermark passes their end
    val q = StreamingOps.sessions(ms.toDF())
      .writeStream.format("memory").queryName("t_sess")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"),
        ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      ms.addData(ev(4, "2024-01-01 14:00:00"))
      q.processAllAvailable()
      ms.addData(ev(5, "2024-01-01 16:00:00"))
      q.processAllAvailable()
      val n = spark.table("t_sess").count()
      assert(n >= 2, s"expected >=2 closed sessions, got $n")
    } finally q.stop()
  }

  test("decay state: streaming ewma matches the scala fold across batches") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamingOps.userDecayState(ms.toDF())
      .writeStream.format("memory").queryName("t_decay")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", uid = 5, v = 10.0),
        ev(2, "2024-01-01 10:01:00", uid = 5, v = 20.0))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 10:02:00", uid = 5, v = 30.0))
      q.processAllAvailable()
      val last = spark.table("t_decay").filter(col("user_id") === 5)
        .orderBy(col("n_events").desc).limit(1)
        .select("n_events", "ewma").collect().head
      // fold: 10 -> .3*20+.7*10=13 -> .3*30+.7*13=18.1
      assert(last.getLong(0) === 3L)
      assert(math.abs(last.getDouble(1) - 18.1) < 1e-9)
    } finally {
      q.stop()
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("rate limit state: streaming bucket matches the batch integer law") {
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamingOps.rateLimitState(ms.toDF())
      .writeStream.format("memory").queryName("t_bucket")
      .outputMode("update").start()
    try {
      // bucket starts at 1.5 tokens: admit, then a 10 s gap refills only
      // 2 777 micro-tokens -> drop; the 1 h gap refills a full token ->
      // admit; the 30 min gap refills exactly 500 000 -> admit to zero
      ms.addData(ev(1, "2024-01-01 10:00:00", uid = 7),
        ev(2, "2024-01-01 10:00:10", uid = 7))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 11:00:10", uid = 7))
      q.processAllAvailable()
      ms.addData(ev(4, "2024-01-01 11:30:10", uid = 7))
      q.processAllAvailable()
      val last = spark.table("t_bucket").filter(col("user_id") === 7)
        .orderBy(col("n_events").desc).limit(1)
        .select("n_events", "n_admitted").collect().head
      assert(last.getLong(0) === 4L)
      assert(last.getLong(1) === 3L,
        "expected admit/drop/admit/admit under the batch key's exact law")
    } finally {
      q.stop()
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState accumulates per-user state across batches") {
    implicit val sc = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Ev]
    val q = StreamingOps.userRunningStateTws(ms.toDF())
      .writeStream.format("memory").queryName("t_tws")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", uid = 9, v = 4.0))
      q.processAllAvailable()
      ms.addData(ev(2, "2024-01-01 10:05:00", uid = 9, v = 6.0))
      q.processAllAvailable()
      val last = spark.table("t_tws").filter(col("user_id") === 9)
        .orderBy(col("n_events").desc).limit(1)
        .select("n_events", "total_value").collect().head
      assert(last.getLong(0) === 2L)
      assert(last.getDouble(1) === 10.0)
    } finally {
      q.stop()
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.userRunningState(ms.toDF())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00", uid = 7, v = 2.0))
      q.processAllAvailable()
      ms.addData(ev(2, "2024-01-01 10:05:00", uid = 7, v = 3.0))
      q.processAllAvailable()
      val last = spark.table("t_state").filter(col("user_id") === 7)
        .orderBy(col("n_events").desc).limit(1)
        .select("n_events", "total_value").collect().head
      assert(last.getLong(0) === 2L)
      assert(last.getDouble(1) === 5.0)
    } finally q.stop()
  }

  test("stream-static anomaly join flags the same events as the batch query") {
    implicit val sc = spark.sqlContext
    // the static side: per-type stats computed batch-side, exactly as an
    // offline stats-refresh job would publish them
    val stats = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
    val ms = MemoryStream[Ev]
    val q = StreamingOps.anomaly(ms.toDF(), stats)
      .writeStream.format("memory").queryName("t_anomaly")
      .outputMode("append").start()
    try {
      val evs = loadEvs()
      ms.addData(evs: _*); q.processAllAvailable()
      val got = spark.table("t_anomaly").select("event_id").collect()
        .map(_.getLong(0)).toSet
      val exp = SparkEntry.queries("q_events_anomaly")(spark, sfDir)
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(got === exp)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming CDC apply final snapshot matches the batch query") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.cdcApply(ms.toDF())
      .writeStream.format("memory").queryName("t_cdc")
      .outputMode("update").start()
    try {
      val evs = loadEvs()
      // deliberately OUT of event-time order across batches (evens then
      // odds): latest-op-wins is commutative, so arrival order must not
      // matter — unlike the funnel, which latches in order
      val (b1, b2) = evs.partition(_.event_id % 2 == 0)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      // final snapshot = per user, the emitted update with the max
      // (ts_us, event_id), tombstones dropped
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val got = spark.table("t_cdc")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && !col("deleted"))
        .select("user_id", "event_id", "event_type", "value")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSet
      val exp = SparkEntry.queries("q_events_cdc_apply")(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSet
      assert(got === exp)
    } finally q.stop()
  }

  test("streaming funnel stage counts match the batch funnel") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.funnel(ms.toDF())
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("update").start()
    try {
      // replay the whole sf0.001 corpus in event-time order, two batches
      val evs = loadEvs()
      val (b1, b2) = evs.splitAt(evs.length / 2)
      ms.addData(b1.toSeq: _*); q.processAllAvailable()
      ms.addData(b2.toSeq: _*); q.processAllAvailable()
      // stages only latch, so the final per-user state is the max over
      // the emitted updates
      val fin = spark.table("t_funnel").groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      val got = (fin.filter(col("t1").isNotNull).count(),
        fin.filter(col("t2").isNotNull).count(),
        fin.filter(col("t3").isNotNull).count())
      val exp = SparkEntry.queries("q_events_funnel")(spark, sfDir).head()
      assert(got === ((exp.getLong(0), exp.getLong(1), exp.getLong(2))))
    } finally q.stop()
  }

  test("chained session stats stream rolls closed sessions into days") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.sessionStats(ms.toDF())
      .writeStream.format("memory").queryName("t_sess_stats")
      .outputMode("append").start()
    try {
      // user 1: two events in one session; user 2: a single-event
      // (bounce) session — all on 2024-01-01
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"),
        ev(3, "2024-01-01 09:00:00", uid = 2))
      q.processAllAvailable()
      // push the watermark past the day so sessions AND the day close
      ms.addData(ev(9, "2024-01-02 12:00:00"))
      q.processAllAvailable()
      ms.addData(ev(10, "2024-01-03 12:00:00"))
      q.processAllAvailable()
      val rows = spark.table("t_sess_stats")
        .select("day", "n_sessions", "n_bounce").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L, 1L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("daily actives stream dedups users within a day") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingOps.dailyActives(ms.toDF())
      .writeStream.format("memory").queryName("t_dau")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:00:00"),
        ev(3, "2024-01-01 12:00:00", uid = 2))
      q.processAllAvailable()
      ms.addData(ev(9, "2024-01-03 00:30:00"))
      q.processAllAvailable()
      val rows = spark.table("t_dau")
        .select("day", "uniques_1d").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("curateStream admits a quality doc once, drops junk and duplicates") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Doc]
    // 30 distinct non-stopword tokens: 0.3*ln(30) ≈ 1.02 ≥ 0.95 → passes
    val good = (1 to 30).map(i => s"tok$i").mkString(" ")
    // all-stopword repetition: 0.3*ln(4) - 0.5 - 0.2*(3/4) < 0 → gated
    val junk = "the the the the"
    val q = StreamingOps.curateStream(ms.toDF())
      .writeStream.format("memory").queryName("t_curate")
      .outputMode("append").start()
    try {
      ms.addData(Doc(1, t("2024-01-01 10:00:00"), good),
        Doc(2, t("2024-01-01 10:05:00"), good), // same content → dup
        Doc(3, t("2024-01-01 10:10:00"), junk))
      q.processAllAvailable()
      val rows = spark.table("t_curate")
        .select("doc_id", "quality_r").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.map(_._1).toSet === Set(1L),
        s"expected only the first quality doc admitted, got ${rows.toSeq}")
      assert(rows.head._2 >= 0.95)
    } finally q.stop()
  }

  /** transformWithState needs the RocksDB state store provider;
    * restore the session conf after. Checkpoint file checksums are
    * disabled inside the scope: their background writer deadlocks the
    * RocksDB snapshot zip-close on this 2-core test JVM (both task
    * slots park in ChecksumCancellableFSDataOutputStream.close waiting
    * on a checksum future that never runs — observed as an indefinite
    * processAllAvailable hang). */
  private def withRocksDb[A](f: => A): A = {
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        ("org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider"),
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val old = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Poll until `cond` holds. A ProcessingTime-mode transformWithState
    * query NEVER reports noNewData (shouldRunAnotherBatch is always
    * true — a processing-time timer may be due in every trigger), so
    * processAllAvailable would block forever; sink polling is the only
    * sound wait. */
  private def waitFor(clue: String, timeoutMs: Long = 60000L)
      (cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis
    while (!cond && System.currentTimeMillis - t0 < timeoutMs)
      Thread.sleep(100)
    assert(cond, s"timed out waiting for: $clue")
  }

  private val halfSecTrigger =
    org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds")

  test("transformWithState TTL: state survives under the TTL") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val ms = MemoryStream[Ev]
      // TTL far above any plausible inter-batch latency: the two events
      // must accumulate (proves the TTL config path doesn't silently
      // drop live state)
      val q = StreamingOps.userSeenTtl(ms.toDF(), ttlMs = 600000L)
        .writeStream.format("memory").queryName("t_ttl_live")
        .outputMode("update").trigger(halfSecTrigger).start()
      try {
        ms.addData(ev(1, "2024-01-01 10:00:00", uid = 5))
        waitFor("first count emission")(
          spark.table("t_ttl_live").count() >= 1)
        ms.addData(ev(2, "2024-01-01 10:00:01", uid = 5))
        waitFor("accumulated count under TTL")(
          spark.table("t_ttl_live").filter(col("n_in_state") === 2)
            .count() >= 1)
        val ns = spark.table("t_ttl_live").filter(col("user_id") === 5)
          .select("n_in_state").collect().map(_.getLong(0)).toSet
        assert(ns === Set(1L, 2L))
      } finally q.stop()
    }
  }

  test("transformWithState TTL: idle state expires and the count restarts") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val ms = MemoryStream[Ev]
      val q = StreamingOps.userSeenTtl(ms.toDF(), ttlMs = 700L)
        .writeStream.format("memory").queryName("t_ttl_exp")
        .outputMode("update").trigger(halfSecTrigger).start()
      try {
        ms.addData(ev(1, "2024-01-01 10:00:00", uid = 5))
        waitFor("first emission")(spark.table("t_ttl_exp").count() >= 1)
        Thread.sleep(2500) // well past the 0.7 s TTL
        ms.addData(ev(2, "2024-01-01 10:00:01", uid = 5))
        waitFor("post-expiry emission")(
          spark.table("t_ttl_exp").count() >= 2)
        // the store expired the counter between batches: both
        // emissions read n=1, never n=2
        val ns = spark.table("t_ttl_exp").filter(col("user_id") === 5)
          .select("n_in_state").collect().map(_.getLong(0)).toList
        assert(ns === List(1L, 1L),
          s"expected the idle counter to expire, got $ns")
      } finally q.stop()
    }
  }

  test("transformWithState processing-time timer fires on key silence") {
    implicit val sc = spark.sqlContext
    withRocksDb {
      val ms = MemoryStream[Ev]
      val q = StreamingOps.userIdleTimeout(ms.toDF(), idleMs = 600L)
        .writeStream.format("memory").queryName("t_idle")
        .outputMode("update").trigger(halfSecTrigger).start()
      try {
        ms.addData(ev(1, "2024-01-01 10:00:00", uid = 5))
        // the timer fires in a later NO-DATA batch — genuine
        // emit-on-silence, no second key needed to poke the query
        waitFor("timeout row for the silent key")(
          spark.table("t_idle")
            .filter(col("user_id") === 5 && col("timed_out")).count() >= 1)
        val rows = spark.table("t_idle")
          .select("user_id", "n_events", "timed_out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        assert(rows.contains((5L, 1L, false)), s"got $rows")
        assert(rows.contains((5L, 1L, true)), s"got $rows")
        // the timeout cleared the state: the key's next event restarts
        ms.addData(ev(3, "2024-01-01 10:00:02", uid = 5))
        waitFor("restarted count after timeout")(
          spark.table("t_idle")
            .filter(col("user_id") === 5 && !col("timed_out"))
            .count() >= 2)
        val restart = spark.table("t_idle")
          .filter(col("user_id") === 5 && !col("timed_out"))
          .select("n_events").collect().map(_.getLong(0)).toList
        assert(restart === List(1L, 1L),
          s"expected the count to restart after timeout, got $restart")
      } finally q.stop()
    }
  }

  test("transformWithState restart-from-checkpoint equals the uninterrupted run") {
    implicit val sc = spark.sqlContext
    // The missing stateful replay (VERDICT r9 item 7): stop a
    // transformWithState query after its first committed batch, restart
    // a NEW query from the same checkpoint (RocksDB checksum workaround
    // via withRocksDb — see its scaladoc), feed the second batch, and
    // the final per-user state must equal an uninterrupted run's. The
    // restarted query writes to a FRESH memory table, so an n_events=2
    // emission there can only come from state RESTORED off the
    // checkpoint (the n=1, v=4.0 accumulator from before the stop).
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-ckpt").toString
      val b1 = Seq(ev(1, "2024-01-01 10:00:00", uid = 9, v = 4.0),
        ev(2, "2024-01-01 10:00:01", uid = 7, v = 1.0))
      val b2 = Seq(ev(3, "2024-01-01 10:05:00", uid = 9, v = 6.0),
        ev(4, "2024-01-01 10:05:01", uid = 7, v = 2.0))
      def finalOf(rows: Iterable[(Long, Long, Double)])
          : Map[Long, (Long, Double)] =
        rows.groupBy(_._1).map { case (u, rs) =>
          val last = rs.maxBy(_._2)
          u -> (last._2, last._3)
        }
      try {
        val ms = MemoryStream[Ev]
        // the memory sink REFUSES recovery from an existing checkpoint
        // (not fault-tolerant — ResolveWriteToStream), so the
        // checkpointed queries write through foreachBatch into a
        // per-phase buffer instead
        val sunk = new java.util.concurrent.ConcurrentLinkedQueue[
          (Long, Long, Double)]()
        def start() =
          StreamingOps.userRunningStateTws(ms.toDF())
            .writeStream
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .foreachBatch {
              (df: org.apache.spark.sql.Dataset[
                 org.apache.spark.sql.Row], _: Long) =>
                df.select("user_id", "n_events", "total_value").collect()
                  .foreach(r => sunk.add(
                    (r.getLong(0), r.getLong(1), r.getDouble(2))): Unit)
            }
            .start()
        val q1 = start()
        ms.addData(b1: _*)
        q1.processAllAvailable()
        q1.stop()
        sunk.clear() // phase 2 must observe only post-restart output
        ms.addData(b2: _*) // arrives while the query is down
        val q2 = start()
        try {
          q2.processAllAvailable()
          import scala.jdk.CollectionConverters._
          val got = finalOf(sunk.asScala)
          assert(got === Map(9L -> ((2L, 10.0)), 7L -> ((2L, 3.0))),
            "restored state must carry batch-1 accumulators across " +
              s"the restart, got $got")
          // the uninterrupted twin, same batch split
          val ms2 = MemoryStream[Ev]
          val qU = StreamingOps.userRunningStateTws(ms2.toDF())
            .writeStream.format("memory").queryName("t_ckpt_u")
            .outputMode("update").start()
          try {
            ms2.addData(b1: _*); qU.processAllAvailable()
            ms2.addData(b2: _*); qU.processAllAvailable()
            val twin = finalOf(spark.table("t_ckpt_u")
              .select("user_id", "n_events", "total_value").collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
            assert(got === twin)
          } finally qU.stop()
        } finally q2.stop()
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(ckpt))
      }
    }
  }

  test("streaming MG candidates + exact verify replay the batch heavy-hitters key") {
    implicit val sc = spark.sqlContext
    // END-TO-END parity with q_events_heavy_hitters: the stream's MG
    // pass only bounds the candidate set (any superset of the true
    // heavies verifies identically — the same argument the batch key's
    // partition-union makes), so candidates = the union of all shard
    // emissions, then the exact recount + threshold cut must reproduce
    // the batch output EXACTLY (same cap, same corpus, 3 micro-batches).
    val evs = loadEvs()
    val ms = MemoryStream[Ev]
    val q = StreamingOps.heavyHittersStream(ms.toDF(), cap = 256,
        nShards = 8)
      .writeStream.format("memory").queryName("t_hh_parity")
      .outputMode("update").start()
    try {
      evs.grouped(evs.size / 3 + 1).foreach { b =>
        ms.addData(b: _*); q.processAllAvailable()
      }
      val cands = spark.table("t_hh_parity").select("user_id").collect()
        .map(_.getLong(0)).toSet
      val n = evs.size
      val exact = evs.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      val streamHeavies = exact.filter { case (u, c) =>
        cands(u) && c * 256 > n }
      val batch = operators.EventOps
        .queries("q_events_heavy_hitters")(spark, sfDir)
        .select("user_id", "cnt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch.nonEmpty)
      assert(streamHeavies === batch)
    } finally q.stop()
  }

  test("streaming MG heavy-hitter shards keep every above-threshold user") {
    implicit val sc = spark.sqlContext
    val ms = MemoryStream[Ev]
    // skewed synthetic stream fed across three micro-batches: user 7
    // dominates, a rotating tail pressures the tiny cap=4 counters
    val rnd = new scala.util.Random(7)
    val batches: Seq[Seq[Ev]] = (0 until 3).map { b =>
      rnd.shuffle(
        Seq.fill(300)(7L) ++ Seq.fill(120)(8L) ++
          (100L + b * 50 until 150L + b * 50)).zipWithIndex.map {
        case (u, i) => ev(b * 1000L + i, "2024-01-01 10:00:00", uid = u)
      }
    }
    val q = StreamingOps.heavyHittersStream(ms.toDF(), cap = 4,
        nShards = 4)
      .writeStream.format("memory").queryName("t_hh")
      .outputMode("update").start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      // candidates surviving in the LAST emission of each shard
      val cands = spark.table("t_hh").select("user_id").collect()
        .map(_.getLong(0)).toSet
      val all = batches.flatten
      val n = all.size
      val exact = all.groupBy(_.user_id).view.mapValues(_.size).toMap
      val heavy = exact.filter { case (_, c) => c * 4 > n }.keySet
      assert(heavy.nonEmpty && heavy.contains(7L))
      assert(heavy.subsetOf(cands),
        s"every >N/cap user must survive its shard: missing ${heavy -- cands}")
    } finally q.stop()
  }
}
