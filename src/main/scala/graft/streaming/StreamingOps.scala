package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Structured Streaming twins of the batch event-time operators
  * (SURVEY.md §2.10). Each takes a *streaming* DataFrame with the events
  * schema (ts already a timestamp) and returns a transformed streaming
  * DataFrame — source-agnostic: tests feed MemoryStream, production feeds
  * a message-bus reader via graft.sources.SourceFactory.
  *
  * Watermarks bound state: at 100 TB/day the tumbling/sliding aggregations
  * keep only open windows per (window, event_type) group and sessionization
  * keeps one open session per active user — both shuffle on their group key
  * exactly like the batch forms.
  */
object StreamingOps {

  /** Hourly tumbling counts+sums, 10-min watermark (late rows dropped). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("w.start").as("h"), col("event_type"), col("cnt"),
        col("total"))

  /** 1-hour window sliding every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"))

  /** Streaming twin of the batch OHLC resample (EventOps q_events_ohlc):
    * hourly bars per event_type with open/close chosen by the same
    * zero-padded (µs, event_id) key, so replay order cannot change a
    * bar. min_by/max_by are plain declarative aggregates — the bar
    * state per open (window, type) group is one row, finalized when
    * the watermark passes the hour. */
  def ohlc(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("k",
        concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 10, "0")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(min_by(col("value"), col("k")).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), col("k")).as("close"),
        count(lit(1)).as("n_events"), sum(col("value")).as("volume"))
      .select(col("w.start").as("h"), col("event_type"), col("open"),
        col("high"), col("low"), col("close"), col("n_events"),
        col("volume"))

  /** Session windows, 30-min inactivity gap, per user — the native
    * streaming form of EventOps' gaps-and-islands batch query. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("session_value"))

  /** Per-day session-quality rollup as a stream — the streaming twin of
    * the oracle-checked q_events_session_stats: session_window per user,
    * then a daily tumbling re-aggregation of the CLOSED sessions (two
    * chained stateful operators; Spark ≥3.5 propagates the watermark
    * from the session output, which is why the sessions must finalize —
    * append semantics — before the day rolls them up). State: one open
    * session per active user + one open day row. */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(window(col("w"), "1 day").as("day_w"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("n_events") === 1, 1)).as("n_bounce"))
      .select(col("day_w.start").as("day"), col("n_sessions"),
        col("n_bounce"))

  /** Daily distinct actives as a stream (twin of the 1-day column of
    * q_events_rolling_uniques): event-time dedup on (day-window, user)
    * — the window column keeps the dedup state watermark-evictable —
    * then a per-day count of the surviving firsts. */
  def dailyActives(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .select(window(col("ts"), "1 day").as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("uniques_1d"))
      .select(col("w.start").as("day"), col("uniques_1d"))

  /** Stream-stream INNER interval join: each click matched to the same
    * user's purchases within the following 30 minutes (the attribution
    * join; batch twin = EventOps q_stream_interval_join, oracle-checked).
    * Watermarks on BOTH sides plus the time-range condition let Spark
    * bound the join state: buffered clicks are evicted once the purchase
    * watermark passes click_ts + 30 min, so state per user ~ rate ×
    * interval — never unbounded. Sharded by user_id like every per-entity
    * operator here. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
      expr("""c_user = p_user AND
              p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"), col("amount"))
  }

  /** LEFT OUTER stream-stream interval join: the outer (click) side's
    * unmatched rows can only be emitted once the watermark proves no
    * purchase can still arrive inside the 30-minute band, so both sides
    * carry a watermark and the null-extended rows trail the event time
    * by watermark + band — the correctness/latency trade every streaming
    * attribution pipeline makes explicit. State is bounded exactly like
    * the inner form: per-user rows inside the band. */
  def intervalJoinLeft(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    clicks.join(purchases,
        expr("""c_user = p_user AND
                p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"""),
        "leftOuter")
      .select(col("c_user").as("user_id"), col("click_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        col("c_ts"), col("p_ts"))
  }

  /** Exactly-once-style ingest dedup by event_id within the watermark.
    * `delay` is the admission horizon: rows arriving with event time
    * below `max(event time seen) − delay` are dropped before the state
    * store (surfaced as numRowsDroppedByWatermark) — the runtime half of
    * the batch q_events_lateness audit, which predicts exactly this drop
    * count for any candidate delay (parity proven in StreamingSpec). */
  def dedup(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming corpus curation — the ingest-edge admission-control twin
    * of the batch q_pipeline_curate: the SHARED quality gate (TextOps'
    * one score definition at the same ≥ 0.95 cut, so the batch and
    * streaming gates cannot drift) followed by exact content dedup
    * within the watermark (md5(text) — dedup state is bounded by the
    * 1-hour horizon, and junk never enters it because the stateless gate
    * runs first). Input: a document stream with (doc_id, ts, text).
    * At 100 TB this is the filter that keeps re-crawled duplicates and
    * low-quality pages from ever landing in the lake; admitted docs flow
    * on with their scores for downstream routing. */
  def curateStream(docs: DataFrame): DataFrame =
    graft.operators.TextOps.withQualityStats(docs)
      .withColumn("quality_r", graft.Par.r6(graft.operators.TextOps.qualityScore))
      .filter(col("quality_r") >= 0.95)
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("ts"), col("quality_r"))

  /** Streaming suggestion-index maintenance — the reference's core loop
    * (text → token counts → ranked suggestions) as a stream: running
    * per-(prefix, token) counts via streaming aggregation. State is
    * |vocab|-bounded BY CONSTRUCTION (token counts, not documents), so
    * no watermark/eviction is needed and `complete` output mode is the
    * scale-correct delivery: every batch emits the whole current index,
    * the downstream foreachBatch ranks top-k per prefix over the FULL
    * counts (an update-mode slice would rank a prefix against only the
    * tokens that changed this batch — silently wrong suggestions), and
    * idempotent (index, id) upserts make redelivery safe. */
  def suggestStream(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("prefix", substring(col("token"), 1, 1))
      .groupBy("prefix", "token")
      .agg(count(lit(1)).as("cnt"))

  /** Output row of [[userRunningState]]. */
  case class UserState(user_id: Long, n_events: Long, total_value: Double)

  /** transformWithState processor (the Spark 4 arbitrary-state API that
    * supersedes flatMapGroupsWithState): running per-user count + total
    * kept in a typed ValueState handle. */
  class UserStateProcessor
      extends StatefulProcessor[Long, (Long, Double), UserState] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("userTotals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[UserState] = {
      val (n0, v0) = Option(state.get()).getOrElse((0L, 0.0))
      var n = n0
      var v = v0
      rows.foreach { case (_, value) => n += 1; v += value }
      state.update((n, v))
      Iterator.single(UserState(uid, n, v))
    }
  }

  /** Running per-user state via transformWithState (RocksDB-backed state
    * store in production; the typed-handle API). */
  def userRunningStateTws(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserStateProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Output row of [[userDecayState]]. */
  case class DecayState(user_id: Long, n_events: Long, ewma: Double)

  /** Per-user exponential decay state (α=0.3): ewma ← 0.3·v + 0.7·ewma,
    * seeded at the first value — the streaming twin of the batch EWMA
    * family (q_stats_ewma smooths the daily census; this smooths each
    * user's value stream as events arrive). Rows are applied in (ts,
    * event_id) order within a micro-batch; cross-batch order per user is
    * the watermark's job upstream, same contract as the funnel state
    * machine. State per user is one (count, double) pair — sharded on
    * user_id, RocksDB-backed in production. */
  class DecayProcessor
      extends StatefulProcessor[Long, (Long, Double, Long, Long),
        DecayState] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)]("userDecay",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, Double, Long, Long)],
        timers: TimerValues): Iterator[DecayState] = {
      val (n0, e0) = Option(state.get()).getOrElse((0L, 0.0))
      var n = n0
      var e = e0
      rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, v, _, _) =>
        e = if (n == 0) v else 0.3 * v + 0.7 * e
        n += 1
      }
      state.update((n, e))
      Iterator.single(DecayState(uid, n, e))
    }
  }

  /** Per-user decayed mean via transformWithState. */
  def userDecayState(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        unix_micros(col("ts")), col("event_id").cast("long"))
      .as[(Long, Double, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new DecayProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Output row of [[rateLimitState]]. */
  case class BucketState(user_id: Long, n_events: Long, n_admitted: Long)

  /** Streaming twin of the batch token-bucket replay
    * (EventOps q_events_rate_limit): per-user admission control at the
    * ingest edge via transformWithState. SAME all-integer state law —
    * capacity 1.5 tokens (1 500 000 micro-tokens), refill Δµs/3600
    * capped at capacity, cost 1 000 000 per event — so a full-stream
    * replay converges to the batch key's per-user counts exactly
    * (RetrievalR7Spec proves it event-per-micro-batch). State per user
    * is [last_ts, micro_tokens, n_events, n_admitted] — four longs,
    * sharded on user_id, RocksDB-backed in production. Rows apply in
    * (ts, event_id) order within a micro-batch; cross-batch order is
    * the watermark's job upstream (the DecayProcessor contract). */
  class BucketProcessor
      extends StatefulProcessor[Long, (Long, Long, Long), BucketState] {
    @transient private var state: org.apache.spark.sql.streaming
      .ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long, Long, Long)](
        "userBucket",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, Long, Long)],
        timers: TimerValues): Iterator[BucketState] = {
      val (last0, tok0, n0, adm0) =
        Option(state.get()).getOrElse((0L, 1500000L, 0L, 0L))
      var last = last0; var tokens = tok0; var n = n0; var adm = adm0
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _) =>
        tokens = math.min(1500000L, tokens + (ts - last) / 3600)
        last = ts
        if (tokens >= 1000000L) { tokens -= 1000000L; adm += 1 }
        n += 1
      }
      state.update((last, tokens, n, adm))
      Iterator.single(BucketState(uid, n, adm))
    }
  }

  /** Per-user token-bucket admission via transformWithState. */
  def rateLimitState(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new BucketProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Output row of [[funnel]]: the user's stage timestamps (µs), null
    * until the stage is reached in order. */
  case class FunnelStage(user_id: Long, t1: Option[Long], t2: Option[Long],
      t3: Option[Long])

  /** Streaming twin of the batch conversion funnel (EventOps
    * q_events_funnel): a per-user state machine — first view, first
    * click AFTER it, first purchase AFTER that — kept in
    * flatMapGroupsWithState and updated as events arrive. Rows are
    * sorted by ts within each micro-batch; cross-batch the machine
    * assumes event-time order per user (the standard funnel-tracker
    * assumption — an out-of-order view older than an already-latched t1
    * cannot retroactively re-derive t2; bounded reordering is the
    * watermark's job upstream). State per user is three longs —
    * unbounded user counts shard on user_id exactly like sessionization.
    * Parity with the batch funnel's stage counts is spec-tested. */
  def funnel(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[Long], Option[Long], Option[Long]),
        FunnelStage](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[(Option[Long], Option[Long], Option[Long])]) =>
          var (t1, t2, t3) = state.getOption.getOrElse(
            (Option.empty[Long], Option.empty[Long], Option.empty[Long]))
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, typ, us) =>
            if (typ == "view" && t1.isEmpty) t1 = Some(us)
            else if (typ == "click" && t2.isEmpty &&
              t1.exists(us > _)) t2 = Some(us)
            else if (typ == "purchase" && t3.isEmpty &&
              t2.exists(us > _)) t3 = Some(us)
          }
          state.update((t1, t2, t3))
          Iterator(FunnelStage(uid, t1, t2, t3))
      }
      .toDF()
  }

  /** Streaming twin of the batch Misra-Gries heavy-hitter candidate
    * pass (EventOps q_events_heavy_hitters): MG counter maps live in
    * flatMapGroupsWithState, SHARDED by user_id % nShards so state
    * stays bounded (nShards × cap counters total) while each user's
    * full count accumulates in exactly one shard — which makes the
    * guarantee even cleaner than the batch partition-union argument:
    * count > N/cap ≥ N_shard/cap ⟹ the user survives its shard's MG.
    * Each micro-batch emits the shard's current candidate set (Update
    * mode); downstream does the exact recount exactly like the batch
    * path. Spec-verified on a skewed MemoryStream against the batch
    * threshold law. */
  def heavyHittersStream(events: DataFrame, cap: Int = 64,
      nShards: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"))
      .as[Long]
      .groupByKey(_ % nShards)
      .flatMapGroupsWithState[Map[Long, Long], (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[Long],
         state: GroupState[Map[Long, Long]]) =>
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          state.getOption.foreach(m ++= _)
          rows.foreach { u =>
            m.get(u) match {
              case Some(c) => m(u) = c + 1
              case None if m.size < cap => m(u) = 1L
              case None =>
                val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
                dead.foreach(m.remove)
                m.mapValuesInPlace((_, c) => c - 1)
            }
          }
          state.update(m.toMap)
          m.keysIterator.map(u => (shard, u)).toSeq.iterator
      }
      .toDF("shard", "user_id")
  }

  /** Stream-STATIC broadcast join twin of the batch z-score outlier
    * query (EventOps q_events_anomaly): per-type (mu, sigma) come from a
    * batch frame — the offline-recomputed stats artifact every streaming
    * anomaly detector scores against — broadcast to every task, so the
    * stream needs no shuffle at all (stateless projection + filter).
    * The scoring core (rounding, threshold) is EventOps.anomalyScore —
    * one implementation for both twins, so they cannot desynchronize. */
  def anomaly(events: DataFrame, stats: DataFrame): DataFrame =
    graft.operators.EventOps.anomalyScore(events, stats)

  case class CdcRow(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String, value: Double, deleted: Boolean)

  /** Streaming twin of the batch CDC apply (EventOps q_events_cdc_apply):
    * the per-key latest-op-wins upsert view. State per key is ONE row
    * (the current survivor by (ts_us, event_id)); every micro-batch
    * emits the running snapshot row, with 'purchase' acting as the
    * delete marker exactly as in the batch form. Out-of-order rows are
    * handled correctly (the comparison is on event time, not arrival
    * order) — unlike the funnel, CDC apply needs no ordering assumption
    * because max is commutative. Shards on user_id; state is O(keys),
    * the same bound a RocksDB-backed MERGE materialization has. Final-
    * snapshot parity with the batch query is spec-tested. */
  def cdcApply(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("value").cast("double"),
        unix_micros(col("ts")))
      .as[(Long, Long, String, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String, Double), CdcRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, String, Double, Long)],
         state: GroupState[(Long, Long, String, Double)]) =>
          // state = (ts_us, event_id, event_type, value) of the survivor
          var cur = state.getOption
          rows.foreach { case (_, eid, typ, v, us) =>
            if (cur.forall(c => us > c._1 || (us == c._1 && eid > c._2)))
              cur = Some((us, eid, typ, v))
          }
          val c = cur.get // rows was non-empty, so cur is defined
          state.update(c)
          Iterator(CdcRow(uid, c._1, c._2, c._3, c._4,
            deleted = c._3 == "purchase"))
      }
      .toDF()
  }

  /** Custom stateful op: running per-user event count + value total via
    * flatMapGroupsWithState — the escape hatch for state machines the
    * built-in windows can't express. */
  def userRunningState(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          Iterator(UserState(uid, n, v))
      }
      .toDF()
  }

  /** Output row of [[userSeenTtl]]. */
  case class TtlCount(user_id: Long, n_in_state: Long)

  /** transformWithState with a state-TTL retention contract — what a
    * 100 TB keyed-state pipeline relies on to keep the store bounded
    * without manual cleanup code: the per-user counter lives in a
    * ValueState carrying TTLConfig(ttl), so a user idle past the TTL
    * has its value expired BY THE STORE (between batches, in processing
    * time) and the next event restarts the count at 1. TTL requires
    * TimeMode.ProcessingTime; expiry semantics are spec-pinned both
    * ways (survives under the TTL, gone after it). */
  class TtlCountProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, (Long, Long), TtlCount] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("seenTtl",
        Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[TtlCount] = {
      val n = (if (state.exists()) state.get() else 0L) + rows.size
      state.update(n)
      Iterator.single(TtlCount(uid, n))
    }
  }

  /** Per-user event count whose state expires after `ttlMs` idle. */
  def userSeenTtl(events: DataFrame, ttlMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new TtlCountProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF()
  }

  /** Output row of [[userIdleTimeout]]. */
  case class IdleRow(user_id: Long, n_events: Long, timed_out: Boolean)

  /** Processing-time TIMER path of transformWithState — the session-gap
    * / inactivity-alert primitive: each input re-arms a single idle
    * timer (delete-then-register, so exactly one deadline per key) at
    * now + idleMs; when a later micro-batch runs past the deadline,
    * handleExpiredTimer fires WITHOUT input for that key, emits the
    * final count flagged timed_out=true, and clears the state — the
    * emit-on-silence shape watermarks cannot express (a watermark needs
    * events to advance; a timer fires on their absence). */
  class IdleTimerProcessor(idleMs: Long)
      extends StatefulProcessor[Long, (Long, Long), IdleRow] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("idleCount",
        Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[IdleRow] = {
      val n = (if (state.exists()) state.get() else 0L) + rows.size
      state.update(n)
      // one live idle deadline per key: drop any armed timer, re-arm
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timers.getCurrentProcessingTimeInMs + idleMs)
      Iterator.single(IdleRow(uid, n, timed_out = false))
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[IdleRow] = {
      val n = if (state.exists()) state.get() else 0L
      state.clear()
      Iterator.single(IdleRow(uid, n, timed_out = true))
    }
  }

  /** Per-user running count that emits a timed_out row (and drops its
    * state) once the user is idle for `idleMs` of processing time. */
  def userIdleTimeout(events: DataFrame, idleMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new IdleTimerProcessor(idleMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF()
  }
}
