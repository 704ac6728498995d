package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream: the streaming
  * twins of graft.queries.EventWindows (same logic, `readStream` input),
  * plus watermark-governed late-data handling, streaming dedup, and
  * custom per-key state. All transforms take a DataFrame so tests can
  * drive them from MemoryStream and production from any source
  * (file/rate/kinesis-shaped).
  *
  * Scale notes: state stores are keyed by (window/key) — partitioned by
  * the shuffle on the grouping key; watermarks bound state size; append
  * mode emits finalized windows only.
  */
object EventStreams {

  /** Tumbling 1-day count/sum with a 1-hour watermark (append-safe). */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("total_value"))

  /** Sliding 1-day/12-hour window. */
  def sliding12h(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))

  /** Session windows (1-hour gap) per user. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("w.start").as("sess_start"), col("n"),
        col("total_value"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Stream-static enrichment join (static side broadcast at scale). */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(broadcast(customers), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"),
        col("c_mktsegment"))

  /** Stream-stream interval join: each purchase joined to that user's
    * clicks from the preceding hour. Watermarks on both sides + the time
    * range bound the join state (Spark drops buffered rows older than
    * watermark − range). */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
  }

  /** LEFT OUTER stream-stream interval join: like [[purchaseAttribution]]
    * but purchases with NO preceding click still emit, null-padded. The
    * streaming semantics are watermark-deferred: an unmatched purchase is
    * held in state until BOTH watermarks pass the point where a match is
    * no longer possible (p_ts, since clicks must precede the purchase),
    * then emitted with null click columns — exactly how Spark bounds
    * outer-join state. On batch frames this is a plain left outer join,
    * which is what the declared oracle checks. */
  def purchaseAttributionOuter(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"),
      "leftOuter")
  }

  /** Full-outer variant: BOTH sides emit unmatched rows once the other
    * side's watermark passes the point where a match is impossible —
    * purchases with no prior click AND clicks that preceded no purchase.
    * State bounds are symmetric: each side holds rows only inside its
    * watermark-derived window. On batch frames this is a plain full
    * outer join, which is what the declared twin oracles; the click id
    * travels so the unmatched-click rows have a total order. */
  def purchaseAttributionFull(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"),
      "fullOuter")
  }

  // ---- Custom state: running per-user counters (the streaming analog of
  // the reference's threaded record count, `KinesisWriter.scala:184-194`).

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserCounter(user_id: Long, n_events: Long, total_value: Double)

  /** flatMapGroupsWithState: emits an updated running counter per user on
    * every micro-batch containing that user's events. */
  def runningCounters(events: Dataset[EventRow]): Dataset[UserCounter] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserCounter]) => {
          val prev = state.getOption.getOrElse(UserCounter(userId, 0L, 0.0))
          var n = prev.n_events; var v = prev.total_value
          rows.foreach { r => n += 1; v += r.value }
          val next = UserCounter(userId, n, v)
          state.update(next)
          Iterator.single(next)
        })
  }

  /** Same running counters on the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed ValueState on the RocksDB store) — the
    * forward-looking arbitrary-state path: evolvable state schema,
    * timers, and per-state TTL where the classic API has one opaque
    * value per key. Optional `ttlMs` demonstrates per-state TTL: a key's
    * counter silently expires after the duration, so the next event
    * starts from zero (requires TimeMode.ProcessingTime). */
  class CounterProcessor(ttlMs: Option[Long] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, UserCounter] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserCounter] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      state = getHandle.getValueState[UserCounter]("counter",
        org.apache.spark.sql.Encoders.product[UserCounter], ttl)
    }
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserCounter] = {
      val prev = Option(state.get()).getOrElse(UserCounter(key, 0L, 0.0))
      var n = prev.n_events; var v = prev.total_value
      rows.foreach { r => n += 1; v += r.value }
      val next = UserCounter(key, n, v)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningCountersTws(events: Dataset[EventRow],
      ttlMs: Option[Long] = None): Dataset[UserCounter] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode = if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey(_.user_id)
      .transformWithState(new CounterProcessor(ttlMs), timeMode, OutputMode.Update)
  }

  final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double)

  /** Evolved counter state: adds a field to [[UserCounter]]. With the
    * Avro state encoding, transformWithState reads v1 state rows into
    * this schema (new field defaulted) — the state-schema-evolution path
    * a long-lived production query needs across code deploys. */
  final case class UserCounterV2(user_id: Long, n_events: Long,
      total_value: Double, max_value: Double = 0.0)

  /** V2 of [[CounterProcessor]]: same state store name ("counter"), wider
    * state type. Restarting a v1 checkpoint with this processor must
    * carry counters forward and default the new field. */
  class CounterProcessorV2
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, UserCounterV2] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserCounterV2] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserCounterV2]("counter",
        org.apache.spark.sql.Encoders.product[UserCounterV2], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserCounterV2] = {
      val prev = Option(state.get()).getOrElse(UserCounterV2(key, 0L, 0.0))
      var n = prev.n_events; var v = prev.total_value; var mx = prev.max_value
      rows.foreach { r => n += 1; v += r.value; mx = math.max(mx, r.value) }
      val next = UserCounterV2(key, n, v, mx)
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningCountersTwsV2(events: Dataset[EventRow]): Dataset[UserCounterV2] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new CounterProcessorV2, TimeMode.None(), OutputMode.Update)
  }

  final case class UserActivity(user_id: Long, last_events: Seq[Long],
      counts_by_type: Map[String, Long])

  /** ListState + MapState breadth: per user, the last `keep` event ids
    * (ListState as a bounded ring — appendValue, trim on read) and
    * per-event-type running counts (MapState updated point-wise, no
    * read-modify-write of a whole map blob as a ValueState would need).
    * Emits the consolidated activity row per batch with input. */
  class ActivityProcessor(keep: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, UserActivity] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var recent: org.apache.spark.sql.streaming.ListState[Long] = _
    @transient private var byType: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[Long]("recent",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long]("by_type",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserActivity] = {
      rows.foreach { r =>
        recent.appendValue(r.event_id)
        val prev = if (byType.containsKey(r.event_type)) byType.getValue(r.event_type) else 0L
        byType.updateValue(r.event_type, prev + 1L)
      }
      val all = recent.get().toSeq
      val tail = all.takeRight(keep)
      if (all.length > keep) recent.put(tail.toArray) // trim the ring
      val counts = byType.iterator().toMap
      Iterator.single(UserActivity(key, tail, counts))
    }
  }

  def userActivity(events: Dataset[EventRow], keep: Int = 3): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new ActivityProcessor(keep), TimeMode.None(), OutputMode.Update)
  }

  /** Idle-session detection on TIMERS: each event for a key re-arms a
    * timer; when the key goes quiet the timer fires and
    * `handleExpiredTimer` emits the session summary and clears state —
    * the transformWithState capability the classic flatMapGroupsWithState
    * timeout API only approximates. Subclasses choose the clock via
    * [[timerTarget]]; re-arming is forward-only (a new target never pulls
    * an armed timer earlier), correct for both clocks. */
  abstract class BaseSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, SessionSummary] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var agg: org.apache.spark.sql.streaming.ValueState[UserCounter] = _
    @transient private var armed: org.apache.spark.sql.streaming.ValueState[Long] = _
    /** Timer expiry (ms) for a batch whose max event timestamp is given. */
    protected def timerTarget(maxEventTsMs: Long, gapMs: Long,
        timers: org.apache.spark.sql.streaming.TimerValues): Long
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[UserCounter]("sess",
        org.apache.spark.sql.Encoders.product[UserCounter], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed_at",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionSummary] = {
      val prev = Option(agg.get()).getOrElse(UserCounter(key, 0L, 0.0))
      var n = prev.n_events; var v = prev.total_value; var maxTs = Long.MinValue
      rows.foreach { r =>
        n += 1; v += r.value; maxTs = math.max(maxTs, r.ts.getTime)
      }
      agg.update(UserCounter(key, n, v))
      val at = timerTarget(maxTs, gapMs, timers)
      if (!armed.exists() || armed.get() < at) { // forward-only re-arm
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(at)
        armed.update(at)
      }
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = Option(agg.get())
        .map(c => SessionSummary(key, c.n_events, c.total_value))
      agg.clear(); armed.clear()
      out.iterator
    }
  }

  /** Wall-clock sessions: the timer re-arms `gapMs` of PROCESSING time
    * ahead on every batch with input for the key. */
  class SessionTimerProcessor(gapMs: Long) extends BaseSessionProcessor(gapMs) {
    override protected def timerTarget(maxEventTsMs: Long, gap: Long,
        timers: org.apache.spark.sql.streaming.TimerValues): Long =
      timers.getCurrentProcessingTimeInMs() + gap
  }

  def idleSessions(events: Dataset[EventRow], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.ProcessingTime(), OutputMode.Update)
  }

  // ---- Streaming twins of the product-analytics pair (q_funnel_stages /
  // q_retention_cohorts): per-user first-touch state is 3 timestamps /
  // 1 date — O(|users|) state total, the same bound as the batch
  // hash-agg, partitioned by the shuffle on user_id.

  final case class FunnelTouch(tv: Long, tc: Long, tp: Long)
  final case class FunnelStage(user_id: Long, stage: Int)

  /** Streaming funnel: tracks each user's first view/click/purchase
    * timestamps in ValueState and emits the user's current funnel stage
    * (same STRICT ordering CASE as the batch query — each stage must
    * follow the previous one in event time) whenever a batch contains
    * that user's events. Update-mode semantics: the latest emit per user
    * is the answer; the stage-count matrix is one tiny downstream agg. */
  class FunnelProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, FunnelStage] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    private val Unset = Long.MaxValue
    @transient private var touch: org.apache.spark.sql.streaming.ValueState[FunnelTouch] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      touch = getHandle.getValueState[FunnelTouch]("touch",
        org.apache.spark.sql.Encoders.product[FunnelTouch], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[FunnelStage] = {
      val prev = Option(touch.get()).getOrElse(FunnelTouch(Unset, Unset, Unset))
      var tv = prev.tv; var tc = prev.tc; var tp = prev.tp
      rows.foreach { r =>
        // epoch-µs, not Timestamp.getTime (ms): the batch oracle compares
        // first-touch order at µs precision, and two touches inside the
        // same millisecond must order the same way on both sides.
        val t = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
          r.ts.getNanos / 1000L
        r.event_type match {
          case "view" => tv = math.min(tv, t)
          case "click" => tc = math.min(tc, t)
          case "purchase" => tp = math.min(tp, t)
          case _ => ()
        }
      }
      touch.update(FunnelTouch(tv, tc, tp))
      val stage =
        if (tv == Unset) 0
        else if (tc == Unset || tc <= tv) 1
        else if (tp == Unset || tp <= tc) 2
        else 3
      Iterator.single(FunnelStage(key, stage))
    }
  }

  def funnelStages(events: Dataset[EventRow]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update)
  }

  final case class CohortCell(user_id: Long, cohort_wk: Long, offset_wk: Long)

  /** Streaming retention enrichment: maintains each user's first-seen
    * date in ValueState and emits one (user, cohort-week, offset-week)
    * cell per input event; the distinct-user matrix is a downstream agg
    * over the emitted cells. First-touch is exact when events arrive
    * within watermark order per user (an event EARLIER than the user's
    * current first-seen date re-bases d0 and re-emits its own cell, but
    * cells already emitted against the old base are not retracted — the
    * same horizon contract as every watermark-governed operator here). */
  class RetentionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, CohortCell] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    private val Epoch = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    @transient private var first: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[Long]("first_day",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[CohortCell] = {
      val batch = rows.toSeq
      // UTC day math, not toLocalDateTime (JVM-default TZ): the batch
      // oracle runs under spark.sql.session.timeZone=UTC, so cohort days
      // must be host-TZ independent.
      val days = batch.map(r =>
        r.ts.toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDate.toEpochDay)
      var d0 = if (first.exists()) first.get() else Long.MaxValue
      d0 = math.min(d0, days.min)
      first.update(d0)
      days.map { d =>
        CohortCell(key,
          math.floorDiv(d0 - Epoch, 7L), math.floorDiv(d - d0, 7L))
      }.distinct.iterator
    }
  }

  def retentionCells(events: Dataset[EventRow]): Dataset[CohortCell] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new RetentionProcessor, TimeMode.None(), OutputMode.Update)
  }

  /** Event-time twin of [[SessionTimerProcessor]]: the timer is armed at
    * (max event ts in batch) + gap and fires when the WATERMARK passes it
    * — sessions close deterministically from the data's own clock, immune
    * to wall-clock skew between executors. */
  class EventTimeSessionProcessor(gapMs: Long) extends BaseSessionProcessor(gapMs) {
    override protected def timerTarget(maxEventTsMs: Long, gap: Long,
        timers: org.apache.spark.sql.streaming.TimerValues): Long =
      maxEventTsMs + gap
  }

  def idleSessionsEventTime(events: Dataset[EventRow], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new EventTimeSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Update)
  }

  final case class PathEvent(us: Long, eid: Long, ini: String)
  final case class SessionPathRow(user_id: Long, sess_no: Long, path: String)

  /** Streaming session-path miner — the stateful twin of the batch
    * q_session_paths sessionizer: every user's (epoch-µs, event_id,
    * initial) triples accumulate in ListState; each batch re-derives the
    * user's FULL session decomposition (sort by (us, eid), split on 1h
    * gaps, number sessions in order) and re-emits every (user, sess_no,
    * path) row. Update-mode semantics: the latest emit per (user,
    * sess_no) is the answer — a new event can only extend the LAST
    * session or open a new one when arrival respects event-time order
    * per user, so earlier session numbers are stable under the same
    * watermark contract as every operator here. In batch execution the
    * single handleInputRows call per user makes the emit set exact. */
  class SessionPathsProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, SessionPathRow] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var evs: org.apache.spark.sql.streaming.ListState[PathEvent] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      evs = getHandle.getListState[PathEvent]("evs",
        org.apache.spark.sql.Encoders.product[PathEvent], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionPathRow] = {
      rows.foreach { r =>
        // epoch-µs, the FunnelProcessor precedent: same-millisecond
        // events must order identically to the batch oracle
        val t = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
          r.ts.getNanos / 1000L
        evs.appendValue(PathEvent(t, r.event_id, r.event_type.substring(0, 1)))
      }
      val sorted = evs.get().toSeq.sortBy(e => (e.us, e.eid))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionPathRow]
      var sess = 0L
      var prev = Long.MinValue
      val sb = new StringBuilder
      def flush(): Unit = if (sb.nonEmpty) {
        out += SessionPathRow(key, sess, sb.result())
        sb.clear()
      }
      sorted.foreach { e =>
        if (prev != Long.MinValue && e.us - prev > gapUs) { flush(); sess += 1 }
        sb ++= e.ini
        prev = e.us
      }
      flush()
      out.iterator
    }
  }

  def sessionPaths(events: Dataset[EventRow],
      gapUs: Long = 3600000000L): Dataset[SessionPathRow] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new SessionPathsProcessor(gapUs),
        TimeMode.None(), OutputMode.Update)
  }

  final case class BurstEpisode(event_type: String, start_hr: Long,
      end_hr: Long, len_hrs: Long, n_burst: Long, peak: Long)

  /** Streaming burst detector — the stateful twin of the batch
    * q_burst_detect: per event type, hourly counts accumulate in
    * MapState (hour → count, state bounded by the calendar); each batch
    * re-derives the full episode set from the current counts (threshold
    * cnt·n_hours > 2·n_events integer-cross-multiplied, islands over
    * the sorted burst hours) and re-emits it — update-mode latest-wins,
    * the SessionPathsProcessor contract. In batch execution the single
    * handleInputRows call per type makes the emit set exact.
    *
    * INCREMENTAL-CONSUMER CAVEAT (r10 ADVICE): latest-wins keying by
    * (event_type, start_hr) is NOT stable across batches — later data
    * can merge, extend leftward, or dissolve an episode, changing its
    * start_hr, and the previously emitted row under the old start_hr
    * is never overwritten or retracted. A consumer maintaining
    * incremental state must therefore treat each batch's emit set as a
    * FULL REPLACEMENT of that event_type's episodes (the processor
    * re-emits the complete per-type set every batch precisely to make
    * that cheap), not as per-episode upserts. Exactness of the gated
    * q_burst_stream_twin holds in single-batch execution either way. */
  class BurstProcessor(epochUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, EventRow, BurstEpisode] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var counts: org.apache.spark.sql.streaming.MapState[Long, Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long]("hourly",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[BurstEpisode] = {
      rows.foreach { r =>
        val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
          r.ts.getNanos / 1000L
        val hr = Math.floorDiv(us - epochUs, 3600000000L)
        counts.updateValue(hr,
          (if (counts.containsKey(hr)) counts.getValue(hr) else 0L) + 1L)
      }
      val hourly = counts.iterator().map(p => (p._1, p._2)).toSeq.sortBy(_._1)
      val nEv = hourly.map(_._2).sum
      val nHr = hourly.size.toLong
      val burst = hourly.filter { case (_, c) => c * nHr > nEv * 2 }
      val out = scala.collection.mutable.ArrayBuffer.empty[BurstEpisode]
      burst.zipWithIndex.groupBy { case ((h, _), i) => h - i }.values
        .foreach { run =>
          val hs = run.map(_._1)
          out += BurstEpisode(key, hs.map(_._1).min, hs.map(_._1).max,
            hs.size.toLong, hs.map(_._2).sum, hs.map(_._2).max)
        }
      out.iterator
    }
  }

  def burstEpisodes(events: Dataset[EventRow],
      epochUs: Long = 1704067200000000L): Dataset[BurstEpisode] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.event_type)
      .transformWithState(new BurstProcessor(epochUs),
        TimeMode.None(), OutputMode.Update)
  }

  /** Per-user time-to-event firsts for the Kaplan–Meier twin: first
    * event instant, first purchase instant (µs; has_p = false ⇒ fp_us
    * is a placeholder and the user is administratively censored
    * downstream). */
  final case class SurvivalFirsts(user_id: Long, fe_us: Long,
      fp_us: Long, has_p: Boolean)

  /** The stateful half of the streaming Kaplan–Meier twin
    * (q_survival_stream_twin): per-user ValueState carries the running
    * (first event, first purchase) pair; each batch folds its rows in
    * by min-merge (order-independent, so multi-batch and single-batch
    * execution converge to identical state) and re-emits the user's
    * current row — update-mode latest-wins, the SessionPathsProcessor
    * contract. A later batch can flip a user from censored to event
    * (first purchase arrives) or move fe_us earlier; the emitted row
    * replaces the previous one wholesale. The product-limit table
    * itself is DOWNSTREAM of this operator (shared with the batch
    * query), because administrative censoring times move with the
    * corpus horizon and are therefore not per-user state. State is two
    * longs + a flag per user — the q_counter_state_twin bound. */
  class SurvivalProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, SurvivalFirsts] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[SurvivalFirsts] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SurvivalFirsts]("firsts",
        org.apache.spark.sql.Encoders.product[SurvivalFirsts],
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SurvivalFirsts] = {
      def us(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      var cur = Option(state.get())
        .getOrElse(SurvivalFirsts(key, Long.MaxValue, Long.MaxValue, false))
      rows.foreach { r =>
        val u = us(r.ts)
        val fe = math.min(cur.fe_us, u)
        val (fp, hp) =
          if (r.event_type == "purchase") (math.min(cur.fp_us, u), true)
          else (cur.fp_us, cur.has_p)
        cur = SurvivalFirsts(key, fe, fp, hp)
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }

  def survivalFirsts(events: Dataset[EventRow]): Dataset[SurvivalFirsts] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new SurvivalProcessor,
        TimeMode.None(), OutputMode.Update)
  }

  /** Dedup keeper emitted by [[DedupProcessor]]: the admitted (first)
    * event per (user, event_type, event-day) key plus the additive
    * arrival count — n − 1 arrivals were suppressed as duplicates. */
  final case class DedupKeeper(user_id: Long, event_type: String,
    day: Long, keep_us: Long, keep_eid: Long, n: Long)

  /** TTL'd streaming dedup — the stateful half of the 8th twin
    * (q_dedup_stream_twin): frequency-cap dedup keyed by the DEDUP KEY
    * itself ((user, event_type, event-day) — "admit at most one event
    * per user/type/day", the production event-throttling shape).
    * ValueState carries the keeper (lexicographic min on (µs,
    * event_id) — order-independent min-merge, so multi-batch ≡
    * single-batch state, the SurvivalProcessor contract) and the
    * ADDITIVE arrival count; each batch re-emits the key's current row,
    * update-mode latest-wins (an out-of-order earlier arrival REPLACES
    * the keeper wholesale — consumers treat emits per key as full
    * replacement). `ttlMs` is the production state bound: a key's
    * keeper silently expires after the duration (requires
    * TimeMode.ProcessingTime), so a duplicate arriving past the TTL
    * re-admits — the standard bounded-state dedup trade (state size ∝
    * keys active within the TTL window, not corpus history). The gated
    * batch query runs ttl = None (TimeMode.None): single-batch
    * execution sees every arrival in one handleInputRows call, so the
    * emit set is exactly the batch argmin — the oracle's window rank. */
  class DedupProcessor(ttlMs: Option[Long] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, String, Long), EventRow, DedupKeeper] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[DedupKeeper] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      val ttl = ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
        .getOrElse(TTLConfig.NONE)
      state = getHandle.getValueState[DedupKeeper]("keeper",
        org.apache.spark.sql.Encoders.product[DedupKeeper], ttl)
    }
    override def handleInputRows(key: (Long, String, Long),
        rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[DedupKeeper] = {
      val (u, t, day) = key
      var cur = Option(state.get())
        .getOrElse(DedupKeeper(u, t, day, Long.MaxValue, Long.MaxValue, 0L))
      rows.foreach { r =>
        val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
          r.ts.getNanos / 1000L
        val keep =
          if (us < cur.keep_us ||
            (us == cur.keep_us && r.event_id < cur.keep_eid))
            (us, r.event_id)
          else (cur.keep_us, cur.keep_eid)
        cur = DedupKeeper(u, t, day, keep._1, keep._2, cur.n + 1L)
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }

  def dedupKeepers(events: Dataset[EventRow],
      ttlMs: Option[Long] = None,
      epochUs: Long = 1704067200000000L): Dataset[DedupKeeper] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode =
      if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey { r =>
      val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
        r.ts.getNanos / 1000L
      (r.user_id, r.event_type, Math.floorDiv(us - epochUs, 86400000000L))
    }.transformWithState(new DedupProcessor(ttlMs), timeMode,
      OutputMode.Update)
  }

  /** Per-day distinct-user HLL sketch emitted by [[HllDayProcessor]] —
    * the serialized DataSketches HLL (lgK 12, HLL_8: the exact
    * parameters of Spark's `hll_sketch_agg` default, so the batch
    * query's union/estimate machinery reads these bytes verbatim). */
  final case class HllDaySketch(day: Long, sk: Array[Byte])

  /** Streaming cardinality sketches — the stateful half of the 9th
    * twin (q_hll_stream_twin): per event-day key, ValueState holds ONE
    * serialized HLL sketch; each batch heapifies it, folds the batch's
    * user_ids in, re-serializes, and re-emits the day's sketch —
    * update-mode latest-wins, the SessionPathsProcessor contract. HLL
    * registers are a MAX-merge (and the small-n LIST/SET modes hold
    * exact coupon sets), so the final state depends only on the SET of
    * user_ids seen, never on arrival order or batch boundaries:
    * multi-batch ≡ single-batch estimates (proven in StreamingSpec).
    * State is |days| × ≤ 2^lgK bytes — bounded by the calendar, never
    * the corpus: the mergeable-sketch thesis, streamed. This is the
    * production "live distinct-users dashboard" shape: the cumulative
    * time series derives DOWNSTREAM by unioning the emitted day
    * sketches (shared verbatim with the batch q_hll_cum_users), because
    * cumulative state would re-aggregate history per batch. */
  class HllDayProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, HllDaySketch] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("sk",
        org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[HllDaySketch] = {
      val sk =
        if (state.exists())
          org.apache.datasketches.hll.HllSketch.heapify(state.get())
        else new org.apache.datasketches.hll.HllSketch(12,
          org.apache.datasketches.hll.TgtHllType.HLL_8)
      rows.foreach(r => sk.update(r.user_id))
      val bytes = sk.toUpdatableByteArray
      state.update(bytes)
      Iterator.single(HllDaySketch(key, bytes))
    }
  }

  def hllDaySketches(events: Dataset[EventRow],
      epochUs: Long = 1704067200000000L): Dataset[HllDaySketch] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey { r =>
      val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
        r.ts.getNanos / 1000L
      Math.floorDiv(us - epochUs, 86400000000L)
    }.transformWithState(new HllDayProcessor, TimeMode.None(),
      OutputMode.Update)
  }

  /** Per-day EXACT value quantiles emitted by [[QuantileHistProcessor]]
    * — the live latency/value-dashboard row (n, p50/p90/p99 on the
    * declared cents grid). */
  final case class DayQuantiles(day: Long, n: Long, p50_c: Long,
    p90_c: Long, p99_c: Long)

  /** Streaming exact quantiles — the stateful half of the 10th twin
    * (q_quantile_stream_twin), and the answer to "which quantile state
    * is mergeable": t-digest is insertion-order-dependent and GK is
    * batch-boundary-dependent, but an ADDITIVE COUNT HISTOGRAM on a
    * declared bounded grid is the trivially mergeable exact form —
    * per event-day key, MapState[cents → count] (values land once on
    * the e2 cents grid, clamped to [0, 65535] so out-of-range mass
    * sits in the edge key and state is hard-bounded at 65536 entries
    * per day regardless of corpus size). Counts are additive, so the
    * final state depends only on the MULTISET of values seen — arrival
    * order and batch boundaries cannot move it: multi-batch ≡
    * single-batch, proven in StreamingSpec. Each batch folds its rows
    * into the map, then derives the day's quantiles from the full
    * (state-bounded, ≤65536-entry) histogram and re-emits — update-
    * mode latest-wins. Quantile rule (declared, integer-exact): p-th
    * percentile = the smallest c whose cumulative count reaches
    * ⌈p·n/100⌉ — the classic inverse-ECDF definition, identical
    * integer arithmetic in the DuckDB oracle. */
  class QuantileHistProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, DayQuantiles] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var hist: org.apache.spark.sql.streaming.MapState[Long, Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      hist = getHandle.getMapState[Long, Long]("hist",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[DayQuantiles] = {
      rows.foreach { r =>
        // the engine-wide cents rule: round(value·100) HALF_UP, then
        // the declared [0, 65535] clamp (edge keys absorb outliers)
        val cRaw = new java.math.BigDecimal(r.value * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        val c = math.min(65535L, math.max(0L, cRaw))
        val cur = if (hist.containsKey(c)) hist.getValue(c) else 0L
        hist.updateValue(c, cur + 1L)
      }
      val entries = hist.iterator().toArray.sortBy(_._1)
      val n = entries.map(_._2).sum
      def q(p: Long): Long = {
        val target = (p * n + 99L) / 100L // ⌈p·n/100⌉ for positive n
        var cum = 0L
        var i = 0
        while (i < entries.length) {
          cum += entries(i)._2
          if (cum >= target) return entries(i)._1
          i += 1
        }
        entries.last._1
      }
      Iterator.single(DayQuantiles(key, n, q(50), q(90), q(99)))
    }
  }

  def quantileDayHist(events: Dataset[EventRow],
      epochUs: Long = 1704067200000000L): Dataset[DayQuantiles] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey { r =>
      val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
        r.ts.getNanos / 1000L
      Math.floorDiv(us - epochUs, 86400000000L)
    }.transformWithState(new QuantileHistProcessor, TimeMode.None(),
      OutputMode.Update)
  }

  /** Per-day heavy-hitter row emitted by [[MgDayProcessor]] — the live
    * "top items today" dashboard row. */
  final case class DayTopItem(day: Long, item: String, cnt: Long,
    rank: Long)

  /** Streaming Misra–Gries heavy hitters — the stateful half of the
    * 11th twin (q_heavyhitters_stream_twin): per event-day key, ONE
    * serialized [[graft.functions.MGSummary]] in ValueState (≤ k
    * counters — state hard-bounded at k entries per day at ANY corpus
    * size). Each batch folds its rows into a BATCH-LOCAL summary and
    * then summary-MERGES it into the state — deliberately exercising
    * the PODS'12 mergeable path (the 100 TB segment-rollup shape), not
    * pointwise adds. MG contents are processing-order-specific in
    * general, so the GATE runs the item domain BELOW k (event_type,
    * \|types\| ≤ 5 « k = 32), where no decrement can ever fire and the
    * summary is provably the EXACT count map — order- and
    * batch-insensitive (multi-batch ≡ single-batch, proven in
    * StreamingSpec), the quantile-twin exactness thesis applied to the
    * frequent-items sketch. Above-k domains keep only the deterministic
    * BOUNDS (presence of every item with true count > n/(k+1);
    * estimates never overcount; undercount ≤ n/(k+1)) — asserted in
    * StreamingSpec on a k = 2 synthetic stream. Each batch re-emits the
    * day's full ranked counter table, update-mode latest-wins. */
  class MgDayProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, DayTopItem] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("mg",
        org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[DayTopItem] = {
      val batch = new graft.functions.MGSummary(k)
      rows.foreach(r => batch.add(r.event_type))
      val cur =
        if (state.exists()) graft.functions.MGSummary.deserialize(state.get())
        else new graft.functions.MGSummary(k)
      cur.mergeIn(batch)
      state.update(cur.serialize())
      cur.counts.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
        .iterator.map { case ((t, c), i) => DayTopItem(key, t, c, i + 1L) }
    }
  }

  def mgDayTop(events: Dataset[EventRow], k: Int = 32,
      epochUs: Long = 1704067200000000L): Dataset[DayTopItem] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey { r =>
      val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
        r.ts.getNanos / 1000L
      Math.floorDiv(us - epochUs, 86400000000L)
    }.transformWithState(new MgDayProcessor(k), TimeMode.None(),
      OutputMode.Update)
  }

  final case class WinTopItem(win: Long, win_start_day: Long,
    item: String, cnt: Long, rank: Long)

  /** WINDOWED TOP-K WITH STATE EVICTION (twin #12) — the per-day
    * Misra–Gries twin composed with a per-window lifetime: keys are
    * 7-day tumbling windows, state is one serialized MG(k) summary
    * per OPEN window, and in event-time mode (`evict = true`) each
    * window registers a timer at its own event-time END — when the
    * watermark passes it, the timer fires, the processor emits a
    * final `__closed__` tombstone carrying the summary's item count,
    * and CLEARS the state, so total state is bounded by the number of
    * windows still inside the watermark horizon, never by the stream
    * length. Batch/gate mode (`evict = false`, TimeMode.None) shares
    * the identical fold/merge/emit path with no timers — one batch,
    * nothing to evict. The eviction ≡ batch proof (tombstone per
    * closed window + the state store row count actually dropping)
    * lives in StreamingSpec's multi-batch MemoryStream run. */
  class WinTopProcessor(k: Int, winUs: Long, epochUs: Long, evict: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, WinTopItem] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Array[Byte]] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("wintop",
        org.apache.spark.sql.Encoders.BINARY, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[WinTopItem] = {
      val batch = new graft.functions.MGSummary(k)
      rows.foreach(r => batch.add(r.event_type))
      val cur =
        if (state.exists()) graft.functions.MGSummary.deserialize(state.get())
        else new graft.functions.MGSummary(k)
      cur.mergeIn(batch)
      state.update(cur.serialize())
      // re-registering the same expiry is idempotent (timers key on
      // the timestamp), so every batch may safely re-arm it
      if (evict) getHandle.registerTimer((epochUs + (key + 1) * winUs) / 1000L)
      cur.counts.toSeq.sortBy { case (t, c) => (-c, t) }.zipWithIndex
        .iterator.map { case ((t, c), i) =>
          WinTopItem(key, key * (winUs / 86400000000L), t, c, i + 1L) }
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[WinTopItem] = {
      val n = if (state.exists())
        graft.functions.MGSummary.deserialize(state.get()).counts.size
      else 0
      state.clear()
      Iterator.single(WinTopItem(key, key * (winUs / 86400000000L),
        "__closed__", n.toLong, 0L))
    }
  }

  def winTop(events: Dataset[EventRow], k: Int = 32, winDays: Long = 7L,
      epochUs: Long = 1704067200000000L,
      evict: Boolean = false): Dataset[WinTopItem] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val winUs = winDays * 86400000000L
    val src = if (evict) events.withWatermark("ts", "1 hour") else events
    src.groupByKey { r =>
      val us = Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
        r.ts.getNanos / 1000L
      Math.floorDiv(us - epochUs, winUs)
    }.transformWithState(new WinTopProcessor(k, winUs, epochUs, evict),
      if (evict) TimeMode.EventTime() else TimeMode.None(),
      OutputMode.Update)
  }

  /** One closed (or batch-final) session emitted by
    * [[SessionTopProcessor]]: the session's exact start, its event and
    * distinct-item mass, the top item under the deterministic
    * (count desc, item) order, and HOW it closed — 'gap' (a later
    * event opened the next session), 'final' (batch end), or 'timer'
    * (event-time watermark eviction). */
  final case class SessionTopRow(user_id: Long, session_start_us: Long,
    n_events: Long, n_types: Long, top_item: String, top_cnt: Long,
    closed_by: String)

  /** SESSION-WINDOW TOP-K WITH GAP EVICTION (twin #13) — the
    * Misra–Gries summary composed with the SESSIONIZER's gap logic
    * (twin #12 gave windows a fixed lifetime; sessions have a DATA-
    * DEPENDENT one: the window closes when the user goes quiet for
    * `gapUs`). State per user is (session_start, last_event, MG(k)
    * bytes). Within a batch, rows are ordered by (event-time,
    * event_id) and gaps split sessions inline — each closed session
    * emits immediately ('gap'); the open tail is carried in state. In
    * event-time mode the processor moves ONE timer to
    * last_event + gap on every batch (delete-then-register — timers
    * key on their timestamp, so a moved deadline must delete the old
    * one or a stale early timer would close a still-live session);
    * when the watermark passes it, the session emits as 'timer' and
    * the state CLEARS — total state is bounded by the count of users
    * active inside the watermark horizon, never the stream length. In
    * batch/gate mode (TimeMode.None) the identical walk runs once and
    * the open tail emits as 'final', so batch output is EXACTLY the
    * full sessionization — oracled by the lag/cumsum session SQL.
    * The per-key sort buffers one user's batch slice — bounded by a
    * user's own history, the declared posture of every session
    * processor in this file. */
  class SessionTopProcessor(k: Int, gapUs: Long, evict: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, SessionTopRow] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[
      (Long, Long, Array[Byte])] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long, Array[Byte])]("sess",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY), TTLConfig.NONE)
    private def usOf(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    private def row(key: Long, start: Long,
        mg: graft.functions.MGSummary, how: String): SessionTopRow = {
      // n_events is mg.n — the EXACT stream length the summary always
      // tracks, decrements or not. n_types (map size) and top_cnt are
      // exact ONLY while the session's distinct domain stayed <= k.
      // Policy (r15 ADVICE): in batch/gate mode (evict = false, where
      // the output is hash-compared against the DuckDB oracle) a
      // k-overflow fails LOUDLY — silently undercounting would corrupt
      // the gate. In long-running event-time mode (evict = true) one
      // data-dependent session must NOT kill the whole streaming query:
      // emit the row flagged approximate ("~" suffix on `how`) so the
      // consumer can quarantine it, and keep n_events exact.
      if (!evict) require(!mg.decremented,
        s"SessionTopProcessor: user $key session has > $k distinct event" +
          " types — MG decremented, n_types/top_cnt would be estimates;" +
          " raise k or declare the query approximate")
      val cs = mg.counts.toSeq
      // a decremented summary can be EMPTY (k=2 fed a,b,c: the third
      // distinct type decrements every count to zero) — the approximate
      // row still emits, with an empty top and the ~ flag
      val (top, cnt) =
        if (cs.isEmpty) ("", 0L) else cs.minBy { case (t, c) => (-c, t) }
      SessionTopRow(key, start, mg.n, cs.size.toLong, top, cnt,
        if (mg.decremented) how + "~" else how)
    }
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues):
        Iterator[SessionTopRow] = {
      val sorted = rows.toArray.sortBy(r => (usOf(r.ts), r.event_id))
      val out = Seq.newBuilder[SessionTopRow]
      var (start, last, mgBytes) =
        if (state.exists()) state.get() else (-1L, -1L, null: Array[Byte])
      var cur = if (mgBytes == null) new graft.functions.MGSummary(k)
        else graft.functions.MGSummary.deserialize(mgBytes)
      sorted.foreach { r =>
        val us = usOf(r.ts)
        if (start >= 0L && us - last > gapUs) {
          out += row(key, start, cur, "gap")
          cur = new graft.functions.MGSummary(k)
          start = us
        } else if (start < 0L) start = us
        cur.add(r.event_type)
        last = us
      }
      if (evict) {
        state.update((start, last, cur.serialize()))
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        getHandle.registerTimer((last + gapUs) / 1000L)
      } else {
        out += row(key, start, cur, "final")
        state.update((start, last, cur.serialize()))
      }
      out.result().iterator
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[SessionTopRow] = {
      val out = if (state.exists()) {
        val (start, _, mgBytes) = state.get()
        Iterator.single(row(key, start,
          graft.functions.MGSummary.deserialize(mgBytes), "timer"))
      } else Iterator.empty
      state.clear()
      out
    }
  }

  def sessionTop(events: Dataset[EventRow], k: Int = 32,
      gapUs: Long = 86400000000L,
      evict: Boolean = false): Dataset[SessionTopRow] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val src = if (evict) events.withWatermark("ts", "1 hour") else events
    src.groupByKey(_.user_id)
      .transformWithState(new SessionTopProcessor(k, gapUs, evict),
        if (evict) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Update)
  }

  /** One matched (purchase, click) pair from [[IntervalJoinProcessor]]
    * — the q_stream_interval_join output contract. */
  final case class IntervalJoinOut(p_id: Long, p_user: Long, p_ts_us: Long,
    p_value: Double, c_ts_us: Long)
  /** Buffered purchase awaiting late clicks. */
  final case class BufPurchase(id: Long, us: Long, value: Double)
  /** Buffered click awaiting late purchases. */
  final case class BufClick(us: Long)

  /** STATEFUL STREAM-STREAM INTERVAL JOIN (twin #14) — the two-sided
    * buffered join Spark's native stream-stream join runs internally,
    * expressed as an explicit StatefulProcessor so the STATE BOUND is
    * a provable contract instead of an engine internal: per user, two
    * ListStates buffer unmatched purchases and clicks; each batch joins
    * new purchases against (buffered + new) clicks and new clicks
    * against buffered purchases — every qualifying pair
    * (c ∈ [p − win, p)) emits exactly once, because a pair is emitted
    * only when its LATER-ARRIVING side is new. In event-time mode the
    * watermark drives TWO-SIDED eviction: a purchase at p can never
    * match once wm > p (all future clicks have ts ≥ wm ≥ p, and the
    * join needs c < p); a click at c can never match once
    * wm > c + win (future purchases have p ≥ wm > c + win, and the
    * join needs p ≤ c + win) — both prune inline per batch, and ONE
    * re-armed timer (delete-then-register, the SessionTop pattern)
    * sweeps IDLE users at their earliest future deadline, so total
    * state is bounded by the rows inside the watermark horizon on
    * each side, never the stream length. Batch/gate mode
    * (TimeMode.None) runs the identical single-pass join — output is
    * EXACTLY the batch interval join, oracled by the same SQL as
    * q_stream_interval_join. The two-sided eviction ≡ no-eviction
    * output equality and the state-store row-count drop are
    * StreamingSpec's multi-batch proofs. */
  class IntervalJoinProcessor(winUs: Long, evict: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, IntervalJoinOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var pbuf: org.apache.spark.sql.streaming.ListState[BufPurchase] = _
    @transient private var cbuf: org.apache.spark.sql.streaming.ListState[BufClick] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      pbuf = getHandle.getListState[BufPurchase]("pbuf",
        org.apache.spark.sql.Encoders.product[BufPurchase], TTLConfig.NONE)
      cbuf = getHandle.getListState[BufClick]("cbuf",
        org.apache.spark.sql.Encoders.product[BufClick], TTLConfig.NONE)
    }
    private def usOf(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    /** Drop provably-unmatchable buffered rows; returns survivors. */
    private def prune(wmUs: Long): (Array[BufPurchase], Array[BufClick]) = {
      val ps = pbuf.get().filter(_.us >= wmUs).toArray
      val cs = cbuf.get().filter(_.us + winUs >= wmUs).toArray
      // the store rejects empty list writes — clear() is the empty put
      if (ps.isEmpty) pbuf.clear() else pbuf.put(ps)
      if (cs.isEmpty) cbuf.clear() else cbuf.put(cs)
      (ps, cs)
    }
    /** Earliest future event-time at which something becomes evictable
      * (ms, exclusive passage → +1). */
    private def nextDeadlineMs(ps: Array[BufPurchase],
        cs: Array[BufClick]): Option[Long] = {
      val cands = ps.map(_.us) ++ cs.map(_.us + winUs)
      if (cands.isEmpty) None else Some(cands.min / 1000L + 1L)
    }
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues):
        Iterator[IntervalJoinOut] = {
      val rs = rows.toArray
      val np = rs.filter(_.event_type == "purchase")
        .map(r => BufPurchase(r.event_id, usOf(r.ts), r.value))
      val nc = rs.filter(_.event_type == "click")
        .map(r => BufClick(usOf(r.ts)))
      val bufP = pbuf.get().toArray
      val bufC = cbuf.get().toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[IntervalJoinOut]
      def matches(p: BufPurchase, c: BufClick): Boolean =
        c.us >= p.us - winUs && c.us < p.us
      for (p <- np; c <- bufC ++ nc if matches(p, c))
        out += IntervalJoinOut(p.id, key, p.us, p.value, c.us)
      for (p <- bufP; c <- nc if matches(p, c))
        out += IntervalJoinOut(p.id, key, p.us, p.value, c.us)
      if (np.nonEmpty) pbuf.appendList(np)
      if (nc.nonEmpty) cbuf.appendList(nc)
      if (evict) {
        val (ps, cs) = prune(timers.getCurrentWatermarkInMs() * 1000L)
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        nextDeadlineMs(ps, cs).foreach(getHandle.registerTimer)
      }
      out.iterator
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[IntervalJoinOut] = {
      val (ps, cs) = prune(timerValues.getCurrentWatermarkInMs() * 1000L)
      nextDeadlineMs(ps, cs).foreach(getHandle.registerTimer)
      Iterator.empty
    }
  }

  def intervalJoin(events: Dataset[EventRow],
      winUs: Long = 3600000000L,
      evict: Boolean = false): Dataset[IntervalJoinOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val src = if (evict) events.withWatermark("ts", "1 hour") else events
    src.groupByKey(_.user_id)
      .transformWithState(new IntervalJoinProcessor(winUs, evict),
        if (evict) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append)
  }

  /** One session boundary from [[SessionBoundsProcessor]] — `delta` is
    * +1 at a session start, −1 at its end; `ts` re-anchors event time
    * so the downstream per-day stage can watermark on it. */
  final case class SessBound(day: Long, us: Long, delta: Long,
    ts: java.sql.Timestamp)
  /** One finalized day from [[SweepLineProcessor]]: boundary counts +
    * the day's internal peak and net (the cross-day carry is the
    * consumer's ≤|days| rollup, not stream state). */
  final case class DayConcurrency(day: Long, starts: Long, ends: Long,
    in_peak: Long, net: Long)

  /** STREAMING TWIN #15, stage 1 — the gap sessionizer emitting ±1
    * boundary rows (the sweep-line input of q_session_concurrency).
    * Same per-user posture as every session processor in this file:
    * state = (start, last) per user, a re-armed idle timer at
    * last + gap, per-batch slice sorted; cross-batch order is the
    * watermark's contract (the declared posture of all the twins —
    * a within-allowance straggler that would extend a session
    * BACKWARD shifts its recorded start; the batch gate is exact).
    *
    * Emission discipline in event-time mode (forced by the chained-
    * operator rule that an emitted row's event time may not lag the
    * watermark): the +1 START boundary emits EAGERLY when the session
    * opens (its instant is the admitting event's own time, never late),
    * the −1 END boundary emits at close (inline gap or idle timer). The
    * emitted `ts` is clamped to the current watermark — it only anchors
    * downstream validity; the boundary's true instant rides in `us`,
    * which is what the sweep sorts on. Batch/gate mode (TimeMode.None)
    * emits start+end pairs from the single full-history walk, open tail
    * included — exactly the batch query's boundary multiset. */
  class SessionBoundsProcessor(gapUs: Long, evict: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, SessBound] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[
      (Long, Long)] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("sess",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    private def usOf(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    /** Boundary row; `ts` clamped to watermark+1ms for the emit check. */
    private def bound(us: Long, delta: Long, wmMs: Long): SessBound =
      SessBound(Math.floorDiv(us, 86400000000L), us, delta,
        new java.sql.Timestamp(math.max(us / 1000L, wmMs + 1L)))
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues):
        Iterator[SessBound] = {
      val wm = if (evict) timers.getCurrentWatermarkInMs() else 0L
      val sorted = rows.toArray.sortBy(r => (usOf(r.ts), r.event_id))
      val out = Seq.newBuilder[SessBound]
      var (start, last) =
        if (state.exists()) state.get() else (-1L, -1L)
      sorted.foreach { r =>
        val us = usOf(r.ts)
        if (start >= 0L && us - last > gapUs) {
          if (evict) out += bound(last, -1L, wm) // close (start already out)
          else out ++= Iterator(bound(start, 1L, wm), bound(last, -1L, wm))
          start = us
          if (evict) out += bound(us, 1L, wm) // eager start
        } else if (start < 0L) {
          start = us
          if (evict) out += bound(us, 1L, wm) // eager start
        }
        last = us
      }
      if (evict) {
        state.update((start, last))
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        getHandle.registerTimer((last + gapUs) / 1000L)
      } else {
        if (start >= 0L) // open tail: final in the single gate batch
          out ++= Iterator(bound(start, 1L, wm), bound(last, -1L, wm))
        state.update((start, last))
      }
      out.result().iterator
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[SessBound] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val out = if (state.exists()) {
        val (start, last) = state.get()
        if (start >= 0L) Iterator.single(bound(last, -1L, wm))
        else Iterator.empty
      } else Iterator.empty
      state.clear()
      out
    }
  }

  /** STREAMING TWIN #15, stage 2 — the per-day sweep line as an explicit
    * StatefulProcessor. Exactly-once under ANY batch split: boundaries
    * BUFFER in a per-day ListState until the day finalizes (batch/gate
    * mode: the single batch holds the whole day; event-time mode: a
    * per-day timer at day-end, watermark-driven), then ONE sort by
    * (us, delta DESC — starts before ends at ties, the batch query's
    * declared tie order), one linear sweep, one emitted row, state
    * CLEARED. State bound: the day's own boundary count (2 × sessions
    * touching the day) — event-driven, not corpus-scale, and freed the
    * moment the watermark passes the day. */
  class SweepLineProcessor(evict: Boolean, slackMs: Long = 0L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessBound, DayConcurrency] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var buf: org.apache.spark.sql.streaming.ListState[
      (Long, Long)] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[(Long, Long)]("bounds",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    private def sweep(key: Long, bs: Array[(Long, Long)]): DayConcurrency = {
      val sorted = bs.sortBy { case (us, d) => (us, -d) }
      var cur = 0L; var peak = 0L
      var starts = 0L; var ends = 0L
      sorted.foreach { case (_, d) =>
        cur += d
        if (cur > peak) peak = cur
        if (d == 1L) starts += 1 else ends += 1
      }
      DayConcurrency(key, starts, ends, peak, cur)
    }
    override def handleInputRows(key: Long, rows: Iterator[SessBound],
        timers: org.apache.spark.sql.streaming.TimerValues):
        Iterator[DayConcurrency] = {
      val incoming = rows.map(b => (b.us, b.delta)).toArray
      if (evict) {
        incoming.foreach(b => buf.appendValue(b))
        // one timer at day end + slack (idle-close latency: a session
        // ENDING in this day is only detected once the watermark passes
        // its last event + gap, so the day's −1 can arrive up to
        // gap + allowance after day end) — re-arming is idempotent
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        getHandle.registerTimer((key + 1) * 86400000L + slackMs)
        Iterator.empty
      } else {
        // batch/gate: the single batch IS the whole day
        Iterator.single(sweep(key, incoming))
      }
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[DayConcurrency] = {
      val bs = buf.get().toArray
      buf.clear()
      if (bs.isEmpty) Iterator.empty
      else Iterator.single(sweep(key, bs.map(r => (r._1, r._2))))
    }
  }

  /** Twin #15 composition: sessionizer boundaries → per-day sweep line.
    * The cross-day CARRY (running net) is deliberately NOT stream state:
    * it is a total order over days, so the consumer applies it on the
    * ≤|days| output frame (the gate query does exactly that) — the same
    * division of labor as the batch query's two-level prefix sum. */
  def sessionConcurrencyDaily(events: Dataset[EventRow],
      gapUs: Long = 3600000000L,
      evict: Boolean = false): Dataset[DayConcurrency] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val src = if (evict) events.withWatermark("ts", "1 hour") else events
    // chained stateful operators: re-defining the watermark downstream is
    // disallowed — stage 1 instead DECLARES its output event-time column
    // ("ts", the boundary's own instant) and Spark propagates the
    // watermark through to the day stage's timers
    val bounds = if (evict)
      src.groupByKey(_.user_id)
        .transformWithState(new SessionBoundsProcessor(gapUs, evict),
          "ts", OutputMode.Append)
    else
      src.groupByKey(_.user_id)
        .transformWithState(new SessionBoundsProcessor(gapUs, evict),
          TimeMode.None(), OutputMode.Append)
    // slack = gap (idle-close latency) + the 1 h watermark allowance
    bounds.groupByKey(_.day)
      .transformWithState(
        new SweepLineProcessor(evict, gapUs / 1000L + 3600000L + 1000L),
        if (evict) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append)
  }

  /** One finalized day of the event series from [[DayCountProcessor]] —
    * `ts` re-anchors event time so the chained seasonal stage inherits
    * the watermark. */
  final case class DayCount(day: Long, n: Long, ts: java.sql.Timestamp)
  /** One finalized detrended day from [[StlSeasonalProcessor]]: the
    * centered-MA trend and residual on the e2 grid — the per-dow
    * seasonal rollup is the consumer's ≤|days| aggregation, not stream
    * state (the twin #15 division of labor). */
  final case class StlResid(day: Long, dow: Long, n: Long,
    trend_e2: Long, resid_e2: Long)

  /** STREAMING TWIN #16, stage 1 — per-day event counts, finalized by
    * watermark timer. State is ONE long per open day; a day emits
    * exactly once, when the watermark passes its end (so every emitted
    * count is complete under the allowance — stragglers beyond it are
    * the watermark contract's declared drop, the posture of all the
    * twins). Batch/gate mode (TimeMode.None): the single batch holds
    * the whole day — emit immediately. */
  class DayCountProcessor(evict: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, DayCount] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    private def row(day: Long, n: Long, wmMs: Long): DayCount =
      DayCount(day, n, new java.sql.Timestamp(
        math.max((day + 1) * 86400000L - 1L, wmMs + 1L)))
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: org.apache.spark.sql.streaming.TimerValues):
        Iterator[DayCount] = {
      val n = rows.size.toLong
      if (!evict) Iterator.single(row(key, n, 0L))
      else {
        cnt.update((if (cnt.exists()) cnt.get() else 0L) + n)
        // idempotent re-arm at day end: fires once the watermark passes
        val it = getHandle.listTimers()
        while (it.hasNext) getHandle.deleteTimer(it.next())
        getHandle.registerTimer((key + 1) * 86400000L)
        Iterator.empty
      }
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[DayCount] = {
      val out = if (cnt.exists())
        Iterator.single(row(key, cnt.get(),
          timerValues.getCurrentWatermarkInMs()))
      else Iterator.empty
      cnt.clear()
      out
    }
  }

  /** STREAMING TWIN #16, stage 2 — the STL-lite detrender as an
    * explicit StatefulProcessor over the finalized daily series
    * (single grouping key: its input is the ≤|days| day frame stage 1
    * already collapsed, never raw events — constant-key is the
    * CORRECT scale posture here, exactly like the gate query's own
    * bounded daily window).
    *
    * Emission is purely ARRIVAL-DRIVEN — no timers, no slack: a
    * stage-1 row only exists once its day is watermark-final, and
    * chained stateful operators deliver all of a micro-batch's
    * upstream emissions in the same downstream batch, so when day D
    * has arrived every event-bearing day < D has too — an absent day
    * ≤ maxSeen is PROVABLY zero, which is exactly the densified-grid
    * semantics of the batch query. Day d emits once d+3 ≤ maxSeen
    * (the batch query's own edge exclusion: residuals need the full
    * ±3 window, and the grid ends at the last OBSERVED day).
    *
    * State bound: a ≤7-day sliding buffer of counts (days < frontier−3
    * pruned the moment the frontier passes), the frontier, and the
    * grid origin — O(1), freed as it slides. Exactly-once per day: the
    * frontier only moves forward. */
  class StlSeasonalProcessor(evict: Boolean)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, DayCount, StlResid] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TTLConfig}
    @transient private var dayN: org.apache.spark.sql.streaming.MapState[Long, Long] = _
    @transient private var meta: org.apache.spark.sql.streaming.ValueState[
      (Long, Long, Long)] = _ // (minDay, maxSeen, frontier; frontier = -1 until first emit)
    override def init(outputMode: OM, timeMode: TimeMode): Unit = {
      dayN = getHandle.getMapState[Long, Long]("dayN",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      meta = getHandle.getValueState[(Long, Long, Long)]("meta",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    }
    /** One finalized residual day: trend = ±3-window sum ·100 div 7
      * (one truncating division — the batch query's grid), absent
      * window days read as 0. */
    private def resid(d: Long): StlResid = {
      var s7 = 0L
      var k = d - 3
      while (k <= d + 3) {
        if (dayN.containsKey(k)) s7 += dayN.getValue(k)
        k += 1
      }
      val n = if (dayN.containsKey(d)) dayN.getValue(d) else 0L
      val trend = Math.floorDiv(s7 * 100L, 7L)
      StlResid(d, d % 7, n, trend, n * 100L - trend)
    }
    override def handleInputRows(key: Long, rows: Iterator[DayCount],
        timers: org.apache.spark.sql.streaming.TimerValues):
        Iterator[StlResid] = {
      if (!evict) {
        // batch/gate: the single batch IS the whole series — replay the
        // batch query's dense-grid walk directly
        val all = rows.map(r => r.day -> r.n).toArray
        all.foreach { case (d, n) => dayN.updateValue(d, n) }
        val d0 = all.iterator.map(_._1).min
        val d1 = all.iterator.map(_._1).max
        // eager: the state handle is only guaranteed inside this call
        (d0 + 3 to d1 - 3).map(resid).iterator
      } else {
        var (minDay, maxSeen, frontier) =
          if (meta.exists()) meta.get() else (Long.MaxValue, Long.MinValue, -1L)
        rows.foreach { r =>
          dayN.updateValue(r.day, r.n)
          if (r.day < minDay) minDay = r.day
          if (r.day > maxSeen) maxSeen = r.day
        }
        val out = Seq.newBuilder[StlResid]
        if (minDay != Long.MaxValue) {
          if (frontier < 0L) frontier = minDay + 3
          while (frontier + 3 <= maxSeen) {
            out += resid(frontier)
            frontier += 1
          }
          // slide the buffer: days below frontier-3 can never be read
          val prune = dayN.keys().filter(_ < frontier - 3).toArray
          prune.foreach(dayN.removeKey)
        }
        meta.update((minDay, maxSeen, frontier))
        out.result().iterator
      }
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo):
        Iterator[StlResid] = Iterator.empty
  }

  /** Twin #16 composition: per-day counts → STL-lite detrender. The
    * per-dow seasonal means are the consumer's rollup over the ≤|days|
    * residual frame (the gate query does exactly that) — same division
    * of labor as twin #15's cross-day carry. */
  def stlSeasonalDaily(events: Dataset[EventRow],
      evict: Boolean = false): Dataset[StlResid] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val src = if (evict) events.withWatermark("ts", "1 hour") else events
    def dayOf(r: EventRow): Long =
      Math.floorDiv(Math.floorDiv(r.ts.getTime, 1000L) * 1000000L +
        r.ts.getNanos / 1000L, 86400000000L)
    val daily = if (evict)
      src.groupByKey(dayOf _)
        .transformWithState(new DayCountProcessor(evict), "ts",
          OutputMode.Append)
    else
      src.groupByKey(dayOf _)
        .transformWithState(new DayCountProcessor(evict), TimeMode.None(),
          OutputMode.Append)
    daily.groupByKey(_ => 0L)
      .transformWithState(new StlSeasonalProcessor(evict),
        if (evict) TimeMode.EventTime() else TimeMode.None(),
        OutputMode.Append)
  }
}
