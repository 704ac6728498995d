package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.EventStreams.EventRow

/** Deterministic replay tests for the Structured Streaming operators
  * (SURVEY §5.2.4): event-time windows, watermark late-data drop,
  * streaming dedup, custom state, and the foreachBatch Kinesis sink.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(day: Int, hour: Int = 0, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:$min%02d:00")

  private def row(id: Long, t: Timestamp, user: Long = 1L,
      typ: String = "click", v: Double = 1.0): EventRow =
    EventRow(id, t, user, typ, v)

  private def runQuery(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode, adds: Seq[() => Unit]): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try adds.foreach { add => add(); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  test("tumbling window aggregates by event-time day") {
    import spark.implicits._
    val mem = MemoryStream[EventRow](spark)
    val out = runQuery(
      EventStreams.tumblingDaily(mem.toDF()), "t_tumble", OutputMode.Complete,
      Seq(() => mem.addData(
        row(1, ts(1, 1)), row(2, ts(1, 5), v = 2.0), row(3, ts(2, 3), v = 5.0))))
    val got = out.select(date_format(col("win_start"), "yyyy-MM-dd").as("d"),
        col("n"), col("total_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("2024-01-01", 2L, 3.0), ("2024-01-02", 1L, 5.0)))
  }

  test("watermark drops events later than 1 hour behind the max") {
    import spark.implicits._
    val mem = MemoryStream[EventRow](spark)
    val agg = EventStreams.tumblingDaily(mem.toDF())
    val out = runQuery(agg, "t_late", OutputMode.Append, Seq(
      () => mem.addData(row(1, ts(1, 2)), row(2, ts(1, 10))),
      // advance watermark far past day 1's window end
      () => mem.addData(row(3, ts(5, 12))),
      // this day-1 event is now > 1h late: must be dropped
      () => mem.addData(row(4, ts(1, 4), v = 100.0))))
    val day1 = out.filter(date_format(col("win_start"), "yyyy-MM-dd") === "2024-01-01")
      .select(col("n"), col("total_value")).as[(Long, Double)].collect().toSeq
    assert(day1 == Seq((2L, 2.0)), s"late event leaked into $day1")
  }

  test("session windows split on 1-hour gaps per user") {
    import spark.implicits._
    val mem = MemoryStream[EventRow](spark)
    val out = runQuery(
      EventStreams.sessionize(mem.toDF()), "t_sess", OutputMode.Complete,
      Seq(() => mem.addData(
        row(1, ts(1, 1, 0)), row(2, ts(1, 1, 30)), // session A (gap < 1h)
        row(3, ts(1, 3, 0)),                       // session B (1.5h gap)
        row(4, ts(1, 1, 10), user = 2L))))         // other user
    val got = out.select(col("user_id"), col("n")).as[(Long, Long)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)).sorted)
  }

  test("streaming dedup keeps first occurrence of event_id") {
    import spark.implicits._
    val mem = MemoryStream[EventRow](spark)
    val out = runQuery(
      EventStreams.dedup(mem.toDF()), "t_dedup", OutputMode.Append, Seq(
        () => mem.addData(row(1, ts(1, 1)), row(2, ts(1, 2))),
        () => mem.addData(row(1, ts(1, 1)), row(3, ts(1, 3)))))
    assert(out.select(col("event_id")).as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(out.count() == 3)
  }

  test("flatMapGroupsWithState keeps running per-user counters across batches") {
    import spark.implicits._
    val mem = MemoryStream[EventRow](spark)
    val out = runQuery(
      EventStreams.runningCounters(mem.toDS()).toDF(), "t_state", OutputMode.Update,
      Seq(
        () => mem.addData(row(1, ts(1), user = 1, v = 2.0), row(2, ts(1), user = 2, v = 3.0)),
        () => mem.addData(row(3, ts(2), user = 1, v = 5.0))))
    // last emitted state per user
    val last = out.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("total_value")).as("v"))
      .as[(Long, Long, Double)].collect().toSet
    assert(last == Set((1L, 2L, 7.0), (2L, 1L, 3.0)))
  }

  test("transformWithState (StatefulProcessor + RocksDB) keeps running counters") {
    import spark.implicits._
    // transformWithState requires the RocksDB state store
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[EventRow](spark)
    val df = EventStreams.runningCountersTws(mem.toDS()).toDF()
    val q = df.writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("t_tws")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_chk").toString)
      .start()
    try {
      mem.addData(row(1, ts(1), user = 1, v = 2.0), row(2, ts(1), user = 2, v = 3.0))
      q.processAllAvailable()
      mem.addData(row(3, ts(2), user = 1, v = 5.0))
      q.processAllAvailable()
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
    val last = spark.table("t_tws").groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("total_value")).as("v"))
      .as[(Long, Long, Double)].collect().toSet
    assert(last == Set((1L, 2L, 7.0), (2L, 1L, 3.0)))
  }

  private def withRocksDb[A](extra: (String, String)*)(body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = (providerKey +: extra.map(_._1)).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    extra.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("transformWithState timers: idle session emitted via handleExpiredTimer") {
    import spark.implicits._
    withRocksDb() {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.idleSessions(mem.toDS(), gapMs = 200L).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_timer")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("timer_chk").toString)
        .start()
      try {
        mem.addData(row(1, ts(1), user = 1, v = 2.0), row(2, ts(1), user = 1, v = 3.0))
        // NOTE: processAllAvailable() is unusable here — with pending
        // processing-time timers the engine keeps scheduling batches, so
        // its no-new-data latch never settles. Poll the sink instead,
        // poking an unrelated key to keep batches (and timer sweeps) coming.
        def got() = spark.table("t_timer").as[(Long, Long, Double)].collect().toSet
        val deadline = System.currentTimeMillis() + 30000
        var poke = 100L
        while (!got().contains((1L, 2L, 5.0)) && System.currentTimeMillis() < deadline) {
          Thread.sleep(250)
          poke += 1
          mem.addData(row(poke, ts(2), user = 99, v = 1.0))
        }
        assert(got().contains((1L, 2L, 5.0)),
          s"no session summary for user 1: ${got()}")
      } finally q.stop()
    }
  }

  test("event-time timers: session closes when the watermark passes the gap") {
    import spark.implicits._
    withRocksDb() {
      val mem = MemoryStream[EventRow](spark)
      // 1-hour event-time gap; watermark = max seen ts (no delay)
      val df = EventStreams.idleSessionsEventTime(mem.toDS(),
        gapMs = 60L * 60 * 1000).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_et_timer")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("et_timer_chk").toString)
        .start()
      try {
        mem.addData(row(1, ts(1, 1), user = 1, v = 2.0),
          row(2, ts(1, 1, 30), user = 1, v = 3.0))
        q.processAllAvailable()
        assert(spark.table("t_et_timer").isEmpty) // watermark hasn't passed
        // day-3 event pushes the watermark far past user 1's gap
        mem.addData(row(3, ts(3), user = 99, v = 1.0))
        q.processAllAvailable()
        mem.addData(row(4, ts(3, 1), user = 99, v = 1.0)) // fire sweep batch
        q.processAllAvailable()
        val got = spark.table("t_et_timer").as[(Long, Long, Double)].collect().toSet
        assert(got.contains((1L, 2L, 5.0)), s"session never closed: $got")
      } finally q.stop()
    }
  }

  test("transformWithState TTL: per-state expiry resets the counter") {
    import spark.implicits._
    withRocksDb() {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.runningCountersTws(mem.toDS(), ttlMs = Some(250L)).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_ttl")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ttl_chk").toString)
        .start()
      // TimeMode.ProcessingTime keeps the engine scheduling batches, so
      // processAllAvailable never settles (as in the timer test): poll.
      def got() = spark.table("t_ttl").as[(Long, Long, Double)].collect().toSet
      def awaitContains(t: (Long, Long, Double)): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!got().contains(t) && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(got().contains(t), s"never saw $t in ${got()}")
      }
      try {
        mem.addData(row(1, ts(1), user = 1, v = 2.0))
        awaitContains((1L, 1L, 2.0))
        Thread.sleep(700) // let the value state pass its TTL
        mem.addData(row(2, ts(2), user = 1, v = 5.0))
        // state expired → the counter restarts at zero: (1,1,5.0) not (1,2,7.0)
        awaitContains((1L, 1L, 5.0))
      } finally q.stop()
      assert(!got().contains((1L, 2L, 7.0)), s"TTL never expired: ${got()}")
    }
  }

  test("ListState ring + MapState counts track per-user activity") {
    import spark.implicits._
    withRocksDb() {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.userActivity(mem.toDS(), keep = 3).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_activity")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("act_chk").toString)
        .start()
      try {
        mem.addData(
          row(1, ts(1), user = 1, typ = "click"),
          row(2, ts(1), user = 1, typ = "view"),
          row(3, ts(1), user = 1, typ = "click"))
        q.processAllAvailable()
        mem.addData(
          row(4, ts(2), user = 1, typ = "click"),
          row(5, ts(2), user = 1, typ = "purchase"))
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("t_activity")
        .as[(Long, Seq[Long], Map[String, Long])].collect()
        .filter(_._1 == 1L).maxBy(_._2.max)
      assert(last._2 == Seq(3L, 4L, 5L), s"ring should keep last 3: $last")
      assert(last._3 == Map("click" -> 3L, "view" -> 1L, "purchase" -> 1L), s"$last")
    }
  }

  test("state schema evolution: v2 processor resumes a v1 checkpoint (avro)") {
    import spark.implicits._
    val chk = java.nio.file.Files.createTempDirectory("evolve_chk").toString
    withRocksDb(
      "spark.sql.streaming.stateStore.encodingFormat" -> "avro") {
      val mem = MemoryStream[EventRow](spark)
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, Double)]()
      // phase 1: v1 state (user_id, n_events, total_value); the memory
      // sink can't recover a checkpoint, so both phases use foreachBatch
      val q1 = EventStreams.runningCountersTws(mem.toDS())
        .writeStream.outputMode(OutputMode.Update)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[EventStreams.UserCounter], _: Long) =>
          ds.count() // must execute the batch (commits the state store)
          ()
        }
        .option("checkpointLocation", chk)
        .start()
      try {
        mem.addData(row(1, ts(1), user = 1, v = 2.0), row(2, ts(1), user = 2, v = 3.0))
        q1.processAllAvailable()
      } finally q1.stop()
      // phase 2: SAME checkpoint + source, evolved state (+ max_value)
      val q2 = EventStreams.runningCountersTwsV2(mem.toDS())
        .writeStream.outputMode(OutputMode.Update)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[EventStreams.UserCounterV2], _: Long) =>
          ds.collect().foreach(c =>
            out.add((c.user_id, c.n_events, c.total_value, c.max_value))); ()
        }
        .option("checkpointLocation", chk)
        .start()
      try {
        mem.addData(row(3, ts(2), user = 1, v = 5.0))
        q2.processAllAvailable()
      } finally q2.stop()
      import scala.jdk.CollectionConverters._
      // v1's (1, 2.0) survives the schema change; max_value starts from
      // the default and only sees post-evolution values
      val got = out.asScala.toSet
      assert(got.contains((1L, 2L, 7.0, 5.0)), s"state lost across evolution: $got")
    }
  }

  test("RocksDB changelog checkpointing writes changelog files") {
    import spark.implicits._
    val chk = java.nio.file.Files.createTempDirectory("changelog_chk").toString
    withRocksDb(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true") {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.runningCountersTws(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_changelog")
        .option("checkpointLocation", chk)
        .start()
      try {
        mem.addData(row(1, ts(1), user = 1, v = 2.0), row(2, ts(1), user = 2, v = 3.0))
        q.processAllAvailable()
        mem.addData(row(3, ts(2), user = 1, v = 5.0))
        q.processAllAvailable()
      } finally q.stop()
    }
    val changelogs = java.nio.file.Files.walk(java.nio.file.Paths.get(chk))
      .filter(p => p.toString.endsWith(".changelog")).count()
    assert(changelogs > 0, s"no .changelog files under $chk")
    val last = spark.table("t_changelog").groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("total_value")).as("v"))
      .as[(Long, Long, Double)].collect().toSet
    assert(last == Set((1L, 2L, 7.0), (2L, 1L, 3.0)))
  }

  test("stream-static join enriches events with the customer dim") {
    import spark.implicits._
    val customers = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[EventRow](spark)
    val out = runQuery(
      EventStreams.enrich(mem.toDF(), customers), "t_enrich", OutputMode.Append,
      Seq(() => mem.addData(row(1, ts(1), user = 1), row(2, ts(1), user = 2),
        row(3, ts(1), user = 9))))
    val got = out.select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "BUILDING"), (2L, "MACHINERY"))) // user 9 has no dim row
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    import spark.implicits._
    val purchases = MemoryStream[EventRow](spark)
    val clicks = MemoryStream[EventRow](spark)
    val joined = EventStreams.purchaseAttribution(purchases.toDF(), clicks.toDF())
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_attr").start()
    try {
      clicks.addData(
        row(10, ts(1, 9, 30), user = 1),  // 30 min before purchase → match
        row(11, ts(1, 5, 0), user = 1),   // 5h before → outside window
        row(12, ts(1, 9, 45), user = 2))  // other user
      purchases.addData(row(1, ts(1, 10, 0), user = 1, typ = "purchase", v = 42.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_attr")
      .select(col("p_id"), col("c_ts")).as[(Long, java.sql.Timestamp)]
      .collect().toSeq
    assert(got == Seq((1L, ts(1, 9, 30))), s"got $got")
  }

  test("left-outer interval join emits null-padded purchases after watermark") {
    import spark.implicits._
    val purchases = MemoryStream[EventRow](spark)
    val clicks = MemoryStream[EventRow](spark)
    val joined = EventStreams.purchaseAttributionOuter(purchases.toDF(), clicks.toDF())
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_attr_outer").start()
    try {
      clicks.addData(row(10, ts(1, 9, 30), user = 1))   // match for user 1
      purchases.addData(
        row(1, ts(1, 10, 0), user = 1, typ = "purchase", v = 42.0),
        row(2, ts(1, 10, 0), user = 5, typ = "purchase", v = 7.0)) // no click
      q.processAllAvailable()
      // push BOTH watermarks past the point where user 5 could still
      // match (clicks precede purchases, so watermark > p_ts suffices):
      // the unmatched purchase must then emit null-padded
      clicks.addData(row(90, ts(1, 23, 0), user = 99))
      purchases.addData(row(91, ts(1, 23, 0), user = 99, typ = "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_attr_outer")
      .select(col("p_id"), col("c_ts")).as[(Long, Option[java.sql.Timestamp])]
      .collect().toMap
    assert(got(1L).contains(ts(1, 9, 30)), s"matched row wrong: $got")
    assert(got.contains(2L) && got(2L).isEmpty,
      s"unmatched purchase not emitted null-padded after watermark: $got")
  }

  test("full-outer interval join emits unmatched rows from BOTH sides") {
    import spark.implicits._
    val purchases = MemoryStream[EventRow](spark)
    val clicks = MemoryStream[EventRow](spark)
    val joined = EventStreams.purchaseAttributionFull(purchases.toDF(), clicks.toDF())
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("t_attr_full").start()
    try {
      clicks.addData(
        row(10, ts(1, 9, 30), user = 1),  // match for user 1's purchase
        row(11, ts(1, 9, 40), user = 7))  // no purchase follows → unmatched
      purchases.addData(
        row(1, ts(1, 10, 0), user = 1, typ = "purchase", v = 42.0),
        row(2, ts(1, 10, 0), user = 5, typ = "purchase", v = 7.0)) // no click
      q.processAllAvailable()
      // advance both watermarks far enough that neither unmatched row can
      // still match (clicks wait p_ts ∈ [c_ts, c_ts+1h), purchases wait
      // c_ts ∈ [p_ts−1h, p_ts)) — then both must emit null-padded
      clicks.addData(row(90, ts(1, 23, 0), user = 99))
      purchases.addData(row(91, ts(1, 23, 0), user = 99, typ = "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_attr_full")
      .select(col("p_id"), col("c_id"))
      .as[(Option[Long], Option[Long])].collect().toSet
    assert(got.contains((Some(1L), Some(10L))), s"matched pair missing: $got")
    assert(got.contains((Some(2L), None)),
      s"unmatched purchase not null-padded: $got")
    assert(got.contains((None, Some(11L))),
      s"unmatched click not null-padded: $got")
  }

  test("streaming funnel twin matches the batch stage assignment") {
    import spark.implicits._
    // user 1 completes the funnel across two batches; user 2's click
    // precedes its view (strict ordering → stage 1); user 3 has no view
    // (stage 0); user 4 stops after click (stage 2)
    val batch1 = Seq(
      row(1, ts(1, 1), user = 1, typ = "view"),
      row(2, ts(1, 2), user = 1, typ = "click"),
      row(3, ts(1, 2), user = 2, typ = "click"),
      row(4, ts(1, 3), user = 2, typ = "view"),
      row(5, ts(1, 1), user = 3, typ = "purchase"),
      row(6, ts(1, 1), user = 4, typ = "view"))
    val batch2 = Seq(
      row(7, ts(1, 4), user = 1, typ = "purchase"),
      row(8, ts(1, 5), user = 4, typ = "click"))
    val all = batch1 ++ batch2
    withRocksDb() {
      val mem = MemoryStream[EventRow](spark)
      val q = EventStreams.funnelStages(mem.toDS()).toDF()
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_funnel")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("funnel_chk").toString)
        .start()
      try {
        mem.addData(batch1: _*); q.processAllAvailable()
        mem.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
    }
    // chronological feed → stage is nondecreasing per user; the final
    // stage is max over emits
    val streamed = spark.table("t_funnel").groupBy(col("user_id"))
      .agg(max(col("stage")).cast("long").as("stage"))
    // the batch query's exact expressions over the same rows
    val batchTwin = all.toDF()
      .groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("tv"),
        min(when(col("event_type") === "click", col("ts"))).as("tc"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      .select(col("user_id"),
        when(col("tv").isNull, 0)
          .when(col("tc").isNull || col("tc") <= col("tv"), 1)
          .when(col("tp").isNull || col("tp") <= col("tc"), 2)
          .otherwise(3).cast("long").as("stage"))
    val got = streamed.as[(Long, Long)].collect().toSet
    val want = batchTwin.as[(Long, Long)].collect().toSet
    assert(got == want, s"stream $got != batch $want")
    assert(want == Set((1L, 3L), (2L, 1L), (3L, 0L), (4L, 2L)))
  }

  test("streaming retention cells match the batch cohort matrix") {
    import spark.implicits._
    // user 1: cohort week 0 (first seen Jan 1), active weeks 0 and 1;
    // user 2: cohort week 1 (first seen Jan 9), active weeks 0 and 1
    val batch1 = Seq(
      row(1, ts(1), user = 1), row(2, ts(9), user = 2))
    val batch2 = Seq(
      row(3, ts(10), user = 1), row(4, ts(16), user = 2),
      row(5, ts(1, 5), user = 1)) // same-day repeat, same cell
    val all = batch1 ++ batch2
    withRocksDb() {
      val mem = MemoryStream[EventRow](spark)
      val q = EventStreams.retentionCells(mem.toDS()).toDF()
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_retention")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ret_chk").toString)
        .start()
      try {
        mem.addData(batch1: _*); q.processAllAvailable()
        mem.addData(batch2: _*); q.processAllAvailable()
      } finally q.stop()
    }
    val streamed = spark.table("t_retention")
      .groupBy(col("cohort_wk"), col("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    // the batch query's exact expressions over the same rows
    val e = all.toDF().select(col("user_id"), to_date(col("ts")).as("dt"))
    val first = e.groupBy(col("user_id")).agg(min(col("dt")).as("d0"))
    val batchTwin = e.join(first, "user_id")
      .select(
        floor(datediff(col("d0"), lit("2024-01-01").cast("date")) / 7)
          .as("cohort_wk"),
        floor(datediff(col("dt"), col("d0")) / 7).as("offset_wk"),
        col("user_id"))
      .groupBy(col("cohort_wk"), col("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val got = streamed.as[(Long, Long, Long)].collect().toSet
    val want = batchTwin.as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"stream $got != batch $want")
    assert(want == Set((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("stateful query resumes from checkpoint with state intact") {
    import spark.implicits._
    val chk = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val mem = MemoryStream[EventRow](spark)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = EventStreams.runningCounters(mem.toDS())
      .writeStream.outputMode(OutputMode.Update)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EventStreams.UserCounter], _: Long) =>
        ds.collect().foreach(c => seen.add((c.user_id, c.n_events))); ()
      }
      .option("checkpointLocation", chk)
      .start()
    val q1 = start()
    try { mem.addData(row(1, ts(1), user = 7, v = 2.0)); q1.processAllAvailable() }
    finally q1.stop()
    // restart from the same checkpoint: per-key state must survive
    val q2 = start()
    try { mem.addData(row(2, ts(2), user = 7, v = 5.0)); q2.processAllAvailable() }
    finally q2.stop()
    import scala.jdk.CollectionConverters._
    val counts = seen.asScala.filter(_._1 == 7L).map(_._2).toSeq.sorted
    assert(counts.lastOption.contains(2L),
      s"state lost across restart (expected running count 2): $counts")
  }

  test("foreachBatch drives the Kinesis-semantics sink from a stream") {
    import spark.implicits._
    import graft.kinesis._
    val k = new InMemoryKinesis(numShards = 2)
    val cfg = KinesisSinkSemantics.Config("stream-sink", backoffMillis = 1,
      maxAggSize = 5000, maxLastSize = 500)
    val mem = MemoryStream[String](spark)
    val q = mem.toDF().select(col("value").cast("binary").as("payload"))
      .writeStream
      .foreachBatch(KinesisSinkSemantics.foreachBatch("payload", k, k, cfg))
      .outputMode(OutputMode.Append)
      .start()
    try {
      mem.addData((0 until 300).map(i => s"msg-$i"): _*)
      q.processAllAvailable()
      mem.addData((300 until 400).map(i => s"msg-$i"): _*)
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val delivered = k.received.values.asScala.flatMap(_.asScala)
      .flatMap(w => AggRecordCodec.decode(w).records.map(r => new String(r.data, "UTF-8")))
      .toSet
    assert(delivered == (0 until 400).map(i => s"msg-$i").toSet)
  }

  test("composition: per-record failures × mid-stream shard split × backpressure") {
    // The three mechanisms the sink composes in production, exercised
    // TOGETHER through the streaming path: every 3rd record fails
    // individually inside multi-entry calls (selective retry), a shard
    // splits between micro-batches (batch 2 must route to the children),
    // and a tight per-shard budget forces real backpressure waits.
    import spark.implicits._
    import graft.kinesis._
    val k = new InMemoryKinesis(numShards = 2, failRecordEvery = 3)
    // spy: prove at least one call failed PARTIALLY (0 < failed < size) —
    // the scenario selective retry exists for
    // counters live in the companion object: the spy is serialized into
    // executor task closures, so instance fields would be incremented on
    // per-task deserialized COPIES (same trap InMemoryKinesis's static
    // registry exists for)
    StreamingSpec.partials.set(0)
    StreamingSpec.callLog.clear()
    val spy = new PutRecordsTransport {
      override def putRecords(s: String, e: Seq[PutEntry]): PutResult = {
        val r = k.putRecords(s, e)
        StreamingSpec.callLog.add((e.size, r.failedRecordCount))
        if (r.failedRecordCount > 0 && r.failedRecordCount < e.size)
          StreamingSpec.partials.incrementAndGet()
        r
      }
    }
    val throttle = new ShardThrottle("t-split-" + System.nanoTime(),
      bytesPerSec = 2048, recordsPerSec = 1000) // tight: forces real waits
    val cfg = KinesisSinkSemantics.Config("stream-split", backoffMillis = 1,
      maxAggSize = 2000, maxLastSize = 500, throttle = Some(throttle))
    val mem = MemoryStream[String](spark)
    // 2 partitions → each partition packs several aggregates per grouped
    // PutRecords call, so per-record failures hit SOME entries of a call
    val q = mem.toDF().repartition(2)
      .select(col("value").cast("binary").as("payload"))
      .writeStream
      .foreachBatch(KinesisSinkSemantics.foreachBatch("payload", spy, k, cfg))
      .outputMode(OutputMode.Append)
      .start()
    try {
      mem.addData((0 until 300).map(i => s"part1-$i"): _*)
      q.processAllAvailable()
      // reshard between micro-batches: the parent closes, two children
      // cover its range; batch 2 re-lists shards and routes to children
      import scala.jdk.CollectionConverters._
      val openBefore = ShardModel.allShards("stream-split", k)
        .filter(_.endingSequenceNumber.isEmpty).map(_.shardId)
      k.splitShard(openBefore.head)
      mem.addData((300 until 600).map(i => s"part2-$i"): _*)
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val delivered = k.received.values.asScala.flatMap(_.asScala)
      .flatMap(w => AggRecordCodec.decode(w).records.map(r => new String(r.data, "UTF-8")))
      .toSeq
    val expected = (0 until 300).map(i => s"part1-$i") ++ (300 until 600).map(i => s"part2-$i")
    // MULTISET equality: selective retry of failed entries delivers each
    // payload exactly once — a whole-group resend after a partial failure
    // would surface here as duplicates
    assert(delivered.sorted == expected.sorted,
      s"${delivered.size} delivered vs ${expected.size} expected")
    assert(StreamingSpec.partials.get() > 0,
      s"no partial multi-entry failure was ever injected; calls (size, failed): " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          StreamingSpec.callLog.iterator()).asScala.toSeq)
    // data reached a post-split child shard (ids beyond the original two)
    val hitShards = k.received.keySet.asScala
    assert(hitShards.exists(sid => sid > "shardId-000000000001"),
      s"split children never received data: $hitShards")
    assert(throttle.totalWaitMillis > 0, "backpressure never engaged")
  }

  test("session-path processor re-derives paths incrementally across batches") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.sessionPaths(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_paths")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("paths_chk").toString)
        .start()
      try {
        // batch 1: one session (view, click 10 min apart)
        mem.addData(row(1, ts(1, 9, 0), user = 1, typ = "view"),
          row(2, ts(1, 9, 10), user = 1, typ = "click"))
        q.processAllAvailable()
        // batch 2: same session extends (+30 min), then a >1h gap opens
        // session 2; a second user appears
        mem.addData(row(3, ts(1, 9, 40), user = 1, typ = "purchase"),
          row(4, ts(1, 12, 0), user = 1, typ = "view"),
          row(5, ts(1, 8, 0), user = 2, typ = "signup"))
        q.processAllAvailable()
      } finally q.stop()
      // update mode: the latest emit per (user, sess_no) is the answer;
      // event-time-ordered arrival keeps earlier session numbers stable,
      // so the final distinct states are exactly the full decomposition
      val rows = spark.table("t_paths")
        .select(col("user_id"), col("sess_no"), col("path"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val lastPerKey = rows.zipWithIndex
        .groupBy { case ((u, sNo, _), _) => (u, sNo) }
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1._3 }
      assert(lastPerKey == Map((1L, 0L) -> "vcp", (1L, 1L) -> "v",
        (2L, 0L) -> "s"))
      // batch-1 emit really happened and was the prefix of the session
      assert(rows.contains((1L, 0L, "vc")),
        "first batch must emit the partial session path")
    }
  }

  test("burst processor re-derives episodes incrementally across batches") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      // epoch at 2024-01-01T00:00Z, matching the batch query
      val df = EventStreams.burstEpisodes(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_burst")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("burst_chk").toString)
        .start()
      try {
        // batch 1: 6 hours with counts (3,1,1,1,1,1) — mean = 8/6, so
        // only hour 0 (count 3) bursts: 3·6 > 2·8
        val b1 = (1 to 3).map(i => row(i, ts(1, 0), typ = "view")) ++
          (1 to 5).map(i => row(10 + i, ts(1, i), typ = "view"))
        mem.addData(b1: _*)
        q.processAllAvailable()
        // batch 2: hour 0 gains 2 (now 5) and hour 1 gains 4 (now 5) —
        // mean = 14/6, burst needs c·6 > 28, so hours 0 AND 1 burst and
        // must MERGE into one 2-hour episode on re-derivation
        mem.addData((1 to 2).map(i => row(20 + i, ts(1, 0), typ = "view")) ++
          (1 to 4).map(i => row(30 + i, ts(1, 1), typ = "view")): _*)
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("t_burst")
        .select(col("event_type"), col("start_hr"), col("end_hr"),
          col("len_hrs"), col("n_burst"), col("peak"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      // batch-1 emit: the single-hour episode
      assert(rows.contains(("view", 0L, 0L, 1L, 3L, 3L)),
        "first batch must emit the single-hour episode")
      // final emit: the merged 2-hour episode (last rows win)
      assert(rows.last == (("view", 0L, 1L, 2L, 10L, 5L)),
        s"re-derivation must merge the episode, got ${rows.toSeq}")
    }
  }

  test("survival processor: censored user flips to event across batches, " +
    "firsts min-merge incrementally") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.survivalFirsts(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_surv")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("surv_chk").toString)
        .start()
      try {
        // batch 1: user 1 and user 2 each click on day 1 — both are
        // administratively censored (no purchase yet)
        mem.addData(row(1, ts(1), user = 1), row(2, ts(1), user = 2))
        q.processAllAvailable()
        // batch 2: user 1 purchases on day 4 (flips censored → event);
        // user 2 clicks EARLIER (day 1 00:00 was batch 1; an hour-0
        // pre-dating click moves fe back — min-merge, not overwrite)
        mem.addData(row(3, ts(4), user = 1, typ = "purchase"),
          row(4, Timestamp.valueOf("2023-12-31 12:00:00"), user = 2))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("t_surv")
        .select(col("user_id"), col("fe_us"), col("fp_us"), col("has_p"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      def us(t: Timestamp) =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      // batch-1 emits: both censored with fe at day 1
      assert(rows.contains((1L, us(ts(1)), Long.MaxValue, false)),
        s"user 1 must start censored: ${rows.toSeq}")
      assert(rows.contains((2L, us(ts(1)), Long.MaxValue, false)),
        s"user 2 must start censored: ${rows.toSeq}")
      // latest-wins finals: user 1 has the purchase, user 2 the earlier fe
      val fin = rows.groupBy(_._1).map { case (u, rs) => u -> rs.last }
      assert(fin(1L) == ((1L, us(ts(1)), us(ts(4)), true)),
        s"user 1 must flip to event: ${fin(1L)}")
      assert(fin(2L) ==
        ((2L, us(Timestamp.valueOf("2023-12-31 12:00:00")),
          Long.MaxValue, false)),
        s"user 2's first-event must min-merge backward: ${fin(2L)}")
    }
  }

  test("dedup processor: keeper min-merges backward across batches; " +
    "duplicate count accumulates per key") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.dedupKeepers(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_dedup")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("dedup_chk").toString)
        .start()
      try {
        // batch 1: user 1 clicks twice on day 1 (10:00 eid=5, 09:00
        // eid=3) — same dedup key, keeper = the 09:00 arrival
        mem.addData(row(5, ts(1, 10), user = 1), row(3, ts(1, 9), user = 1))
        q.processAllAvailable()
        // batch 2: an OUT-OF-ORDER earlier click (08:00 eid=9) for the
        // same key — keeper must min-merge BACKWARD and replace the
        // emitted row wholesale; plus a view (different type → its own
        // key, untouched count)
        mem.addData(row(9, ts(1, 8), user = 1),
          row(7, ts(1, 11), user = 1, typ = "view"))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("t_dedup")
        .select(col("user_id"), col("event_type"), col("day"),
          col("keep_us"), col("keep_eid"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      def us(t: java.sql.Timestamp) =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      // batch-1 emit: keeper (09:00, 3) with both arrivals counted
      assert(rows.contains((1L, "click", 0L, us(ts(1, 9)), 3L, 2L)),
        s"batch-1 keeper must be the 09:00 arrival: ${rows.toSeq}")
      // latest-wins finals per key
      val fin = rows.groupBy(r => (r._1, r._2, r._3))
        .map { case (k, rs) => k -> rs.last }
      assert(fin((1L, "click", 0L)) ==
        ((1L, "click", 0L, us(ts(1, 8)), 9L, 3L)),
        s"keeper must min-merge backward with n=3: ${fin.toSeq}")
      assert(fin((1L, "view", 0L)) ==
        ((1L, "view", 0L, us(ts(1, 11)), 7L, 1L)),
        s"distinct event_type must key separately: ${fin.toSeq}")
    }
  }

  test("dedup processor TTL: a duplicate past the state TTL re-admits") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.dedupKeepers(mem.toDS(), ttlMs = Some(250L)).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_dedup_ttl")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("dedup_ttl_chk").toString)
        .start()
      // ProcessingTime mode keeps scheduling batches (the counter-TTL
      // test precedent): poll instead of processAllAvailable settling.
      def got() = spark.table("t_dedup_ttl")
        .select(col("keep_eid"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def awaitContains(t: (Long, Long)): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (!got().contains(t) && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(got().contains(t), s"never saw $t in ${got()}")
      }
      try {
        mem.addData(row(5, ts(1, 10), user = 1))
        awaitContains((5L, 1L))
        Thread.sleep(700) // keeper state passes its TTL
        // same dedup key arrives again: expired state → RE-ADMITTED as
        // a fresh keeper (n restarts at 1), the documented TTL trade
        mem.addData(row(8, ts(1, 11), user = 1))
        awaitContains((8L, 1L))
      } finally q.stop()
      assert(!got().contains((5L, 2L)),
        s"TTL never expired — duplicate was suppressed: ${got()}")
    }
  }

  test("HLL day processor: multi-batch sketches equal the single-pass " +
    "set estimate and Spark's hll_sketch_agg") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.hllDaySketches(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_hll")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("hll_chk").toString)
        .start()
      try {
        // batch 1: users 1,2,3 on day 1; user 1 again on day 2
        mem.addData(row(1, ts(1), user = 1), row(2, ts(1), user = 2),
          row(3, ts(1), user = 3), row(4, ts(2), user = 1))
        q.processAllAvailable()
        // batch 2: user 2 REPEATS on day 1 (estimate must not move) and
        // user 4 is new on day 1 (estimate must absorb it)
        mem.addData(row(5, ts(1, 5), user = 2), row(6, ts(1, 7), user = 4))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("t_hll")
        .select(col("day"), col("sk")).collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      // latest-wins final sketch per day
      val fin = rows.groupBy(_._1).map { case (d, rs) => d -> rs.last._2 }
      def est(bytes: Array[Byte]): Double =
        org.apache.datasketches.hll.HllSketch.heapify(bytes).getEstimate
      // single-pass reference: one JVM sketch over each day's DISTINCT
      // user set — order/batch/dup-insensitivity means equality
      def ref(users: Seq[Long]): Double = {
        val sk = new org.apache.datasketches.hll.HllSketch(12,
          org.apache.datasketches.hll.TgtHllType.HLL_8)
        users.foreach(sk.update)
        sk.getEstimate
      }
      assert(est(fin(0L)) == ref(Seq(1L, 2L, 3L, 4L)),
        "day-1 estimate must equal the single-pass set estimate")
      assert(est(fin(1L)) == ref(Seq(1L)),
        "day-2 estimate must equal the single-pass set estimate")
      // the batch-1 emit for day 1 covered only {1,2,3}
      assert(est(rows.filter(_._1 == 0L).head._2) == ref(Seq(1L, 2L, 3L)),
        "batch-1 day-1 sketch must cover exactly the first batch's users")
      // cross-API: Spark's hll_sketch_agg over the same users produces
      // the same estimate (lgK/HLL_8 parameters match by construction;
      // Spark's hll_sketch_estimate rounds to LongType)
      val sparkEst = Seq(1L, 2L, 3L, 4L, 2L).toDF("u")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(u))")).head.getLong(0)
      assert(Math.round(est(fin(0L))) == sparkEst,
        "processor sketch must match hll_sketch_agg's estimate")
    }
  }

  test("quantile hist processor: multi-batch exact quantiles equal " +
    "the single-pass inverse-ECDF, clamp included") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.quantileDayHist(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_quant")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("quant_chk").toString)
        .start()
      try {
        // batch 1: day-0 values out of order; day-1 value past the
        // clamp (700.00 → 70000 cents → edge key 65535)
        mem.addData(row(1, ts(1), v = 3.0), row(2, ts(1), v = 1.0),
          row(3, ts(1), v = 5.0), row(4, ts(2), v = 700.0))
        q.processAllAvailable()
        // batch 2: day-0 gains a DUPLICATE value and a new low one —
        // additive counts must absorb both
        mem.addData(row(5, ts(1, 5), v = 3.0), row(6, ts(1, 7), v = 2.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("t_quant")
        .select(col("day"), col("n"), col("p50_c"), col("p90_c"),
          col("p99_c")).collect()
        .map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      val fin = rows.groupBy(_._1).map { case (d, rs) => d -> rs.last._2 }
      // single-pass reference: the declared inverse-ECDF rule over the
      // sorted cents multiset — order/batch-insensitivity means equality
      def ref(cents: Seq[Long]): (Long, Long, Long, Long) = {
        val s = cents.sorted; val n = s.length.toLong
        def qq(p: Long) = s(((p * n + 99L) / 100L - 1L).toInt)
        (n, qq(50), qq(90), qq(99))
      }
      assert(fin(0L) == ref(Seq(300L, 100L, 500L, 300L, 200L)),
        s"day-0 multi-batch quantiles diverged: ${fin(0L)}")
      assert(fin(1L) == ref(Seq(65535L)),
        "out-of-range value must land in the clamp edge key")
      // the batch-1 emit for day 0 covered only the first three values
      assert(rows.filter(_._1 == 0L).head._2 ==
        ref(Seq(300L, 100L, 500L)),
        "batch-1 day-0 emit must cover exactly the first batch")
    }
  }

  test("MG day processor: below-k domain is exact and batch-split-" +
    "insensitive (the gate contract)") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.mgDayTop(mem.toDS()).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_mg")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("mg_chk").toString)
        .start()
      try {
        mem.addData(row(1, ts(1), typ = "click"), row(2, ts(1), typ = "view"),
          row(3, ts(1), typ = "click"))
        q.processAllAvailable()
        // batch 2: same day gains more of BOTH types + a new one —
        // with |items| ≤ k the merged summary must be the exact counts
        mem.addData(row(4, ts(1, 5), typ = "view"),
          row(5, ts(1, 6), typ = "click"), row(6, ts(1, 7), typ = "buy"))
        q.processAllAvailable()
      } finally q.stop()
      val fin = spark.table("t_mg")
        .select(col("day"), col("item"), col("cnt"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (k2, vs) => k2 -> vs.last._2 }
      assert(fin((0L, "click")) == ((3L, 1L)) &&
        fin((0L, "view")) == ((2L, 2L)) && fin((0L, "buy")) == ((1L, 3L)),
        s"below-k MG must equal exact ranked counts: $fin")
    }
  }

  test("MG day processor: above-k domain keeps the deterministic " +
    "Misra-Gries bounds across batch splits (k = 2)") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.mgDayTop(mem.toDS(), k = 2).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_mg_k2")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("mg2_chk").toString)
        .start()
      // true counts: a=5, b=2, c=1, d=1 (n=9); split mid-stream
      val types = Seq("a", "a", "b", "c", "a", "a", "d", "b", "a")
      try {
        mem.addData(types.take(4).zipWithIndex.map { case (t, i) =>
          row(i + 1L, ts(1, i), typ = t) }: _*)
        q.processAllAvailable()
        mem.addData(types.drop(4).zipWithIndex.map { case (t, i) =>
          row(i + 10L, ts(1, 10 + i), typ = t) }: _*)
        q.processAllAvailable()
      } finally q.stop()
      val fin = spark.table("t_mg_k2")
        .select(col("day"), col("item"), col("cnt"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .groupBy(r => (r._1, r._2)).map(_._2.last)
        .filter(_._1 == 0L).map(r => r._2 -> r._3).toMap
      val truth = Map("a" -> 5L, "b" -> 2L, "c" -> 1L, "d" -> 1L)
      val n = 9L
      assert(fin.size <= 2, s"state must hold <= k counters: $fin")
      // every item with true count > n/(k+1) = 3 is GUARANTEED present
      assert(fin.contains("a"), s"guaranteed heavy hitter missing: $fin")
      fin.foreach { case (t, est) =>
        assert(est <= truth(t), s"MG must never overcount: $t $est")
        assert((truth(t) - est) * 3L <= n,
          s"undercount bound broken for $t: est $est true ${truth(t)}")
      }
    }
  }

  test("twin #12 windowed top-k: timer eviction on watermark passage — " +
    "closed window emits tombstone, state row count drops, no resurrection") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.winTop(mem.toDS(), k = 32, winDays = 7L,
        evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_wintop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wintop_chk").toString)
        .start()
      def stateRows: Long =
        Option(q.lastProgress).map(_.stateOperators(0).numRowsTotal)
          .getOrElse(-1L)
      try {
        // window 0 = days 0–6 (2024-01-01 .. 01-07)
        mem.addData(row(1, ts(1, 1), typ = "a"),
          row(2, ts(2, 1), typ = "a"), row(3, ts(3, 1), typ = "b"))
        q.processAllAvailable()
        mem.addData(row(4, ts(5, 1), typ = "b")) // merges into window 0
        q.processAllAvailable()
        val openRows = stateRows
        // far future (day 28 → window 3): watermark will pass window
        // 0's end (day 7) once this batch's max event time registers
        mem.addData(row(5, ts(28, 1), typ = "c"))
        q.processAllAvailable()
        // timers fire against the watermark set by the PREVIOUS batch
        // — one more batch lets window 0's timer expire
        mem.addData(row(6, ts(28, 2), typ = "c"))
        q.processAllAvailable()
        val afterFire = stateRows
        // a day-1 straggler is beyond the watermark: dropped, so the
        // closed window must NOT resurrect
        mem.addData(row(7, ts(1, 6), typ = "a"))
        q.processAllAvailable()
        val out = spark.table("t_wintop")
          .select(col("win"), col("item"), col("cnt"), col("rank"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        // final pre-close update for window 0 = exact batch counts
        val w0 = out.filter(x => x._1 == 0L && x._2 != "__closed__")
          .groupBy(_._2).map(_._2.maxBy(_._3)).toSeq
          .map(x => (x._2, x._3)).sortBy(_._1)
        assert(w0 == Seq(("a", 2L), ("b", 2L)),
          s"window-0 counts must merge across batches: $w0")
        // exactly ONE tombstone for window 0, carrying its item count
        val tomb = out.filter(_._2 == "__closed__")
        assert(tomb.count(_._1 == 0L) == 1,
          s"window 0 must close exactly once: ${tomb.toSeq}")
        assert(tomb.find(_._1 == 0L).get._3 == 2L,
          "tombstone must carry the evicted summary's item count")
        // eviction is real: the state store sheds window 0's row
        assert(afterFire < openRows + 1,
          s"state rows must drop after eviction: open=$openRows after=$afterFire")
        // no window-0 update rows after the tombstone (no resurrection)
        assert(out.count(x => x._1 == 0L && x._2 == "a") == 2,
          "late straggler must not reopen the closed window")
      } finally q.stop()
    }
  }

  test("twin #13 session top-k: gap closes inline, watermark timer evicts " +
    "the quiet user, state drops, no resurrection") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.sessionTop(mem.toDS(), k = 32,
        gapUs = 86400000000L, evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_sesstop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sesstop_chk").toString)
        .start()
      def stateRows: Long =
        Option(q.lastProgress).map(_.stateOperators(0).numRowsTotal)
          .getOrElse(-1L)
      def us(t: java.sql.Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      try {
        // batch 1: user 1's session opens (3 events, gaps < 1 day)
        mem.addData(row(1, ts(1, 1)), row(2, ts(1, 2)),
          row(3, ts(1, 3), typ = "view"))
        q.processAllAvailable()
        // batch 2: user 1 extends the SAME session across the batch
        // boundary (21 h < gap); user 3 has an INLINE gap (26 h) — its
        // day-1 session must emit 'gap' immediately, the day-2 06:00
        // session stays open. Batch-2 watermark = day 2 05:00, still
        // BELOW both deadlines (day 3 01:00 / day 3 06:00): nothing
        // may evict yet.
        mem.addData(row(4, ts(2, 1)),
          row(5, ts(1, 4), user = 3L, typ = "view"),
          row(6, ts(2, 6), user = 3L))
        q.processAllAvailable()
        val openRows = stateRows
        // batches 3–4: a far-future user-2 pair pushes the watermark
        // past both deadlines — users 1 and 3 evict on their timers
        mem.addData(row(7, ts(20, 0), user = 2L))
        q.processAllAvailable()
        mem.addData(row(8, ts(20, 2), user = 2L))
        q.processAllAvailable()
        val afterFire = stateRows
        // batch 5: a user-1 straggler far beyond the watermark must be
        // dropped — the evicted session must NOT resurrect
        mem.addData(row(9, ts(1, 5)))
        q.processAllAvailable()
        val out = spark.table("t_sesstop")
          .select(col("user_id"), col("session_start_us"), col("n_events"),
            col("n_types"), col("top_item"), col("top_cnt"),
            col("closed_by")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getString(4), r.getLong(5), r.getString(6)))
        // user 1: exactly ONE row, the timer-evicted merged session
        val u1 = out.filter(_._1 == 1L)
        assert(u1.length == 1, s"user 1 must close exactly once: ${u1.toSeq}")
        assert(u1.head == ((1L, us(ts(1, 1)), 4L, 2L, "click", 3L, "timer")),
          s"evicted session must merge across batches exactly: ${u1.head}")
        // user 3: the day-1 session closed INLINE by the day-5 gap,
        // the day-5 session closed by the watermark timer
        val u3 = out.filter(_._1 == 3L).sortBy(_._2)
        assert(u3.map(x => (x._2, x._3, x._5, x._7)).toSeq == Seq(
          (us(ts(1, 4)), 1L, "view", "gap"),
          (us(ts(2, 6)), 1L, "click", "timer")),
          s"user 3 sessions diverged: ${u3.toSeq}")
        // eviction is real: the store sheds the evicted users' rows
        assert(afterFire < openRows,
          s"state rows must drop after eviction: open=$openRows after=$afterFire")
        // no resurrection from the dropped straggler
        assert(out.count(_._1 == 1L) == 1,
          "late straggler must not reopen the evicted session")
      } finally q.stop()
    }
  }

  test("twin #13 session top-k: multi-batch closed sessions equal the " +
    "single-batch (gate-mode) sessionization") {
    import spark.implicits._
    withRocksDbSp {
      val rows = Seq(
        row(1, ts(1, 1)), row(2, ts(1, 2), typ = "view"),
        row(3, ts(3, 1)), row(4, ts(3, 2)),
        row(5, ts(1, 4), user = 2L, typ = "buy"), row(6, ts(6, 0), user = 2L),
        row(7, ts(6, 1), user = 2L, typ = "view"))
      // gate mode: one batch, open tails emit as 'final'
      val batch = EventStreams.sessionTop(
        spark.createDataset(rows), evict = false).collect()
        .map(r => (r.user_id, r.session_start_us, r.n_events, r.top_item))
        .toSet
      // streamed in three batches, then a far-future watermark push so
      // every session closes by gap or timer
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.sessionTop(mem.toDS(), evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_sess_eq")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sesseq_chk").toString)
        .start()
      try {
        mem.addData(rows.take(2): _*); q.processAllAvailable()
        mem.addData(rows.slice(2, 5): _*); q.processAllAvailable()
        mem.addData(rows.drop(5): _*); q.processAllAvailable()
        mem.addData(row(99, ts(25, 0), user = 9L)); q.processAllAvailable()
        mem.addData(row(100, ts(25, 1), user = 9L)); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("t_sess_eq")
        .select(col("user_id"), col("session_start_us"), col("n_events"),
          col("top_item")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      // user 9's pusher session never closes (its timer is beyond the
      // final watermark) — it appears only in the batch run's 'final's
      val batchNoPusher = batch.filter(_._1 != 9L)
      assert(streamed == batchNoPusher,
        s"stream-closed sessions must equal batch sessionization:\n" +
          s"stream=$streamed\nbatch=$batchNoPusher")
    }
  }

  test("session top-k overflow policy (r15 ADVICE): gate mode fails loudly, " +
    "event-time mode emits the ~-flagged approximate row") {
    import spark.implicits._
    withRocksDbSp {
      // 3 distinct event types against k = 2 -> the MG summary must
      // decrement (the data-dependent condition the policy splits on)
      val rows3 = Seq(row(1, ts(1, 1), typ = "a"),
        row(2, ts(1, 2), typ = "b"), row(3, ts(1, 3), typ = "c"))
      // batch-mode TWS needs the state-store coordinator up + lag
      // reporting off (the prepBatchStateStore contract the QDefs use)
      spark.streams
      spark.conf.set(
        "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
        "false")
      // gate/batch mode (evict = false): loud failure — a silent
      // undercount would corrupt the hash gate
      val e = intercept[Throwable] {
        EventStreams.sessionTop(spark.createDataset(rows3), k = 2,
          evict = false).collect()
      }
      val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .take(8).map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(chain.exists(_.contains("distinct event")),
        s"gate-mode overflow must carry the loud message: $chain")
      // event-time mode (evict = true): the query SURVIVES and the row
      // arrives with the '~' approximate marker on closed_by
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.sessionTop(mem.toDS(), k = 2,
        gapUs = 3600000000L, evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("t_sessovf")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sessovf_chk").toString)
        .start()
      try {
        mem.addData(rows3: _*); q.processAllAvailable()
        // watermark pushers (a different user, far future) so user 1's
        // overflowed session closes by timer instead of killing the query
        mem.addData(row(99, ts(20, 0), user = 9L)); q.processAllAvailable()
        mem.addData(row(100, ts(25, 0), user = 9L)); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("t_sessovf")
        .filter(col("user_id") === 1L)
        .select(col("n_events"), col("closed_by")).collect()
      assert(got.length == 1, s"overflowed session must emit: ${got.toSeq}")
      assert(got(0).getLong(0) == 3L,
        "n_events stays EXACT through the MG decrement (mg.n)")
      assert(got(0).getString(1).endsWith("~"),
        s"approximate marker expected, got '${got(0).getString(1)}'")
    }
  }

  test("twin #14 interval join: cross-batch pairs emit exactly once, " +
    "two-sided state evicts on watermark passage, no resurrection") {
    import spark.implicits._
    withRocksDbSp {
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.intervalJoin(mem.toDS(), evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("t_ivj")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ivj_chk").toString)
        .start()
      def stateRows: Long =
        Option(q.lastProgress).map(_.stateOperators(0).numRowsTotal)
          .getOrElse(-1L)
      def us(t: Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      try {
        // batch 1: user 1's click buffers; user 2's purchase buffers
        mem.addData(row(1, ts(1, 1), typ = "click"),
          row(2, ts(1, 2), user = 2L, typ = "purchase", v = 7.0))
        q.processAllAvailable()
        // batch 2: user 1's purchase arrives AFTER its click (joins the
        // buffered click); user 2's click arrives LATE but above the
        // watermark (day-1 02:00 max − 1 h = 01:00 < 01:30) and joins
        // the buffered purchase — both directions of the buffer, one
        // emission each
        mem.addData(row(3, ts(1, 1, 30), typ = "purchase", v = 5.0),
          row(4, ts(1, 1, 30), user = 2L, typ = "click"))
        q.processAllAvailable()
        val openRows = stateRows
        // batches 3–4: far-future rows push the watermark past every
        // buffered deadline; the idle users' timers fire on batch 4
        // (timers compare against the PREVIOUS batch's watermark)
        mem.addData(row(5, ts(20, 0), user = 9L, typ = "click"))
        q.processAllAvailable()
        mem.addData(row(6, ts(20, 2), user = 9L, typ = "click"))
        q.processAllAvailable()
        val afterFire = stateRows
        // batch 5: a straggler purchase below the watermark is dropped
        // — the evicted click must not produce a late pair
        mem.addData(row(7, ts(1, 2), typ = "purchase", v = 9.0))
        q.processAllAvailable()
        val out = spark.table("t_ivj")
          .select(col("p_id"), col("p_user"), col("p_ts_us"),
            col("p_value"), col("c_ts_us")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getLong(4))).toSeq.sorted
        assert(out == Seq(
          (2L, 2L, us(ts(1, 2)), 7.0, us(ts(1, 1, 30))),
          (3L, 1L, us(ts(1, 1, 30)), 5.0, us(ts(1, 1)))),
          s"exactly the two cross-batch pairs, once each: $out")
        assert(afterFire < openRows,
          s"state rows must drop after eviction: open=$openRows after=$afterFire")
      } finally q.stop()
    }
  }

  test("twin #14 interval join: multi-batch output equals the gate-mode " +
    "single-batch join") {
    import spark.implicits._
    withRocksDbSp {
      val rows = Seq(
        row(1, ts(1, 1), typ = "click"), row(2, ts(1, 2), typ = "purchase", v = 2.0),
        row(3, ts(1, 2, 30), typ = "click"), row(4, ts(1, 3), typ = "purchase", v = 3.0),
        row(5, ts(1, 1), user = 2L, typ = "purchase", v = 4.0),
        row(6, ts(1, 1, 30), user = 2L, typ = "click"),
        row(7, ts(1, 2), user = 2L, typ = "purchase", v = 5.0),
        row(8, ts(2, 5), typ = "click"), row(9, ts(2, 5, 30), typ = "purchase", v = 6.0))
      // batch (gate) mode: TimeMode.None single pass
      val batch = EventStreams.intervalJoin(rows.toDS()).toDF()
        .select(col("p_id"), col("c_ts_us")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // streamed in three event-time-ordered batches
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.intervalJoin(mem.toDS(), evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("t_ivj_eq")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ivj_eq_chk").toString)
        .start()
      try {
        mem.addData(rows(0), rows(4), rows(5))
        q.processAllAvailable()
        mem.addData(rows(1), rows(2), rows(6))
        q.processAllAvailable()
        mem.addData(rows(3))
        q.processAllAvailable()
        mem.addData(rows(7), rows(8))
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("t_ivj_eq")
        .select(col("p_id"), col("c_ts_us")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"multi-batch stream must equal the single-batch join:\n" +
          s"stream=$streamed\nbatch=$batch")
    }
  }

  test("twin #15 session concurrency: multi-batch daily sweep equals " +
    "gate mode; day finalizes once by watermark timer; state evicts; " +
    "no resurrection") {
    import spark.implicits._
    withRocksDbSp {
      // three users, two days, sessions crossing batch boundaries:
      // u1 day1 [01:00..02:00] (3 events over 2 batches) + [05:00..05:15]
      // u2 day1 [01:30..01:30] singleton + day2 [03:00..03:30]
      val live = Seq(
        row(1, ts(1, 1)), row(2, ts(1, 1, 30), user = 2L),
        row(3, ts(1, 1, 30)), row(4, ts(1, 2)),
        row(5, ts(1, 5)), row(6, ts(1, 5, 15)),
        row(7, ts(2, 3), user = 2L), row(8, ts(2, 3, 30), user = 2L))
      // batch-mode TWS needs the state-store coordinator up + lag
      // reporting off (the prepBatchStateStore contract the QDefs use)
      spark.streams
      spark.conf.set(
        "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
        "false")
      // gate mode (single batch, evict = false) on the SAME rows is the
      // ground truth the streamed run must reproduce day-for-day
      val batch = EventStreams.sessionConcurrencyDaily(live.toDS()).toDF()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams
        .sessionConcurrencyDaily(mem.toDS(), evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("t_swp")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("swp_chk").toString)
        .start()
      def stateRows: Seq[Long] =
        Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq(-1L))
      // the trailing empty batches of a processAllAvailable already run
      // timer evictions, so "open" state is the PEAK across the progress
      // history, not the last snapshot
      def statePeak: Long =
        q.recentProgress.map(_.stateOperators.map(_.numRowsTotal).sum)
          .foldLeft(0L)(math.max)
      try {
        mem.addData(live(0), live(1))
        q.processAllAvailable()
        mem.addData(live(2), live(3))
        q.processAllAvailable()
        mem.addData(live(4), live(5), live(6), live(7))
        q.processAllAvailable()
        val open = statePeak
        // far-future nudges: advance the watermark past every session's
        // idle deadline AND both day ends; chained timers need a batch
        // per hop (session close → boundary buffered → day timer fires)
        mem.addData(row(100, ts(20, 0), user = 9L))
        q.processAllAvailable()
        mem.addData(row(101, ts(20, 2), user = 9L))
        q.processAllAvailable()
        mem.addData(row(102, ts(20, 4), user = 9L))
        q.processAllAvailable()
        mem.addData(row(103, ts(20, 6), user = 9L))
        q.processAllAvailable()
        val after = stateRows
        // straggler far below the watermark: dropped at the source, the
        // finalized day must NOT re-emit
        mem.addData(row(9, ts(1, 6)))
        q.processAllAvailable()
        val day20 = ts(20, 0).getTime / 86400000L
        val streamed = spark.table("t_swp")
          .filter(col("day") < day20)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        assert(streamed.toSet == batch,
          s"streamed days must equal gate mode:\nstream=$streamed\nbatch=$batch")
        assert(streamed.size == streamed.toSet.size,
          s"each day must emit exactly once: $streamed")
        assert(after.sum < open,
          s"state rows must drop after watermark passage: peak=$open after=$after")
      } finally q.stop()
    }
  }

  test("twin #16 STL seasonal: multi-batch residual days equal gate mode " +
    "(absent days read as the dense grid's zero); each day emits exactly " +
    "once; the sliding buffer evicts") {
    import spark.implicits._
    withRocksDbSp {
      // days 1..10 with days 4 and 9 ABSENT — their zero counts sit
      // inside the emitted ±3 windows, so equality with gate mode
      // proves the densified-grid semantics, not just the happy path
      val live = Seq(
        row(1, ts(1, 1)), row(2, ts(2, 2)), row(3, ts(2, 3)),
        row(4, ts(3, 1)), row(5, ts(5, 4)), row(6, ts(6, 1)),
        row(7, ts(6, 2)), row(8, ts(7, 5)), row(9, ts(8, 3)),
        row(10, ts(10, 1)))
      spark.streams
      spark.conf.set(
        "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
        "false")
      val batch = EventStreams.stlSeasonalDaily(live.toDS()).toDF()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // gate emits exactly days d0+3 .. d1-3
      val d0 = ts(1, 1).getTime / 86400000L
      assert(batch.map(_._1) == (d0 + 3 to d0 + 6).toSet,
        s"gate day range: ${batch.map(_._1)}")
      val mem = MemoryStream[EventRow](spark)
      val df = EventStreams.stlSeasonalDaily(mem.toDS(), evict = true).toDF()
      val q = df.writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("t_stl")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("stl_chk").toString)
        .start()
      def stateRows: Seq[Long] =
        Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).toSeq).getOrElse(Seq(-1L))
      def statePeak: Long =
        q.recentProgress.map(_.stateOperators.map(_.numRowsTotal).sum)
          .foldLeft(0L)(math.max)
      try {
        mem.addData(live(0), live(1), live(2))
        q.processAllAvailable()
        mem.addData(live(3), live(4), live(5))
        q.processAllAvailable()
        mem.addData(live(6), live(7), live(8), live(9))
        q.processAllAvailable()
        val open = statePeak
        // far-future nudges: each watermark advance finalizes day
        // counts (stage-1 timers) whose rows reach stage 2 in the SAME
        // batch (chained operators); several hops drain the pipeline
        mem.addData(row(100, ts(20, 0), user = 9L))
        q.processAllAvailable()
        mem.addData(row(101, ts(20, 2), user = 9L))
        q.processAllAvailable()
        mem.addData(row(102, ts(20, 4), user = 9L))
        q.processAllAvailable()
        val after = stateRows
        // straggler far below the watermark: dropped at the source —
        // finalized days must NOT re-emit or shift
        mem.addData(row(11, ts(2, 6)))
        q.processAllAvailable()
        // the nudge day (20) legitimately extends the streamed grid past
        // the live fixture's d1 = day 10 — compare on the live window
        val streamedAll = spark.table("t_stl")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        val streamedLive = streamedAll.filter(_._1 <= d0 + 6)
        assert(streamedLive.toSet == batch,
          s"streamed must equal gate mode:\nstream=$streamedLive\nbatch=$batch")
        assert(streamedAll.map(_._1).distinct.size == streamedAll.size,
          s"each day must emit exactly once: ${streamedAll.map(_._1)}")
        assert(after.sum < open,
          s"sliding buffer must evict: peak=$open after=$after")
      } finally q.stop()
    }
  }

  private def withRocksDbSp[A](body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }
}

object StreamingSpec {
  /** JVM-static spy counters — see the composition test. */
  val partials = new java.util.concurrent.atomic.AtomicInteger
  val callLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int)]()
}
