package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Batch-mode equivalents of the Structured Streaming operators (the same
  * logic runs as a streaming query in graft.streaming — identical plans,
  * `readStream` instead of `read`). These give the streaming semantics a
  * DuckDB oracle: tumbling/sliding/session windows, dedup, stream-static
  * join.
  *
  * Window starts are emitted as epoch seconds (BIGINT) — engine-neutral.
  */
object EventWindows {

  /** Poisson(1) CDF thresholds for k = 0..4, pre-scaled to the 2⁶⁰
    * integer grid — evaluated ONCE here and embedded as BIGINT literals
    * in both engine plans (q_bootstrap_poisson), so the md5-uniform →
    * Poisson weight map is pure integer comparison per-engine. */
  private[queries] val PoisT: Array[Long] = {
    var fact = 1.0; var sum = 0.0
    (0 to 4).map { k =>
      if (k > 0) fact *= k
      sum += 1.0 / fact
      (math.exp(-1.0) * sum * math.pow(2.0, 60)).toLong
    }.toArray
  }

  /** q_fdr_bh p-value chains, shared VERBATIM between the Spark plan
    * (`expr`) and the DuckDB oracle so both engines execute the
    * identical IEEE op sequence over identical exact integer inputs —
    * the q_pmi class-C argument: +,-,*,/ and sqrt are correctly-rounded
    * IEEE ops (bit-identical given identical operand order); only
    * `exp` is libm-dependent, and its final-ulp wobble is absorbed by
    * the single 1e-6 ppm rounding at the end of each chain. */
  // KS two-sample asymptotic p = min(1, 2·exp(−2·D²·n_a n_b/(n_a+n_b)))
  // over the exact integer D numerator (D = d_num/(n_a·n_b)).
  private val ksPpmSql: String =
    "CAST(round(least(1.0, 2.0 * exp(-2.0" +
      " * (CAST(d_num AS DOUBLE) / n_a / n_b)" +
      " * (CAST(d_num AS DOUBLE) / n_a / n_b)" +
      " * (CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)))) * 1000000, 0)" +
      " AS BIGINT)"
  // |z| of the tie-corrected Mann–Whitney normal approximation over the
  // exact integers (u2_a = 2·U_a, tie = Σ(t³−t)):
  //   z = (U_a − n1n2/2) / sqrt(n1n2/12 · ((n+1) − tie/(n(n−1))))
  private val mwAzSql: String =
    "abs((CAST(u2_a AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)" +
      " / (2.0 * sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)" +
      " * ((n1 + n2 + 1) - CAST(tie AS DOUBLE)" +
      " / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))))"
  private val mwTnSql: String = "1.0 / (1.0 + 0.2316419 * az)"
  // Two-sided normal p via Abramowitz–Stegun 26.2.17 (|err| < 7.5e-8,
  // two orders under the ppm grid): 1−Φ(z) = φ(z)·Σ bᵢtⁱ, φ's 1/√(2π)
  // embedded as a literal so neither engine computes a transcendental
  // constant.
  private val normPpmSql: String =
    "CAST(round(least(1.0, 2.0 * (exp(-az * az / 2.0)" +
      " * 0.3989422804014327" +
      " * (tn * (0.319381530 + tn * (-0.356563782 + tn * (1.781477937" +
      " + tn * (-1.821255978 + tn * 1.330274429))))))) * 1000000, 0)" +
      " AS BIGINT)"

  /** Shared product-limit machinery of q_survival_km /
    * q_survival_stream_twin: from the per-user (t, ev) frame, the
    * study-length-bounded daily frame, risk sets by prefix subtraction,
    * the log-domain survival sum with the explicit d = n dead flag, and
    * the single exp at the end. ONE definition, so the batch query and
    * the stateful twin cannot drift. */
  private def kmTable(users: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val daily = users.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
      .localCheckpoint(true) // risk/cum windows + the total read it
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(sum(col("d") + col("c")).as("n_all"))
    daily.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("n_all") -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("dead",
        max(when(col("d") >= col("n_risk"), 1L).otherwise(0L))
          .over(wCum))
      .withColumn("term", when(col("d") < col("n_risk"),
        expr("CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk)" +
          " * 1000000, 0) AS BIGINT)")).otherwise(lit(0L)))
      .withColumn("km_ln_e6",
        when(col("dead") === 1L, lit(null).cast("long"))
          .otherwise(sum(col("term")).over(wCum)))
      .select(col("t").as("t_day"), col("n_risk"),
        col("d").as("d_events"), col("c").as("c_censored"),
        col("km_ln_e6"),
        when(col("dead") === 1L, lit(0L)).otherwise(
          expr("CAST(round(exp(CAST(km_ln_e6 AS DOUBLE) / 1000000)" +
            " * 1000000, 0) AS BIGINT)")).as("surv_ppm"))
      .orderBy(col("t_day"))
  }

  /** The q_survival_km oracle — shared verbatim with
    * q_survival_stream_twin (state replayed in one batch IS the batch
    * computation, so the twin's reference result is identical). */
  private val survivalKmSql: String =
    """WITH gm AS (SELECT max(ts) AS gm FROM events),
        u AS (SELECT user_id, min(ts) AS fe,
            min(ts) FILTER (WHERE event_type = 'purchase') AS fp
          FROM events GROUP BY user_id),
        tt AS (SELECT CASE WHEN fp IS NOT NULL
              THEN date_diff('day', CAST(fe AS DATE), CAST(fp AS DATE))
              ELSE date_diff('day', CAST(fe AS DATE), CAST(gm AS DATE))
              END AS t,
            CAST(fp IS NOT NULL AS BIGINT) AS ev
          FROM u CROSS JOIN gm),
        daily AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
            CAST(sum(1 - ev) AS BIGINT) AS c FROM tt GROUP BY t),
        tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_all FROM daily),
        r AS (SELECT t, d, c,
            n_all - CAST(COALESCE(sum(d + c) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_risk
          FROM daily CROSS JOIN tot),
        r2 AS (SELECT *,
            CAST(max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS BIGINT) AS dead,
            CASE WHEN d < n_risk
              THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                * 1000000, 0) AS BIGINT)
              ELSE 0 END AS term
          FROM r),
        r3 AS (SELECT *, CASE WHEN dead = 1 THEN NULL
            ELSE CAST(sum(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) END AS km_ln_e6
          FROM r2)
        SELECT t AS t_day, n_risk, d AS d_events, c AS c_censored,
          km_ln_e6,
          CASE WHEN dead = 1 THEN 0
            ELSE CAST(round(exp(CAST(km_ln_e6 AS DOUBLE) / 1000000)
              * 1000000, 0) AS BIGINT) END AS surv_ppm
        FROM r3 ORDER BY t_day"""

  val all: Seq[QDef] = Seq(

    // Tumbling 1-day event-time window.
    QDef("q_tumbling_daily",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(unix_timestamp(col("w.start")).as("win_start_s"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("win_start_s"), col("event_type")),
      Some(s"""SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS win_start_s,
        event_type, count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY win_start_s, event_type""")),

    // Sliding window: 1-day length, 12-hour slide → each event lands in
    // exactly two windows. Oracle reconstructs the two window starts per
    // event arithmetically (windows align to the epoch, as Spark's do).
    QDef("q_sliding_12h",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "1 day", "12 hours").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(unix_timestamp(col("w.start")).as("win_start_s"),
          col("n"), col("total_value"))
        .orderBy(col("win_start_s")),
      Some(s"""SELECT win_start_s, count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM (
          SELECT ((epoch_us(ts) // 1000000) // 43200 - k) * 43200 AS win_start_s, value
          FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        GROUP BY win_start_s ORDER BY win_start_s""")),

    // Session window, 1-hour gap, per user. Session semantics: an event at
    // t joins the session iff t < last_ts + gap (Spark's session_window);
    // the oracle reproduces this with a gaps-and-islands window.
    QDef("q_session_window_1h",
      (s, d) => events(s, d)
        .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start_s"),
          col("n"), col("total_value"))
        .orderBy(col("user_id"), col("sess_start_s")),
      Some(s"""WITH flagged AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 1 HOUR OR
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS new_sess
          FROM events),
        sessions AS (
          SELECT user_id, ts, value,
            sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM flagged)
        SELECT user_id,
          epoch_us(min(ts)) // 1000000 AS sess_start_s,
          count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM sessions GROUP BY user_id, sess_id
        ORDER BY user_id, sess_start_s""")),

    // Deterministic dedup: first event per (user_id, event_type) by event
    // time — the batch equivalent of withWatermark + dropDuplicates.
    // Gap-based batch sessionization — the lag + running-sum formulation
    // (new session iff the gap to the previous event exceeds 1h), the
    // classic SQL twin of session_window above but emitting per-session
    // START/END/duration rows. Windows partition on user_id — a
    // high-cardinality key, so per-user sorts distribute (contrast the
    // percent_rank demo's 5-value key, documented in TUNING.md). All gap
    // arithmetic in exact epoch-µs integers so both engines agree on
    // every boundary.
    QDef("q_sessionize_lag",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            (col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 3600000000L).cast("long"))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_no"))
          .agg(count(lit(1)).as("n"),
            min(unix_micros(col("ts"))).as("sess_start_us"),
            max(unix_micros(col("ts"))).as("sess_end_us"),
            dsum(col("value")).as("sv"))
          .orderBy(col("user_id"), col("sess_no"))
      },
      Some(s"""WITH x AS (SELECT user_id, event_id, ts, value,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y)
        SELECT user_id, sess_no, count(*) AS n,
          min(epoch_us(ts)) AS sess_start_us,
          max(epoch_us(ts)) AS sess_end_us,
          ${sqlDsum("value")} AS sv
        FROM z GROUP BY user_id, sess_no
        ORDER BY user_id, sess_no""")),

    // SESSION CONCURRENCY (r14 VERDICT directive 7 — the overlapping-
    // session count, the one event-analytics shape the surface lacked):
    // how many users have an ACTIVE session at once? Sessions are the
    // same 1-hour-gap islands as q_sessionize_lag (shared definition —
    // the session SQL is identical); each [start_us, end_us] interval
    // becomes a +1/−1 boundary pair and concurrency is the running sum
    // over all boundaries ordered by (us, delta DESC) — starts before
    // ends at the same microsecond, so touching sessions briefly
    // overlap and single-event (zero-length) sessions still count.
    // SCALE: the running sum is NEVER a corpus-scale unpartitioned
    // window — it's the sharded two-level prefix sum (the
    // q_curriculum_order shape): an in-day cumsum partitioned by the
    // UTC day, plus each day's carried-in concurrency from a prefix
    // sum over the bounded calendar grid (≤ |days| rows). The daily
    // PEAK is invariant to boundary order within (us, delta) ties
    // (the max after a run of equal-delta boundaries doesn't depend on
    // their relative order), so no further tiebreaker is needed.
    // Output per day with ≥1 boundary: sessions started/ended, and the
    // peak concurrency including the carried-in level. All-integer.
    QDef("q_session_concurrency",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_sess", (col("prev_us").isNull ||
            col("us") - col("prev_us") > 3600000000L).cast("long"))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_no"))
          .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        val bounds = sess.select(col("s_us").as("us"), lit(1L).as("delta"))
          .unionAll(sess.select(col("e_us").as("us"), lit(-1L).as("delta")))
          .withColumn("day", expr("us div 86400000000"))
        val wd = Window.partitionBy(col("day"))
          .orderBy(col("us"), col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val daily = bounds.withColumn("cum", sum(col("delta")).over(wd))
          .groupBy(col("day"))
          .agg(count(when(col("delta") === 1L, 1)).as("starts"),
            count(when(col("delta") === -1L, 1)).as("ends"),
            max(col("cum")).as("in_peak"), sum(col("delta")).as("net"))
        val wg = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)
        daily
          .withColumn("carry", coalesce(sum(col("net")).over(wg), lit(0L)))
          .select(col("day"), col("starts"), col("ends"),
            greatest(col("carry"), col("carry") + col("in_peak"))
              .as("peak"))
          .orderBy(col("day"))
      },
      Some(s"""WITH x AS (SELECT user_id, event_id, ts,
            epoch_us(ts) AS us,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR us - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y),
        sess AS (SELECT user_id, sess_no, min(us) AS s_us, max(us) AS e_us
          FROM z GROUP BY user_id, sess_no),
        b AS (SELECT s_us AS us, CAST(1 AS BIGINT) AS delta FROM sess
          UNION ALL
          SELECT e_us, CAST(-1 AS BIGINT) FROM sess),
        c AS (SELECT us // 86400000000 AS day, us, delta,
            CAST(sum(delta) OVER (PARTITION BY us // 86400000000
              ORDER BY us, delta DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS cum
          FROM b),
        daily AS (SELECT day,
            CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT) AS starts,
            CAST(count(*) FILTER (WHERE delta = -1) AS BIGINT) AS ends,
            max(cum) AS in_peak, CAST(sum(delta) AS BIGINT) AS net
          FROM c GROUP BY day),
        o AS (SELECT *, COALESCE(CAST(sum(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
            0) AS carry FROM daily)
        SELECT day, starts, ends,
          greatest(carry, carry + in_peak) AS peak
        FROM o ORDER BY day""")),

    // ACTIVE-USER ROLLING REACH — DAU / WAU / MAU and the stickiness
    // ratio (DAU·10⁴ div MAU), the product-analytics scorecard beside
    // the funnel: for every day with events, distinct users that day,
    // in the trailing 7 days, and in the trailing 30 days. SCALE: the
    // rolling distincts are NOT windowed distinct-counts over the
    // corpus — the corpus collapses FIRST to the distinct (day, user)
    // pair frame (one hash agg, |users|·|days| bound), then each pair
    // joins to the ≤|days| day grid via a bounded-fanout theta join
    // (≤7 and ≤30 grid days per pair) and a count-distinct per grid
    // day. All-integer: class A determinism.
    QDef("q_active_users",
      (s, d) => {
        val du = events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            col("user_id")).distinct()
          .localCheckpoint(true) // three self-joins read it
        val grid = du.select(col("day")).distinct()
        val dau = du.groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        def rolling(days: Int, name: String) = grid.as("g")
          .join(du.as("p"), col("p.day").between(
            col("g.day") - (days - 1), col("g.day")))
          .groupBy(col("g.day").as("day"))
          .agg(countDistinct(col("user_id")).as(name))
        dau.join(rolling(7, "wau"), Seq("day"))
          .join(rolling(30, "mau"), Seq("day"))
          .withColumn("stickiness_bp",
            expr("dau * 10000 div greatest(mau, 1)"))
          .orderBy(col("day"))
      },
      Some(s"""WITH du AS (SELECT DISTINCT
            epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        grid AS (SELECT DISTINCT day FROM du),
        dau AS (SELECT day, count(DISTINCT user_id) AS dau
          FROM du GROUP BY day),
        wau AS (SELECT g.day, count(DISTINCT p.user_id) AS wau
          FROM grid g JOIN du p
            ON p.day BETWEEN g.day - 6 AND g.day GROUP BY g.day),
        mau AS (SELECT g.day, count(DISTINCT p.user_id) AS mau
          FROM grid g JOIN du p
            ON p.day BETWEEN g.day - 29 AND g.day GROUP BY g.day)
        SELECT day, dau, wau, mau,
          dau * 10000 // greatest(mau, 1) AS stickiness_bp
        FROM dau JOIN wau USING (day) JOIN mau USING (day)
        ORDER BY day""")),

    // USER INTERARRIVAL PROFILE — the distribution of gaps between a
    // user's consecutive events, bucketed by DECIMAL DIGIT COUNT of
    // the gap in seconds (an order-of-magnitude histogram computed
    // without logarithms: length(CAST(gap_s AS VARCHAR)) — identical
    // integer/string semantics in both engines, no transcendentals in
    // the gate chain). The lag runs per-user (the sessionizer's
    // declared bounded-history posture); everything after is one
    // hash agg. Gap of 0 s (same-second events) lands in the 1-digit
    // bucket with "0". All-integer.
    QDef("q_user_interarrival",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .withColumn("gap_s", expr("gap_us div 1000000"))
          .filter(col("gap_s").isNotNull)
          .withColumn("gap_digits",
            length(col("gap_s").cast("string")).cast("long"))
          .groupBy(col("gap_digits"))
          .agg(count(lit(1)).as("n_gaps"),
            min(col("gap_s")).as("min_gap_s"),
            max(col("gap_s")).as("max_gap_s"))
          .orderBy(col("gap_digits"))
      },
      Some(s"""WITH g AS (SELECT (epoch_us(ts) -
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id)) // 1000000 AS gap_s
          FROM events)
        SELECT CAST(length(CAST(gap_s AS VARCHAR)) AS BIGINT)
            AS gap_digits,
          count(*) AS n_gaps, min(gap_s) AS min_gap_s,
          max(gap_s) AS max_gap_s
        FROM g WHERE gap_s IS NOT NULL
        GROUP BY 1 ORDER BY gap_digits""")),

    // ACTIVITY HEATMAP — the day-of-week × hour-of-day usage matrix
    // every analytics product ships: events and distinct users per
    // (dow, hour) cell, plus the cell's share of total traffic in
    // basis points. Pure calendar arithmetic on epoch-µs integers
    // (dow 0 = Thursday 1970-01-01, the raw epoch convention, declared
    // — no timezone/locale dependency can drift between engines), one
    // map-side scan + a ≤168-row hash agg + a broadcast 1-row total.
    QDef("q_activity_heatmap",
      (s, d) => {
        val ev = events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("unix_micros(ts) % 86400000000 div 3600000000")
              .as("hour"), col("user_id"))
          .withColumn("dow", expr("day % 7"))
        val tot = ev.agg(count(lit(1)).as("total"))
        ev.groupBy(col("dow"), col("hour"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .crossJoin(broadcast(tot))
          .select(col("dow"), col("hour"), col("n"), col("n_users"),
            expr("n * 10000 div total").as("share_bp"))
          .orderBy(col("dow"), col("hour"))
      },
      Some(s"""WITH ev AS (SELECT
            (epoch_us(ts) // 86400000000) % 7 AS dow,
            epoch_us(ts) % 86400000000 // 3600000000 AS hour,
            user_id
          FROM events),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM ev)
        SELECT dow, hour, count(*) AS n,
          CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
          count(*) * 10000 // total AS share_bp
        FROM ev CROSS JOIN tot
        GROUP BY dow, hour, total ORDER BY dow, hour""")),

    // SESSION DURATION HISTOGRAM — how long do sessions last, by
    // decimal digit count of the duration in seconds (the logarithm-
    // free order-of-magnitude bucketing of q_user_interarrival applied
    // to the sessionizer's output): sessions are the SAME 1-hour-gap
    // islands as q_sessionize_lag; single-event sessions land in the
    // "0"-second 1-digit bucket (declared). All-integer.
    QDef("q_session_duration_histogram",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_sess", (col("prev_us").isNull ||
            col("us") - col("prev_us") > 3600000000L).cast("long"))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_no"))
          .agg(max(col("us")).as("mx"), min(col("us")).as("mn"),
            count(lit(1)).as("n_ev"))
          .withColumn("dur_s", expr("(mx - mn) div 1000000"))
          .withColumn("dur_digits",
            length(col("dur_s").cast("string")).cast("long"))
          .groupBy(col("dur_digits"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_ev")).as("n_events"),
            min(col("dur_s")).as("min_dur_s"),
            max(col("dur_s")).as("max_dur_s"))
          .orderBy(col("dur_digits"))
      },
      Some(s"""WITH x AS (SELECT user_id, event_id, ts,
            epoch_us(ts) AS us,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR us - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y),
        sess AS (SELECT user_id, sess_no,
            (max(us) - min(us)) // 1000000 AS dur_s,
            CAST(count(*) AS BIGINT) AS n_ev
          FROM z GROUP BY user_id, sess_no)
        SELECT CAST(length(CAST(dur_s AS VARCHAR)) AS BIGINT)
            AS dur_digits,
          count(*) AS n_sessions, CAST(sum(n_ev) AS BIGINT) AS n_events,
          min(dur_s) AS min_dur_s, max(dur_s) AS max_dur_s
        FROM sess GROUP BY 1 ORDER BY dur_digits""")),

    // ENGAGEMENT CONCENTRATION — the Gini coefficient of per-user
    // event counts plus the top-decile traffic share: the inequality
    // scorecard behind "10% of users generate X% of traffic". The
    // q_gini_vocab histogram-identity pattern applied to users: Σ
    // rank·c needs ranks under (c, user) ascending order, but within a
    // count-group the rank SUM is fixed — so the engine windows over
    // the count HISTOGRAM (distinct count values ≪ users ≪ corpus)
    // and closes Σ rank·c = Σ_v c·(m·start + m(m+1)/2) exactly. The
    // top-decile share takes u10 = n_users div 10 users from the
    // descending-count side, splitting the boundary count-group
    // proportionally in whole users (u10 = 0 ⇒ share 0, declared).
    // DECIMAL(38,0)/HUGEINT moments, e6/bp grids, class A.
    QDef("q_engagement_gini",
      (s, d) => {
        val cnts = events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("c"))
        val hist = cnts.groupBy(col("c")).agg(count(lit(1)).as("m"))
          .localCheckpoint(true) // two window passes + the rollup
        val tot = hist.agg(sum(col("m")).as("n_users"))
        val wAsc = Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDesc = Window.orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("cum_m", sum(col("m")).over(wAsc))
          .withColumn("cum_desc", sum(col("m")).over(wDesc))
          .crossJoin(broadcast(tot))
          .withColumn("start", col("cum_m") - col("m"))
          .withColumn("u10", expr("n_users div 10"))
          .withColumn("take", least(col("m"),
            greatest(lit(0L), col("u10") - (col("cum_desc") - col("m")))))
          .agg(
            max(col("n_users")).as("n_users"),
            sum(expr("CAST(c AS DECIMAL(38,0)) * m")).as("total_events"),
            sum(expr("""CAST(c AS DECIMAL(38,0)) *
              (m * start + m * (m + 1) div 2)""")).as("s_rank_c"),
            sum(expr("CAST(c AS DECIMAL(38,0)) * take")).as("top10_ev"))
          .select(col("n_users"),
            col("total_events").cast("long").as("total_events"),
            expr("""CAST((2 * s_rank_c - (n_users + 1) * total_events)
              * 1000000 div (CAST(n_users AS DECIMAL(38,0))
              * total_events) AS BIGINT)""").as("gini_e6"),
            expr("CAST(top10_ev * 10000 div total_events AS BIGINT)")
              .as("top10_share_bp"))
      },
      Some(s"""WITH cnts AS (SELECT user_id,
            CAST(count(*) AS BIGINT) AS c FROM events GROUP BY user_id),
        hist AS (SELECT c, CAST(count(*) AS BIGINT) AS m
          FROM cnts GROUP BY c),
        tot AS (SELECT CAST(sum(m) AS BIGINT) AS n_users FROM hist),
        st AS (SELECT c, m,
            CAST(sum(m) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
              AS BIGINT) - m AS start,
            CAST(sum(m) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_desc
          FROM hist),
        agg AS (SELECT max(n_users) AS n_users,
            CAST(sum(CAST(c AS HUGEINT) * m) AS HUGEINT) AS total_events,
            CAST(sum(CAST(c AS HUGEINT) *
              (m * start + m * (m + 1) // 2)) AS HUGEINT) AS s_rank_c,
            CAST(sum(CAST(c AS HUGEINT) * least(m,
              greatest(0, n_users // 10 - (cum_desc - m))))
              AS HUGEINT) AS top10_ev
          FROM st CROSS JOIN tot)
        SELECT n_users, CAST(total_events AS BIGINT) AS total_events,
          CAST((2 * s_rank_c - (n_users + 1) * total_events) * 1000000
            // (CAST(n_users AS HUGEINT) * total_events) AS BIGINT)
            AS gini_e6,
          CAST(top10_ev * 10000 // total_events AS BIGINT)
            AS top10_share_bp
        FROM agg""")),

    // SEASONAL–TREND DECOMPOSITION (STL-lite, classical additive form)
    // of the daily event-count series — the time-series view the
    // heatmap (q_activity_heatmap) only shows marginally: trend = the
    // 7-day centered moving average (the classical decomposition's MA
    // filter matched to the weekly period), seasonal(dow) = the mean
    // detrended residual per day-of-week, both on the e2 integer grid
    // (trend = 7-day sum × 100 div 7 — one truncating division; Spark
    // `div` ≡ DuckDB `//` toward zero, negatives included). Edge days
    // without a full ±3-day window are EXCLUDED from the seasonal means
    // (the classical convention: the MA is undefined there). The daily
    // series is densified onto the full min..max calendar grid (a
    // missing day is a true 0, and the MA window must slide over
    // calendar days, not observed rows). Scale: one map-side combinable
    // count per day, then every window/mean runs on the ≤|days| daily
    // frame — the q_session_concurrency bounded-frame discipline; the
    // corpus-size work never reaches a window.
    QDef("q_stl_seasonal",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("n"))
        val bounds = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val grid = bounds
          .select(explode(expr("sequence(d0, d1)")).as("day"),
            col("d0"), col("d1"))
        val dense = grid.join(daily, Seq("day"), "left")
          .select(col("day"), col("d0"), col("d1"),
            coalesce(col("n"), lit(0L)).as("n"))
        val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
        dense
          .withColumn("s7", sum(col("n")).over(w))
          .filter(col("day") >= col("d0") + 3 && col("day") <= col("d1") - 3)
          .select(col("day"), col("n"), expr("s7 * 100 div 7").as("trend_e2"))
          .select((col("day") % 7).as("dow"),
            (col("n") * 100 - col("trend_e2")).as("resid_e2"))
          .groupBy(col("dow"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("resid_e2")).as("sum_resid_e2"))
          .select(col("dow"), col("n_days"), col("sum_resid_e2"),
            expr("sum_resid_e2 div n_days").as("seasonal_e2"))
          .orderBy(col("dow"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        grid AS (SELECT unnest(range(d0, d1 + 1)) AS day, d0, d1
          FROM bounds),
        dense AS (SELECT g.day, g.d0, g.d1, COALESCE(daily.n, 0) AS n
          FROM grid g LEFT JOIN daily ON g.day = daily.day),
        ma AS (SELECT day, d0, d1, n,
            sum(n) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7
          FROM dense),
        det AS (SELECT day % 7 AS dow,
            n * 100 - s7 * 100 // 7 AS resid_e2
          FROM ma WHERE day >= d0 + 3 AND day <= d1 - 3)
        SELECT dow, count(*) AS n_days,
          CAST(sum(resid_e2) AS BIGINT) AS sum_resid_e2,
          CAST(sum(resid_e2) AS BIGINT) // count(*) AS seasonal_e2
        FROM det GROUP BY dow ORDER BY dow""")),

    // Ordered funnel analysis: how far does each user progress through
    // view → click → purchase, where each stage must STRICTLY follow the
    // previous one in event time (first occurrence per stage)? One
    // hash-agg collapses each user to three first-touch timestamps
    // (map-side combinable conditional mins — never a per-user event
    // sort), then a codegen'd CASE ladder assigns the stage and a second
    // tiny agg counts the funnel. The product-analytics staple.
    QDef("q_funnel_stages",
      (s, d) => {
        val m = events(s, d).groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        m.select(
            when(col("tv").isNull, 0)
              .when(col("tc").isNull || col("tc") <= col("tv"), 1)
              .when(col("tp").isNull || col("tp") <= col("tc"), 2)
              .otherwise(3).cast("long").as("stage"))
          .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("stage"))
      },
      Some("""WITH m AS (SELECT user_id,
            min(ts) FILTER (WHERE event_type = 'view') AS tv,
            min(ts) FILTER (WHERE event_type = 'click') AS tc,
            min(ts) FILTER (WHERE event_type = 'purchase') AS tp
          FROM events GROUP BY user_id)
        SELECT CAST(CASE WHEN tv IS NULL THEN 0
            WHEN tc IS NULL OR tc <= tv THEN 1
            WHEN tp IS NULL OR tp <= tc THEN 2
            ELSE 3 END AS BIGINT) AS stage,
          count(*) AS n_users
        FROM m GROUP BY 1 ORDER BY stage""")),

    // Cohort retention matrix: users bucketed by first-seen week
    // (cohort) × weeks-since-first-seen (offset) → distinct active
    // users. Two hash-aggs (first-touch per user, then the matrix) plus
    // the per-user first-touch equi-join back onto events — the other
    // product-analytics staple. The first-touch frame has |users|
    // cardinality, so it carries NO broadcast hint: at 100 TB it must be
    // a shuffle join on user_id (co-partitioned with the groupBy that
    // produced it, so the exchange is reused); AQE still broadcasts it
    // at small SFs where it fits.
    QDef("q_retention_cohorts",
      (s, d) => {
        val e = events(s, d).select(col("user_id"), to_date(col("ts")).as("dt"))
        val first = e.groupBy(col("user_id")).agg(min(col("dt")).as("d0"))
        e.join(first, "user_id")
          .select(
            floor(datediff(col("d0"), lit("2024-01-01").cast("date")) / 7)
              .as("cohort_wk"),
            floor(datediff(col("dt"), col("d0")) / 7).as("offset_wk"),
            col("user_id"))
          .groupBy(col("cohort_wk"), col("offset_wk"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_wk"), col("offset_wk"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
        first AS (SELECT user_id, min(dt) AS d0 FROM e GROUP BY user_id)
        SELECT CAST(floor(date_diff('day', DATE '2024-01-01', d0) / 7.0)
            AS BIGINT) AS cohort_wk,
          CAST(floor(date_diff('day', d0, dt) / 7.0) AS BIGINT) AS offset_wk,
          count(DISTINCT e.user_id) AS n_users
        FROM e JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""")),

    // The STREAMING funnel operator itself, on the driver gate: runs
    // EventStreams.funnelStages (transformWithState + ValueState) in
    // batch execution mode — Spark executes the same StatefulProcessor
    // against an ephemeral state store, feeding each user's full history
    // as one handleInputRows call — then counts stages. Must equal
    // q_funnel_stages' oracle exactly: the processor's min-tracking over
    // one batch IS the conditional-min aggregation. StreamingSpec proves
    // the multi-batch incremental path equal to this on MemoryStreams;
    // this query pins the processor's stage logic to DuckDB every round.
    QDef("q_funnel_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.funnelStages(ev).toDF()
          .select(col("stage").cast("long").as("stage"))
          .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("stage"))
      },
      Some("""WITH m AS (SELECT user_id,
            min(ts) FILTER (WHERE event_type = 'view') AS tv,
            min(ts) FILTER (WHERE event_type = 'click') AS tc,
            min(ts) FILTER (WHERE event_type = 'purchase') AS tp
          FROM events GROUP BY user_id)
        SELECT CAST(CASE WHEN tv IS NULL THEN 0
            WHEN tc IS NULL OR tc <= tv THEN 1
            WHEN tp IS NULL OR tp <= tc THEN 2
            ELSE 3 END AS BIGINT) AS stage,
          count(*) AS n_users
        FROM m GROUP BY 1 ORDER BY stage""")),

    // The STREAMING retention operator on the driver gate, same pattern:
    // EventStreams.retentionCells (first-touch ValueState) in batch mode
    // emits one (user, cohort_wk, offset_wk) cell per event day, then the
    // distinct-user matrix. Day arithmetic inside the processor is
    // java.time epoch-day math (JVM UTC), the batch oracle's to_date is
    // session-UTC — both land on the same civil date for µs timestamps.
    QDef("q_retention_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.retentionCells(ev).toDF()
          .groupBy(col("cohort_wk"), col("offset_wk"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_wk"), col("offset_wk"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
        first AS (SELECT user_id, min(dt) AS d0 FROM e GROUP BY user_id)
        SELECT CAST(floor(date_diff('day', DATE '2024-01-01', d0) / 7.0)
            AS BIGINT) AS cohort_wk,
          CAST(floor(date_diff('day', d0, dt) / 7.0) AS BIGINT) AS offset_wk,
          count(DISTINCT e.user_id) AS n_users
        FROM e JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""")),

    // The transformWithState RUNNING-COUNTER operator (ValueState) on
    // the gate: batch execution hands each user's full history to one
    // handleInputRows call, so the emitted counter is the per-user
    // total. The operator's event COUNT is compared directly; its
    // float sum is iteration-order-dependent (the processor adds
    // doubles in arrival order — correct streaming semantics, not
    // cross-engine comparable), so the compared value column comes
    // from the declarative dsum over the same rows, joined on user_id.
    QDef("q_counter_state_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        val counters = graft.streaming.EventStreams.runningCountersTws(ev)
          .toDF().select(col("user_id"), col("n_events"))
        val sums = events(s, d).groupBy(col("user_id"))
          .agg(dsum(col("value")).as("total_value"))
        counters.join(sums, "user_id")
          .orderBy(col("user_id"))
      },
      Some(s"""SELECT user_id, count(*) AS n_events,
        ${sqlDsum("value")} AS total_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // The MapState operator (per-user per-event-type point updates) on
    // the gate: ActivityProcessor's counts_by_type map, exploded to
    // (user, type, n) rows. The ListState ring it also maintains holds
    // ARRIVAL-order event ids — correct streaming semantics but not
    // deterministic in batch partition order, so it is exercised (the
    // state updates run) and not compared.
    QDef("q_activity_state_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.userActivity(ev).toDF()
          .select(col("user_id"), explode(col("counts_by_type")))
          .select(col("user_id"), col("key").as("event_type"),
            col("value").as("n"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type""")),

    QDef("q_events_dedup",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("first_ts_us"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, event_id, epoch_us(ts) AS first_ts_us
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                ORDER BY ts, event_id) AS rn FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type""")),

    // Last-touch revenue attribution: each purchase's value goes to the
    // channel of the LAST click in the preceding hour (channel derived
    // from the click's JSON props). The interval join is the
    // q_stream_interval_join shape; "last" resolves by row_number over
    // (click time DESC, click id DESC) — deterministic total order —
    // and the channel rollup is one dsum. The marketing staple that
    // composes three declared primitives.
    QDef("q_attribution_last_touch",
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"), col("value").as("p_value"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"),
            pmod(get_json_object(col("props"), "$.k").cast("long"), lit(5L))
              .as("channel"))
        val joined = p.join(c, col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
        val lastTouch = joined.withColumn("rn",
            row_number().over(Window.partitionBy(col("p_id"))
              .orderBy(col("c_ts").desc, col("c_id").desc)))
          .filter(col("rn") === 1)
        lastTouch.groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            dsum(col("p_value")).as("attributed_value"))
          .orderBy(col("channel"))
      },
      Some(s"""WITH p AS (SELECT event_id AS p_id, user_id AS p_user,
            ts AS p_ts, value AS p_value
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, ts AS c_ts, event_id AS c_id,
            CAST(json_extract(props, '$$.k') AS BIGINT) % 5 AS channel
          FROM events WHERE event_type = 'click'),
        lt AS (SELECT p_id, p_value, channel,
            row_number() OVER (PARTITION BY p_id
              ORDER BY c_ts DESC, c_id DESC) AS rn
          FROM p JOIN c ON p_user = c_user
            AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts)
        SELECT channel, count(*) AS n_purchases,
          ${sqlDsum("p_value")} AS attributed_value
        FROM lt WHERE rn = 1
        GROUP BY channel ORDER BY channel""")),

    // User-journey Markov transitions: count every (state → next state)
    // hop along each user's time-ordered event stream and derive the
    // transition matrix in exact ppm integers — the path-analysis
    // staple. One lead() over the per-user window (high-cardinality
    // partition key, distributes) + two tiny hash-aggs.
    QDef("q_markov_transitions",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val hops = events(s, d)
          .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = hops.groupBy(col("from_type"))
          .agg(sum(col("n")).as("tot"))
        hops.join(totals, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 1000000 div tot").as("p_ppm"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH hops AS (SELECT from_type, to_type, count(*) AS n
          FROM (SELECT event_type AS from_type,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS to_type
            FROM events)
          WHERE to_type IS NOT NULL GROUP BY 1, 2),
        totals AS (SELECT from_type, sum(n) AS tot FROM hops GROUP BY 1)
        SELECT h.from_type, h.to_type, h.n,
          CAST(h.n * 1000000 // t.tot AS BIGINT) AS p_ppm
        FROM hops h JOIN totals t USING (from_type)
        ORDER BY from_type, to_type""")),

    // Funnel conversion latency: for users who complete the strict
    // view → click → purchase ordering, first-view-to-first-purchase
    // time per first-seen-week cohort. Same conditional-min hash-agg as
    // q_funnel_stages; latencies are epoch-µs integers and the mean is
    // the FLOOR-DIVIDED integer sum/count — a davg here would push the
    // DECIMAL(30,6) sum's internal integer past 2^53 (µs latencies are
    // ~6e11 each), where DuckDB's two-step decimal→double cast rounds
    // differently than Spark's BigDecimal.doubleValue (1-ulp flip seen
    // at sf0.01). Integer division has no such edge.
    QDef("q_funnel_latency",
      (s, d) => {
        val m = events(s, d).groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        m.filter(col("tv").isNotNull && col("tc").isNotNull &&
            col("tp").isNotNull && col("tc") > col("tv") &&
            col("tp") > col("tc"))
          .select(
            floor(datediff(to_date(col("tv")), lit("2024-01-01").cast("date")) / 7)
              .as("cohort_wk"),
            (unix_micros(col("tp")) - unix_micros(col("tv"))).as("lat_us"))
          .groupBy(col("cohort_wk"))
          .agg(count(lit(1)).as("n_conv"),
            min(col("lat_us")).as("min_us"), max(col("lat_us")).as("max_us"),
            sum(col("lat_us")).as("sum_us"))
          .select(col("cohort_wk"), col("n_conv"), col("min_us"),
            col("max_us"), expr("sum_us div n_conv").as("avg_us_floor"))
          .orderBy(col("cohort_wk"))
      },
      Some(s"""WITH m AS (SELECT user_id,
            min(ts) FILTER (WHERE event_type = 'view') AS tv,
            min(ts) FILTER (WHERE event_type = 'click') AS tc,
            min(ts) FILTER (WHERE event_type = 'purchase') AS tp
          FROM events GROUP BY user_id),
        conv AS (SELECT
            CAST(floor(date_diff('day', DATE '2024-01-01',
              CAST(tv AS DATE)) / 7.0) AS BIGINT) AS cohort_wk,
            epoch_us(tp) - epoch_us(tv) AS lat_us
          FROM m WHERE tv IS NOT NULL AND tc IS NOT NULL
            AND tp IS NOT NULL AND tc > tv AND tp > tc)
        SELECT cohort_wk, count(*) AS n_conv,
          min(lat_us) AS min_us, max(lat_us) AS max_us,
          CAST(sum(lat_us) // count(*) AS BIGINT) AS avg_us_floor
        FROM conv GROUP BY cohort_wk ORDER BY cohort_wk""")),

    // Time-series gap filling: per-user daily activity with MISSING DAYS
    // zero-filled — the resample/densify step every downstream
    // time-series model needs. The calendar is generated per user with
    // sequence() over its own [min, max] day span (epoch-day integers),
    // exploded, and left-joined back to the observed counts; at scale
    // both sides hash-partition on (user_id, day) and the explode adds
    // O(span) rows per user, never a global calendar broadcast.
    QDef("q_timeseries_gapfill",
      (s, d) => {
        val daily = events(s, d)
          .select(col("user_id"),
            floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n"))
        val span = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val calendar = span
          .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
        calendar.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH daily AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day, count(*) AS n
          FROM events GROUP BY 1, 2),
        span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
          FROM daily GROUP BY user_id),
        calendar AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day
          FROM span)
        SELECT c.user_id, c.day, COALESCE(d.n, 0) AS n
        FROM calendar c LEFT JOIN daily d
          ON c.user_id = d.user_id AND c.day = d.day
        ORDER BY c.user_id, c.day""")),

    // SCD2 interval build: collapse each user's event stream into
    // type-2 validity intervals of its CURRENT event_type — valid_from =
    // the event's time, valid_to = the next DIFFERENT type's time (NULL
    // while current). Two windows over the per-user ordering (lag to
    // detect changes, lead on the change rows for the close timestamp)
    // — the standard dimension-history builder, all epoch-µs integers.
    QDef("q_scd2_intervals",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val changes = events(s, d)
          .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        changes
          .withColumn("valid_to_us",
            lead(unix_micros(col("ts")), 1).over(byUser))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.cast("long").as("is_current"))
          .orderBy(col("user_id"), col("valid_from_us"))
      },
      Some("""WITH marked AS (SELECT user_id, event_type, ts, event_id,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events),
        changes AS (SELECT * FROM marked
          WHERE prev_type IS NULL OR prev_type <> event_type)
        SELECT user_id, event_type,
          epoch_us(ts) AS valid_from_us,
          lead(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS valid_to_us,
          CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) IS NULL AS BIGINT) AS is_current
        FROM changes ORDER BY user_id, valid_from_us""")),

    // POINT-IN-TIME join — the data-warehouse companion of the SCD2
    // builder: each purchase event looks up the dimension version valid
    // AT its timestamp (valid_from ≤ t < valid_to, open interval while
    // current). The intervals tile each user's timeline (CurationSpec
    // proves no overlap), so every purchase matches exactly one version
    // — the join is an equi-join on user_id with a range residual, the
    // same co-partitioned shape as the as-of join (one user shuffle,
    // range predicate evaluated inside the SMJ). All epoch-µs integers.
    QDef("q_pit_join",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = events(s, d)
        val changes = ev
          .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        val dim = changes
          .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(byUser))
          .select(col("user_id").as("d_user"),
            col("event_type").as("state_type"),
            unix_micros(col("ts")).as("valid_from_us"), col("valid_to_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"))
        purchases.join(dim,
            col("user_id") === col("d_user") &&
              col("valid_from_us") <= col("p_us") &&
              (col("valid_to_us").isNull || col("p_us") < col("valid_to_us")))
          .select(col("p_id"), col("user_id"), col("p_us"),
            col("state_type"), col("valid_from_us"))
          .orderBy(col("p_id"))
      },
      Some("""WITH marked AS (SELECT user_id, event_type, ts, event_id,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events),
        changes AS (SELECT * FROM marked
          WHERE prev_type IS NULL OR prev_type <> event_type),
        dim AS (SELECT user_id AS d_user, event_type AS state_type,
            epoch_us(ts) AS valid_from_us,
            lead(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS valid_to_us
          FROM changes),
        p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase')
        SELECT p_id, p.user_id, p_us, state_type, valid_from_us
        FROM p JOIN dim ON p.user_id = d_user
          AND valid_from_us <= p_us
          AND (valid_to_us IS NULL OR p_us < valid_to_us)
        ORDER BY p_id""")),

    // INTERVAL-OVERLAP aggregate — the temporal-join family's aggregate
    // form: how much of each user's SESSION time was spent in each SCD2
    // STATE? Both interval sets derive from the same per-user window
    // pass (one user_id shuffle feeds the sessionizer and the SCD2
    // builder), intervals are half-open in epoch-µs (sessions
    // [start, end+1), states [vf, vt) with the open current state
    // clipped at the user's last event + 1), and the per-pair overlap
    // max(0, min(vt, s_end+1) − max(vf, s_start)) rolls up per
    // (user, state). All BIGINT (class A).
    QDef("q_interval_overlap",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = events(s, d)
        val sess = ev
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            (col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 3600000000L)
              .cast("long"))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_no"))
          .agg(min(unix_micros(col("ts"))).as("s_start"),
            max(unix_micros(col("ts"))).as("s_end"))
        val userMax = ev.groupBy(col("user_id"))
          .agg(max(unix_micros(col("ts"))).as("u_max"))
        val changes = ev
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        val dim = changes
          .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
          .join(userMax, "user_id")
          .select(col("user_id").as("d_user"),
            col("event_type").as("state_type"),
            unix_micros(col("ts")).as("vf"),
            coalesce(col("valid_to_us"), col("u_max") + 1).as("vt"))
        sess.join(dim,
            col("user_id") === col("d_user") &&
              col("vf") <= col("s_end") && col("s_start") < col("vt"))
          .withColumn("ov", greatest(lit(0L),
            least(col("vt"), col("s_end") + 1)
              - greatest(col("vf"), col("s_start"))))
          .groupBy(col("user_id"), col("state_type"))
          .agg(sum(col("ov")).as("overlap_us"), count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"), col("state_type"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events),
        z AS (SELECT *, CAST(sum(CASE WHEN prev_us IS NULL
              OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
          FROM x),
        sess AS (SELECT user_id, sess_no,
            min(epoch_us(ts)) AS s_start, max(epoch_us(ts)) AS s_end
          FROM z GROUP BY 1, 2),
        umax AS (SELECT user_id, max(epoch_us(ts)) AS u_max
          FROM events GROUP BY 1),
        changes AS (SELECT user_id, event_type, ts, event_id FROM x
          WHERE prev_type IS NULL OR prev_type <> event_type),
        dim AS (SELECT c.user_id AS d_user, event_type AS state_type,
            epoch_us(ts) AS vf,
            coalesce(lead(epoch_us(ts)) OVER (PARTITION BY c.user_id
              ORDER BY ts, event_id), u_max + 1) AS vt
          FROM changes c JOIN umax ON c.user_id = umax.user_id)
        SELECT user_id, state_type,
          CAST(sum(greatest(0, least(vt, s_end + 1)
            - greatest(vf, s_start))) AS BIGINT) AS overlap_us,
          count(*) AS n_pairs
        FROM sess JOIN dim ON user_id = d_user
          AND vf <= s_end AND s_start < vt
        GROUP BY user_id, state_type
        ORDER BY user_id, state_type""")),

    // Stream-static join shape: events (stream side) joined to the static
    // customer dim (broadcast at scale).
    QDef("q_stream_static_join",
      (s, d) => events(s, d)
        .join(broadcast(customer(s, d)), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("c_mktsegment"), col("event_type")),
      Some(s"""SELECT c_mktsegment, event_type, count(*) AS n,
        ${sqlDsum("value")} AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
        ORDER BY c_mktsegment, event_type""")),

    // Stream-stream interval join, batch twin: each purchase joined to the
    // same user's clicks from the preceding hour. This calls the EXACT
    // streaming operator (EventStreams.purchaseAttribution — withWatermark
    // is a no-op on batch frames), so the declared oracle covers the very
    // code path StreamingSpec runs with readStream. At scale this is an
    // equi-join on user_id with the time range as a post-join filter
    // (streaming: watermark + range bounds both sides' buffered state).
    QDef("q_stream_interval_join",
      (s, d) => {
        val ev = events(s, d)
        graft.streaming.EventStreams.purchaseAttribution(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"))
          .select(col("p_id"), col("p_user"),
            unix_micros(col("p_ts")).as("p_ts_us"), col("p_value"),
            unix_micros(col("c_ts")).as("c_ts_us"))
          .orderBy(col("p_id"), col("c_ts_us"))
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS p_user,
        epoch_us(p.ts) AS p_ts_us, p.value AS p_value, epoch_us(c.ts) AS c_ts_us
        FROM events p JOIN events c
          ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        ORDER BY p_id, c_ts_us""")),

    // STATEFUL stream-stream interval join (twin #14, r14 VERDICT
    // directive 3): the same purchase⋈click interval join as
    // q_stream_interval_join, but run through the EXPLICIT two-sided
    // buffered StatefulProcessor (EventStreams.IntervalJoinProcessor)
    // whose per-user ListStates + watermark-driven two-sided eviction
    // are the state-bound CONTRACT the native operator only implies.
    // Batch/gate mode runs the identical single-pass join, so output
    // is exactly the batch interval join — same oracle SQL. The
    // multi-batch MemoryStream proofs (pairs emitted exactly once
    // across batch splits, state rows DROP on watermark passage, no
    // resurrection) live in StreamingSpec.
    QDef("q_interval_join_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.intervalJoin(ev).toDF()
          .select(col("p_id"), col("p_user"), col("p_ts_us"),
            col("p_value"), col("c_ts_us"))
          .orderBy(col("p_id"), col("c_ts_us"))
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS p_user,
        epoch_us(p.ts) AS p_ts_us, p.value AS p_value, epoch_us(c.ts) AS c_ts_us
        FROM events p JOIN events c
          ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        ORDER BY p_id, c_ts_us""")),

    // STREAMING TWIN #15 (r15 VERDICT directive 5): session concurrency
    // as an explicit two-stage StatefulProcessor chain — the per-user gap
    // sessionizer emitting ±1 boundary rows, then the per-day sweep line
    // buffering each day's boundaries (exactly-once under any batch
    // split) and finalizing by watermark timer. Batch/gate mode runs the
    // identical walk in one batch; the cross-day carry is the ≤|days|
    // consumer rollup applied here, so the output is EXACTLY
    // q_session_concurrency — same oracle, hash-compared. StreamingSpec
    // proves multi-batch ≡ single-batch, watermark-driven state eviction
    // with a strict state-store row-count drop, and no resurrection.
    QDef("q_session_concurrency_stream_twin",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        val daily = graft.streaming.EventStreams
          .sessionConcurrencyDaily(ev).toDF()
        val wg = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)
        daily
          .withColumn("carry", coalesce(sum(col("net")).over(wg), lit(0L)))
          .select(col("day"), col("starts"), col("ends"),
            greatest(col("carry"), col("carry") + col("in_peak"))
              .as("peak"))
          .orderBy(col("day"))
      },
      Some(s"""WITH x AS (SELECT user_id, event_id, ts,
            epoch_us(ts) AS us,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR us - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y),
        sess AS (SELECT user_id, sess_no, min(us) AS s_us, max(us) AS e_us
          FROM z GROUP BY user_id, sess_no),
        b AS (SELECT s_us AS us, CAST(1 AS BIGINT) AS delta FROM sess
          UNION ALL
          SELECT e_us, CAST(-1 AS BIGINT) FROM sess),
        c AS (SELECT us // 86400000000 AS day, us, delta,
            CAST(sum(delta) OVER (PARTITION BY us // 86400000000
              ORDER BY us, delta DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS cum
          FROM b),
        daily AS (SELECT day,
            CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT) AS starts,
            CAST(count(*) FILTER (WHERE delta = -1) AS BIGINT) AS ends,
            max(cum) AS in_peak, CAST(sum(delta) AS BIGINT) AS net
          FROM c GROUP BY day),
        o AS (SELECT *, COALESCE(CAST(sum(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
            0) AS carry FROM daily)
        SELECT day, starts, ends,
          greatest(carry, carry + in_peak) AS peak
        FROM o ORDER BY day""")),

    // STREAMING TWIN #16 (r16 wave 3): the STL-lite seasonal split as a
    // chained two-stage StatefulProcessor pipeline — stage 1 finalizes
    // per-day counts by watermark timer (one long of state per open
    // day), stage 2 slides the ±3 centered-MA window over the finalized
    // daily series with a ≤7-day buffer and a forward-only frontier
    // (arrival-driven: a stage-1 row only exists once its day is final,
    // so an absent day ≤ maxSeen is provably the dense grid's zero).
    // Batch/gate mode runs the identical dense-grid walk in one call;
    // the per-dow rollup below is the consumer's ≤|days| aggregation —
    // SAME ORACLE as q_stl_seasonal, hash-compared at 3 SFs. Multi-batch
    // ≡ gate, exactly-once per day, and the sliding-buffer eviction are
    // StreamingSpec's proofs.
    QDef("q_stl_seasonal_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.stlSeasonalDaily(ev).toDF()
          .groupBy(col("dow"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("resid_e2")).as("sum_resid_e2"))
          .select(col("dow"), col("n_days"), col("sum_resid_e2"),
            expr("sum_resid_e2 div n_days").as("seasonal_e2"))
          .orderBy(col("dow"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        grid AS (SELECT unnest(range(d0, d1 + 1)) AS day, d0, d1
          FROM bounds),
        dense AS (SELECT g.day, g.d0, g.d1, COALESCE(daily.n, 0) AS n
          FROM grid g LEFT JOIN daily ON g.day = daily.day),
        ma AS (SELECT day, d0, d1, n,
            sum(n) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7
          FROM dense),
        det AS (SELECT day % 7 AS dow,
            n * 100 - s7 * 100 // 7 AS resid_e2
          FROM ma WHERE day >= d0 + 3 AND day <= d1 - 3)
        SELECT dow, count(*) AS n_days,
          CAST(sum(resid_e2) AS BIGINT) AS sum_resid_e2,
          CAST(sum(resid_e2) AS BIGINT) // count(*) AS seasonal_e2
        FROM det GROUP BY dow ORDER BY dow""")),

    // LEFT OUTER stream-stream interval join, batch twin: purchases with
    // no preceding click survive null-padded. Same exact-operator pattern
    // as q_stream_interval_join (withWatermark is a no-op on batch);
    // streaming-side the null row is watermark-deferred until a match is
    // impossible — StreamingSpec drives that path with MemoryStreams.
    // NULLS FIRST pins the engines' opposite null-ordering defaults.
    QDef("q_stream_interval_join_outer",
      (s, d) => {
        val ev = events(s, d)
        graft.streaming.EventStreams.purchaseAttributionOuter(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"))
          .select(col("p_id"), col("p_user"),
            unix_micros(col("p_ts")).as("p_ts_us"), col("p_value"),
            unix_micros(col("c_ts")).as("c_ts_us"))
          .orderBy(col("p_id"), col("c_ts_us").asc_nulls_first)
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS p_user,
        epoch_us(p.ts) AS p_ts_us, p.value AS p_value, epoch_us(c.ts) AS c_ts_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        ORDER BY p_id, c_ts_us NULLS FIRST""")),

    // Stream-stream interval join, FULL outer twin: unmatched purchases
    // AND unmatched clicks both survive (the click side carries its
    // event id so the null-purchase rows still have a total order). The
    // streaming form is purchaseAttributionFull (watermarks bound state
    // symmetrically); the batch twin here is what the oracle checks.
    QDef("q_stream_interval_join_full",
      (s, d) => {
        val ev = events(s, d)
        graft.streaming.EventStreams.purchaseAttributionFull(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "click"))
          .select(col("p_id"), col("p_user"),
            unix_micros(col("p_ts")).as("p_ts_us"), col("p_value"),
            col("c_id"), unix_micros(col("c_ts")).as("c_ts_us"))
          .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS p_user,
        epoch_us(p.ts) AS p_ts_us, p.value AS p_value,
        c.event_id AS c_id, epoch_us(c.ts) AS c_ts_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        ORDER BY p_id NULLS FIRST, c_id NULLS FIRST""")),

    // Last-observation-carried-forward imputation (LOCF): per user, the
    // running "last purchase value seen so far" fills every event row —
    // the time-series imputation step of a feature pipeline, and the
    // IGNORE NULLS window semantic (last(_, ignoreNulls) over an
    // unbounded-preceding frame). Values pass through unchanged (no
    // arithmetic — per-row identical doubles in both engines); the
    // frame sorts inside each user partition only.
    QDef("q_locf_impute",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("ts"),
            when(col("event_type") === "purchase", col("value")).as("v"))
          .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("v_filled"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          last_value(CASE WHEN event_type = 'purchase' THEN value END
            IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        FROM events
        ORDER BY user_id, ts_us, event_id""")),

    // Sequence-pattern mining (MATCH_RECOGNIZE-lite): each user's event
    // history collapses to an initials string in (ts, event_id) total
    // order, and journey patterns are counted by regex — 'v[ce]*p' =
    // "view, then only clicks/errors, then purchase". Both engines run
    // greedy non-overlapping left-to-right matching on the identical
    // string (the regex subset avoids engine-specific syntax), so the
    // counts are exact. One groupBy; the per-user string is bounded by
    // per-user history length.
    QDef("q_event_pattern_regex",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            substring(col("event_type"), 1, 1).as("i")).as("st"))
        ev.groupBy(col("user_id"))
          .agg(array_join(transform(array_sort(collect_list(col("st"))),
            x => x.getField("i")), "").as("seq"))
          .select(col("user_id"), length(col("seq")).as("n_events"),
            expr("regexp_count(seq, 'v[ce]*p')").as("n_journeys"),
            expr("regexp_count(seq, 'vp')").as("n_direct"))
          .orderBy(col("user_id"))
      },
      Some("""WITH seqs AS (SELECT user_id,
            string_agg(substr(event_type, 1, 1), ''
              ORDER BY epoch_us(ts), event_id) AS seq
          FROM events GROUP BY 1)
        SELECT user_id, length(seq) AS n_events,
          len(regexp_extract_all(seq, 'v[ce]*p')) AS n_journeys,
          len(regexp_extract_all(seq, 'vp')) AS n_direct
        FROM seqs ORDER BY user_id""")),

    // Parameterized sequence-pattern SETS — the generalization of
    // q_event_pattern_regex from two hard-wired journeys to a declared
    // pattern table: the per-user initials string is built ONCE (same
    // (ts, event_id) total order) and every pattern counts over it in the
    // same pass — adding a pattern is a config row, not a new query. The
    // regex subset (literals, classes, greedy quantifiers; no anchors or
    // backrefs) behaves identically under Java regex and RE2, so counts
    // are exact in both engines.
    QDef("q_event_pattern_sets", {
      val patterns = Seq( // (column, regex) — the declared pattern set
        "n_journeys" -> "v[ce]*p", // view → only clicks/errors → purchase
        "n_direct" -> "vp", // view immediately converting
        "n_repeat_buy" -> "p[vce]*p", // repeat purchase, no view between
        "n_err_streak" -> "ee+", // 2+ consecutive errors
        "n_click_burst" -> "ccc+") // 3+ consecutive clicks
      val fn: Q.Fn = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
            substring(col("event_type"), 1, 1).as("i")).as("st"))
        val seqs = ev.groupBy(col("user_id"))
          .agg(array_join(transform(array_sort(collect_list(col("st"))),
            x => x.getField("i")), "").as("seq"))
        patterns.foldLeft(
            seqs.select(col("user_id"), length(col("seq")).as("n_events"),
              col("seq"))) { case (df, (name, re)) =>
            df.withColumn(name, expr(s"regexp_count(seq, '$re')"))
          }
          .drop("seq")
          .orderBy(col("user_id"))
      }
      fn
    }, {
      val patterns = Seq(
        "n_journeys" -> "v[ce]*p", "n_direct" -> "vp",
        "n_repeat_buy" -> "p[vce]*p", "n_err_streak" -> "ee+",
        "n_click_burst" -> "ccc+")
      val cols = patterns.map { case (name, re) =>
        s"len(regexp_extract_all(seq, '$re')) AS $name" }.mkString(",\n          ")
      Some(s"""WITH seqs AS (SELECT user_id,
            string_agg(substr(event_type, 1, 1), ''
              ORDER BY epoch_us(ts), event_id) AS seq
          FROM events GROUP BY 1)
        SELECT user_id, length(seq) AS n_events,
          $cols
        FROM seqs ORDER BY user_id""")
    }),

    // Time-decay attribution with EXACT integer weights: each click in
    // the 24 h before a purchase earns 1e6 >> Δhours credit (halving
    // per hour — the decay factor is a power of two, so the weights are
    // pure integer division, no float decay anywhere). The interval
    // join reuses the purchase-click machinery; per-Δh rollup makes the
    // distribution auditable.
    QDef("q_attribution_time_decay",
      (s, d) => {
        val ev = events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), unix_micros(col("ts")).as("pt"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), unix_micros(col("ts")).as("ct"))
        p.join(c, col("pu") === col("cu")
            && col("ct") < col("pt")
            && col("ct") >= col("pt") - lit(86400000000L))
          .withColumn("dh", expr("(pt - ct) div 3600000000"))
          .withColumn("credit",
            expr("1000000 div shiftleft(CAST(1 AS BIGINT), CAST(dh AS INT))"))
          .groupBy(col("dh"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("credit")).as("credit_sum"))
          .orderBy(col("dh"))
      },
      Some("""SELECT dh, count(*) AS n_pairs,
          CAST(sum(credit) AS BIGINT) AS credit_sum
        FROM (SELECT
            (epoch_us(p.ts) - epoch_us(c.ts)) // 3600000000 AS dh,
            1000000 // (CAST(1 AS BIGINT) <<
              ((epoch_us(p.ts) - epoch_us(c.ts)) // 3600000000)) AS credit
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'click') c
            ON p.user_id = c.user_id
            AND epoch_us(c.ts) < epoch_us(p.ts)
            AND epoch_us(c.ts) >= epoch_us(p.ts) - 86400000000)
        GROUP BY 1 ORDER BY dh""")),

    // Integer-exact exponential smoothing (EWMA, half-life = 1 event):
    // y_n = Σ_{k=0..29} v_{n−k} >> k in micro-units — the α=1/2
    // geometric filter as pure BIGINT shifts (a 30-tap truncation: tap
    // 30+ of a <3.3e8-micro value is already 0, so the cutoff loses
    // nothing). The declarative form is 30 lag() taps over the per-user
    // (ts, event_id) order — no recurrence, no float decay, identical
    // in both engines. The 100 TB profile is one window shuffle on
    // user_id.
    QDef("q_ewma_halflife", {
      val taps = 30
      val fn: Q.Fn = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val base = events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            unix_micros(col("ts")).as("ts_us"),
            round(col("value") * lit(1000000), 0).cast("long").as("v"))
        val ewma = (0 until taps).map(k =>
            coalesce(expr(s"shiftright(lag(v, $k) OVER (PARTITION BY " +
              s"user_id ORDER BY ts, event_id), $k)"), lit(0L)))
          .reduce(_ + _)
        base
          .withColumn("ewma_micro", ewma)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("ewma_micro"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      }
      fn
    }, {
      val taps = 30
      val sum = (0 until taps).map(k =>
        s"coalesce(lag(v, $k) OVER w >> $k, 0)").mkString(" + ")
      Some(s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          $sum AS ewma_micro
        FROM (SELECT event_id, user_id, ts,
            CAST(round(value * 1000000, 0) AS BIGINT) AS v FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts_us, event_id""")
    }),

    // EWMA with a NON-power-of-two decay (α = 0.3, decay 0.7) — the
    // class-C twin of q_ewma_halflife: shifts can't express 0.7^k, so
    // each engine computes its own pow(0.7, k) and PRE-ROUNDS it onto
    // the 1e-4 integer grid (CAST(round(pow·10⁴, 0) AS BIGINT)) BEFORE
    // any arithmetic touches data — after that the whole filter is
    // BIGINT (weight · micro-value, ≤3.3e12/tap · 28 taps ≪ 2^63).
    // Class-C flip argument, constant-side: the 28 weights are fixed
    // constants 7^k·10^(4−k) whose decimal digits never end in 5, so no
    // true value sits at a rounding midpoint (EventWindowsSpec asserts
    // every tap clears the midpoint by ≥1e-3); libm disagreement
    // (≤ ulps) cannot cross a gap that wide. Taps stop at 28 where the
    // rounded weight hits 0. Same single per-user window shuffle as the
    // half-life form.
    QDef("q_ewma_decay", {
      val taps = 28
      val fn: Q.Fn = (s, d) => {
        val base = events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            unix_micros(col("ts")).as("ts_us"),
            round(col("value") * lit(1000000), 0).cast("long").as("v"))
        val ewma = (0 until taps).map(k =>
            coalesce(expr(s"lag(v, $k) OVER (PARTITION BY user_id " +
              s"ORDER BY ts, event_id)"), lit(0L)) *
              expr(s"CAST(round(pow(0.7, $k) * 10000, 0) AS BIGINT)"))
          .reduce(_ + _)
        base
          .withColumn("ewma_e10", ewma)
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("ewma_e10"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      }
      fn
    }, {
      val taps = 28
      val sum = (0 until taps).map(k =>
        s"coalesce(lag(v, $k) OVER w, 0) * " +
          s"CAST(round(pow(0.7, $k) * 10000, 0) AS BIGINT)")
        .mkString(" + ")
      Some(s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          $sum AS ewma_e10
        FROM (SELECT event_id, user_id, ts,
            CAST(round(value * 1000000, 0) AS BIGINT) AS v FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts_us, event_id""")
    }),

    // CUSUM change-point detection per user — the classic drift monitor
    // over a metric stream, exactly integer: micro-unit values, per-user
    // truncated integer mean μ = Σv div n (both Spark `div` and DuckDB
    // `//` truncate toward zero, so the engines agree even for a
    // hypothetical negative Σv), prefix sums S_k of (v−μ) under the
    // (ts, event_id) total order, and CUSUM⁺_k = S_k − min_{j≤k} S_j
    // (the running-min formulation — max-subarray deviation without any
    // recurrence, so it is two window passes, not an iterative fold).
    // Output: each user's peak deviation and the earliest timestamp
    // attaining it. All BIGINT (class A); one user_id shuffle shared by
    // the mean join and both windows.
    QDef("q_cusum_changepoint",
      (s, d) => {
        val base = events(s, d).select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value") * lit(1000000), 0).cast("long").as("v"))
        val mu = base.groupBy(col("user_id"))
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
          .select(col("user_id"), expr("sv div n").as("mu"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val c = base.join(mu, "user_id")
          .withColumn("s", sum(col("v") - col("mu")).over(w))
          .withColumn("cusum", col("s") - min(col("s")).over(w))
        val agg = c.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), max(col("cusum")).as("max_cusum"))
        val peak = c.join(agg.select(col("user_id"), col("max_cusum")),
            Seq("user_id"))
          .filter(col("cusum") === col("max_cusum"))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("peak_us"))
        agg.join(peak, "user_id")
          .select(col("user_id"), col("n_events"), col("max_cusum"),
            col("peak_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH base AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
            CAST(round(value * 1000000, 0) AS BIGINT) AS v FROM events),
        mu AS (SELECT user_id, sum(v) // count(*) AS mu FROM base GROUP BY 1),
        s AS (SELECT user_id, ts_us, event_id,
            sum(v - mu) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS s
          FROM base JOIN mu USING (user_id)),
        c AS (SELECT user_id, ts_us,
            s - min(s) OVER (PARTITION BY user_id
              ORDER BY ts_us, event_id) AS cusum
          FROM s),
        a AS (SELECT user_id, count(*) AS n_events,
            max(cusum) AS max_cusum FROM c GROUP BY 1)
        SELECT a.user_id, a.n_events,
          CAST(a.max_cusum AS BIGINT) AS max_cusum,
          CAST(min(c.ts_us) AS BIGINT) AS peak_us
        FROM a JOIN c ON a.user_id = c.user_id AND c.cusum = a.max_cusum
        GROUP BY a.user_id, a.n_events, a.max_cusum
        ORDER BY a.user_id""")),

    // Time-RANGE window frame: each event's trailing-1-hour per-user
    // activity (sum + count over RANGE 3,600,000,000 µs PRECEDING on
    // the epoch-µs ordering) — the per-ROW sliding time window, as
    // opposed to q_sliding_12h's fixed grid. Exact decimal sum; the
    // range frame orders once per user partition.
    QDef("q_window_time_range",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sv_1h", sum(col("value")
            .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
            .over(w).cast("double"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("n_1h"), col("sv_1h"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some(s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          count(*) OVER w AS n_1h,
          CAST(sum(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS sv_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, event_id""")),

    // Session bounce rate: the share of 1-hour-gap sessions that end
    // after a single event, per first-event type — the engagement KPI
    // on top of the q_sessionize_lag machinery. Bounce share in exact
    // ppm; min_by gives the session's entry event type (ties broken by
    // the (ts_us, event_id) struct order, identical in both engines).
    QDef("q_session_bounce",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            (col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 3600000000L)
              .cast("long"))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_no"))
          .agg(count(lit(1)).as("n"),
            // composite (ts, event_id) tiebreak as a zero-padded string
            // key — fixed width makes lexicographic == numeric, and
            // DuckDB's min_by takes only scalar keys
            min_by(col("event_type"),
              concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
                lpad(col("event_id").cast("string"), 12, "0")))
              .as("entry_type"))
        sess.groupBy(col("entry_type"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_bounced"))
          .withColumn("bounce_ppm",
            expr("n_bounced * 1000000 div n_sessions"))
          .orderBy(col("entry_type"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y),
        sess AS (SELECT user_id, sess_no, count(*) AS n,
            min_by(event_type,
              lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
              lpad(CAST(event_id AS VARCHAR), 12, '0')) AS entry_type
          FROM z GROUP BY 1, 2)
        SELECT entry_type, count(*) AS n_sessions,
          CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_bounced,
          CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS bounce_ppm
        FROM sess GROUP BY 1 ORDER BY entry_type""")),

    // SEASONAL DECOMPOSITION of the daily event volume — the classic
    // trend / weekday-seasonal / remainder additive split, kept entirely
    // in integers (class A, strongest) by working in 7× units: trend×7 is
    // the centered 7-observed-day window SUM (no division), detrend7 =
    // 7·cnt − sum7, the per-weekday seasonal index is the truncated
    // integer mean of detrend7 (both engines truncate toward zero, incl.
    // negatives — the CUSUM precedent), and the remainder closes the
    // identity resid7 = detrend7 − seas7 exactly. Day index and weekday
    // are pure epoch-day arithmetic from the 2024-01-01 anchor (a
    // Monday; dow 0 = Monday via the sign-safe ((x%7)+7)%7 ≡ pmod).
    // Scale: the daily rollup is one map-side-combinable hash-agg; every
    // window after it runs on the bounded ~1-year daily frame (replication
    // adds users, not days), so the global orderBy is over ≤366 rows.
    QDef("q_seasonal_decompose",
      (s, d) => {
        val daily = events(s, d)
          .select(datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
        val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
        val trended = daily
          .withColumn("nw", count(lit(1)).over(w7))
          .withColumn("sum7", sum(col("cnt")).over(w7))
          .filter(col("nw") === 7).drop("nw")
          .withColumn("detrend7", col("cnt") * 7 - col("sum7"))
          .withColumn("dow", pmod(col("day"), lit(7)).cast("long"))
          .localCheckpoint(true) // bounded daily frame; feeds seas + join
        val seas = trended.groupBy(col("dow"))
          .agg(sum(col("detrend7")).as("snum"), count(lit(1)).as("scnt"))
          .select(col("dow"), expr("snum div scnt").as("seas7"))
        trended.join(broadcast(seas), Seq("dow"))
          .select(col("day"), col("dow"), col("cnt"), col("sum7"),
            col("detrend7"), col("seas7"),
            (col("detrend7") - col("seas7")).as("resid7"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (
          SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS day, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
        tr AS (SELECT day, cnt, count(*) OVER w AS nw,
            CAST(sum(cnt) OVER w AS BIGINT) AS sum7
          FROM daily WINDOW w AS (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        det AS (SELECT day, ((day % 7) + 7) % 7 AS dow, cnt, sum7,
            cnt * 7 - sum7 AS detrend7
          FROM tr WHERE nw = 7),
        seas AS (SELECT dow,
            CAST(CAST(sum(detrend7) AS BIGINT) // count(*) AS BIGINT)
              AS seas7
          FROM det GROUP BY dow)
        SELECT day, d.dow, cnt, sum7, detrend7, seas7,
          detrend7 - seas7 AS resid7
        FROM det d JOIN seas s ON d.dow = s.dow
        ORDER BY day""")),

    // TOP USER JOURNEYS — frequent-path mining over the sessionizer:
    // each 1h-gap session collapses to its ordered event-type initial
    // string (the q_event_pattern_sets encoding on q_sessionize_lag's
    // machinery), then one hash-agg counts sessions and distinct users
    // per path; top-15 by frequency. The per-session sort is bounded by
    // session length (collect + array_sort inside the session group,
    // never a corpus sort); the (ts, event_id) struct order is the
    // established cross-engine total order. The product-analytics
    // "what do users actually do" rollup beside funnel/retention/Markov
    // (those fix the pattern; this DISCOVERS the patterns).
    QDef("q_session_paths",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            (col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 3600000000L)
              .cast("long"))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_no"))
          .agg(expr("""array_join(transform(
              array_sort(collect_list(struct(unix_micros(ts) AS us,
                event_id AS eid, substring(event_type, 1, 1) AS ini))),
              x -> x.ini), '')""").as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(15)
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y),
        paths AS (SELECT user_id, sess_no,
            string_agg(substr(event_type, 1, 1), ''
              ORDER BY ts, event_id) AS path
          FROM z GROUP BY user_id, sess_no)
        SELECT path, count(*) AS n_sessions,
          CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 15""")),

    // The STREAMING session-path miner on the driver gate (the 5th
    // stateful twin, q_funnel_stream_twin pattern): EventStreams
    // .sessionPaths runs its ListState StatefulProcessor in batch
    // execution — each user's full history arrives in one
    // handleInputRows call, so the re-derived session decomposition IS
    // the batch sessionizer's — then the identical path rollup + top-15.
    // Must hash-match q_session_paths' oracle exactly every round;
    // StreamingSpec proves the multi-batch incremental path on
    // MemoryStreams.
    QDef("q_session_paths_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.sessionPaths(ev).toDF()
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(15)
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_us
          FROM events),
        y AS (SELECT *, CASE WHEN prev_us IS NULL
              OR epoch_us(ts) - prev_us > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM x),
        z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sess_no
          FROM y),
        paths AS (SELECT user_id, sess_no,
            string_agg(substr(event_type, 1, 1), ''
              ORDER BY ts, event_id) AS path
          FROM z GROUP BY user_id, sess_no)
        SELECT path, count(*) AS n_sessions,
          CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 15""")),

    // WELCH T-STATISTIC matrix — the unequal-variance mean-difference
    // test for every event-type pair over `value` (the A/B experiment
    // readout beside the chi²/KS/KL distribution battery: those test
    // SHAPE, this tests MEANS with a variance model). Per-group moments
    // (n, Σv, Σv²) are ONE map-side-combinable hash-agg with the sums
    // decimal-exact (each v and v·v rounds identically to the
    // DECIMAL(30,6) grid in both engines); the 10-pair matrix is a
    // broadcast self-cross of the 5-row moment frame. t² is then a
    // fixed IEEE op chain over identical exact inputs, rounded once to
    // 1e-6 (the q_pmi class-C argument); the formula is written with
    // IDENTICAL parenthesization in both engines.
    QDef("q_welch_ttest",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val m = events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(Dec)).as("sv"),
            sum((col("value") * col("value")).cast(Dec)).as("svv"))
          .localCheckpoint(true) // both sides of the pair cross
        val a = m.select(col("event_type").as("type_a"), col("n").as("n_a"),
          col("sv").as("sv_a"), col("svv").as("svv_a"))
        val b = m.select(col("event_type").as("type_b"), col("n").as("n_b"),
          col("sv").as("sv_b"), col("svv").as("svv_b"))
        a.join(broadcast(b), col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
            expr("""round(CAST(sv_a AS DOUBLE) / n_a
              - CAST(sv_b AS DOUBLE) / n_b, 6)""").as("mean_diff"),
            expr("""round(
              (CAST(sv_a AS DOUBLE) / n_a - CAST(sv_b AS DOUBLE) / n_b)
              * (CAST(sv_a AS DOUBLE) / n_a - CAST(sv_b AS DOUBLE) / n_b)
              / ((CAST(svv_a AS DOUBLE)
                  - CAST(sv_a AS DOUBLE) * CAST(sv_a AS DOUBLE) / n_a)
                 / (n_a - 1) / n_a
               + (CAST(svv_b AS DOUBLE)
                  - CAST(sv_b AS DOUBLE) * CAST(sv_b AS DOUBLE) / n_b)
                 / (n_b - 1) / n_b), 6)""").as("t2"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(value AS DECIMAL(30,6))) AS sv,
            sum(CAST(value * value AS DECIMAL(30,6))) AS svv
          FROM events GROUP BY event_type)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
          a.n AS n_a, b.n AS n_b,
          round(CAST(a.sv AS DOUBLE) / a.n
            - CAST(b.sv AS DOUBLE) / b.n, 6) AS mean_diff,
          round(
            (CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n)
            * (CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n)
            / ((CAST(a.svv AS DOUBLE)
                - CAST(a.sv AS DOUBLE) * CAST(a.sv AS DOUBLE) / a.n)
               / (a.n - 1) / a.n
             + (CAST(b.svv AS DOUBLE)
                - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE) / b.n)
               / (b.n - 1) / b.n), 6) AS t2
        FROM m a JOIN m b ON a.event_type < b.event_type
        ORDER BY type_a, type_b""")),

    // ONE-WAY ANOVA F — completes the inference battery (chi² tests
    // independence, KS/KL shape, Welch a PAIR of means; F tests ALL
    // group means at once): F = (SSB/(k−1)) / (SSW/(N−k)) over `value`
    // by event_type. Same moment machinery as q_welch_ttest — one
    // map-side-combinable (n, Σv, Σv²) decimal-exact agg, the grand
    // moments from re-summing the 5-row group frame (decimal sums
    // re-aggregate exactly), then a fixed IEEE chain over identical
    // exact inputs with identical parenthesization, rounded once.
    QDef("q_anova_f",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val m = events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(Dec)).as("sv"),
            sum((col("value") * col("value")).cast(Dec)).as("svv"))
        m.agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
            sum(expr("""CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n""")
              .cast(Dec)).as("sbn"),
            sum(col("sv")).as("sv_all"), sum(col("svv")).as("svv_all"))
          .select(col("k"), col("n_total"),
            expr("""round(CAST(sbn AS DOUBLE)
              - CAST(sv_all AS DOUBLE) * CAST(sv_all AS DOUBLE) / n_total,
              6)""").as("ssb"),
            expr("round(CAST(svv_all AS DOUBLE) - CAST(sbn AS DOUBLE), 6)")
              .as("ssw"),
            expr("""round(
              ((CAST(sbn AS DOUBLE)
                - CAST(sv_all AS DOUBLE) * CAST(sv_all AS DOUBLE) / n_total)
               / (k - 1))
              / ((CAST(svv_all AS DOUBLE) - CAST(sbn AS DOUBLE))
               / (n_total - k)), 6)""").as("f_stat"))
      },
      Some("""WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(value AS DECIMAL(30,6))) AS sv,
            sum(CAST(value * value AS DECIMAL(30,6))) AS svv
          FROM events GROUP BY event_type)
        SELECT CAST(count(*) AS BIGINT) AS k,
          CAST(sum(n) AS BIGINT) AS n_total,
          round(CAST(sum(CAST(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n
              AS DECIMAL(30,6))) AS DOUBLE)
            - CAST(sum(sv) AS DOUBLE) * CAST(sum(sv) AS DOUBLE) / sum(n),
            6) AS ssb,
          round(CAST(sum(svv) AS DOUBLE)
            - CAST(sum(CAST(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n
              AS DECIMAL(30,6))) AS DOUBLE), 6) AS ssw,
          round(
            ((CAST(sum(CAST(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n
                AS DECIMAL(30,6))) AS DOUBLE)
              - CAST(sum(sv) AS DOUBLE) * CAST(sum(sv) AS DOUBLE) / sum(n))
             / (count(*) - 1))
            / ((CAST(sum(svv) AS DOUBLE)
              - CAST(sum(CAST(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n
                AS DECIMAL(30,6))) AS DOUBLE))
             / (sum(n) - count(*))), 6) AS f_stat
        FROM m""")),

    // MANN–WHITNEY U — the rank-sum (distribution-free) counterpart of
    // q_welch_ttest for the click-vs-purchase `value` contrast: no
    // normality assumption, exact tie handling via average ranks. With
    // ties split ½-½, U_A = Σ_v cntA(v)·cntBbelow(v) + ½cntA(v)·cntB(v);
    // clearing ×2 keeps u2_a integral and u2_a + u2_b = 2·n1·n2 is the
    // spec-asserted conservation identity. The rank prefix is TWO-LEVEL
    // over the exact-double value histogram — level 1 cumulates across
    // the bounded floor(value) bucket frame, level 2 windows WITHIN each
    // bucket — so no window ever orders more than one bucket's distinct
    // values (the scalable shape of global ranking; a single global
    // window would serialize the corpus through one partition at
    // 100 TB). Common-language effect size = u2_a/(2n1n2), one IEEE
    // divide over exact integers (class A + exact-div).
    QDef("q_mannwhitney_u",
      (s, d) => {
        val hist = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("value").as("v"),
            (col("event_type") === "click").cast("long").as("isa"))
          .groupBy(col("v"))
          .agg(sum(col("isa")).as("ca"),
            (count(lit(1)) - sum(col("isa"))).as("cb"))
          .withColumn("bkt", floor(col("v")).cast("long"))
          .localCheckpoint(true) // bucket totals + in-bucket windows
        val wB = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bktCum = hist.groupBy(col("bkt")).agg(sum(col("cb")).as("bb"))
          .withColumn("cum_bb", coalesce(sum(col("bb")).over(wB), lit(0L)))
          .select(col("bkt"), col("cum_bb"))
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        hist
          .withColumn("in_bb", coalesce(sum(col("cb")).over(wIn), lit(0L)))
          .join(broadcast(bktCum), Seq("bkt"))
          .agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
            sum(col("ca") * ((col("cum_bb") + col("in_bb")) * 2 + col("cb")))
              .as("u2_a"))
          .select(col("n1"), col("n2"), col("u2_a"),
            (col("n1") * col("n2") * 2 - col("u2_a")).as("u2_b"),
            round(col("u2_a").cast("double") /
              (col("n1") * col("n2") * 2), 6).as("cles"))
      },
      Some("""WITH hist AS (SELECT value AS v,
            CAST(sum(CAST(event_type = 'click' AS BIGINT)) AS BIGINT) AS ca,
            CAST(count(*) - sum(CAST(event_type = 'click' AS BIGINT))
              AS BIGINT) AS cb,
            CAST(floor(value) AS BIGINT) AS bkt
          FROM events WHERE event_type IN ('click', 'purchase')
          GROUP BY value),
        bc AS (SELECT bkt, CAST(COALESCE(sum(bb) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_bb
          FROM (SELECT bkt, CAST(sum(cb) AS BIGINT) AS bb
                FROM hist GROUP BY bkt)),
        r AS (SELECT ca, cb,
            CAST(COALESCE(sum(cb) OVER (PARTITION BY h.bkt ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) + cum_bb AS below
          FROM hist h JOIN bc ON h.bkt = bc.bkt)
        SELECT CAST(sum(ca) AS BIGINT) AS n1,
          CAST(sum(cb) AS BIGINT) AS n2,
          CAST(sum(ca * (below * 2 + cb)) AS BIGINT) AS u2_a,
          CAST(sum(ca) AS BIGINT) * CAST(sum(cb) AS BIGINT) * 2
            - CAST(sum(ca * (below * 2 + cb)) AS BIGINT) AS u2_b,
          round(CAST(CAST(sum(ca * (below * 2 + cb)) AS BIGINT) AS DOUBLE)
            / (CAST(sum(ca) AS BIGINT) * CAST(sum(cb) AS BIGINT) * 2), 6)
            AS cles
        FROM r""")),

    // WILCOXON SIGNED-RANK (r14) — the PAIRED member completing the
    // nonparametric family (Mann–Whitney: independent two-sample;
    // Kruskal–Wallis: k-sample): per user the pair is (Σ click value,
    // Σ view value) in exact e6 micro-units (users with both types
    // present; zero differences dropped — the standard rule), ranks of
    // |d| by the SAME two-level bucketed cumulative + doubled
    // average-rank identity as the siblings, so the signed rank sums
    // ×2 are exact BIGINTs with the conservation s⁺ + s⁻ = n(n+1)
    // built in; the normal-approximation z is ONE sqrt chain over
    // exact integers rounded once to e6. Scale: one (user, type)
    // map-side agg; ranks live on the ≤|users| distinct-|d| frame
    // with bounded-grid windows.
    QDef("q_wilcoxon_signed_rank",
      (s, d) => {
        val pu = events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_type"),
            expr("CAST(round(value * 1000000, 0) AS BIGINT)").as("v"))
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "click", col("v")))
            .as("a"),
            sum(when(col("event_type") === "view", col("v"))).as("b"))
          .filter(col("a").isNotNull && col("b").isNotNull)
          .select(col("user_id"), (col("a") - col("b")).as("dd"))
          .filter(col("dd") =!= 0L)
          .select(col("dd"), abs(col("dd")).as("ad"))
          .localCheckpoint(true) // |d| histogram + the rank join
        val hv = pu.groupBy(col("ad")).agg(count(lit(1)).as("c"))
          .withColumn("bkt", expr("ad div 1000000"))
          .localCheckpoint(true)
        val wB = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bktCum = hv.groupBy(col("bkt")).agg(sum(col("c")).as("bb"))
          .withColumn("cum_bb", coalesce(sum(col("bb")).over(wB), lit(0L)))
          .select(col("bkt"), col("cum_bb"))
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("ad"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val below = hv
          .withColumn("in_bb", coalesce(sum(col("c")).over(wIn), lit(0L)))
          .join(broadcast(bktCum), Seq("bkt"))
          .select(col("ad"), col("c"),
            (col("cum_bb") + col("in_bb")).as("below"))
        pu.join(below, Seq("ad"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("dd") > 0L,
              col("below") * 2 + col("c") + 1).otherwise(0L))
              .as("s_plus2"),
            sum(when(col("dd") < 0L,
              col("below") * 2 + col("c") + 1).otherwise(0L))
              .as("s_minus2"))
          .select(col("n_pairs"), col("s_plus2"), col("s_minus2"),
            expr("CAST(round((s_plus2 - n_pairs * (n_pairs + 1) / 2.0)" +
              " / (2 * sqrt(n_pairs * (n_pairs + 1.0)" +
              " * (2 * n_pairs + 1) / 24.0)) * 1000000, 0) AS BIGINT)")
              .as("z_e6"))
      },
      Some("""WITH pu AS (SELECT user_id,
            CAST(sum(CASE WHEN event_type = 'click' THEN
              CAST(round(value * 1000000, 0) AS BIGINT) END) AS BIGINT)
              AS a,
            CAST(sum(CASE WHEN event_type = 'view' THEN
              CAST(round(value * 1000000, 0) AS BIGINT) END) AS BIGINT)
              AS b
          FROM events WHERE event_type IN ('click', 'view')
          GROUP BY user_id),
        dset AS (SELECT a - b AS dd, abs(a - b) AS ad FROM pu
          WHERE a IS NOT NULL AND b IS NOT NULL AND a - b <> 0),
        hv AS (SELECT ad, CAST(count(*) AS BIGINT) AS c,
            ad // 1000000 AS bkt
          FROM dset GROUP BY ad),
        bc AS (SELECT bkt, CAST(COALESCE(sum(bb) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_bb
          FROM (SELECT bkt, CAST(sum(c) AS BIGINT) AS bb
                FROM hv GROUP BY bkt)),
        below AS (SELECT hv.ad, hv.c,
            CAST(COALESCE(sum(hv.c) OVER (PARTITION BY hv.bkt
              ORDER BY hv.ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) + bc.cum_bb AS below
          FROM hv JOIN bc ON hv.bkt = bc.bkt),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN dd > 0 THEN below * 2 + c + 1
              ELSE 0 END) AS BIGINT) AS s_plus2,
            CAST(sum(CASE WHEN dd < 0 THEN below * 2 + c + 1
              ELSE 0 END) AS BIGINT) AS s_minus2
          FROM dset JOIN below USING (ad))
        SELECT n_pairs, s_plus2, s_minus2,
          CAST(round((s_plus2 - n_pairs * (n_pairs + 1) / 2.0)
            / (2 * sqrt(n_pairs * (n_pairs + 1.0)
            * (2 * n_pairs + 1) / 24.0)) * 1000000, 0) AS BIGINT)
            AS z_e6
        FROM agg""")),

    // DAILY-SERIES AUTOCORRELATION (r14) — the ACF at lags 0..7 of the
    // zero-filled daily event-count series, the memory/seasonality
    // fingerprint beside q_seasonal_decompose (trend/weekday split)
    // and q_cross_correlation (two-series lead/lag): exactly integer —
    // centered products cleared by n ((n·x_t − S)(n·x_{t+k} − S)), the
    // ratio to the lag-0 denominator by one truncating ppm division
    // (negative-safe: both engines truncate toward zero). Scale: one
    // map-side day agg; the dense calendar frame and the 8-lag grid
    // are calendar-bounded at any corpus size.
    QDef("q_acf_daily",
      (s, d) => {
        import s.implicits._
        val daily = events(s, d)
          .select(datediff(col("ts").cast("date"),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        val rng = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val dense = rng
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
          .localCheckpoint(true) // both sides of the lag join + stats
        val st = dense.agg(count(lit(1)).as("n"), sum(col("x")).as("ss"))
        val lags = (0L to 7L).toDF("lag")
        val per = dense.as("a").crossJoin(broadcast(lags))
          .join(dense.as("b"), col("b.day") === col("a.day") + col("lag"))
          .crossJoin(broadcast(st))
          .select(col("lag"),
            ((col("a.x") * col("n") - col("ss"))
              * (col("b.x") * col("n") - col("ss"))).as("prod"))
          .groupBy(col("lag"))
          .agg(sum(col("prod")).as("num"), count(lit(1)).as("n_terms"))
          .localCheckpoint(true) // 8 rows; read twice (den + output)
        val den = per.filter(col("lag") === 0L)
          .select(col("num").as("den"))
        per.crossJoin(broadcast(den))
          .select(col("lag"), col("n_terms"), col("num"), col("den"),
            expr("num * 1000000 div greatest(den, 1)").as("acf_ppm"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (SELECT
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS day,
            CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        dense AS (SELECT g.day, CAST(COALESCE(x, 0) AS BIGINT) AS x
          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
          LEFT JOIN daily USING (day)),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS ss FROM dense),
        lags AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS lag),
        p AS (SELECT lag,
            CAST(sum((a.x * n - ss) * (b.x * n - ss)) AS BIGINT) AS num,
            CAST(count(*) AS BIGINT) AS n_terms
          FROM dense a CROSS JOIN lags
          JOIN dense b ON b.day = a.day + lag
          CROSS JOIN st GROUP BY lag),
        dn AS (SELECT num AS den FROM p WHERE lag = 0)
        SELECT lag, n_terms, num, den,
          num * 1000000 // greatest(den, 1) AS acf_ppm
        FROM p CROSS JOIN dn ORDER BY lag""")),

    // KRUSKAL–WALLIS H (r14) — the k-sample rank test completing the
    // nonparametric battery (Mann–Whitney is its 2-sample special
    // case; ANOVA-F its parametric sibling): do the event types share
    // one value distribution? ENTIRELY integer-exact (class A): ranks
    // use the same two-level bucketed cumulative as q_mannwhitney_u
    // (bucket = floor(v), in-bucket windows partition by bucket — no
    // corpus-wide sort), tied ranks via the doubled average-rank
    // identity 2·r̄(v) = 2·below(v) + c(v) + 1, so the per-type rank
    // sum ×2 (ranksum2) is an exact BIGINT. H = 12/(N(N+1))·ΣR²/n −
    // 3(N+1) lands on the e6 grid by cleared-denominator DECIMAL(38)/
    // HUGEINT arithmetic with ONE truncating division (numerator
    // clamped at 0 — H is nonnegative; per-term truncation of Q can
    // dip ≤ 12·|types| below, and clamping keeps truncate-vs-floor
    // divergence out); the tie-corrected H divides by the exact
    // (N³−N−Σ(t³−t)) factor the same way. Scale: one (v, type)
    // hash-agg + bounded-grid windows + |types|-row frames.
    QDef("q_kruskal_wallis",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"), col("value").as("v"))
        val h = ev.groupBy(col("v"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val hv = ev.groupBy(col("v")).agg(count(lit(1)).as("c"))
          .withColumn("bkt", floor(col("v")).cast("long"))
          .localCheckpoint(true) // bucket totals + in-bucket windows
        val wB = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bktCum = hv.groupBy(col("bkt")).agg(sum(col("c")).as("bb"))
          .withColumn("cum_bb", coalesce(sum(col("bb")).over(wB), lit(0L)))
          .select(col("bkt"), col("cum_bb"))
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val below = hv
          .withColumn("in_bb", coalesce(sum(col("c")).over(wIn), lit(0L)))
          .join(broadcast(bktCum), Seq("bkt"))
          .select(col("v"), col("c"),
            (col("cum_bb") + col("in_bb")).as("below"))
          .localCheckpoint(true) // rank sums + the tie certificate
        val st = h.join(below, Seq("v"))
          .groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n_t"),
            sum(col("cnt") * (col("below") * 2 + col("c") + 1))
              .as("ranksum2"))
        val ties = below.agg(
          sum(expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).as("tt"))
        // the per-type quotient stays UNSCALED (Spark `div` is an
        // IntegralDivide returning BIGINT, so an e6 pre-scale overflows
        // past ~10^5 events/type — caught at the 10x ScaleProof run);
        // scaling by 1e6 AFTER the decimal sum keeps every intermediate
        // in range and costs < 10^-4 ppm of H (per-term truncation is
        // <= 1 unscaled unit x |types|, amplified by 12e6/D). The
        // quotient itself is Long-safe to ~5e18, i.e. ~3e7 events/type
        // at this share mix — the DECIMAL widening is named past that.
        val tot = st.agg(sum(col("n_t")).as("nn"),
          sum(expr("CAST(CAST(ranksum2 AS DECIMAL(38,0)) * ranksum2" +
            " div (4 * n_t) AS DECIMAL(38,0))")).as("q"))
        st.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
          .withColumn("h_ppm",
            expr("CAST(greatest(12 * q * 1000000 - 3000000 * (nn + 1)" +
              " * (CAST(nn AS DECIMAL(38,0)) * (nn + 1)), 0)" +
              " div (CAST(nn AS DECIMAL(38,0)) * (nn + 1)) AS BIGINT)"))
          .select(col("event_type"), col("n_t"), col("ranksum2"),
            col("h_ppm"),
            expr("CAST(CAST(h_ppm AS DECIMAL(38,0))" +
              " * (CAST(nn AS DECIMAL(38,0)) * nn * nn - nn)" +
              " div greatest(CAST(nn AS DECIMAL(38,0)) * nn * nn" +
              " - nn - tt, 1) AS BIGINT)").as("h_tie_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (SELECT event_type, value AS v FROM events),
          h AS (SELECT v, event_type, CAST(count(*) AS BIGINT) AS cnt
            FROM ev GROUP BY 1, 2),
          hv AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
              CAST(floor(v) AS BIGINT) AS bkt
            FROM ev GROUP BY v),
          bc AS (SELECT bkt, CAST(COALESCE(sum(bb) OVER (ORDER BY bkt
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum_bb
            FROM (SELECT bkt, CAST(sum(c) AS BIGINT) AS bb
                  FROM hv GROUP BY bkt)),
          below AS (SELECT hv.v, hv.c,
              CAST(COALESCE(sum(hv.c) OVER (PARTITION BY hv.bkt
                ORDER BY hv.v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + bc.cum_bb AS below
            FROM hv JOIN bc ON hv.bkt = bc.bkt),
          st AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_t,
              CAST(sum(cnt * (below * 2 + c + 1)) AS BIGINT) AS ranksum2
            FROM h JOIN below USING (v) GROUP BY 1),
          ties AS (SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS tt
            FROM below),
          tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS nn,
              sum(CAST(ranksum2 AS HUGEINT) * ranksum2
                // (4 * n_t)) AS q
            FROM st),
          hh AS (SELECT nn,
              CAST(greatest(12 * q * 1000000 - 3000000 * (nn + 1)
                  * (CAST(nn AS HUGEINT) * (nn + 1)), 0)
                // (CAST(nn AS HUGEINT) * (nn + 1)) AS BIGINT) AS h_ppm
            FROM tot)
        SELECT s.event_type, s.n_t, s.ranksum2, hh.h_ppm,
          CAST(CAST(hh.h_ppm AS HUGEINT)
            * (CAST(nn AS HUGEINT) * nn * nn - nn)
            // greatest(CAST(nn AS HUGEINT) * nn * nn - nn - tt, 1)
            AS BIGINT) AS h_tie_ppm
        FROM st s CROSS JOIN hh CROSS JOIN ties
        ORDER BY event_type""")),

    // THEIL–SEN ROBUST TREND — the median-of-pairwise-slopes estimator
    // per event type over the daily count series (the outlier-immune
    // alternative to q_agg_regression's least squares: one wild day
    // shifts OLS, but not the slope median). The pair frame is BOUNDED:
    // slopes are computed on the ~30-row-per-type daily AGGREGATE, never
    // on events (n_days² pairs per type — at any corpus scale the daily
    // frame stays calendar-sized, so the quadratic is a constant).
    // Median = type-1 lower (rank (n+1)÷2 under the total order
    // (slope, d1, d2)) — SELECTION of one already-computed value, no
    // averaging, so the result is a single exact IEEE division
    // (y₂−y₁)/(d₂−d₁) identical in both engines (class A + exact-div).
    // SPLIT-CONFORMAL PREDICTION INTERVAL (Vovk et al.; Lei et al.
    // 2018) — distribution-free 90% intervals for a fitted model, the
    // uncertainty layer the regression battery lacks: OLS value ~ hour
    // fit on the Knuth-hash 80% split (decimal-exact moments, slope/
    // intercept as identical IEEE chains), absolute residuals on the
    // held-out 20%, and the conformal quantile = the
    // ⌈0.9·(n_cal+1)⌉-th smallest residual by TYPE-1 SELECTION over
    // the residual histogram (two-level bucketed rank — the
    // q_mannwhitney_u shape; no corpus sort, no interpolation: the
    // selected value is one already-computed double). Calibration
    // coverage ships as exact ppm and is ≥ 900000 BY CONSTRUCTION of
    // the selection rank (spec-asserted). Scale: one moment agg + one
    // residual map scan + bounded-frame windows. Class B + exact
    // selection.
    QDef("q_conformal_interval",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_id"), hour(col("ts")).cast("long").as("x"),
            col("value").as("y"))
          .withColumn("is_train",
            pmod(col("event_id") * lit(2654435761L),
              lit(4294967296L)) % 100 < 80)
          .localCheckpoint(true) // moment agg + residual scan share it
        val fit = ev.filter(col("is_train"))
          .agg(count(lit(1)).as("n_train"),
            dsum(col("x").cast("double")).as("sx"), dsum(col("y")).as("sy"),
            dsum((col("x") * col("x")).cast("double")).as("sxx"),
            dsum(col("x").cast("double") * col("y")).as("sxy"))
          .withColumn("slope",
            expr("(CAST(n_train AS DOUBLE) * sxy - sx * sy)" +
              " / (CAST(n_train AS DOUBLE) * sxx - sx * sx)"))
          .withColumn("icept", expr("(sy - slope * sx) / n_train"))
          .select(col("n_train"), col("slope"), col("icept"))
        val hist = ev.filter(!col("is_train"))
          .crossJoin(broadcast(fit))
          .select(expr("abs(y - (icept + slope * x))").as("r"))
          .groupBy(col("r")).agg(count(lit(1)).as("cnt"))
          .withColumn("bkt", floor(col("r")).cast("long"))
          .localCheckpoint(true) // bucket totals + in-bucket windows
        val wB = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bktCum = hist.groupBy(col("bkt")).agg(sum(col("cnt")).as("bc"))
          .withColumn("cum_b", coalesce(sum(col("bc")).over(wB), lit(0L)))
          .select(col("bkt"), col("cum_b"))
        val wIn = Window.partitionBy(col("bkt")).orderBy(col("r"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nCal = hist.agg(sum(col("cnt")).as("n_cal"))
          .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
        val sel = hist.withColumn("in_c", sum(col("cnt")).over(wIn))
          .join(broadcast(bktCum), Seq("bkt"))
          .crossJoin(broadcast(nCal))
          .withColumn("cum", col("cum_b") + col("in_c"))
          .filter(col("cum") >= col("k"))
          .orderBy(col("r")).limit(1)
          .select(col("r").as("q90"), col("cum").as("n_le_q"))
        fit.crossJoin(broadcast(nCal)).crossJoin(broadcast(sel))
          .select(col("n_train"), col("n_cal"), col("k"),
            round(col("slope"), 6).as("slope_r6"),
            round(col("icept"), 6).as("icept_r6"),
            round(col("q90"), 6).as("q90_halfwidth"),
            expr("n_le_q * 1000000 div n_cal").as("cal_cov_ppm"))
      },
      Some(s"""WITH ev AS (SELECT event_id,
            CAST(hour(ts) AS BIGINT) AS x, value AS y,
            (event_id * 2654435761) % 4294967296 % 100 < 80 AS is_train
          FROM events),
        fit0 AS (SELECT CAST(count(*) AS BIGINT) AS n_train,
            ${sqlDsum("x")} AS sx, ${sqlDsum("y")} AS sy,
            ${sqlDsum("x * x")} AS sxx, ${sqlDsum("x * y")} AS sxy
          FROM ev WHERE is_train),
        fit1 AS (SELECT n_train,
            (CAST(n_train AS DOUBLE) * sxy - sx * sy)
              / (CAST(n_train AS DOUBLE) * sxx - sx * sx) AS slope,
            sx, sy FROM fit0),
        fit AS (SELECT n_train, slope,
            (sy - slope * sx) / n_train AS icept FROM fit1),
        hist AS (SELECT r, CAST(count(*) AS BIGINT) AS cnt,
            CAST(floor(r) AS BIGINT) AS bkt
          FROM (SELECT abs(y - (icept + slope * x)) AS r
            FROM ev CROSS JOIN fit WHERE NOT is_train)
          GROUP BY r),
        bc AS (SELECT bkt, CAST(COALESCE(sum(bc2) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_b
          FROM (SELECT bkt, CAST(sum(cnt) AS BIGINT) AS bc2
            FROM hist GROUP BY bkt)),
        nc AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_cal,
            CAST((9 * (sum(cnt) + 1) + 9) // 10 AS BIGINT) AS k
          FROM hist),
        sel AS (SELECT r AS q90, cum AS n_le_q FROM (
            SELECT h.r, cum_b + CAST(sum(cnt) OVER (PARTITION BY h.bkt
              ORDER BY h.r ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS BIGINT) AS cum
            FROM hist h JOIN bc ON h.bkt = bc.bkt) CROSS JOIN nc
          WHERE cum >= k ORDER BY r LIMIT 1)
        SELECT n_train, n_cal, k, round(slope, 6) AS slope_r6,
          round(icept, 6) AS icept_r6, round(q90, 6) AS q90_halfwidth,
          CAST(n_le_q * 1000000 // n_cal AS BIGINT) AS cal_cov_ppm
        FROM fit CROSS JOIN nc CROSS JOIN sel""")),

    // KAPLAN–MEIER SURVIVAL — the time-to-event operator the
    // funnel/retention battery lacks (product-limit estimator, Kaplan
    // & Meier 1958): subject = user, origin = first event, event =
    // first purchase, administrative censoring at the corpus's last
    // timestamp. Each user contributes ONE (t_days, event?) row from a
    // single map-side-combinable per-user agg; the KM table then lives
    // on the STUDY-LENGTH-bounded day frame (risk set by prefix
    // subtraction, at-risk includes same-day censorings — the standard
    // convention). The survival product is carried in log domain as an
    // exact cumulative BIGINT of per-step round(ln((n−d)/n)·10⁶) terms
    // (d = 0 steps contribute exactly 0), with a cumulative dead flag
    // handling the d = n boundary (S → 0; ln undefined) explicitly
    // instead of NaN-ing — surv_ppm is the single exp at the end (the
    // class-C one-transcendental chain, identical text both engines).
    // Scale: per-user agg + calendar-bounded windows, the
    // q_retention_cohorts profile. JVM product-limit replay in-spec.
    QDef("q_survival_km",
      (s, d) => {
        val ev = events(s, d)
        val gmax = ev.agg(max(col("ts")).as("gm"))
        val users = ev.groupBy(col("user_id"))
          .agg(min(col("ts")).as("fe"),
            min(when(col("event_type") === "purchase", col("ts")))
              .as("fp"))
          .crossJoin(broadcast(gmax))
          .select(
            when(col("fp").isNotNull,
              datediff(to_date(col("fp")), to_date(col("fe"))))
              .otherwise(datediff(to_date(col("gm")), to_date(col("fe"))))
              .cast("long").as("t"),
            col("fp").isNotNull.cast("long").as("ev"))
        kmTable(users)
      },
      Some(survivalKmSql)),

    // The STREAMING Kaplan–Meier twin (the 7th stateful twin,
    // q_burst_stream_twin pattern): EventStreams.survivalFirsts runs a
    // per-user ValueState StatefulProcessor — the running (first event,
    // first purchase) pair, min-merged per batch, latest-wins re-emit —
    // and the product-limit table is derived DOWNSTREAM from that state
    // through the SHARED kmTable machinery (administrative censoring
    // times move with the corpus horizon, so they are computed at read,
    // never stored). In batch execution each user's full history arrives
    // in one handleInputRows call, so the emitted firsts ARE the batch
    // per-user agg's and the twin shares q_survival_km's oracle
    // verbatim. State = two longs + a flag per user (the
    // q_counter_state_twin bound); StreamingSpec proves the multi-batch
    // censored→event flip.
    QDef("q_survival_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        val firsts = graft.streaming.EventStreams.survivalFirsts(ev).toDF()
        val gmax = events(s, d).agg(max(col("ts")).as("gm"))
        val users = firsts.crossJoin(broadcast(gmax))
          .select(
            when(col("has_p"),
              datediff(to_date(timestamp_micros(col("fp_us"))),
                to_date(timestamp_micros(col("fe_us")))))
              .otherwise(datediff(to_date(col("gm")),
                to_date(timestamp_micros(col("fe_us")))))
              .cast("long").as("t"),
            col("has_p").cast("long").as("ev"))
        kmTable(users)
      },
      Some(survivalKmSql)),

    // TTL'd STREAMING DEDUP — the 8th stateful twin: EventStreams
    // .dedupKeepers runs a StatefulProcessor keyed by the DEDUP KEY
    // (user, event_type, event-day) — "admit at most one event per
    // user/type/day", the production frequency-cap/throttle shape —
    // with ValueState carrying the keeper (lexicographic (µs,
    // event_id) min-merge, order-independent ⇒ multi-batch ≡
    // single-batch) and the additive arrival count; per-state TTL
    // (exercised in StreamingSpec) is the production state bound:
    // state ∝ keys active within the TTL window, never corpus history.
    // The gate runs ttl = None: in batch execution each key's full
    // arrival set lands in one handleInputRows call, so the emitted
    // keepers ARE the batch argmin and the oracle replays them as a
    // (ts, event_id) window rank. Downstream rollup per (event_type,
    // day): admitted keys, total arrivals, suppressed duplicates, and
    // the keeper-id sum as an identity checksum (hash-verifies WHICH
    // event won each key, not just how many).
    QDef("q_dedup_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.dedupKeepers(ev).toDF()
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_events"),
            sum(col("keep_eid")).as("keeper_id_sum"))
          .select(col("event_type"), col("day"), col("n_keys"),
            col("n_events"),
            (col("n_events") - col("n_keys")).as("n_suppressed"),
            col("keeper_id_sum"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH r AS (SELECT event_type,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            event_id,
            row_number() OVER (PARTITION BY user_id, event_type,
              date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              ORDER BY ts, event_id) AS rn,
            CAST(count(*) OVER (PARTITION BY user_id, event_type,
              date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
              AS BIGINT) AS n
          FROM events)
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_keys,
          CAST(sum(n) AS BIGINT) AS n_events,
          CAST(sum(n) - count(*) AS BIGINT) AS n_suppressed,
          CAST(sum(event_id) AS BIGINT) AS keeper_id_sum
        FROM r WHERE rn = 1
        GROUP BY event_type, day ORDER BY event_type, day""")),

    QDef("q_theil_sen",
      (s, d) => {
        val daily = events(s, d)
          .select(col("event_type"), datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint(true) // both sides of the pair self-join
        val pairs = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            col("a.day").as("d1"), col("b.day").as("d2"),
            ((col("b.y") - col("a.y")).cast("double") /
              (col("b.day") - col("a.day"))).as("slope"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("slope"), col("d1"), col("d2"))
        val ranked = pairs.withColumn("rn", row_number().over(w))
          .localCheckpoint(true) // median probe + the pair count read it
        val np = ranked.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"))
        val nd = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"))
        ranked.join(broadcast(np), "event_type")
          .filter(col("rn") === expr("(n_pairs + 1) div 2"))
          .join(broadcast(nd), "event_type")
          .select(col("event_type"), col("n_days"), col("n_pairs"),
            col("slope").as("slope_med"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        pairs AS (SELECT a.event_type, a.day AS d1, b.day AS d2,
            CAST(b.y - a.y AS DOUBLE) / (b.day - a.day) AS slope
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.day < b.day),
        rn AS (SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY slope, d1, d2) AS rn FROM pairs),
        np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
          FROM pairs GROUP BY 1),
        nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
          FROM daily GROUP BY 1)
        SELECT r.event_type, n_days, n_pairs, slope AS slope_med
        FROM rn r JOIN np USING (event_type) JOIN nd USING (event_type)
        WHERE rn = (n_pairs + 1) // 2
        ORDER BY event_type""")),

    // MANN–KENDALL TREND TEST — the non-parametric companion of
    // q_theil_sen (Theil–Sen gives the slope magnitude; this tests
    // whether a monotone trend EXISTS): S = Σ_{i<j} sign(yⱼ − yᵢ) over
    // each type's daily count series (exact integer), tie-corrected
    // variance from the tie-group histogram — var·18 stays an exact
    // BIGINT (var_num18) and the reported z = (S ∓ 1)/√(var_num18/18)
    // is a fixed chain of correctly-rounded IEEE ops over identical
    // inputs. The pair frame is the same calendar-bounded constant as
    // Theil–Sen's. Class A + exact-div.
    QDef("q_mann_kendall",
      (s, d) => {
        val daily = events(s, d)
          .select(col("event_type"), datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint(true) // pair join + tie histogram + n_days
        val sF = daily.as("a").join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(sum(signum(col("b.y") - col("a.y")).cast("long")).as("s"))
        val ties = daily.groupBy(col("event_type"), col("y"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("event_type"))
          .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
            .as("tie_term"))
        val nd = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"))
        sF.join(ties, "event_type").join(nd, "event_type")
          .select(col("event_type"), col("n_days"), col("s"),
            (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
              - col("tie_term")).as("var_num18"))
          .withColumn("z",
            when(col("s") > 0, (col("s") - 1).cast("double") /
              sqrt(col("var_num18").cast("double") / 18))
              .when(col("s") < 0, (col("s") + 1).cast("double") /
                sqrt(col("var_num18").cast("double") / 18))
              .otherwise(lit(0.0)))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        sF AS (SELECT a.event_type,
            CAST(sum(CAST(sign(b.y - a.y) AS BIGINT)) AS BIGINT) AS s
          FROM daily a JOIN daily b
            ON a.event_type = b.event_type AND a.day < b.day
          GROUP BY 1),
        ties AS (SELECT event_type,
            CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_term
          FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t
                FROM daily GROUP BY 1, 2)
          GROUP BY 1),
        nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
          FROM daily GROUP BY 1)
        SELECT s.event_type, n_days, s,
          n_days * (n_days - 1) * (n_days * 2 + 5) - tie_term AS var_num18,
          CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
              / sqrt(CAST(n_days * (n_days - 1) * (n_days * 2 + 5)
                - tie_term AS DOUBLE) / 18)
            WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
              / sqrt(CAST(n_days * (n_days - 1) * (n_days * 2 + 5)
                - tie_term AS DOUBLE) / 18)
            ELSE CAST(0 AS DOUBLE) END AS z
        FROM sF s JOIN ties USING (event_type) JOIN nd USING (event_type)
        ORDER BY event_type""")),


    // RANDOMIZATION (permutation) TEST — the assumption-free companion
    // of q_welch_ttest/q_mannwhitney_u for the click-vs-purchase mean
    // contrast: 32 deterministic re-splits of the pooled values (split r
    // assigns each event by the parity of md5(event_id||'#'||r)'s first
    // nibble — cross-engine, no RNG state, the pairSampleNibbles idiom),
    // p = (#{|Δᵣ| ≥ |Δ_obs|} + 1)/(R+1) in exact ppm. Every mean is a
    // decimal-exact conditional sum over one IEEE divide, so each Δ is
    // bit-identical in both engines and the ≥ comparisons are exact
    // (class A + exact-div). Shape: one 32× fan of the two-type slice
    // (documented constant fan-out) into a single map-side-combinable
    // hash-agg — at 100 TB the fan is the only cost and it partial-
    // aggregates before the shuffle.
    QDef("q_permutation_test",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val base = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("event_type"), col("value"))
          .localCheckpoint(true) // observed split + the 32-replicate fan
        val obsRow = base.agg(
          ((sum(when(col("event_type") === "click", col("value"))
            .cast(Dec)).cast("double") /
            sum(when(col("event_type") === "click", 1L))) -
          (sum(when(col("event_type") === "purchase", col("value"))
            .cast(Dec)).cast("double") /
            sum(when(col("event_type") === "purchase", 1L)))).as("d_obs"))
        val evenNibbles = Seq("0", "2", "4", "6", "8", "a", "c", "e")
        val reps = base
          .crossJoin(broadcast(s.range(1, 33).select(col("id").as("rep"))))
          .withColumn("side_a",
            substring(md5(concat(col("event_id").cast("string"), lit("#"),
              col("rep"))), 1, 1).isin(evenNibbles: _*))
          .groupBy(col("rep"))
          .agg(
            ((sum(when(col("side_a"), col("value")).cast(Dec))
              .cast("double") / sum(when(col("side_a"), 1L))) -
            (sum(when(!col("side_a"), col("value")).cast(Dec))
              .cast("double") / sum(when(!col("side_a"), 1L))))
              .as("d_rep"))
        reps.crossJoin(broadcast(obsRow))
          .groupBy(col("d_obs"))
          .agg(count(lit(1)).as("n_reps"),
            sum((abs(col("d_rep")) >= abs(col("d_obs"))).cast("long"))
              .as("n_extreme"))
          .select(col("n_reps"), col("n_extreme"),
            expr("((n_extreme + 1) * 1000000) div (n_reps + 1)")
              .as("p_ppm"),
            col("d_obs"))
      },
      Some("""WITH base AS (SELECT event_id, event_type, value
          FROM events WHERE event_type IN ('click', 'purchase')),
        obs AS (SELECT
            CAST(sum(CAST(value AS DECIMAL(30,6)))
                FILTER (WHERE event_type = 'click') AS DOUBLE)
              / count(*) FILTER (WHERE event_type = 'click')
            - CAST(sum(CAST(value AS DECIMAL(30,6)))
                FILTER (WHERE event_type = 'purchase') AS DOUBLE)
              / count(*) FILTER (WHERE event_type = 'purchase') AS d_obs
          FROM base),
        sides AS (SELECT r.range AS rep, value,
            substr(md5(CAST(event_id AS VARCHAR) || '#'
              || CAST(r.range AS VARCHAR)), 1, 1)
              IN ('0','2','4','6','8','a','c','e') AS side_a
          FROM base CROSS JOIN range(1, 33) r),
        reps AS (SELECT rep,
            CAST(sum(CAST(value AS DECIMAL(30,6)))
                FILTER (WHERE side_a) AS DOUBLE)
              / count(*) FILTER (WHERE side_a)
            - CAST(sum(CAST(value AS DECIMAL(30,6)))
                FILTER (WHERE NOT side_a) AS DOUBLE)
              / count(*) FILTER (WHERE NOT side_a) AS d_rep
          FROM sides GROUP BY rep)
        SELECT CAST(count(*) AS BIGINT) AS n_reps,
          CAST(sum(CAST(abs(d_rep) >= abs(d_obs) AS BIGINT)) AS BIGINT)
            AS n_extreme,
          CAST(((sum(CAST(abs(d_rep) >= abs(d_obs) AS BIGINT)) + 1)
            * 1000000) // (count(*) + 1) AS BIGINT) AS p_ppm,
          d_obs
        FROM reps CROSS JOIN obs GROUP BY d_obs""")),

    // BENJAMINI–HOCHBERG FDR (Benjamini & Hochberg 1995, JRSS-B) — the
    // multiple-comparisons step-up every real A/B platform runs over
    // its test battery. Three of the repo's inference families are
    // re-derived as a POOLED m-hypothesis frame, each hypothesis with a
    // deterministic cross-engine p in ppm:
    //   perm_mean (10): the q_permutation_test machinery generalized to
    //     every event-type pair — ONE 32× md5-resplit fan computes
    //     per-(type, rep, side) decimal-exact moments, every pair's
    //     Δ_rep is then algebra over that 160-row frame; p is EXACT
    //     ((#extreme+1)·1e6 div 33 — class A).
    //   ks_nchars (190): the q_ks_drift statistic per source pair +
    //     the asymptotic two-sample p = min(1, 2·exp(−2D²·n_eff)) over
    //     the exact integer D numerator (class C: one exp, rounded
    //     once to the ppm grid — ksPpmSql above).
    //   mw_rank (10): the q_mannwhitney_u two-level bucketed rank
    //     prefix per event-type pair (windows partitioned by pair —
    //     never a global value sort), tie-corrected normal z, p via
    //     the Abramowitz–Stegun Φ chain (normPpmSql above).
    // The step-up itself is INTEGER arithmetic with cleared
    // denominators: rank the m p-values ascending (total order
    // (p_ppm, family, test_id)), k* = max{k : p_ppm·m ≤ k·50000}
    // (α = 0.05), reject ranks ≤ k*. Ties in p can never straddle k*:
    // if p_(k*+1) = p_(k*) satisfies at k*, it satisfies at k*+1 too,
    // contradicting maximality — so the rejection set is well-defined.
    // Scale: each family's corpus-side work is the already-proven
    // shape (map-side-combinable fans, pair-partitioned windows); the
    // pooled battery is SCHEMA-bounded (type pairs + source pairs =
    // 210 rows at any corpus size), so the single-partition rank
    // window is a declared bounded-derived-frame site. BH assumes
    // independence or PRDS across hypotheses; the shared-resplit perm
    // family is positively dependent, which BH tolerates
    // conservatively (Benjamini–Yekutieli 2001) — documented, not
    // hidden.
    QDef("q_fdr_bh",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val evenNibbles = Seq("0", "2", "4", "6", "8", "a", "c", "e")
        // r17 restructure (guide §1.2 / §2.3, VERDICT r16 item 4): the
        // events table is scanned exactly TWICE — once into the (value,
        // type) histogram `vt` (which now also yields the per-type
        // moments obsT: n = Σcnt, sv = Σ value·cnt, exact in DECIMAL
        // arithmetic, so d_obs is bit-identical), once into the 32× md5
        // resplit fan (oracle-mandated; map-side-combinable into ONE
        // (type, rep) exchange). The former ev/obsT checkpoints (a third
        // scan + two extra actions) are gone; `tot` below similarly
        // derives from the checkpointed `cnts` histogram instead of a
        // second documents scan.
        val ev = events(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
        // MW value histogram, hoisted: obsT + both MW tag joins read it
        val vt = ev.select(col("value").as("v"), col("event_type"))
          .groupBy(col("v"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        // family 1: permutation mean contrast per event-type pair
        // (per-type moments from the histogram: exact decimal algebra)
        val obsT = vt.groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n"),
            sum(col("v").cast(Dec) * col("cnt")).as("sv"))
          .localCheckpoint(true) // ≤|types| rows; 4 broadcast builds read it
        val pairObs = obsT.select(col("event_type").as("type_a"),
            col("n").as("n_a"), col("sv").as("sv_a"))
          .join(broadcast(obsT.select(col("event_type").as("type_b"),
            col("n").as("n_b"), col("sv").as("sv_b"))),
            col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            expr("CAST(sv_a AS DOUBLE) / n_a - CAST(sv_b AS DOUBLE) / n_b")
              .as("d_obs"))
        val repT = ev
          .crossJoin(broadcast(s.range(1, 33).select(col("id").as("rep"))))
          .withColumn("side_a",
            substring(md5(concat(col("event_id").cast("string"), lit("#"),
              col("rep"))), 1, 1).isin(evenNibbles: _*))
          .groupBy(col("event_type"), col("rep"))
          .agg(sum(when(col("side_a"), col("value")).cast(Dec)).as("sa"),
            sum(when(col("side_a"), 1L)).as("na"),
            sum(when(!col("side_a"), col("value")).cast(Dec)).as("sb"),
            sum(when(!col("side_a"), 1L)).as("nb"))
          // NOT checkpointed although self-joined below: the two sides'
          // partial-agg exchanges are canonical-equal and runtime-reused,
          // so the 32× md5 fan already runs once — an eager checkpoint
          // was MEASURED slower (5.2 vs 4.7 s min-of-3 at sf0.1: it
          // serializes a materialization that otherwise overlaps)
        val pairRep = repT.select(col("event_type").as("type_a"),
            col("rep"), col("sa").as("sa_a"), col("na").as("na_a"),
            col("sb").as("sb_a"), col("nb").as("nb_a"))
          .join(repT.select(col("event_type").as("type_b"),
            col("rep").as("rep_b"), col("sa").as("sa_b"),
            col("na").as("na_b"), col("sb").as("sb_b"),
            col("nb").as("nb_b")),
            col("type_a") < col("type_b") && col("rep") === col("rep_b"))
          .select(col("type_a"), col("type_b"),
            expr("CAST(sa_a + sa_b AS DOUBLE) / (na_a + na_b)" +
              " - CAST(sb_a + sb_b AS DOUBLE) / (nb_a + nb_b)").as("d_rep"))
        val permP = pairRep.join(broadcast(pairObs), Seq("type_a", "type_b"))
          .groupBy(col("type_a"), col("type_b"), col("d_obs"))
          .agg(sum((abs(col("d_rep")) >= abs(col("d_obs"))).cast("long"))
            .as("ne"))
          .select(lit("perm_mean").as("family"),
            concat(col("type_a"), lit("|"), col("type_b")).as("test_id"),
            expr("((ne + 1) * 1000000) div 33").as("p_ppm"))
        // family 2: KS per source pair over the n_chars histogram
        val docs = documents(s, d)
        val cnts = docs.groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true) // feeds both sides of the pair fan-out
        // per-source totals from the checkpointed histogram (histogram-
        // sized agg) instead of a second documents scan
        val tot = cnts.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
        val pairsK = tot.select(col("source").as("source_a"),
            col("n").as("n_a"))
          .crossJoin(broadcast(tot.select(
            col("source").as("source_b"), col("n").as("n_b"))))
          .filter(col("source_a") < col("source_b"))
        val taggedK = cnts
          .join(broadcast(pairsK), col("source") === col("source_a"))
          .select(col("source_a"), col("source_b"),
            col("n_chars").as("v"), col("cnt").as("ca"), lit(0L).as("cb"))
          .unionAll(cnts
            .join(broadcast(pairsK), col("source") === col("source_b"))
            .select(col("source_a"), col("source_b"),
              col("n_chars").as("v"), lit(0L).as("ca"), col("cnt").as("cb")))
          .groupBy(col("source_a"), col("source_b"), col("v"))
          .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
        val wK = Window.partitionBy(col("source_a"), col("source_b"))
          .orderBy(col("v"))
        val ksP = taggedK
          .withColumn("cum_a", sum(col("ca")).over(wK))
          .withColumn("cum_b", sum(col("cb")).over(wK))
          .join(broadcast(pairsK), Seq("source_a", "source_b"))
          .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
          .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
            .as("d_num"))
          .select(lit("ks_nchars").as("family"),
            concat(col("source_a"), lit("|"), col("source_b")).as("test_id"),
            expr(ksPpmSql).as("p_ppm"))
        // family 3: Mann–Whitney per event-type pair (two-level rank
        // prefix partitioned by pair — the q_mannwhitney_u shape ×10)
        // reads the hoisted `vt` histogram checkpoint
        val tpairs = obsT.select(col("event_type").as("type_a"))
          .join(broadcast(obsT.select(col("event_type").as("type_b"))),
            col("type_a") < col("type_b"))
        val taggedM = vt
          .join(broadcast(tpairs), col("event_type") === col("type_a"))
          .select(col("type_a"), col("type_b"), col("v"),
            col("cnt").as("ca"), lit(0L).as("cb"))
          .unionAll(vt
            .join(broadcast(tpairs), col("event_type") === col("type_b"))
            .select(col("type_a"), col("type_b"), col("v"),
              lit(0L).as("ca"), col("cnt").as("cb")))
          .groupBy(col("type_a"), col("type_b"), col("v"))
          .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
          .withColumn("bkt", floor(col("v")).cast("long"))
          // KEPT checkpointed (r17 measured): dropping it costs ~1 s —
          // the bucket-total agg keys (ta,tb,bkt) and the in-bucket
          // window partitioning (ta,tb,bkt order v) sit on DIFFERENT
          // exchanges than the (ta,tb,v) agg, so ReusedExchange cannot
          // cover the two consumers and the union subtree runs twice
          .localCheckpoint(true) // bucket totals + in-bucket windows
        val wBm = Window.partitionBy(col("type_a"), col("type_b"))
          .orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bktCumM = taggedM
          .groupBy(col("type_a"), col("type_b"), col("bkt"))
          .agg(sum(col("cb")).as("bb"))
          .withColumn("cum_bb", coalesce(sum(col("bb")).over(wBm), lit(0L)))
          .select(col("type_a"), col("type_b"), col("bkt"), col("cum_bb"))
        val wInM = Window.partitionBy(col("type_a"), col("type_b"),
            col("bkt")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val mwP = taggedM
          .withColumn("in_bb", coalesce(sum(col("cb")).over(wInM), lit(0L)))
          .join(broadcast(bktCumM), Seq("type_a", "type_b", "bkt"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
            sum(col("ca") * ((col("cum_bb") + col("in_bb")) * 2 + col("cb")))
              .as("u2_a"),
            sum(expr("(ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)"))
              .as("tie"))
          .withColumn("az", expr(mwAzSql))
          .withColumn("tn", expr(mwTnSql))
          .select(lit("mw_rank").as("family"),
            concat(col("type_a"), lit("|"), col("type_b")).as("test_id"),
            expr(normPpmSql).as("p_ppm"))
        // pooled battery + integer step-up
        val battery = permP.unionAll(ksP).unionAll(mwP)
          .localCheckpoint(true) // rank window, m count, k* scan share it
        val mTests = battery.agg(count(lit(1)).as("m_tests"))
        val wR = Window.orderBy(col("p_ppm"), col("family"), col("test_id"))
        val ranked = battery
          .withColumn("rnk", row_number().over(wR).cast("long"))
          .crossJoin(broadcast(mTests))
          .localCheckpoint(true) // k* scan + final projection read it
        val kStar = ranked.agg(max(when(
            col("p_ppm") * col("m_tests") <= col("rnk") * lit(50000L),
            col("rnk")).otherwise(0L)).as("k_star"))
        ranked.crossJoin(broadcast(kStar))
          .select(col("family"), col("test_id"), col("p_ppm"),
            col("m_tests"), col("rnk"), col("k_star"),
            (col("p_ppm") <= lit(50000L)).cast("long").as("reject_raw"),
            (col("rnk") <= col("k_star")).cast("long").as("reject_bh"))
          .orderBy(col("rnk"))
      },
      Some(s"""WITH fb_ev AS (SELECT event_id, event_type, value FROM events),
        obs_t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(value AS DECIMAL(30,6))) AS sv
          FROM fb_ev GROUP BY 1),
        pair_obs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n AS d_obs
          FROM obs_t a JOIN obs_t b ON a.event_type < b.event_type),
        rep_t AS (SELECT event_type, rep,
            sum(CAST(value AS DECIMAL(30,6))) FILTER (WHERE side_a) AS sa,
            CAST(count(*) FILTER (WHERE side_a) AS BIGINT) AS na,
            sum(CAST(value AS DECIMAL(30,6))) FILTER (WHERE NOT side_a)
              AS sb,
            CAST(count(*) FILTER (WHERE NOT side_a) AS BIGINT) AS nb
          FROM (SELECT event_type, value, r.range AS rep,
              substr(md5(CAST(event_id AS VARCHAR) || '#' ||
                CAST(r.range AS VARCHAR)), 1, 1)
                IN ('0','2','4','6','8','a','c','e') AS side_a
            FROM fb_ev CROSS JOIN range(1, 33) r)
          GROUP BY 1, 2),
        pair_rep AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            CAST(a.sa + b.sa AS DOUBLE) / (a.na + b.na)
              - CAST(a.sb + b.sb AS DOUBLE) / (a.nb + b.nb) AS d_rep
          FROM rep_t a JOIN rep_t b
            ON a.event_type < b.event_type AND a.rep = b.rep),
        perm_p AS (SELECT 'perm_mean' AS family,
            type_a || '|' || type_b AS test_id,
            CAST(((sum(CAST(abs(d_rep) >= abs(d_obs) AS BIGINT)) + 1)
              * 1000000) // 33 AS BIGINT) AS p_ppm
          FROM pair_rep JOIN pair_obs USING (type_a, type_b)
          GROUP BY type_a, type_b, d_obs),
        kd_tot AS (SELECT source, count(*) AS n
          FROM documents GROUP BY source),
        kd_cnts AS (SELECT source, n_chars AS v, count(*) AS cnt
          FROM documents GROUP BY source, n_chars),
        kd_pairs AS (SELECT a.source AS source_a, b.source AS source_b,
            a.n AS n_a, b.n AS n_b
          FROM kd_tot a JOIN kd_tot b ON a.source < b.source),
        kd_tagged AS (SELECT source_a, source_b, v,
            CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb
          FROM (
            SELECT p.source_a, p.source_b, c.v, c.cnt AS ca, 0 AS cb
            FROM kd_cnts c JOIN kd_pairs p ON c.source = p.source_a
            UNION ALL
            SELECT p.source_a, p.source_b, c.v, 0 AS ca, c.cnt AS cb
            FROM kd_cnts c JOIN kd_pairs p ON c.source = p.source_b)
          GROUP BY 1, 2, 3),
        kd_cum AS (SELECT source_a, source_b,
            CAST(sum(ca) OVER (PARTITION BY source_a, source_b
              ORDER BY v) AS BIGINT) AS cum_a,
            CAST(sum(cb) OVER (PARTITION BY source_a, source_b
              ORDER BY v) AS BIGINT) AS cum_b
          FROM kd_tagged),
        kd_stat AS (SELECT c.source_a, c.source_b, p.n_a, p.n_b,
            CAST(max(abs(cum_a * p.n_b - cum_b * p.n_a)) AS BIGINT)
              AS d_num
          FROM kd_cum c JOIN kd_pairs p USING (source_a, source_b)
          GROUP BY 1, 2, 3, 4),
        ks_p AS (SELECT 'ks_nchars' AS family,
            source_a || '|' || source_b AS test_id,
            $ksPpmSql AS p_ppm
          FROM kd_stat),
        mw_vt AS (SELECT value AS v, event_type,
            CAST(count(*) AS BIGINT) AS cnt
          FROM fb_ev GROUP BY 1, 2),
        mw_pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM obs_t a JOIN obs_t b ON a.event_type < b.event_type),
        mw_tagged AS (SELECT type_a, type_b, v,
            CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb,
            CAST(floor(v) AS BIGINT) AS bkt
          FROM (SELECT p.type_a, p.type_b, t.v, t.cnt AS ca, 0 AS cb
              FROM mw_vt t JOIN mw_pairs p ON t.event_type = p.type_a
            UNION ALL
            SELECT p.type_a, p.type_b, t.v, 0 AS ca, t.cnt AS cb
              FROM mw_vt t JOIN mw_pairs p ON t.event_type = p.type_b)
          GROUP BY type_a, type_b, v),
        mw_bc AS (SELECT type_a, type_b, bkt,
            CAST(COALESCE(sum(bb) OVER (PARTITION BY type_a, type_b
              ORDER BY bkt ROWS BETWEEN UNBOUNDED PRECEDING AND
              1 PRECEDING), 0) AS BIGINT) AS cum_bb
          FROM (SELECT type_a, type_b, bkt, CAST(sum(cb) AS BIGINT) AS bb
            FROM mw_tagged GROUP BY 1, 2, 3)),
        mw_r AS (SELECT h.type_a, h.type_b, ca, cb,
            CAST(COALESCE(sum(cb) OVER (PARTITION BY h.type_a, h.type_b,
              h.bkt ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
              1 PRECEDING), 0) AS BIGINT) + cum_bb AS below
          FROM mw_tagged h JOIN mw_bc b ON h.type_a = b.type_a
            AND h.type_b = b.type_b AND h.bkt = b.bkt),
        mw_stat AS (SELECT type_a, type_b, CAST(sum(ca) AS BIGINT) AS n1,
            CAST(sum(cb) AS BIGINT) AS n2,
            CAST(sum(ca * (below * 2 + cb)) AS BIGINT) AS u2_a,
            CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
              AS BIGINT) AS tie
          FROM mw_r GROUP BY 1, 2),
        mw_az AS (SELECT type_a, type_b, $mwAzSql AS az FROM mw_stat),
        mw_tn AS (SELECT type_a, type_b, az, $mwTnSql AS tn FROM mw_az),
        mw_p AS (SELECT 'mw_rank' AS family,
            type_a || '|' || type_b AS test_id,
            $normPpmSql AS p_ppm
          FROM mw_tn),
        battery AS (SELECT * FROM perm_p UNION ALL SELECT * FROM ks_p
          UNION ALL SELECT * FROM mw_p),
        ranked AS (SELECT family, test_id, p_ppm,
            CAST(row_number() OVER (ORDER BY p_ppm, family, test_id)
              AS BIGINT) AS rnk,
            (SELECT CAST(count(*) AS BIGINT) FROM battery) AS m_tests
          FROM battery),
        kst AS (SELECT CAST(max(CASE WHEN p_ppm * m_tests <= rnk * 50000
              THEN rnk ELSE 0 END) AS BIGINT) AS k_star FROM ranked)
        SELECT family, test_id, p_ppm, m_tests, rnk, k_star,
          CAST(p_ppm <= 50000 AS BIGINT) AS reject_raw,
          CAST(rnk <= k_star AS BIGINT) AS reject_bh
        FROM ranked CROSS JOIN kst
        ORDER BY rnk""")),

    // POISSON BOOTSTRAP CI — the bootstrap that actually works at 100 TB
    // (Chamandy et al., Google 2012): instead of materializing B
    // resamples, every row gets an independent Poisson(1) weight per
    // replicate, so one scan computes all 32 replicate means. The weight
    // is DETERMINISTIC: u = first-60-bits of md5(event_id||'#'||r)
    // compared against the Poisson(1) CDF thresholds PRE-SCALED to the
    // same 2⁶⁰ integer grid (builder-time constants embedded in both
    // plans — the NdcgW pattern; no float RNG, no exp() per-engine).
    // Replicate means are decimal-exact weighted sums over one IEEE
    // divide; the 90% CI is TYPE-1 SELECTION (2nd and 31st order
    // statistics of the 32 exact means) — selection, never averaging,
    // so every reported number is an exact division (class A +
    // exact-div). Shape: a documented 32× fan into one map-side-
    // combinable hash-agg + a 32-row sort.
    QDef("q_bootstrap_poisson",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val base = events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("value"))
          .localCheckpoint(true) // observed mean + the replicate fan
        val obs = base.agg(
          (sum(col("value").cast(Dec)).cast("double") / count(lit(1)))
            .as("mean_obs"))
        val u = conv(substring(md5(concat(col("event_id").cast("string"),
          lit("#"), col("rep"))), 1, 15), 16, 10).cast("long")
        // foldRight so the SMALLEST threshold test is outermost —
        // first-match semantics, identical to the oracle's CASE chain
        val w = PoisT.indices.foldRight(
            lit(PoisT.length.toLong): org.apache.spark.sql.Column) {
          case (k, acc) => when(u < PoisT(k), lit(k.toLong)).otherwise(acc)
        }
        val reps = base
          .crossJoin(broadcast(s.range(1, 33).select(col("id").as("rep"))))
          .withColumn("w", w.cast("long"))
          .groupBy(col("rep"))
          .agg((sum((col("value") * col("w")).cast(Dec)).cast("double") /
            sum(col("w"))).as("m"))
        val wOrd = Window.orderBy(col("m"), col("rep"))
        reps.withColumn("rn", row_number().over(wOrd))
          .filter(col("rn").isin(2, 31))
          .groupBy()
          .agg(min(col("m")).as("ci_lo"), max(col("m")).as("ci_hi"))
          .crossJoin(broadcast(obs))
          .select(lit(32L).as("n_reps"), col("mean_obs"),
            col("ci_lo"), col("ci_hi"))
      },
      Some {
        val cases = PoisT.zipWithIndex
          .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
        s"""WITH base AS (SELECT event_id, value FROM events
            WHERE event_type = 'purchase'),
        obs AS (SELECT CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
            / count(*) AS mean_obs FROM base),
        us AS (SELECT r.range AS rep, value,
            CAST(${(1 to 15).map(i =>
              "(strpos('0123456789abcdef', substr(" +
              "md5(CAST(event_id AS VARCHAR) || '#' || " +
              s"CAST(r.range AS VARCHAR)), $i, 1)) - 1) * " +
              s"${1L << (4 * (15 - i))}").mkString(" + ")} AS BIGINT) AS u
          FROM base CROSS JOIN range(1, 33) r),
        ws AS (SELECT rep, value,
            CAST(CASE $cases ELSE ${PoisT.length} END AS BIGINT) AS w
          FROM us),
        reps AS (SELECT rep,
            CAST(sum(CAST(value * w AS DECIMAL(30,6))) AS DOUBLE)
              / CAST(sum(w) AS BIGINT) AS m
          FROM ws GROUP BY rep),
        rk AS (SELECT m, row_number() OVER (ORDER BY m, rep) AS rn
          FROM reps)
        SELECT CAST(32 AS BIGINT) AS n_reps, mean_obs,
          (SELECT min(m) FROM rk WHERE rn IN (2, 31)) AS ci_lo,
          (SELECT max(m) FROM rk WHERE rn IN (2, 31)) AS ci_hi
        FROM obs"""
      }),

    // The STREAMING burst detector on the driver gate (the 6th stateful
    // twin, q_session_paths_stream_twin pattern): EventStreams
    // .burstEpisodes runs its MapState StatefulProcessor in batch
    // execution — each type's full history arrives in one
    // handleInputRows call, so the re-derived episode set IS the batch
    // q_burst_detect's — against the identical oracle. State is the
    // (hour → count) map, bounded by the calendar per type;
    // StreamingSpec proves the multi-batch incremental path.
    QDef("q_burst_stream_twin",
      (s, d) => {
        import s.implicits._
        prepBatchStateStore(s)
        val ev = events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.EventRow]
        graft.streaming.EventStreams.burstEpisodes(ev).toDF()
          .select(col("event_type"), col("start_hr"), col("end_hr"),
            col("len_hrs"), col("n_burst"), col("peak"))
          .orderBy(col("event_type"), col("start_hr"))
      },
      Some("""WITH hourly AS (SELECT event_type,
            (epoch_us(ts) - 1704067200000000) // 3600000000 AS hr,
            CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
            CAST(count(*) AS BIGINT) AS n_hours
          FROM hourly GROUP BY 1),
        b AS (SELECT h.event_type, hr, cnt,
            hr - row_number() OVER (PARTITION BY h.event_type
              ORDER BY hr) AS grp
          FROM hourly h JOIN tot t USING (event_type)
          WHERE cnt * n_hours > n_events * 2)
        SELECT event_type, CAST(min(hr) AS BIGINT) AS start_hr,
          CAST(max(hr) AS BIGINT) AS end_hr,
          CAST(count(*) AS BIGINT) AS len_hrs,
          CAST(sum(cnt) AS BIGINT) AS n_burst,
          CAST(max(cnt) AS BIGINT) AS peak
        FROM b GROUP BY event_type, grp
        ORDER BY event_type, start_hr""")),

    // LEAD–LAG CROSS-CORRELATION — "do clicks lead purchases, and by
    // how many days?": Pearson r between the click and purchase daily
    // count series at every lag in −7..+7 (the alignment operator
    // beside q_seasonal_decompose/q_agg_regression; the argmax lag IS
    // the conversion latency estimate at day granularity). Each lag's
    // moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs over the
    // calendar-bounded daily frame — the 15-lag fan is a broadcast
    // cross of a 15-row frame against ≤31 daily rows — and r is one
    // identically-parenthesized sqrt/divide chain per lag (class A +
    // exact-div). Guard: a zero-variance window yields NULL identically
    // in both engines.
    QDef("q_cross_correlation",
      (s, d) => {
        val daily = events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"), datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("y"))
          .localCheckpoint(true) // both series read it
        val xs = daily.filter(col("event_type") === "click")
          .select(col("day"), col("y").as("xv"))
        val ys = daily.filter(col("event_type") === "purchase")
          .select(col("day").as("yday"), col("y").as("yv"))
        val lags = broadcast(s.range(-7, 8).select(col("id").as("lag")))
        xs.crossJoin(lags)
          .join(ys, col("day") + col("lag") === col("yday"))
          .groupBy(col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("xv")).as("sx"), sum(col("yv")).as("sy"),
            sum(col("xv") * col("yv")).as("sxy"),
            sum(col("xv") * col("xv")).as("sxx"),
            sum(col("yv") * col("yv")).as("syy"))
          .select(col("lag"), col("n_pairs"),
            ((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
               sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy"))
                .cast("double")))).as("r"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events WHERE event_type IN ('click', 'purchase')
          GROUP BY 1, 2),
        xs AS (SELECT day, y AS xv FROM daily WHERE event_type = 'click'),
        ys AS (SELECT day AS yday, y AS yv FROM daily
          WHERE event_type = 'purchase'),
        m AS (SELECT l.range AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
            CAST(sum(xv * yv) AS BIGINT) AS sxy,
            CAST(sum(xv * xv) AS BIGINT) AS sxx,
            CAST(sum(yv * yv) AS BIGINT) AS syy
          FROM xs CROSS JOIN range(-7, 8) l
          JOIN ys ON xs.day + l.range = ys.yday
          GROUP BY 1)
        SELECT lag, n_pairs,
          CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
            (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
             sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS r
        FROM m ORDER BY lag""")),

    // BURST DETECTION — elevated-rate episode mining per event type (the
    // discrete two-state reading of Kleinberg's burst model): an hour is
    // bursting when its count exceeds 2× the type's mean hourly rate —
    // tested INTEGER-cross-multiplied (cnt·n_hours > 2·n_events, no
    // rate division ever happens) — and consecutive bursting hours
    // collapse to episodes via the gaps-and-islands rewrite (hour −
    // row_number is constant within a run). Episodes report span,
    // length, total and peak count. Shape: one (type, hour) hash-agg
    // over the corpus, then windows over the bounded burst-hour frame
    // (≤ calendar hours per type). All integer (class A).
    QDef("q_burst_detect",
      (s, d) => {
        val hourly = events(s, d)
          .select(col("event_type"),
            expr("(unix_micros(ts) - 1704067200000000) div 3600000000")
              .as("hr"))
          .groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true) // totals + the burst filter read it
        val tot = hourly.groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n_events"), count(lit(1)).as("n_hours"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        hourly.join(broadcast(tot), "event_type")
          .filter(col("cnt") * col("n_hours") > col("n_events") * 2)
          .withColumn("grp", col("hr") - row_number().over(w))
          .groupBy(col("event_type"), col("grp"))
          .agg(min(col("hr")).as("start_hr"), max(col("hr")).as("end_hr"),
            count(lit(1)).as("len_hrs"), sum(col("cnt")).as("n_burst"),
            max(col("cnt")).as("peak"))
          .drop("grp")
          .orderBy(col("event_type"), col("start_hr"))
      },
      Some("""WITH hourly AS (SELECT event_type,
            (epoch_us(ts) - 1704067200000000) // 3600000000 AS hr,
            CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
            CAST(count(*) AS BIGINT) AS n_hours
          FROM hourly GROUP BY 1),
        b AS (SELECT h.event_type, hr, cnt,
            hr - row_number() OVER (PARTITION BY h.event_type
              ORDER BY hr) AS grp
          FROM hourly h JOIN tot t USING (event_type)
          WHERE cnt * n_hours > n_events * 2)
        SELECT event_type, CAST(min(hr) AS BIGINT) AS start_hr,
          CAST(max(hr) AS BIGINT) AS end_hr,
          CAST(count(*) AS BIGINT) AS len_hrs,
          CAST(sum(cnt) AS BIGINT) AS n_burst,
          CAST(max(cnt) AS BIGINT) AS peak
        FROM b GROUP BY event_type, grp
        ORDER BY event_type, start_hr""")),

    // INCREMENTAL VIEW MAINTENANCE merge — the nightly-pipeline algebra
    // beside q_agg_tdigest_rollup's sketch mergeability: yesterday's
    // materialized per-(type, day) aggregate plus today's DELTA
    // aggregate must re-aggregate to EXACTLY the full recompute. The
    // decimal partial mechanism (dsumPart → dsumMerge ≡ dsum, exact by
    // construction) makes the float sum mergeable without drift, so the
    // per-row `consistent` flag — computed IN-PLAN against the full
    // recompute — is provably 1 everywhere and any IVM regression fails
    // the driver's hash gate. Scale: this is the O(delta) nightly
    // update pattern; the full recompute exists here only as the
    // self-audit. Class A/B (counts + exact-decimal merge identity).
    QDef("q_ivm_merge",
      (s, d) => {
        val cutoff = lit("2024-01-20").cast("timestamp")
        val ev = events(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("ts"), col("value"))
          .localCheckpoint(true) // base, delta, and full scans
        def part(f: org.apache.spark.sql.DataFrame) =
          f.groupBy(col("event_type"), col("day"))
            .agg(count(lit(1)).as("n"), dsumPart(col("value")).as("sv"))
        val merged = part(ev.filter(col("ts") < cutoff))
          .unionAll(part(ev.filter(col("ts") >= cutoff)))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("n")).as("n"), dsumMerge(col("sv")).as("total_value"))
        val full = ev.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("nf"), dsum(col("value")).as("tvf"))
        merged.join(full, Seq("event_type", "day"))
          .select(col("event_type"),
            datediff(col("day"), lit("2024-01-01").cast("date"))
              .cast("long").as("day_no"),
            col("n"), col("total_value"),
            (col("n") === col("nf") &&
              col("total_value") === col("tvf")).cast("long")
              .as("consistent"))
          .orderBy(col("event_type"), col("day_no"))
      },
      Some(s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
            ts, value FROM events),
        base AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(value AS DECIMAL(30,6))) AS sv
          FROM ev WHERE ts < TIMESTAMP '2024-01-20'
          GROUP BY 1, 2),
        delta AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(value AS DECIMAL(30,6))) AS sv
          FROM ev WHERE ts >= TIMESTAMP '2024-01-20'
          GROUP BY 1, 2),
        merged AS (SELECT event_type, day,
            CAST(sum(n) AS BIGINT) AS n,
            CAST(sum(sv) AS DOUBLE) AS total_value
          FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
          GROUP BY 1, 2),
        full_ AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS nf,
            ${sqlDsum("value")} AS tvf
          FROM ev GROUP BY 1, 2)
        SELECT m.event_type,
          date_diff('day', DATE '2024-01-01', m.day) AS day_no,
          m.n, m.total_value,
          CAST(m.n = f.nf AND m.total_value = f.tvf AS BIGINT)
            AS consistent
        FROM merged m JOIN full_ f
          ON m.event_type = f.event_type AND m.day = f.day
        ORDER BY m.event_type, day_no""")),


    // NEAREST-neighbor temporal join — the |Δt|-minimizing alignment
    // (sensor fusion / attribution when direction is unknown): each
    // purchase pairs with its user's temporally CLOSEST click, either
    // side. Backward/forward as-of joins fix a direction; this one
    // resolves min |Δt| with the deterministic (|Δt|, backward-first,
    // click-id) total order encoded as a fixed-width string min_by key
    // (the q_session_bounce composite-key idiom — lexicographic ==
    // numeric at fixed width, identical in both engines). Shape: one
    // user_id co-partitioned equi-join (per-user fan bounded by
    // history), one hash-agg — never a time-range cross join.
    QDef("q_join_asof_nearest",
      (s, d) => {
        val e = events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
            col("event_id").as("c_id"))
        p.join(c, Seq("user_id"))
          .withColumn("delta_us", col("c_us") - col("p_us"))
          .withColumn("k", concat(
            lpad(abs(col("delta_us")).cast("string"), 20, "0"),
            when(col("delta_us") <= 0, lit("0")).otherwise(lit("1")),
            lpad(col("c_id").cast("string"), 12, "0")))
          .groupBy(col("p_id"), col("user_id"))
          .agg(min_by(col("c_id"), col("k")).as("c_id"),
            min_by(col("delta_us"), col("k")).as("delta_us"))
          .orderBy(col("p_id"))
      },
      Some("""WITH p AS (SELECT event_id AS p_id, user_id,
            epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS c_id
          FROM events WHERE event_type = 'click'),
        j AS (SELECT p_id, p.user_id, c_id, c_us - p_us AS delta_us,
            lpad(CAST(abs(c_us - p_us) AS VARCHAR), 20, '0')
              || (CASE WHEN c_us - p_us <= 0 THEN '0' ELSE '1' END)
              || lpad(CAST(c_id AS VARCHAR), 12, '0') AS k
          FROM p JOIN c ON p.user_id = c.user_id)
        SELECT p_id, user_id, min_by(c_id, k) AS c_id,
          min_by(delta_us, k) AS delta_us
        FROM j GROUP BY p_id, user_id ORDER BY p_id""")),

    // RFM SEGMENTATION — the marketing-analytics staple: score every
    // customer 1–3 on Recency (last order date), Frequency (order
    // count), Monetary (decimal-exact spend), concatenate to a segment
    // code, roll up. Tercile scores are the explicit integer-rank
    // formula score = (3·(r−1)) div n + 1 over the (metric, custkey)
    // total order — the SAME formula both engines, no reliance on
    // ntile internals; the global rank windows run over the CUSTOMER
    // dimension (the documented bounded-dim global-rank regime; the
    // fact side only feeds the per-customer hash-agg). Monetary sums
    // are DECIMAL(30,6)-exact, so ranks never see float order.
    QDef("q_rfm_segments",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val per = orders(s, d).groupBy(col("o_custkey"))
          // o_orderdate reads as TIMESTAMP_NTZ; the UTC-pinned session
          // (asserted by Tables.normalizeEventTs's contract) makes the
          // cast an identity on the wall-clock instant
          .agg(max(unix_micros(col("o_orderdate").cast("timestamp")))
            .as("last_us"),
            count(lit(1)).as("freq"),
            sum(col("o_totalprice").cast(Dec)).as("money"))
          .localCheckpoint(true) // three rank windows + the rollup
        import org.apache.spark.sql.expressions.Window
        def rank(order: org.apache.spark.sql.Column*) =
          row_number().over(Window.orderBy(order: _*)).cast("long")
        per
          .withColumn("r_rank", rank(col("last_us"), col("o_custkey")))
          .withColumn("f_rank", rank(col("freq"), col("o_custkey")))
          .withColumn("m_rank", rank(col("money"), col("o_custkey")))
          .crossJoin(broadcast(per.agg(count(lit(1)).as("nc"))))
          .select(col("freq"), col("money"),
            expr("(r_rank - 1) * 3 div nc + 1").as("r_score"),
            expr("(f_rank - 1) * 3 div nc + 1").as("f_score"),
            expr("(m_rank - 1) * 3 div nc + 1").as("m_score"))
          .groupBy(concat(col("r_score"), col("f_score"), col("m_score"))
            .as("segment"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("freq")).as("n_orders"),
            round(sum(col("money")).cast("double"), 4).as("spend"))
          .orderBy(col("segment"))
      },
      Some("""WITH per AS (SELECT o_custkey,
            max(epoch_us(o_orderdate)) AS last_us,
            CAST(count(*) AS BIGINT) AS freq,
            sum(CAST(o_totalprice AS DECIMAL(30,6))) AS money
          FROM orders GROUP BY o_custkey),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        sc AS (SELECT o_custkey, freq, money,
            (CAST(row_number() OVER (ORDER BY last_us, o_custkey) AS BIGINT)
              - 1) * 3 // n.n + 1 AS r_score,
            (CAST(row_number() OVER (ORDER BY freq, o_custkey) AS BIGINT)
              - 1) * 3 // n.n + 1 AS f_score,
            (CAST(row_number() OVER (ORDER BY money, o_custkey) AS BIGINT)
              - 1) * 3 // n.n + 1 AS m_score
          FROM per CROSS JOIN n)
        SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
            || CAST(m_score AS VARCHAR) AS segment,
          CAST(count(*) AS BIGINT) AS n_customers,
          CAST(sum(freq) AS BIGINT) AS n_orders,
          round(CAST(sum(money) AS DOUBLE), 4) AS spend
        FROM sc GROUP BY 1 ORDER BY segment""")),

    // CUPED variance reduction (Deng et al. WSDM'13) — the
    // experimentation-platform staple: adjust each user's post-period
    // metric by their PRE-period baseline (θ = cov(pre, post)/var(pre);
    // adjusted = post − θ·(pre − mean_pre)), shrinking metric variance
    // by exactly cov²/var_pre without biasing the mean. One
    // per-user conditional-sum hash-agg (map-side combinable) builds
    // the (pre, post) pairs; the five cross moments are decimal-exact
    // (per-user sums land once on the 30,6 grid, the pairwise products
    // are single IEEE multiplies re-grided before the exact sum); θ,
    // variances, and the reduction are fixed IEEE chains with identical
    // parenthesization both engines (the q_welch_ttest class), rounded
    // once.
    // SAMPLE-RATIO MISMATCH — the experiment-integrity guard that runs
    // BEFORE any A/B readout (CUPED/Welch/permutation are meaningless if
    // the randomizer is broken): users split 80/20 by the Knuth-hash
    // bucket (the q_split_assign assignment), and the 1-df chi² against
    // the designed ratio is computed with CLEARED denominators —
    // χ² = [(5·o_a − 4n)² + 4·(5·o_b − n)²] / (20n), so the numerator is
    // an exact BIGINT and the flag "χ² > 3.84" (95th pct) is the
    // integer cross-multiplication num·100 > 7680·n — no float enters
    // the decision. One user-level hash-agg + a 1-row rollup (class A +
    // exact-div on the reported χ²).
    QDef("q_ab_srm",
      (s, d) => {
        val arm = pmod(col("user_id") * lit(2654435761L),
          lit(4294967296L)) % 100 < 80
        events(s, d).select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n"),
            sum(when(arm, 1L).otherwise(0L)).as("o_a"))
          .select(col("n"), col("o_a"), (col("n") - col("o_a")).as("o_b"),
            ((col("o_a") * 5 - col("n") * 4) * (col("o_a") * 5 - col("n") * 4)
              + ((col("n") - col("o_a")) * 5 - col("n"))
              * ((col("n") - col("o_a")) * 5 - col("n")) * 4)
              .as("chi2_num"))
          .select(col("n"), col("o_a"), col("o_b"), col("chi2_num"),
            (col("chi2_num").cast("double") / (col("n") * 20)).as("chi2"),
            (col("chi2_num") * 100 > col("n") * 7680).cast("long")
              .as("srm_flag"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
        c AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST((user_id * 2654435761) % 4294967296 % 100 < 80
              AS BIGINT)) AS BIGINT) AS o_a
          FROM u)
        SELECT n, o_a, n - o_a AS o_b,
          (o_a * 5 - n * 4) * (o_a * 5 - n * 4)
            + ((n - o_a) * 5 - n) * ((n - o_a) * 5 - n) * 4 AS chi2_num,
          CAST((o_a * 5 - n * 4) * (o_a * 5 - n * 4)
            + ((n - o_a) * 5 - n) * ((n - o_a) * 5 - n) * 4 AS DOUBLE)
            / (n * 20) AS chi2,
          CAST(((o_a * 5 - n * 4) * (o_a * 5 - n * 4)
            + ((n - o_a) * 5 - n) * ((n - o_a) * 5 - n) * 4) * 100
            > n * 7680 AS BIGINT) AS srm_flag
        FROM c""")),

    // STRATIFIED TREATMENT-EFFECT estimate — the observational-causal
    // companion of CUPED/SRM: users split into Knuth-hash arms, the
    // post-period outcome contrast is computed WITHIN pre-period
    // activity terciles and combined with stratum weights (classic
    // stratification/post-stratification — removes the confounding a
    // raw arm contrast inherits when pre-activity predicts outcome).
    // Terciles use the explicit (3·(rank−1)) div n + 1 rank formula
    // over the (pre, user_id) total order on the user DIM frame (the
    // q_rfm_segments bounded-dim global-rank regime); per-(stratum,
    // arm) means are decimal-exact sums over one IEEE divide; the
    // per-stratum diff and weight ship exactly (round-6 diff, exact
    // ppm weight) so the weighted ATE is reproducible from the output.
    QDef("q_propensity_strata",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val split = lit("2024-01-16").cast("timestamp")
        val arm = (pmod(col("user_id") * lit(2654435761L),
          lit(4294967296L)) % 100 < 80).cast("long")
        val per = events(s, d).groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < split, col("value")).otherwise(0.0)
              .cast(Dec)).as("pre"),
            sum(when(col("ts") >= split, col("value")).otherwise(0.0)
              .cast(Dec)).as("post"))
          .withColumn("treat", arm)
          .localCheckpoint(true) // rank window + the stratum rollup
        val n = per.agg(count(lit(1)).as("n"))
        val w = Window.orderBy(col("pre"), col("user_id"))
        val strat = per.withColumn("rk", row_number().over(w))
          .crossJoin(broadcast(n))
          .withColumn("stratum", expr("(3 * (rk - 1)) div n + 1"))
        strat.groupBy(col("stratum"))
          .agg(count(lit(1)).as("n_s"),
            sum(col("treat")).as("n_treat"),
            (sum(when(col("treat") === 1, col("post"))).cast("double") /
              sum(col("treat"))).as("m_treat"),
            (sum(when(col("treat") === 0, col("post"))).cast("double") /
              sum(lit(1L) - col("treat"))).as("m_ctrl"),
            first(col("n")).as("n"))
          // NO trailing round: every mean is one correctly-rounded
          // division of identical exact decimals (the JM midpoint-hazard
          // lesson — a round-6 of a 1e-6-grid quotient can sit on a
          // decimal midpoint where the engines' round implementations
          // disagree; the raw doubles are bit-identical)
          .select(col("stratum"), col("n_s"), col("n_treat"),
            (col("n_s") - col("n_treat")).as("n_ctrl"),
            col("m_treat"), col("m_ctrl"),
            (col("m_treat") - col("m_ctrl")).as("diff"),
            expr("(n_s * 1000000) div n").as("w_ppm"))
          .orderBy(col("stratum"))
      },
      Some("""WITH per AS (SELECT user_id,
            sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-16'
              THEN value ELSE 0.0 END AS DECIMAL(30,6))) AS pre,
            sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16'
              THEN value ELSE 0.0 END AS DECIMAL(30,6))) AS post,
            CAST((user_id * 2654435761) % 4294967296 % 100 < 80
              AS BIGINT) AS treat
          FROM events GROUP BY user_id),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
        strat AS (SELECT *,
            (3 * (row_number() OVER (ORDER BY pre, user_id) - 1)) // n + 1
              AS stratum
          FROM per CROSS JOIN nn)
        SELECT CAST(stratum AS BIGINT) AS stratum,
          CAST(count(*) AS BIGINT) AS n_s,
          CAST(sum(treat) AS BIGINT) AS n_treat,
          CAST(count(*) - sum(treat) AS BIGINT) AS n_ctrl,
          CAST(sum(CASE WHEN treat = 1 THEN post END) AS DOUBLE)
            / CAST(sum(treat) AS BIGINT) AS m_treat,
          CAST(sum(CASE WHEN treat = 0 THEN post END) AS DOUBLE)
            / CAST(sum(1 - treat) AS BIGINT) AS m_ctrl,
          CAST(sum(CASE WHEN treat = 1 THEN post END) AS DOUBLE)
              / CAST(sum(treat) AS BIGINT)
            - CAST(sum(CASE WHEN treat = 0 THEN post END) AS DOUBLE)
              / CAST(sum(1 - treat) AS BIGINT) AS diff,
          CAST((count(*) * 1000000) // max(n) AS BIGINT) AS w_ppm
        FROM strat GROUP BY stratum ORDER BY stratum""")),

    // DIFFERENCE-IN-DIFFERENCES — the causal battery's parallel-trends
    // estimator beside CUPED (variance reduction), SRM (integrity),
    // and the stratified effect (confounding): per-user pre/post value
    // sums (the CUPED decimal-exact machinery and its 2024-01-16
    // split), Knuth 80/20 arms (the q_ab_srm assignment), DID =
    // (T̄post − T̄pre) − (C̄post − C̄pre) over user-level means as
    // UNROUNDED exact divisions (the JM midpoint lesson), rounded once
    // at emission. A PLACEBO DID re-runs the identical estimator
    // entirely inside the pre period (split 2024-01-08) — the standard
    // parallel-trends falsification. No treatment exists in this
    // synthetic corpus, so BOTH estimates are null noise (neither
    // bounds the other — the spec replays the estimator exactly and
    // checks only the algebra, never a magnitude the null does not
    // promise).
    // One map-side-combinable per-user agg + a 4-cell rollup: the
    // 100 TB shape is a single scan. Class B + exact-div.
    QDef("q_did_effect",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val split = lit("2024-01-16").cast("timestamp")
        val psplit = lit("2024-01-08").cast("timestamp")
        val arm = pmod(col("user_id") * lit(2654435761L),
          lit(4294967296L)) % 100 < 80
        val per = events(s, d).groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < split, col("value")).otherwise(0.0)
              .cast(Dec)).as("pre"),
            sum(when(col("ts") >= split, col("value")).otherwise(0.0)
              .cast(Dec)).as("post"),
            sum(when(col("ts") < psplit, col("value")).otherwise(0.0)
              .cast(Dec)).as("ppre"),
            sum(when(col("ts") >= psplit && col("ts") < split,
              col("value")).otherwise(0.0).cast(Dec)).as("ppost"))
          .withColumn("t", arm.cast("long"))
        per.groupBy(col("t"))
          .agg(count(lit(1)).as("n"),
            sum(col("pre")).as("sp"), sum(col("post")).as("sq"),
            sum(col("ppre")).as("spp"), sum(col("ppost")).as("spq"))
          .agg(
            sum(when(col("t") === 1, col("n"))).as("n_t"),
            sum(when(col("t") === 0, col("n"))).as("n_c"),
            sum(when(col("t") === 1, col("sp"))).as("sp_t"),
            sum(when(col("t") === 1, col("sq"))).as("sq_t"),
            sum(when(col("t") === 0, col("sp"))).as("sp_c"),
            sum(when(col("t") === 0, col("sq"))).as("sq_c"),
            sum(when(col("t") === 1, col("spp"))).as("pp_t"),
            sum(when(col("t") === 1, col("spq"))).as("pq_t"),
            sum(when(col("t") === 0, col("spp"))).as("pp_c"),
            sum(when(col("t") === 0, col("spq"))).as("pq_c"))
          .select(col("n_t"), col("n_c"),
            expr("""round((CAST(sq_t AS DOUBLE) / n_t
                - CAST(sp_t AS DOUBLE) / n_t)
              - (CAST(sq_c AS DOUBLE) / n_c
                - CAST(sp_c AS DOUBLE) / n_c), 6)""").as("did_r6"),
            expr("""round((CAST(pq_t AS DOUBLE) / n_t
                - CAST(pp_t AS DOUBLE) / n_t)
              - (CAST(pq_c AS DOUBLE) / n_c
                - CAST(pp_c AS DOUBLE) / n_c), 6)""")
              .as("placebo_did_r6"))
      },
      Some("""WITH per AS (SELECT user_id,
            CAST((user_id * 2654435761) % 4294967296 % 100 < 80
              AS BIGINT) AS t,
            sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
              ELSE 0.0 END AS DECIMAL(30,6))) AS pre,
            sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
              ELSE 0.0 END AS DECIMAL(30,6))) AS post,
            sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN value
              ELSE 0.0 END AS DECIMAL(30,6))) AS ppre,
            sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                AND ts < TIMESTAMP '2024-01-16' THEN value
              ELSE 0.0 END AS DECIMAL(30,6))) AS ppost
          FROM events GROUP BY user_id),
        g AS (SELECT t, CAST(count(*) AS BIGINT) AS n,
            sum(pre) AS sp, sum(post) AS sq,
            sum(ppre) AS spp, sum(ppost) AS spq
          FROM per GROUP BY t)
        SELECT
          CAST(sum(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n_t,
          CAST(sum(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n_c,
          round((CAST(sum(CASE WHEN t = 1 THEN sq END) AS DOUBLE)
              / sum(CASE WHEN t = 1 THEN n END)
            - CAST(sum(CASE WHEN t = 1 THEN sp END) AS DOUBLE)
              / sum(CASE WHEN t = 1 THEN n END))
            - (CAST(sum(CASE WHEN t = 0 THEN sq END) AS DOUBLE)
              / sum(CASE WHEN t = 0 THEN n END)
            - CAST(sum(CASE WHEN t = 0 THEN sp END) AS DOUBLE)
              / sum(CASE WHEN t = 0 THEN n END)), 6) AS did_r6,
          round((CAST(sum(CASE WHEN t = 1 THEN spq END) AS DOUBLE)
              / sum(CASE WHEN t = 1 THEN n END)
            - CAST(sum(CASE WHEN t = 1 THEN spp END) AS DOUBLE)
              / sum(CASE WHEN t = 1 THEN n END))
            - (CAST(sum(CASE WHEN t = 0 THEN spq END) AS DOUBLE)
              / sum(CASE WHEN t = 0 THEN n END)
            - CAST(sum(CASE WHEN t = 0 THEN spp END) AS DOUBLE)
              / sum(CASE WHEN t = 0 THEN n END)), 6)
            AS placebo_did_r6
        FROM g""")),

    QDef("q_abtest_cuped",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val split = lit("2024-01-16").cast("timestamp")
        val per = events(s, d).groupBy(col("user_id"))
          .agg(
            sum(when(col("ts") < split, col("value")).otherwise(0.0)
              .cast(Dec)).as("pre"),
            sum(when(col("ts") >= split, col("value")).otherwise(0.0)
              .cast(Dec)).as("post"))
        val m = per.agg(count(lit(1)).as("n"),
          sum(col("pre")).as("sp"), sum(col("post")).as("sq"),
          sum(expr("CAST(CAST(pre AS DOUBLE) * CAST(pre AS DOUBLE) AS DECIMAL(30,6))")).as("spp"),
          sum(expr("CAST(CAST(post AS DOUBLE) * CAST(post AS DOUBLE) AS DECIMAL(30,6))")).as("sqq"),
          sum(expr("CAST(CAST(pre AS DOUBLE) * CAST(post AS DOUBLE) AS DECIMAL(30,6))")).as("spq"))
        m.select(col("n"),
          expr("""round((CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
            * CAST(sq AS DOUBLE) / n)
            / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)
            * CAST(sp AS DOUBLE) / n), 6)""").as("theta"),
          expr("""round((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
            * CAST(sq AS DOUBLE) / n) / (n - 1), 6)""").as("var_post"),
          expr("""round(((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
            * CAST(sq AS DOUBLE) / n)
            - (CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
               * CAST(sq AS DOUBLE) / n)
            * (CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
               * CAST(sq AS DOUBLE) / n)
            / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)
               * CAST(sp AS DOUBLE) / n)) / (n - 1), 6)""").as("var_adj"))
      },
      Some("""WITH per AS (SELECT user_id,
            sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN value
              ELSE 0.0 END AS DECIMAL(30,6))) AS pre,
            sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value
              ELSE 0.0 END AS DECIMAL(30,6))) AS post
          FROM events GROUP BY user_id),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
            sum(pre) AS sp, sum(post) AS sq,
            sum(CAST(CAST(pre AS DOUBLE) * CAST(pre AS DOUBLE)
              AS DECIMAL(30,6))) AS spp,
            sum(CAST(CAST(post AS DOUBLE) * CAST(post AS DOUBLE)
              AS DECIMAL(30,6))) AS sqq,
            sum(CAST(CAST(pre AS DOUBLE) * CAST(post AS DOUBLE)
              AS DECIMAL(30,6))) AS spq
          FROM per)
        SELECT n,
          round((CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
            * CAST(sq AS DOUBLE) / n)
            / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)
            * CAST(sp AS DOUBLE) / n), 6) AS theta,
          round((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
            * CAST(sq AS DOUBLE) / n) / (n - 1), 6) AS var_post,
          round(((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)
            * CAST(sq AS DOUBLE) / n)
            - (CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
               * CAST(sq AS DOUBLE) / n)
            * (CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
               * CAST(sq AS DOUBLE) / n)
            / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)
               * CAST(sp AS DOUBLE) / n)) / (n - 1), 6) AS var_adj
        FROM m""")),

    // INTERVAL UNION length — total covered activity time per user when
    // each event opens a 5-minute window and windows overlap: the
    // classic coverage/utilization operator (machine uptime, ad
    // viewability, session coverage). The q_dupspan_trim interval-union
    // mechanism declared standalone: per-user sort + running-max island
    // assignment merges overlapping-or-touching [us, us+300s) windows,
    // then one hash-agg sums exact µs lengths. All integers (class A);
    // windows partition by user (state bounded by per-user history).
    QDef("q_interval_union",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val iv = events(s, d).select(col("user_id"),
          unix_micros(col("ts")).as("s0"),
          (unix_micros(col("ts")) + 300000000L).as("e0"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("s0"), col("e0"))
        iv.withColumn("pmax", max(col("e0")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("ni",
            (col("pmax").isNull || col("s0") > col("pmax")).cast("long"))
          .withColumn("isl", sum(col("ni")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("isl"))
          .agg(min(col("s0")).as("s"), max(col("e0")).as("e"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("e") - col("s")).as("covered_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (SELECT user_id, epoch_us(ts) AS s0,
            epoch_us(ts) + 300000000 AS e0
          FROM events),
        mk AS (SELECT user_id, s0, e0,
            max(e0) OVER (PARTITION BY user_id ORDER BY s0, e0
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM iv),
        mc AS (SELECT user_id, s0, e0,
            CAST(sum(CASE WHEN pmax IS NULL OR s0 > pmax
              THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
              ORDER BY s0, e0 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl
          FROM mk),
        merged AS (SELECT user_id, isl, min(s0) AS s, max(e0) AS e
          FROM mc GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
          CAST(sum(e - s) AS BIGINT) AS covered_us
        FROM merged GROUP BY user_id ORDER BY user_id""")),

    // BRADLEY–TERRY PREFERENCE STRENGTHS (r13) — the pairwise-
    // comparison rating model behind RLHF preference data, reward-model
    // analysis, and offline eval leaderboards (Bradley & Terry 1952),
    // fitted with Hunter's MM update (Hunter 2004: p_i ← W_i / Σ_j
    // n_ij/(p_i+p_j)) as a DECLARED 5-round trajectory. Comparisons
    // are mined from events: within each (user, event-day), every pair
    // of event types both present "plays", and the larger exact cents
    // sum wins (ties are no-contests, dropped — the BT likelihood has
    // no tie term). Every update is pure Long integer floor-division
    // on declared grids (p on e6, the per-opponent term on e3:
    // term = n_ij·10⁹ div (p_i+p_j); p' = W_i·10⁹ div Σterm), so both
    // engines replay bit-identical rounds — overflow-safe to ~9·10⁹
    // comparisons per pair (PB-scale event logs; past that the
    // DECIMAL(38,0)/HUGEINT widening of pcaCovFull applies). A type
    // with no decided games keeps p = 10⁶ by declared rule. Scale:
    // ONE map-side-combinable (user, day, type) agg, a pairwise
    // self-join fanned ≤|types| per key, then everything lives on
    // |types|²-bounded broadcast frames; the 5 MM rounds touch ≤56
    // rows each.
    QDef("q_bradley_terry",
      (s, d) => {
        val g = events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("event_type"),
            round(col("value") * 100, 0).cast("long").as("c"))
          .groupBy(col("user_id"), col("day"), col("event_type"))
          .agg(sum(col("c")).as("v"))
        val pr = g.as("a").join(g.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .filter(col("a.v") =!= col("b.v"))
          .select(col("a.event_type").as("ta"),
            col("b.event_type").as("tb"),
            (col("a.v") > col("b.v")).cast("long").as("wa"))
          .groupBy(col("ta"), col("tb"))
          .agg(count(lit(1)).as("games"), sum(col("wa")).as("wins_a"))
          .localCheckpoint(true) // ≤ |types|² rows, read 2× per MM round
        val sym = pr.select(col("ta").as("i"), col("tb").as("j"),
            col("games"), col("wins_a").as("w"))
          .unionAll(pr.select(col("tb").as("i"), col("ta").as("j"),
            col("games"), (col("games") - col("wins_a")).as("w")))
        val wt = sym.groupBy(col("i"))
          .agg(sum(col("w")).as("wins"), sum(col("games")).as("games"))
          .localCheckpoint(true)
        val types = events(s, d).select(col("event_type").as("i"))
          .distinct().localCheckpoint(true)
        var p = types.select(col("i"), lit(1000000L).as("p"))
        for (_ <- 1 to 5) {
          val se3 = sym
            .join(broadcast(p.select(col("i"), col("p").as("pi"))), "i")
            .join(broadcast(p.select(col("i").as("j"), col("p").as("pj"))),
              "j")
            .groupBy(col("i"))
            .agg(sum(expr("games * 1000000000 div greatest(pi + pj, 1)"))
              .as("se3"))
          p = types
            .join(wt, Seq("i"), "left").join(se3, Seq("i"), "left")
            .select(col("i"),
              when(col("se3").isNull || col("se3") === 0L, lit(1000000L))
                .otherwise(expr("wins * 1000000000 div se3")).as("p"))
            .localCheckpoint(true)
        }
        p.join(wt, Seq("i"), "left")
          .select(col("i").as("event_type"),
            coalesce(col("games"), lit(0L)).as("games"),
            coalesce(col("wins"), lit(0L)).as("wins"),
            col("p").as("strength_e6"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("strength_e6").desc, col("event_type")))
            .cast("long"))
          .orderBy(col("rank"))
      },
      Some {
        def round_(r: Int): String = s"""
        s$r AS (SELECT s.i, CAST(sum(s.games * 1000000000 //
              greatest(pi.p + pj.p, 1)) AS BIGINT) AS se3
          FROM sym s JOIN p${r - 1} pi ON s.i = pi.i
            JOIN p${r - 1} pj ON s.j = pj.i
          GROUP BY s.i),
        p$r AS (SELECT t.i, CAST(CASE WHEN se3 IS NULL OR se3 = 0
              THEN 1000000 ELSE wins * 1000000000 // se3 END
            AS BIGINT) AS p
          FROM t LEFT JOIN wt ON t.i = wt.i
            LEFT JOIN s$r ON t.i = s$r.i)"""
        s"""WITH g AS (SELECT user_id, CAST(ts AS DATE) AS day,
            event_type,
            sum(CAST(round(value * 100) AS BIGINT)) AS v
          FROM events GROUP BY 1, 2, 3),
        pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
            CAST(count(*) AS BIGINT) AS games,
            CAST(sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END)
              AS BIGINT) AS wins_a
          FROM g a JOIN g b ON a.user_id = b.user_id AND a.day = b.day
            AND a.event_type < b.event_type
          WHERE a.v <> b.v GROUP BY 1, 2),
        sym AS (SELECT ta AS i, tb AS j, games, wins_a AS w FROM pr
          UNION ALL SELECT tb, ta, games, games - wins_a FROM pr),
        wt AS (SELECT i, CAST(sum(w) AS BIGINT) AS wins,
            CAST(sum(games) AS BIGINT) AS games FROM sym GROUP BY i),
        t AS (SELECT DISTINCT event_type AS i FROM events),
        p0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p FROM t),
        ${(1 to 5).map(round_).mkString(",")}
        SELECT p5.i AS event_type,
          CAST(COALESCE(wt.games, 0) AS BIGINT) AS games,
          CAST(COALESCE(wt.wins, 0) AS BIGINT) AS wins,
          p5.p AS strength_e6,
          CAST(row_number() OVER (ORDER BY p5.p DESC, p5.i)
            AS BIGINT) AS rank
        FROM p5 LEFT JOIN wt ON p5.i = wt.i
        ORDER BY rank"""
      }),

    // KENDALL τ-b (r14) — the concordance-based rank correlation beside
    // q_spearman_corr (Spearman ranks the marginals; Kendall counts pair
    // inversions — the two disagree exactly when the dependence is
    // non-monotone in the tails): do daily click and purchase volumes
    // co-move? Over the zero-filled dense daily (x = clicks, y =
    // purchases) series, concordant/discordant/tied pair counts are
    // exact BIGINTs from the calendar-bounded pair self-join (the
    // q_theil_sen constant: days² never grows with the corpus), and
    // τ-b = (C−D)/√((n0−tx)(n0−ty)) is ONE two-sqrt chain over exact
    // integers rounded once to e6, 0-guarded when either margin is
    // constant. Scale: one map-side day agg; everything downstream is
    // calendar-bounded.
    QDef("q_kendall_tau",
      (s, d) => {
        val daily = events(s, d)
          .select(datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"),
            col("event_type"))
          .groupBy(col("day"))
          .agg(sum((col("event_type") === "click").cast("long")).as("x"),
            sum((col("event_type") === "purchase").cast("long")).as("y"))
        val rng = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val dense = rng
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("y"), lit(0L)).as("y"))
          .localCheckpoint(true) // both sides of the pair self-join
        dense.as("a").join(dense.as("b"), col("a.day") < col("b.day"))
          .agg(count(lit(1)).as("n0"),
            sum(when((col("b.x") > col("a.x") && col("b.y") > col("a.y"))
              || (col("b.x") < col("a.x") && col("b.y") < col("a.y")), 1L)
              .otherwise(0L)).as("nc"),
            sum(when((col("b.x") > col("a.x") && col("b.y") < col("a.y"))
              || (col("b.x") < col("a.x") && col("b.y") > col("a.y")), 1L)
              .otherwise(0L)).as("nd"),
            sum(when(col("b.x") === col("a.x"), 1L).otherwise(0L)).as("tx"),
            sum(when(col("b.y") === col("a.y"), 1L).otherwise(0L)).as("ty"))
          .select(col("n0"), col("nc"), col("nd"), col("tx"), col("ty"),
            expr("""CASE WHEN n0 > tx AND n0 > ty THEN
              CAST(round((nc - nd) * 1000000
                / (sqrt(CAST(n0 - tx AS DOUBLE))
                 * sqrt(CAST(n0 - ty AS DOUBLE))), 0) AS BIGINT)
              ELSE 0 END""").as("tau_e6"))
      },
      Some("""WITH daily AS (SELECT
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
            CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
          FROM events GROUP BY 1),
        rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        dense AS (SELECT g.day, CAST(COALESCE(x, 0) AS BIGINT) AS x,
            CAST(COALESCE(y, 0) AS BIGINT) AS y
          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
          LEFT JOIN daily USING (day)),
        p AS (SELECT CAST(count(*) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN (b.x > a.x AND b.y > a.y)
              OR (b.x < a.x AND b.y < a.y) THEN 1 ELSE 0 END)
              AS BIGINT) AS nc,
            CAST(sum(CASE WHEN (b.x > a.x AND b.y < a.y)
              OR (b.x < a.x AND b.y > a.y) THEN 1 ELSE 0 END)
              AS BIGINT) AS nd,
            CAST(sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END)
              AS BIGINT) AS tx,
            CAST(sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END)
              AS BIGINT) AS ty
          FROM dense a JOIN dense b ON a.day < b.day)
        SELECT n0, nc, nd, tx, ty,
          CASE WHEN n0 > tx AND n0 > ty THEN
            CAST(round((nc - nd) * 1000000
              / (sqrt(CAST(n0 - tx AS DOUBLE))
               * sqrt(CAST(n0 - ty AS DOUBLE))), 0) AS BIGINT)
          ELSE 0 END AS tau_e6
        FROM p""")),

    // FRIEDMAN TEST (r14) — the BLOCKED k-sample rank test completing
    // the nonparametric battery (Kruskal–Wallis pools all observations
    // into one ranking; Friedman ranks WITHIN each block, removing
    // between-day level shifts — the repeated-measures design): per
    // day (block) the k event types are ranked by their exact e2
    // daily value sums (the q_bradley_terry per-day frame), ties by
    // the doubled average-rank identity 2·r̄ = 2·below + c + 1 so
    // every rank sum ×2 is an exact BIGINT with the conservation
    // Σⱼ R2ⱼ = n·k(k+1) built in (spec-asserted). Only days with ALL
    // k types present are kept (balanced blocks — the test's
    // requirement). χ²_F lands on the ppm grid by the cleared-
    // denominator identity χ² = 3(ΣR2² − n²k(k+1)²)/(nk(k+1)) with
    // ONE truncating division (numerator ≥ 0 by Cauchy–Schwarz, so
    // floor-vs-truncate never diverges). Scale: one (day, type)
    // map-side agg; ranks live in per-day windows over k rows each —
    // never a corpus-wide sort; all downstream frames are
    // calendar × |types| bounded.
    QDef("q_friedman",
      (s, d) => {
        val g = events(s, d)
          .select(to_date(col("ts")).as("day"), col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("v0"))
          .groupBy(col("day"), col("event_type"))
          .agg(sum(col("v0")).as("v"))
        val kTot = g.select(col("event_type")).distinct()
          .agg(count(lit(1)).as("k"))
        val fullDays = g.groupBy(col("day")).agg(count(lit(1)).as("kt"))
          .crossJoin(broadcast(kTot)).filter(col("kt") === col("k"))
          .select(col("day"))
        val gg = g.join(fullDays, Seq("day")).localCheckpoint(true)
        val hv = gg.groupBy(col("day"), col("v")).agg(count(lit(1)).as("c"))
        val wIn = Window.partitionBy(col("day")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val r2 = hv
          .withColumn("below", coalesce(sum(col("c")).over(wIn), lit(0L)))
          .select(col("day"), col("v"),
            (col("below") * 2 + col("c") + 1).as("rank2"))
        val st = gg.join(r2, Seq("day", "v"))
          .groupBy(col("event_type"))
          .agg(sum(col("rank2")).as("ranksum2"),
            count(lit(1)).as("n_blocks"))
        val tot = st.agg(count(lit(1)).as("k"),
          max(col("n_blocks")).as("n"),
          sum(col("ranksum2") * col("ranksum2")).as("ss"))
        st.crossJoin(broadcast(tot))
          .select(col("event_type"), col("n_blocks"), col("ranksum2"),
            expr("""greatest((3 * 1000000 *
              (ss - n * n * k * (k + 1) * (k + 1)))
              div greatest(n * k * (k + 1), 1), 0)""").as("chi2_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (SELECT CAST(ts AS DATE) AS day, event_type,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        fd AS (SELECT day FROM g GROUP BY day
          HAVING count(*) = (SELECT count(DISTINCT event_type) FROM g)),
        gg AS (SELECT g.* FROM g JOIN fd USING (day)),
        hv AS (SELECT day, v, CAST(count(*) AS BIGINT) AS c
          FROM gg GROUP BY 1, 2),
        r2 AS (SELECT day, v,
            CAST(2 * COALESCE(sum(c) OVER (PARTITION BY day ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS BIGINT) AS rank2
          FROM hv),
        st AS (SELECT event_type, CAST(sum(rank2) AS BIGINT) AS ranksum2,
            CAST(count(*) AS BIGINT) AS n_blocks
          FROM gg JOIN r2 USING (day, v) GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
            CAST(max(n_blocks) AS BIGINT) AS n,
            CAST(sum(ranksum2 * ranksum2) AS BIGINT) AS ss FROM st)
        SELECT event_type, n_blocks, ranksum2,
          CAST(greatest((3 * 1000000 *
            (ss - n * n * k * (k + 1) * (k + 1)))
            // greatest(n * k * (k + 1), 1), 0) AS BIGINT) AS chi2_ppm
        FROM st CROSS JOIN tot ORDER BY event_type""")),

    // WALD–WOLFOWITZ RUNS TEST (r14) — is the daily event-volume series
    // RANDOM around its median, or does it clump (persistence) /
    // alternate (overdispersion)? The randomness companion of
    // q_mann_kendall (which tests monotone trend; runs catches
    // non-monotone structure trend misses): zero-filled dense daily
    // counts, the lower median by TYPE-1 SELECTION over the bounded
    // calendar frame (rank (n+1)÷2 — selection of an already-computed
    // value, no interpolation), days equal to the median dropped (the
    // standard rule), runs counted by one lag scan ordered by day.
    // z = (R·n − n − 2n₁n₂)·√(n−1)/√(2n₁n₂(2n₁n₂−n)) is the cleared-
    // denominator form of (R−E)/√Var — exact integers into ONE
    // two-sqrt chain rounded once to e6, 0-guarded for degenerate
    // sign splits. Scale: one map-side day agg; the global-order
    // window and lag scan run on the calendar-bounded dense frame
    // (the audited bounded-frame Window.orderBy class), never on
    // events.
    QDef("q_runs_test",
      (s, d) => {
        val daily = events(s, d)
          .select(datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        val rng = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val dense = rng
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
          .localCheckpoint(true) // median selection + the runs scan
        val nF = dense.agg(count(lit(1)).as("n_all"))
        val med = dense.crossJoin(broadcast(nF))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("x"), col("day"))))
          .filter(col("rn") === expr("(n_all + 1) div 2"))
          .select(col("x").as("med"))
        val signs = dense.crossJoin(broadcast(med))
          .filter(col("x") =!= col("med"))
          .select(col("day"), (col("x") > col("med")).cast("long").as("sgn"))
        signs
          .withColumn("prev", lag(col("sgn"), 1).over(
            Window.orderBy(col("day"))))
          .agg(sum(col("sgn")).as("n1"),
            sum(lit(1L) - col("sgn")).as("n2"),
            sum(when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
              .otherwise(0L)).as("runs"))
          .select(col("n1"), col("n2"), col("runs"),
            expr("""CASE WHEN n1 > 0 AND n2 > 0
                AND 2 * n1 * n2 > n1 + n2 THEN
              CAST(round((runs * (n1 + n2) - (n1 + n2) - 2 * n1 * n2)
                * sqrt(CAST(n1 + n2 - 1 AS DOUBLE))
                / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                  * (2 * n1 * n2 - (n1 + n2))) * 1000000, 0) AS BIGINT)
              ELSE 0 END""").as("z_e6"))
      },
      Some("""WITH daily AS (SELECT
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        dense AS (SELECT g.day, CAST(COALESCE(x, 0) AS BIGINT) AS x
          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
          LEFT JOIN daily USING (day)),
        nf AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM dense),
        med AS (SELECT x AS med FROM (SELECT x, row_number()
              OVER (ORDER BY x, day) AS rn FROM dense) CROSS JOIN nf
          WHERE rn = (n_all + 1) // 2),
        signs AS (SELECT day, CAST(x > med AS BIGINT) AS sgn
          FROM dense CROSS JOIN med WHERE x <> med),
        runs AS (SELECT CAST(sum(sgn) AS BIGINT) AS n1,
            CAST(sum(1 - sgn) AS BIGINT) AS n2,
            CAST(sum(CASE WHEN prev IS NULL OR prev <> sgn THEN 1
              ELSE 0 END) AS BIGINT) AS runs
          FROM (SELECT sgn, lag(sgn) OVER (ORDER BY day) AS prev
                FROM signs))
        SELECT n1, n2, runs,
          CASE WHEN n1 > 0 AND n2 > 0 AND 2 * n1 * n2 > n1 + n2 THEN
            CAST(round((runs * (n1 + n2) - (n1 + n2) - 2 * n1 * n2)
              * sqrt(CAST(n1 + n2 - 1 AS DOUBLE))
              / sqrt(CAST(2 * n1 * n2 AS DOUBLE)
                * (2 * n1 * n2 - (n1 + n2))) * 1000000, 0) AS BIGINT)
          ELSE 0 END AS z_e6
        FROM runs""")),

    // PEARSON CORRELATION MATRIX (r14 wave 3) — the full pairwise
    // linear-correlation matrix over the per-type daily count series,
    // completing the correlation family (q_spearman_corr: one rank
    // pair; q_kendall_tau: one concordance pair; q_cross_correlation:
    // one lead/lag pair; this: ALL type pairs at lag 0 — the
    // co-movement matrix a mixture monitor reads): counts on the
    // zero-filled dense calendar are exact integers, so every moment
    // (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT and
    // r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) is ONE two-sqrt
    // chain over exact integers rounded once to e6, 0-guarded for
    // constant series. Scale: one map-side (day, type) agg; the dense
    // grid and the |types|² pair fan are calendar- and domain-bounded.
    QDef("q_pearson_matrix",
      (s, d) => {
        val daily = events(s, d)
          .select(datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"),
            col("event_type"))
          .groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("y"))
        val rng = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val types = daily.select(col("event_type")).distinct()
        val dense = rng
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .crossJoin(broadcast(types))
          .join(daily, Seq("day", "event_type"), "left")
          .select(col("day"), col("event_type"),
            coalesce(col("y"), lit(0L)).as("y"))
          .localCheckpoint(true) // both sides of the pair join
        val a = dense.select(col("day"), col("event_type").as("type_a"),
          col("y").as("x"))
        val b = dense.select(col("day"), col("event_type").as("type_b"),
          col("y").as("yy"))
        a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("yy")).as("sy"), sum(col("x") * col("yy")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("yy") * col("yy")).as("syy"))
          .select(col("type_a"), col("type_b"), col("n"),
            expr("""CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy
              THEN CAST(round((n * sxy - sx * sy) * 1000000
                / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 0)
                AS BIGINT) ELSE 0 END""").as("r_e6"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH daily AS (SELECT
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            event_type, CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        types AS (SELECT DISTINCT event_type FROM daily),
        dense AS (SELECT g.day, t.event_type,
            CAST(COALESCE(daily.y, 0) AS BIGINT) AS y
          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
          CROSS JOIN types t
          LEFT JOIN daily ON daily.day = g.day
            AND daily.event_type = t.event_type),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(a.y) AS BIGINT) AS sx,
            CAST(sum(b.y) AS BIGINT) AS sy,
            CAST(sum(a.y * b.y) AS BIGINT) AS sxy,
            CAST(sum(a.y * a.y) AS BIGINT) AS sxx,
            CAST(sum(b.y * b.y) AS BIGINT) AS syy
          FROM dense a JOIN dense b ON a.day = b.day
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, n,
          CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy
          THEN CAST(round((n * sxy - sx * sy) * 1000000
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 0) AS BIGINT)
          ELSE 0 END AS r_e6
        FROM p ORDER BY type_a, type_b""")),

    // DURBIN–WATSON AUTOCORRELATION OF REGRESSION RESIDUALS (r14
    // wave 3) — the diagnostic that tells you whether the OLS trend
    // fit (q_agg_regression's shape) can be TRUSTED: serially
    // correlated residuals invalidate its standard errors (DW ≈ 2 ⇒
    // independent; → 0 positive; → 4 negative autocorrelation).
    // ENTIRELY integer (class A): for each type's zero-filled daily
    // series, residuals are cleared by the exact OLS denominator
    // D = nΣt² − (Σt)² — e·D = D·y − (Σy·Σt² − Σt·Σty) −
    // (nΣty − ΣtΣy)·t is an exact BIGINT per day, and D² cancels in
    // DW = Σ(Δe)²/Σe², leaving one truncating ppm division over
    // DECIMAL(38)/HUGEINT squares (e·D reaches ~10⁸ on this calendar
    // — the squares need the widening, named here, Long-safe the
    // ratio). Residual-sum ≡ 0 is the spec-pinned exactness
    // certificate. Scale: one map-side (type, day) agg; lag windows
    // partition per type over the bounded calendar.
    QDef("q_durbin_watson",
      (s, d) => {
        val daily = events(s, d)
          .select(col("event_type"), datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("t"))
          .groupBy(col("event_type"), col("t"))
          .agg(count(lit(1)).as("y"))
        val rng = daily.agg(min(col("t")).as("d0"), max(col("t")).as("d1"))
        val types = daily.select(col("event_type")).distinct()
        val dense = rng
          .select(explode(sequence(col("d0"), col("d1"))).as("t"))
          .crossJoin(broadcast(types))
          .join(daily, Seq("event_type", "t"), "left")
          .select(col("event_type"), col("t"),
            coalesce(col("y"), lit(0L)).as("y"))
          .localCheckpoint(true) // moments + the residual scan
        val m = dense.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
            sum(col("t") * col("t")).as("stt"), sum(col("y")).as("sy"),
            sum(col("t") * col("y")).as("sty"))
        val res = dense.join(broadcast(m), "event_type")
          .select(col("event_type"), col("t"),
            expr("""(n * stt - st * st) * y
              - (sy * stt - st * sty) - (n * sty - st * sy) * t""")
              .as("ed"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
        res.withColumn("ed_prev", lag(col("ed"), 1).over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("ed")).as("resid_sum"),
            sum(expr("CAST(ed AS DECIMAL(38,0)) * ed")).as("see"),
            sum(when(col("ed_prev").isNotNull,
              expr("CAST(ed - ed_prev AS DECIMAL(38,0)) * (ed - ed_prev)"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sdd"))
          .select(col("event_type"), col("n_days"), col("resid_sum"),
            expr("CAST(sdd * 1000000 div greatest(see, 1) AS BIGINT)")
              .as("dw_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        rng AS (SELECT min(t) AS d0, max(t) AS d1 FROM daily),
        types AS (SELECT DISTINCT event_type FROM daily),
        dense AS (SELECT t.event_type, g.t,
            CAST(COALESCE(daily.y, 0) AS BIGINT) AS y
          FROM (SELECT unnest(range(d0, d1 + 1)) AS t FROM rng) g
          CROSS JOIN types t
          LEFT JOIN daily ON daily.t = g.t
            AND daily.event_type = t.event_type),
        m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(t) AS BIGINT) AS st,
            CAST(sum(t * t) AS BIGINT) AS stt,
            CAST(sum(y) AS BIGINT) AS sy,
            CAST(sum(t * y) AS BIGINT) AS sty
          FROM dense GROUP BY 1),
        res AS (SELECT dense.event_type, dense.t,
            (n * stt - st * st) * y - (sy * stt - st * sty)
              - (n * sty - st * sy) * dense.t AS ed
          FROM dense JOIN m ON dense.event_type = m.event_type),
        lr AS (SELECT event_type, ed,
            lag(ed) OVER (PARTITION BY event_type ORDER BY t) AS ed_prev
          FROM res),
        agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(ed) AS BIGINT) AS resid_sum,
            sum(CAST(ed AS HUGEINT) * ed) AS see,
            sum(CASE WHEN ed_prev IS NOT NULL
              THEN CAST(ed - ed_prev AS HUGEINT) * (ed - ed_prev)
              ELSE CAST(0 AS HUGEINT) END) AS sdd
          FROM lr GROUP BY 1)
        SELECT event_type, n_days, resid_sum,
          CAST(sdd * 1000000 // greatest(see, 1) AS BIGINT) AS dw_ppm
        FROM agg ORDER BY event_type""")),

    // LJUNG–BOX PORTMANTEAU TEST (r14 wave 5) — are the first m = 7
    // autocorrelations JOINTLY zero? The one-number whiteness verdict
    // over q_acf_daily's per-lag view (Ljung & Box 1978):
    // Q = n(n+2)·Σ r_k²/(n−k) over the zero-filled daily total series.
    // The per-lag r lands on the declared ppm grid first (the same
    // n-cleared num/den integers as q_acf_daily, with num's e6 product
    // DECIMAL(38)/HUGEINT-widened — the Kruskal–Wallis lesson applied
    // PREEMPTIVELY: num alone can pass 10¹⁵ on a skewed corpus and the
    // e6 prescale would wrap Long), then each term
    // (n(n+2)·r_ppm²) div ((n−k)·10⁶) is one exact integer division —
    // the statistic is DECLARED over the ppm-grid ACF, identical in
    // both engines by construction. Scale: one map-side day agg; lag
    // joins and the 7-term sum live on the calendar-bounded frame.
    QDef("q_ljung_box",
      (s, d) => {
        import s.implicits._
        val daily = events(s, d)
          .select(datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        val rng = daily.agg(min(col("day")).as("d0"),
          max(col("day")).as("d1"))
        val dense = rng
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
          .localCheckpoint(true) // both sides of the lag join + stats
        val st = dense.agg(count(lit(1)).as("n"), sum(col("x")).as("ss"))
        val lags = (0L to 7L).toDF("lag")
        val per = dense.as("a").crossJoin(broadcast(lags))
          .join(dense.as("b"), col("b.day") === col("a.day") + col("lag"))
          .crossJoin(broadcast(st))
          .select(col("lag"), col("n"),
            ((col("a.x") * col("n") - col("ss"))
              * (col("b.x") * col("n") - col("ss"))).as("prod"))
          .groupBy(col("lag"), col("n"))
          .agg(sum(col("prod")).as("num"))
          .localCheckpoint(true) // den row + the 7 term rows
        val den = per.filter(col("lag") === 0L)
          .select(col("num").as("den"))
        per.filter(col("lag") >= 1L).crossJoin(broadcast(den))
          .select(col("lag"), col("n"),
            expr("""CAST(CAST(num AS DECIMAL(38,0)) * 1000000
              div greatest(den, 1) AS BIGINT)""").as("r_ppm"))
          .withColumn("term_ppm",
            expr("""(n * (n + 2) * (r_ppm * r_ppm))
              div ((n - lag) * 1000000)"""))
          .groupBy(col("n"))
          .agg(count(lit(1)).as("m"), sum(col("term_ppm")).as("q_lb_ppm"))
          .select(col("n").as("n_days"), col("m"), col("q_lb_ppm"))
      },
      Some("""WITH daily AS (SELECT
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        dense AS (SELECT g.day, CAST(COALESCE(x, 0) AS BIGINT) AS x
          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
          LEFT JOIN daily USING (day)),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS ss FROM dense),
        lags AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS lag),
        p AS (SELECT lag, n,
            CAST(sum((a.x * n - ss) * (b.x * n - ss)) AS BIGINT) AS num
          FROM dense a CROSS JOIN lags
          JOIN dense b ON b.day = a.day + lag
          CROSS JOIN st GROUP BY lag, n),
        dn AS (SELECT num AS den FROM p WHERE lag = 0),
        r AS (SELECT lag, n,
            CAST(CAST(num AS HUGEINT) * 1000000
              // greatest(den, 1) AS BIGINT) AS r_ppm
          FROM p CROSS JOIN dn WHERE lag >= 1)
        SELECT n AS n_days, CAST(count(*) AS BIGINT) AS m,
          CAST(sum((n * (n + 2) * (r_ppm * r_ppm))
            // ((n - lag) * 1000000)) AS BIGINT) AS q_lb_ppm
        FROM r GROUP BY n""")),

    // INDEX OF DISPERSION / FANO FACTOR (r14 wave 5) — is daily volume
    // Poisson (D = 1), clumped (D > 1), or regular (D < 1)? The
    // count-data overdispersion audit beside q_burst_detect's
    // per-window flags: per type over the zero-filled dense daily
    // series, D = s²/x̄ = (nΣx² − S²)/((n−1)·S) — ENTIRELY integer
    // with the e6 product DECIMAL(38)/HUGEINT-widened (nΣx² passes
    // 10¹⁴ at 100× on this calendar; the prescale would wrap Long).
    // The χ² certificate D·(n−1) ships beside it (the classical
    // Poisson dispersion test statistic). Scale: one map-side
    // (type, day) agg; everything after is calendar × |types| bounded.
    QDef("q_dispersion_index",
      (s, d) => {
        val daily = events(s, d)
          .select(col("event_type"), datediff(to_date(col("ts")),
            lit("2024-01-01").cast("date")).cast("long").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("y"))
        val rng = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val types = daily.select(col("event_type")).distinct()
        rng.select(explode(sequence(col("d0"), col("d1"))).as("day"))
          .crossJoin(broadcast(types))
          .join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"),
            coalesce(col("y"), lit(0L)).as("y"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), sum(col("y")).as("n_events"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("event_type"), col("n_days"), col("n_events"),
            expr("(n_events * 100) div n_days").as("mean_e2"),
            expr("""CAST(CAST(n_days * syy - n_events * n_events
              AS DECIMAL(38,0)) * 1000000
              div greatest((n_days - 1) * n_events, 1) AS BIGINT)""")
              .as("dispersion_ppm"))
          .withColumn("chi2_ppm",
            col("dispersion_ppm") * (col("n_days") - 1))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (SELECT event_type,
            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        types AS (SELECT DISTINCT event_type FROM daily),
        dense AS (SELECT t.event_type,
            CAST(COALESCE(daily.y, 0) AS BIGINT) AS y
          FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM rng) g
          CROSS JOIN types t
          LEFT JOIN daily ON daily.day = g.day
            AND daily.event_type = t.event_type),
        st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(y) AS BIGINT) AS n_events,
            CAST(sum(y * y) AS BIGINT) AS syy
          FROM dense GROUP BY 1)
        SELECT event_type, n_days, n_events,
          (n_events * 100) // n_days AS mean_e2,
          CAST(CAST(n_days * syy - n_events * n_events AS HUGEINT)
            * 1000000 // greatest((n_days - 1) * n_events, 1)
            AS BIGINT) AS dispersion_ppm,
          CAST(CAST(n_days * syy - n_events * n_events AS HUGEINT)
            * 1000000 // greatest((n_days - 1) * n_events, 1)
            AS BIGINT) * (n_days - 1) AS chi2_ppm
        FROM st ORDER BY event_type""")),

    // MARKOV-CHAIN ENTROPY RATE (r14 wave 5) — how predictable is the
    // user-journey PROCESS? The sequence-level complement of
    // q_markov_transitions (which publishes the matrix; this scores
    // it): H_rate = −Σᵢⱼ π̂ᵢ·P̂ᵢⱼ·ln P̂ᵢⱼ under the EMPIRICAL state
    // occupancy π̂ᵢ = totᵢ/T (≡ the stationary law of the observed
    // chain as the walk lengthens — declared weighting, no power
    // iteration needed), so πᵢPᵢⱼ = nᵢⱼ/T and every term is one
    // transcendental chain over exact counts with the inner ln
    // 4-dp-quantized (the q_bigram_entropy discipline), pre-rounded
    // to e6 and summed as BIGINTs. Per-state conditional entropies
    // ship beside the rate. Scale: the hop frame is one lead window
    // per user (bounded by a user's history) + a map-side pair agg;
    // everything after lives on the |types|² grid.
    QDef("q_markov_entropy_rate",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val hops = events(s, d)
          .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // totals + the two term sums
        val totals = hops.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
        val tAll = totals.agg(sum(col("tot")).as("tt"))
        val terms = hops.join(totals, "from_type")
          .crossJoin(broadcast(tAll))
          .select(col("from_type"), col("tot"), col("tt"),
            expr("""CAST(round((n / (tot * 1.0))
              * round(ln(n / (tot * 1.0)), 4) * 1000000, 0)
              AS BIGINT)""").as("tc"),
            expr("""CAST(round((n / (tt * 1.0))
              * round(ln(n / (tot * 1.0)), 4) * 1000000, 0)
              AS BIGINT)""").as("tr"))
        val hRate = terms.agg((-sum(col("tr"))).as("h_rate_e6"))
        terms.groupBy(col("from_type"), col("tot"), col("tt"))
          .agg((-sum(col("tc"))).as("h_cond_e6"))
          .crossJoin(broadcast(hRate))
          .select(col("from_type"), col("tot"),
            expr("(tot * 1000000) div tt").as("pi_ppm"),
            col("h_cond_e6"), col("h_rate_e6"))
          .orderBy(col("from_type"))
      },
      Some("""WITH hops AS (SELECT from_type, to_type,
            CAST(count(*) AS BIGINT) AS n
          FROM (SELECT event_type AS from_type,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS to_type
            FROM events)
          WHERE to_type IS NOT NULL GROUP BY 1, 2),
        totals AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
          FROM hops GROUP BY 1),
        ta AS (SELECT CAST(sum(tot) AS BIGINT) AS tt FROM totals),
        terms AS (SELECT h.from_type, t.tot, ta.tt,
            CAST(round((n / (tot * 1.0))
              * round(ln(n / (tot * 1.0)), 4) * 1000000, 0)
              AS BIGINT) AS tc,
            CAST(round((n / (tt * 1.0))
              * round(ln(n / (tot * 1.0)), 4) * 1000000, 0)
              AS BIGINT) AS tr
          FROM hops h JOIN totals t USING (from_type) CROSS JOIN ta),
        hr AS (SELECT CAST(0 - sum(tr) AS BIGINT) AS h_rate_e6
          FROM terms)
        SELECT from_type, tot, (tot * 1000000) // tt AS pi_ppm,
          CAST(0 - sum(tc) AS BIGINT) AS h_cond_e6, hr.h_rate_e6
        FROM terms CROSS JOIN hr
        GROUP BY from_type, tot, tt, hr.h_rate_e6
        ORDER BY from_type""")),

    // MINIMUM DETECTABLE EFFECT / POWER AUDIT (r14 wave 5) — the
    // experiment-design number the A/B battery lacks: for every type
    // pair, the smallest mean difference this sample could detect at
    // α = 5% two-sided with 80% power, MDE = 2.801585·SE_Welch
    // (z_{0.975} + z_{0.8} as ONE builder-time literal in both engine
    // texts — the Benford constant-table pattern), against the
    // observed difference; powered = |Δ̂| ≥ MDE on the e6 grid (both
    // sides rounded once, integer compare — no float boundary).
    // Reuses q_welch_ttest's decimal-exact (n, Σv, Σv²) moment frame.
    // Scale: one map-side moment agg; the pair fan is |types|²-bounded.
    QDef("q_mde_power",
      (s, d) => {
        val Dec = org.apache.spark.sql.types.DecimalType(30, 6)
        val m = events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(Dec)).as("sv"),
            sum((col("value") * col("value")).cast(Dec)).as("svv"))
          .localCheckpoint(true) // both sides of the pair cross
        val a = m.select(col("event_type").as("type_a"), col("n").as("n_a"),
          col("sv").as("sv_a"), col("svv").as("svv_a"))
        val b = m.select(col("event_type").as("type_b"), col("n").as("n_b"),
          col("sv").as("sv_b"), col("svv").as("svv_b"))
        a.join(broadcast(b), col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
            expr("""CAST(round((CAST(sv_a AS DOUBLE) / n_a
              - CAST(sv_b AS DOUBLE) / n_b) * 1000000, 0) AS BIGINT)""")
              .as("diff_e6"),
            expr("""CAST(round(2.801585 * sqrt(
                (CAST(svv_a AS DOUBLE)
                  - CAST(sv_a AS DOUBLE) * CAST(sv_a AS DOUBLE) / n_a)
                  / (n_a - 1) / n_a
              + (CAST(svv_b AS DOUBLE)
                  - CAST(sv_b AS DOUBLE) * CAST(sv_b AS DOUBLE) / n_b)
                  / (n_b - 1) / n_b) * 1000000, 0) AS BIGINT)""")
              .as("mde_e6"))
          .withColumn("powered",
            (abs(col("diff_e6")) >= col("mde_e6")).cast("long"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(value AS DECIMAL(30,6))) AS sv,
            sum(CAST(value * value AS DECIMAL(30,6))) AS svv
          FROM events GROUP BY event_type)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
          a.n AS n_a, b.n AS n_b,
          CAST(round((CAST(a.sv AS DOUBLE) / a.n
            - CAST(b.sv AS DOUBLE) / b.n) * 1000000, 0) AS BIGINT)
            AS diff_e6,
          CAST(round(2.801585 * sqrt(
              (CAST(a.svv AS DOUBLE)
                - CAST(a.sv AS DOUBLE) * CAST(a.sv AS DOUBLE) / a.n)
                / (a.n - 1) / a.n
            + (CAST(b.svv AS DOUBLE)
                - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE) / b.n)
                / (b.n - 1) / b.n) * 1000000, 0) AS BIGINT) AS mde_e6,
          CAST(abs(CAST(round((CAST(a.sv AS DOUBLE) / a.n
            - CAST(b.sv AS DOUBLE) / b.n) * 1000000, 0) AS BIGINT))
            >= CAST(round(2.801585 * sqrt(
              (CAST(a.svv AS DOUBLE)
                - CAST(a.sv AS DOUBLE) * CAST(a.sv AS DOUBLE) / a.n)
                / (a.n - 1) / a.n
            + (CAST(b.svv AS DOUBLE)
                - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE) / b.n)
                / (b.n - 1) / b.n) * 1000000, 0) AS BIGINT)
            AS BIGINT) AS powered
        FROM m a JOIN m b ON a.event_type < b.event_type
        ORDER BY type_a, type_b"""))
  )
}
