package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables._
import Q._

/** Window-function surface: ranking, top-k per group, lag/lead, running and
  * sliding frames, ntile/percent_rank/cume_dist, first/last/nth value.
  *
  * Every window ORDER BY includes a unique tiebreaker (o_orderkey), so
  * results are total-ordered and deterministic cross-engine. Running sums
  * use the exact-decimal trick from [[Q]]. At scale each window is one
  * shuffle on partitionBy keys; no global single-partition windows except
  * q_window_ntile (explicitly global, small output).
  */
object Windows {

  private val dec = DecimalType(30, 6)

  val all: Seq[QDef] = Seq(

    QDef("q_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rnk"), col("drnk"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rnk, drnk, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(rank() OVER w AS INT) AS rnk,
            CAST(dense_rank() OVER w AS INT) AS drnk,
            CAST(row_number() OVER w AS INT) AS rn
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        WHERE rn <= 5 ORDER BY o_custkey, rn""")),

    QDef("q_window_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
            col("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("rn"))
      },
      Some("""SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
            CAST(row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey)
        WHERE rn <= 3 ORDER BY c_mktsegment, rn""")),

    QDef("q_window_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("od"),
            col("o_totalprice"),
            round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
            round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
            round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("delta"))
          .orderBy(col("o_custkey"), col("od"), col("o_orderkey"))
          .limit(600)
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
          o_totalprice,
          round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
          round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
          round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, od, o_orderkey LIMIT 600""")),

    // Running (cumulative) sum/count — exact decimal accumulation.
    QDef("q_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("run_total"),
            count(lit(1)).over(w).as("run_n"))
          .orderBy(col("o_custkey"), col("run_n"))
          .limit(600)
      },
      Some("""SELECT o_custkey, o_orderkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) AS run_total,
          count(*) OVER w AS run_n
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, run_n LIMIT 600""")),

    // Sliding frame: 3-row moving average as exact sum / count.
    QDef("q_window_sliding_avg",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice").cast(dec)).over(w).cast("double") /
              count(lit(1)).over(w), 4).as("mov_avg3"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
          .limit(600)
      },
      Some("""SELECT o_custkey, o_orderkey,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
                / count(*) OVER w, 4) AS mov_avg3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey LIMIT 600""")),

    // Global ranking distribution functions (single partition by design —
    // output bounded; at scale use bucketed percent_rank via agg instead).
    QDef("q_window_ntile",
      (s, d) => {
        val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d).filter(col("o_totalprice") > 250000.0)
          .select(col("o_orderkey"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          round(percent_rank() OVER w, 6) AS pr,
          round(cume_dist() OVER w, 6) AS cd
        FROM orders WHERE o_totalprice > 250000.0
        WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey""")),

    QDef("q_window_first_last",
      (s, d) => {
        val wOrd = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_totalprice")).over(wFull).as("first_price"),
            last(col("o_totalprice")).over(wFull).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
          .limit(600)
      },
      Some("""SELECT o_custkey, o_orderkey,
          first_value(o_totalprice) OVER w AS first_price,
          last_value(o_totalprice) OVER w AS last_price,
          nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey LIMIT 600""")),

    // Relative-position ranking: percent_rank ((rank−1)/(n−1)) and
    // cume_dist (peers ≤ current / n). The (price, orderkey) ordering is
    // unique, so both are exact rationals evaluated identically as
    // doubles in either engine; round(6) guards the formatting edge.
    QDef("q_window_percent_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        orders(s, d)
          .select(col("o_orderpriority"), col("o_orderkey"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
          .limit(2000)
      },
      Some("""SELECT o_orderpriority, o_orderkey,
          round(percent_rank() OVER w, 6) AS pr,
          round(cume_dist() OVER w, 6) AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderpriority, o_orderkey LIMIT 2000""")),

    // The SCALE-SAFE twin of q_window_percent_rank. The window form above
    // partitions on o_orderpriority — 5 distinct values, so at 100 TB the
    // whole table sorts on 5 tasks. This formulation is the bucketed-CDF
    // rewrite: value-bucket the sort key (price/10k ⇒ ~60 buckets), count
    // per (priority, bucket) with an ordinary hash agg, turn counts into
    // cumulative offsets with a window over the TINY counts table
    // (5×60 rows), then rank only WITHIN each (priority, bucket) — a
    // high-cardinality partitioning whose per-task sort is bounded by the
    // bucket width (add buckets to shrink it at will). rank = offset +
    // local row_number; the (price, orderkey) ordering is unique, so
    // percent_rank = (rank−1)/(n−1) and cume_dist = rank/n exactly.
    // Oracle: the EXACT SAME window SQL as q_window_percent_rank — the
    // rewrite must be result-identical to the window form.
    QDef("q_window_percent_rank_bucketed",
      (s, d) => {
        val o = orders(s, d).select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"),
          floor(col("o_totalprice") / 10000).cast("long").as("b"))
        val counts = o.groupBy(col("o_orderpriority"), col("b"))
          .agg(count(lit(1)).as("cnt"))
        val wOff = Window.partitionBy(col("o_orderpriority")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wTot = Window.partitionBy(col("o_orderpriority"))
        val offsets = counts.select(col("o_orderpriority"), col("b"),
          coalesce(sum(col("cnt")).over(wOff), lit(0L)).as("off"),
          sum(col("cnt")).over(wTot).as("n"))
        val wLocal = Window.partitionBy(col("o_orderpriority"), col("b"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.join(broadcast(offsets), Seq("o_orderpriority", "b"))
          .select(col("o_orderpriority"), col("o_orderkey"), col("n"),
            (col("off") + row_number().over(wLocal)).as("rnk"))
          .select(col("o_orderpriority"), col("o_orderkey"),
            round((col("rnk") - 1).cast("double") / (col("n") - 1), 6).as("pr"),
            round(col("rnk").cast("double") / col("n"), 6).as("cd"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
          .limit(2000)
      },
      Some("""SELECT o_orderpriority, o_orderkey,
          round(percent_rank() OVER w, 6) AS pr,
          round(cume_dist() OVER w, 6) AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderpriority, o_orderkey LIMIT 2000""")),

    // The SCALE-SAFE twin of q_window_ntile's GLOBAL window: same
    // bucketed-CDF rewrite as q_window_percent_rank_bucketed, but with no
    // partition key at all — the window form sorts the whole input on ONE
    // task. Global rank = cumulative bucket offset + within-bucket
    // row_number (price buckets ordered descending to match the DESC
    // ranking); ntile is then pure integer arithmetic on that rank: with
    // n rows in k tiles, the first n%k tiles take ⌈n/k⌉ rows, so
    // tile(r) = (r−1)/(q+1)+1 below the split point and
    // rem + (r−1−rem·(q+1))/q + 1 above it (q = n/k, rem = n%k) — exact,
    // no doubles. Oracle: the EXACT SAME window SQL as q_window_ntile.
    QDef("q_window_ntile_bucketed",
      (s, d) => {
        val k = 4
        val o = orders(s, d).filter(col("o_totalprice") > 250000.0)
          .select(col("o_orderkey"), col("o_totalprice"),
            floor(col("o_totalprice") / 10000).cast("long").as("b"))
        val counts = o.groupBy(col("b")).agg(count(lit(1)).as("cnt"))
        val wOff = Window.orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = counts.select(col("b"),
          coalesce(sum(col("cnt")).over(wOff), lit(0L)).as("off"),
          sum(col("cnt")).over(Window.partitionBy()).as("n"))
        val wLocal = Window.partitionBy(col("b"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val q = (col("n") / k).cast("long")
        val rem = col("n") % k
        val split = rem * (q + 1)
        val rnk = col("off") + row_number().over(wLocal)
        o.join(broadcast(offsets), Seq("b"))
          .select(col("o_orderkey"), col("n"),
            when(rnk <= split, ((rnk - 1) / (q + 1)).cast("long") + 1)
              .otherwise(rem + ((rnk - 1 - split) / q).cast("long") + 1)
              .as("rnk_tile"),
            rnk.as("rnk"))
          .select(col("o_orderkey"),
            col("rnk_tile").cast("int").as("quartile"),
            round((col("rnk") - 1).cast("double") / (col("n") - 1), 6).as("pr"),
            round(col("rnk").cast("double") / col("n"), 6).as("cd"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          round(percent_rank() OVER w, 6) AS pr,
          round(cume_dist() OVER w, 6) AS cd
        FROM orders WHERE o_totalprice > 250000.0
        WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey""")),

    // Sliding DISTINCT count: variety of event types inside each user's
    // trailing-5-event frame — the semantic Spark's window aggs don't
    // offer natively (COUNT(DISTINCT ...) OVER is unsupported), so the
    // engine side states it as size(collect_set() OVER frame), which
    // Catalyst executes with per-frame set state; DuckDB writes the
    // intent directly. Integer output under a (ts, event_id) total
    // order — deterministic in both engines.
    QDef("q_window_distinct_sliding",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-4, 0)
        graft.tables.Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            size(collect_set(col("event_type")).over(w))
              .as("distinct_types_5"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          count(DISTINCT event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS distinct_types_5
        FROM events
        ORDER BY user_id, ts_us, event_id"""))
  )
}
