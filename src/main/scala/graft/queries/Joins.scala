package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Join surface: broadcast/shuffle equi-joins, all outer variants,
  * semi/anti, range (non-equi), theta self-join, cross, as-of, and a
  * 6-table star join.
  *
  * Scale notes: dimension tables (region/nation/supplier/part/customer)
  * are broadcast — no shuffle of the fact table for those joins. The
  * fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  * aggregate on the same key where possible. AQE handles skew at runtime.
  */
object Joins {

  /** DuckDB mirror of [[skewProfileFrame]]: CTEs `keyed` through `prof`
    * (profile, n_rows, n_keys, max_sz, p50_sz, p99_sz, skew_ppm,
    * verdict) — shared by the q_skew_profile and q_skew_routed oracles
    * so the rule cannot drift from its dispatcher. */
  private val skewProfileCte: String =
    """keyed AS (
          SELECT 'natural_user_id' AS profile, user_id AS k FROM events
          UNION ALL
          SELECT 'click_rerouted' AS profile,
            CASE WHEN event_type = 'click' THEN 1 ELSE user_id END AS k
          FROM events),
        hist AS (SELECT profile, sz, CAST(count(*) AS BIGINT) AS m
          FROM (SELECT profile, k, CAST(count(*) AS BIGINT) AS sz
            FROM keyed GROUP BY profile, k)
          GROUP BY profile, sz),
        tot AS (SELECT profile, CAST(sum(m) AS BIGINT) AS n_keys,
            CAST(sum(sz * m) AS BIGINT) AS n_rows,
            CAST(max(sz) AS BIGINT) AS max_sz
          FROM hist GROUP BY profile),
        cum AS (SELECT h.profile, h.sz,
            CAST(sum(m) OVER (PARTITION BY h.profile ORDER BY h.sz
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
            t.n_keys
          FROM hist h JOIN tot t ON h.profile = t.profile),
        p50 AS (SELECT profile, CAST(min(sz) AS BIGINT) AS p50_sz
          FROM cum WHERE cum * 2 >= n_keys GROUP BY profile),
        p99 AS (SELECT profile, CAST(min(sz) AS BIGINT) AS p99_sz
          FROM cum WHERE cum * 100 >= n_keys * 99 GROUP BY profile),
        prof AS (SELECT t.profile, n_rows, n_keys, max_sz, p50_sz, p99_sz,
            CAST(CAST(max_sz AS HUGEINT) * n_keys * 1000000 // n_rows
              AS BIGINT) AS skew_ppm,
            CASE WHEN CAST(max_sz AS HUGEINT) * n_keys * 1000000 // n_rows
                >= 10000000 THEN 'salt_hot_keys'
              WHEN n_keys <= 1024 THEN 'broadcast_keys'
              ELSE 'plain_shuffle' END AS verdict
          FROM tot t JOIN p50 USING (profile) JOIN p99 USING (profile))"""

  /** Shared body of q_skew_profile / q_skew_routed: the per-regime key
    * profile (size histogram, exact quantiles, ppm skew) and the declared
    * integer verdict rule. One map-side-combinable (profile, key) agg +
    * histogram windows on the bounded size frame. */
  private def skewProfileFrame(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val keyed = ev.select(lit("natural_user_id").as("profile"),
        col("user_id").as("k"))
      .unionAll(ev.select(lit("click_rerouted").as("profile"),
        when(col("event_type") === "click", lit(1L))
          .otherwise(col("user_id")).as("k")))
    val hist = keyed.groupBy(col("profile"), col("k"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("profile"), col("sz"))
      .agg(count(lit(1)).as("m"))
      .localCheckpoint(true) // totals + both quantile probes read it
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("profile")).orderBy(col("sz"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = hist.groupBy(col("profile"))
      .agg(sum(col("m")).as("n_keys"),
        sum(col("sz") * col("m")).as("n_rows"),
        max(col("sz")).as("max_sz"))
    val cum = hist.withColumn("cum", sum(col("m")).over(wCum))
      .join(broadcast(tot), Seq("profile"))
    val p50 = cum.filter(col("cum") * 2 >= col("n_keys"))
      .groupBy(col("profile")).agg(min(col("sz")).as("p50_sz"))
    val p99 = cum.filter(col("cum") * 100 >= col("n_keys") * 99)
      .groupBy(col("profile")).agg(min(col("sz")).as("p99_sz"))
    tot.join(broadcast(p50), Seq("profile"))
      .join(broadcast(p99), Seq("profile"))
      .withColumn("skew_ppm",
        expr("CAST(max_sz AS DECIMAL(38,0)) * n_keys * 1000000" +
          " div n_rows"))
      .withColumn("verdict",
        when(col("skew_ppm") >= 10000000L, lit("salt_hot_keys"))
          .when(col("n_keys") <= 1024L, lit("broadcast_keys"))
          .otherwise(lit("plain_shuffle")))
      .select(col("profile"), col("n_rows"), col("n_keys"),
        col("max_sz"), col("p50_sz"), col("p99_sz"),
        col("skew_ppm"), col("verdict"))
  }

  val all: Seq[QDef] = Seq(

    // Broadcast hash join: fact ⋈ small dim, no fact shuffle for the join.
    QDef("q_join_broadcast",
      (s, d) => lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand")),
      Some(s"""SELECT p_brand,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue, count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    // Sort-merge join between the two big tables (hinted; at scale both
    // sides shuffle-sort on orderkey once).
    QDef("q_join_shuffle",
      (s, d) => lineitem(s, d)
        .join(orders(s, d).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority, count(*) AS n_lines,
        count(DISTINCT o_orderkey) AS n_orders,
        ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // TPC-H Q3-style: 3-way join, grouped revenue, top 10. Revenue is an
    // exact decimal sum, so DESC ordering is deterministic cross-engine.
    QDef("q3_shipping_priority",
      (s, d) => customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")
          && col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        o_orderpriority,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // TPC-H Q5-style 6-table star join; dims broadcast, one fact shuffle.
    QDef("q5_local_supplier",
      (s, d) => {
        val c = customer(s, d); val o = orders(s, d); val l = lineitem(s, d)
        val su = supplier(s, d); val n = nation(s, d); val r = region(s, d)
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA"
            && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
        count(*) AS n_lines
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // TPC-H Q10-style: revenue lost to returned items per customer, top 20.
    QDef("q10_returned_items",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("l_returnflag") === "R"
          && col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some(s"""SELECT c_custkey, c_name, n_name,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
        count(*) AS n_items
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // TPC-H Q14-style: promo revenue share in a window — conditional
    // aggregate ratio from exact sums (deterministic double division).
    QDef("q14_promo_share",
      (s, d) => lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .agg(
          (lit(100.0) * dsum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0)))
            / dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("promo_share"),
          count(lit(1)).as("n"))
        .select(round(col("promo_share"), 6).as("promo_share"), col("n")),
      Some(s"""SELECT round(100.0 *
          ${sqlDsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
          / ${sqlDsum("l_extendedprice * (1 - l_discount)")}, 6) AS promo_share,
        count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""")),

    // Left outer + aggregate: customers keep their row even with no orders.
    QDef("q_join_left_outer",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey")),
      Some(s"""SELECT c_custkey, c_mktsegment,
        count(o_orderkey) AS n_orders,
        coalesce(${sqlDsum("o_totalprice")}, 0.0) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""")),

    // Full outer join with nulls on both sides; explicit NULLS FIRST to
    // pin cross-engine sort order of null keys.
    QDef("q_join_full_outer",
      (s, d) => customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
        .join(orders(s, d).filter(col("o_totalprice") > 280000.0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey")),
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
        FULL OUTER JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                         WHERE o_totalprice > 280000.0) o
        ON c_custkey = o_custkey
        ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    // Right outer: the filtered orders side keeps every customer row —
    // completing the outer-join family (left/full already declared).
    // NULLS FIRST pinned like q_join_full_outer.
    QDef("q_join_right_outer",
      (s, d) => orders(s, d).filter(col("o_totalprice") > 280000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .join(customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"), "right_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey")),
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_totalprice > 280000.0) o
        RIGHT OUTER JOIN (SELECT c_custkey, c_name FROM customer
                          WHERE c_mktsegment = 'MACHINERY') c
        ON o_custkey = c_custkey
        ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""")),

    // Left semi: orders having at least one heavy line (EXISTS).
    QDef("q_join_semi",
      (s, d) => orders(s, d)
        .join(lineitem(s, d).filter(col("l_quantity") >= 49.0),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .limit(500),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        ORDER BY o_orderkey LIMIT 500""")),

    // Left anti: customers with no high-value orders (NOT EXISTS).
    QDef("q_join_anti",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 250000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment
        FROM customer WHERE NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        ORDER BY c_custkey""")),

    // Equi + range predicate: lines shipped more than 60 days after the
    // order date. The equi key keeps this a hash/merge join with the range
    // clause as a post-join filter — no BNLJ at scale.
    QDef("q_join_range",
      (s, d) => lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_late"), dsum(col("l_quantity")).as("late_qty"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority, count(*) AS n_late,
        ${sqlDsum("l_quantity")} AS late_qty
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Pure theta self-join (inequality only) on the small supplier dim.
    QDef("q_join_theta_self",
      (s, d) => {
        val a = supplier(s, d).select(col("s_suppkey").as("a_key"),
          col("s_acctbal").as("a_bal"), col("s_nationkey").as("a_nat"))
        val b = supplier(s, d).select(col("s_suppkey").as("b_key"),
          col("s_acctbal").as("b_bal"), col("s_nationkey").as("b_nat"))
        a.join(b, col("a_bal") < col("b_bal") && col("a_nat") =!= col("b_nat"))
          .select(col("a_key"), col("b_key"),
            round(col("b_bal") - col("a_bal"), 2).as("bal_gap"))
          .orderBy(col("a_key"), col("b_key"))
      },
      Some("""SELECT a.s_suppkey AS a_key, b.s_suppkey AS b_key,
        round(b.s_acctbal - a.s_acctbal, 2) AS bal_gap
        FROM supplier a JOIN supplier b
          ON a.s_acctbal < b.s_acctbal AND a.s_nationkey <> b.s_nationkey
        ORDER BY a_key, b_key""")),

    QDef("q_join_cross",
      (s, d) => region(s, d).crossJoin(nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name""")),

    // As-of join: each purchase event paired with that user's most recent
    // click strictly before it. Spark: ranked join (window over the match
    // set); DuckDB: native ASOF JOIN. At scale the join is equi on user_id
    // + time-bucketed; here the per-user match set is small.
    QDef("q_join_asof",
      (s, d) => {
        val e = events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"), col("value").as("c_value"))
        import org.apache.spark.sql.expressions.Window
        // event_id tiebreak — a TOTAL order: two clicks at the identical
        // µs timestamp would otherwise pick an engine-dependent winner
        // (DuckDB's native ASOF JOIN returns an arbitrary row among
        // equal-timestamp candidates, so the oracle spells out the same
        // tiebreak instead of relying on timestamp uniqueness).
        val w = Window.partitionBy(col("p_id"))
          .orderBy(col("c_ts").desc, col("c_id").desc)
        p.join(c, col("user_id") === col("c_user") && col("c_ts") < col("p_ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("p_id"), col("user_id"),
            unix_micros(col("p_ts")).as("p_us"),
            unix_micros(col("c_ts")).as("click_us"),
            round(col("c_value"), 4).as("click_value"))
          .orderBy(col("p_id"))
      },
      Some("""WITH cand AS (
          SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
            c.ts AS c_ts, c.value AS c_value,
            row_number() OVER (PARTITION BY p.event_id
              ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'click') c
            ON p.user_id = c.user_id AND c.ts < p.ts)
        SELECT p_id, user_id, epoch_us(p_ts) AS p_us,
          epoch_us(c_ts) AS click_us, round(c_value, 4) AS click_value
        FROM cand WHERE rn = 1 ORDER BY p_id""")),

    // FORWARD as-of join (pandas merge_asof direction='forward'): each
    // purchase pairs with the EARLIEST click at-or-after it — "next
    // follow-up after conversion". Same rank-over-candidates shape with
    // the order flipped; DuckDB's ASOF JOIN expresses it with p.ts <=
    // c.ts (nearest on the >= side).
    QDef("q_join_asof_forward",
      (s, d) => {
        val e = events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"), col("value").as("c_value"))
        import org.apache.spark.sql.expressions.Window
        // event_id tiebreak, same rationale as q_join_asof above
        val w = Window.partitionBy(col("p_id"))
          .orderBy(col("c_ts").asc, col("c_id").asc)
        p.join(c, col("user_id") === col("c_user") && col("c_ts") >= col("p_ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("p_id"), col("user_id"),
            unix_micros(col("p_ts")).as("p_us"),
            unix_micros(col("c_ts")).as("next_click_us"),
            round(col("c_value"), 4).as("next_click_value"))
          .orderBy(col("p_id"))
      },
      Some("""WITH cand AS (
          SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
            c.ts AS c_ts, c.value AS c_value,
            row_number() OVER (PARTITION BY p.event_id
              ORDER BY c.ts ASC, c.event_id ASC) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'click') c
            ON p.user_id = c.user_id AND c.ts >= p.ts)
        SELECT p_id, user_id, epoch_us(p_ts) AS p_us,
          epoch_us(c_ts) AS next_click_us,
          round(c_value, 4) AS next_click_value
        FROM cand WHERE rn = 1 ORDER BY p_id""")),

    // Left-outer as-of on the native plan node: purchases with no prior
    // click survive with NULL click columns (oracle: ASOF LEFT JOIN).
    QDef("q_join_asof_outer",
      (s, d) => {
        val e = events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"))
        graft.operators.Joins.asofNative(p, c, Seq("user_id"), "p_ts", "c_ts",
            outer = true)
          .select(col("p_id"), col("user_id"),
            unix_micros(col("c_ts")).as("click_us"),
            col("c_ts").isNull.cast("long").as("no_click"))
          .orderBy(col("p_id"))
      },
      Some("""SELECT p.event_id AS p_id, p.user_id,
        epoch_us(c.ts) AS click_us,
        CAST(c.ts IS NULL AS BIGINT) AS no_click
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
        ORDER BY p_id""")),

    // Same as-of semantics on the native plan node (AsOfJoinExec sorted
    // merge — SURVEY §7.2 extension path (c)); checked against DuckDB's
    // native ASOF JOIN.
    QDef("q_join_asof_native",
      (s, d) => {
        val e = events(s, d)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_value"))
        graft.operators.Joins.asofNative(p, c, Seq("user_id"), "p_ts", "c_ts")
          .select(col("p_id"), col("user_id"),
            unix_micros(col("p_ts")).as("p_us"),
            unix_micros(col("c_ts")).as("click_us"),
            round(col("c_value"), 4).as("click_value"))
          .orderBy(col("p_id"))
      },
      Some("""SELECT p.event_id AS p_id, p.user_id,
        epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS click_us,
        round(c.value, 4) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
        ORDER BY p_id""")),

    // Salted skew join: every 'click' event is rerouted to customer 1,
    // manufacturing a hot key that owns ~20% of the fact table — the
    // shape where a plain shuffle join puts one reducer on the critical
    // path. saltedEquiJoin scatters the hot key over 8 sub-keys (left
    // scattered, right replicated ×8), so the oracle is simply the
    // UNSALTED join: salting must be result-invariant. The dim side
    // carries a shuffle_hash hint: left unhinted, Spark broadcasts the
    // small dim and no reducer hot-spot exists to mitigate — the hint
    // keeps the declared query on the shuffle path salting exists for
    // (at 100 TB the right side is a fact table and arrives there on its
    // own). Plan (Generate ×salt fan-out, shuffle join keyed on k+salt)
    // pinned in JoinsSpec.
    QDef("q_join_skew_salted",
      (s, d) => {
        val ev = events(s, d)
          .select(when(col("event_type") === "click", lit(1L))
              .otherwise(col("user_id")).as("k"),
            col("value"))
        val cust = customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment"))
        graft.operators.Joins.saltedEquiJoin(ev, cust.hint("shuffle_hash"), "k", salt = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n, ${sqlDsum("value")} AS sv
        FROM (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE user_id END AS k,
                     value FROM events) e
        JOIN (SELECT c_custkey AS k, c_mktsegment FROM customer) c USING (k)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // JOIN-KEY SKEW PROFILER — the decision operator in front of the
    // two mitigations above (the q_dup_profile pattern: TUNING's
    // measured skew guidance as a runnable router): per key, group
    // sizes → a size HISTOGRAM (bounded by distinct sizes, never the
    // corpus), exact p50/p99 by type-1 selection over the cumulative
    // histogram, skew = max/mean cleared to ppm via DECIMAL(38)
    // cross-multiplication, and the declared integer verdict rule —
    // skew ≥ 10× mean → salt_hot_keys (q_join_skew_salted /
    // q_join_skew_aqe); ≤ 1024 keys → broadcast_keys; else
    // plain_shuffle. Profiled over BOTH key regimes in one unioned
    // scan: the natural user_id key and the same manufactured
    // click-rerouted hot key the mitigation queries use — so the rule
    // provably flips on the input it exists to detect. Scale: one
    // map-side-combinable (profile, key) agg + histogram windows on
    // the bounded size frame. Replay + rule assertions in JoinsSpec.
    QDef("q_skew_profile",
      (s, d) => skewProfileFrame(s, d).orderBy(col("profile")),
      Some(s"""WITH $skewProfileCte
        SELECT profile, n_rows, n_keys, max_sz, p50_sz, p99_sz,
          skew_ppm, verdict
        FROM prof ORDER BY profile""")),

    // SKEW-ROUTER ROUND TRIP (r12 directive 6) — the profiler's verdict
    // actually DISPATCHES: for each key regime, compute the declared
    // verdict with the SHARED skewProfileFrame machinery and execute the
    // join in the form it picks (salt_hot_keys → saltedEquiJoin ×8;
    // broadcast_keys → broadcast dim; plain_shuffle → shuffle join).
    // The profile agg is fully distributed; only the 2-row (profile,
    // verdict) frame crosses to the driver to choose each physical form
    // — the same runtime-stats→plan bridge AQE performs, made explicit
    // and declared. The chosen form rides the output as a column, so
    // the gate verifies the ROUTING DECISION and the join result in one
    // hash; all three forms are result-invariant by construction (the
    // mitigation queries' own oracles prove each against the plain
    // join), which is what makes the router safe to ship. Plan-switch
    // assertions (salt fan vs broadcast vs shuffle) in JoinsSpec.
    QDef("q_skew_routed",
      (s, d) => {
        val verdicts = skewProfileFrame(s, d)
          .select(col("profile"), col("verdict"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val ev = events(s, d)
        def keyed(p: String) = ev.select(
          (if (p == "click_rerouted")
            when(col("event_type") === "click", lit(1L))
              .otherwise(col("user_id"))
          else col("user_id")).as("k"), col("value"))
        val cust = customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment"))
        def routed(p: String): DataFrame = verdicts(p) match {
          case "salt_hot_keys" => graft.operators.Joins
            .saltedEquiJoin(keyed(p), cust.hint("shuffle_hash"), "k",
              salt = 8)
          case "broadcast_keys" => keyed(p).join(broadcast(cust), "k")
          case _ => keyed(p).join(cust.hint("shuffle_hash"), "k")
        }
        Seq("click_rerouted", "natural_user_id").map { p =>
          routed(p).groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
            .select(lit(p).as("profile"), lit(verdicts(p)).as("verdict"),
              col("c_mktsegment"), col("n"), col("sv"))
        }.reduce(_ unionAll _)
          .orderBy(col("profile"), col("c_mktsegment"))
      },
      Some(s"""WITH $skewProfileCte,
        ev AS (SELECT 'natural_user_id' AS profile, user_id AS k, value
            FROM events
          UNION ALL
          SELECT 'click_rerouted' AS profile,
            CASE WHEN event_type = 'click' THEN 1 ELSE user_id END AS k,
            value
          FROM events),
        jn AS (SELECT profile, c_mktsegment,
            CAST(count(*) AS BIGINT) AS n, ${sqlDsum("value")} AS sv
          FROM ev
          JOIN (SELECT c_custkey AS k, c_mktsegment FROM customer) c
            USING (k)
          GROUP BY profile, c_mktsegment)
        SELECT jn.profile, p.verdict, c_mktsegment, n, sv
        FROM jn JOIN prof p ON jn.profile = p.profile
        ORDER BY jn.profile, c_mktsegment""")),

    // AQE skew join: the NATIVE twin of q_join_skew_salted — Spark's
    // OptimizeSkewedJoin splits the hot reducer at runtime from shuffle
    // statistics, no salt column in user code (the operator a 100 TB
    // deployment reaches for FIRST; manual salting remains for engines
    // or stages AQE can't reach). The demonstration executes in-query
    // over the same manufactured hot key with test-scale thresholds
    // (saved/restored), asserts the FINALIZED adaptive plan marked the
    // join skew=true, and pins that proof through the oracle as a flag;
    // the split changes scheduling, never rows, so the oracle is again
    // the plain join.
    QDef("q_join_skew_aqe",
      (s, d) => {
        def agg = {
          // round-robin fan-out to 8 map tasks first: the skew reader
          // splits a hot REDUCE partition at map-output boundaries, so a
          // single-file corpus (sf0.001 = 1 mapper) would be unsplittable
          val ev = events(s, d)
            .select(when(col("event_type") === "click", lit(1L))
                .otherwise(col("user_id")).as("k"),
              col("value"))
            .repartition(8)
          val cust = customer(s, d)
            .select(col("c_custkey").as("k"), col("c_mktsegment"))
          ev.join(cust.hint("merge"), "k")
            .groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
        }
        val keys = Seq(
          "spark.sql.adaptive.enabled",
          "spark.sql.adaptive.skewJoin.enabled",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.coalescePartitions.enabled",
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.autoBroadcastJoinThreshold",
          "spark.sql.shuffle.partitions")
        val saved = keys.map(k => k -> s.conf.getOption(k))
        try {
          s.conf.set("spark.sql.adaptive.enabled", "true")
          s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
          s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
          // thresholds sized for the SMALLEST test corpus (sf0.001's hot
          // partition is a few KB of shuffle bytes); production keeps the
          // 256 MB default — the point demonstrated is the MECHANISM
          s.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512b")
          s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
          s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
          // skew detection compares the hot partition against the MEDIAN
          // partition: with only 4 reducers (Verify's local[4] default)
          // the median partition absorbs ~1/4 of the uniform keys and the
          // hot/median ratio drops below the factor — pin the demo at 32
          // reducers so detection is corpus- and session-independent
          s.conf.set("spark.sql.shuffle.partitions", "32")
          val demo = agg
          demo.collect()
          val plan = demo.queryExecution.executedPlan.toString
          if (!plan.contains("skew=true") || !plan.contains("isFinalPlan=true"))
            throw new IllegalStateException(
              s"q_join_skew_aqe: adaptive plan did not split the hot " +
                s"partition:\n${plan.take(4000)}")
        } finally saved.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
        // re-state the same aggregate under session confs (identical
        // rows either way) with the demonstration's proof flag attached
        agg.withColumn("skew_plan_applied", lit(1L))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n, ${sqlDsum("value")} AS sv,
          CAST(1 AS BIGINT) AS skew_plan_applied
        FROM (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE user_id END AS k,
                     value FROM events) e
        JOIN (SELECT c_custkey AS k, c_mktsegment FROM customer) c USING (k)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    // semantic an ordinary equi-join silently breaks — NULL keys match
    // each other instead of dropping. One segment is nullified and must
    // still land in the dimension row whose key is NULL; counts prove
    // no row leaked. Spark plans <=> as a hash join key (not a theta
    // join), so the 100 TB shape is the same shuffled equi-join.
    QDef("q_join_null_safe",
      (s, d) => {
        val c = customer(s, d).select(col("c_custkey"),
          expr("nullif(c_mktsegment, 'MACHINERY')").as("seg"))
        val segs = c.select(col("seg")).distinct()
          .withColumn("seg_code", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("seg").asc_nulls_first)))
          .select(col("seg").as("seg2"), col("seg_code"))
        c.join(segs, col("seg") <=> col("seg2"))
          .groupBy(col("seg_code"), col("seg"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("seg_code"))
      },
      Some("""WITH c AS (SELECT c_custkey,
            nullif(c_mktsegment, 'MACHINERY') AS seg FROM customer),
          segs AS (SELECT seg, row_number() OVER (ORDER BY seg NULLS FIRST)
              AS seg_code
            FROM (SELECT DISTINCT seg FROM c))
        SELECT seg_code, c.seg, count(*) AS n
        FROM c JOIN segs ON c.seg IS NOT DISTINCT FROM segs.seg
        GROUP BY 1, 2 ORDER BY seg_code"""))
  )
}
