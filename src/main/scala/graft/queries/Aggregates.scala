package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Hash-aggregation surface: grouped aggregates, distinct, rollup/cube,
  * percentiles, collected sets, HAVING, approximate distinct.
  *
  * Scale notes: every query here is a single hash-aggregate over the fact
  * table — partial (map-side) aggregation + one shuffle on the grouping
  * keys; no driver-side collection. Cardinality of all grouping keys is
  * tiny relative to input, so the shuffle moves only the partial maps.
  */
object Aggregates {

  val all: Seq[QDef] = Seq(

    // TPC-H Q1-style pricing summary — the flagship: scan, pushed filter,
    // partial+final hash agg, sort.
    QDef("q1_pricing_summary",
      (s, d) => {
        import org.apache.spark.sql.Column
        val l = lineitem(s, d)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        ${sqlDavg("l_discount")} AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    QDef("q_agg_count_distinct",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("uniq_parts"),
          countDistinct(col("l_suppkey")).as("uniq_supps"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("uniq_ps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        count(DISTINCT l_partkey) AS uniq_parts,
        count(DISTINCT l_suppkey) AS uniq_supps,
        count(DISTINCT (l_partkey, l_suppkey)) AS uniq_ps,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Statistical aggregates; stddev/corr are iterative-merge algorithms in
    // both engines — round to absorb ulp-level drift (values are O(1e4)).
    QDef("q_agg_stats",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
        round(stddev_samp(l_extendedprice), 2) AS sd_price,
        round(var_samp(l_quantity), 4) AS var_qty,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        min(l_extendedprice) AS min_price,
        max(l_extendedprice) AS max_price,
        count(*) AS n
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Per-group least-squares regression (y = slope·x + intercept, plus
    // R²) composed from EXACT decimal moment sums instead of the built-in
    // regr_* aggregates: the streaming-merge formulas those use accumulate
    // doubles in partition order, so their low bits are
    // partitioning-dependent — moments via dsum are exact, and the final
    // closed-form arithmetic is the identical IEEE expression on both
    // engines. One hash-agg pass (5 sums + count), map-side combinable.
    QDef("q_agg_regression",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsumPart(col("l_quantity")).as("sx_d"),
          dsumPart(col("l_extendedprice")).as("sy_d"),
          dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
          dsum(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
          dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"))
        // the centered moments once, then the closed forms — the slope
        // expression exists exactly once per engine. The RAW sx/sy output
        // columns ship as exact micro-unit BIGINTs, not doubles: a
        // per-group |sum| beyond ~9e9 puts the DECIMAL(30,6) internal
        // integer past 2^53, where DuckDB's two-step int128→double→/1e6
        // cast can land 1 ulp off Spark's correctly-rounded
        // BigDecimal.doubleValue (the q_funnel_latency lesson — sy here
        // is ~1.1e10 per group at sf0.1, over the line).
        .select(col("l_returnflag"), col("n"),
          col("sx_d"), col("sy_d"),
          (col("sx_d") * 1000000).cast("long").as("sx_e6"),
          (col("sy_d") * 1000000).cast("long").as("sy_e6"),
          col("sx_d").cast("double").as("sx"), col("sy_d").cast("double").as("sy"),
          col("sxx"), col("syy"), col("sxy"))
        .select(col("l_returnflag"), col("n"), col("sx_e6"), col("sy_e6"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_n"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_n"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("vary_n"),
          col("sx"), col("sy"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          col("sx_e6"), col("sy_e6"),
          round(col("cov_n") / col("varx_n"), 6).as("slope"),
          round((col("sy") - (col("cov_n") / col("varx_n")) * col("sx")) /
            col("n"), 6).as("intercept"),
          round(col("cov_n") * col("cov_n") /
            (col("varx_n") * col("vary_n")), 6).as("r2"))
        .orderBy(col("l_returnflag")),
      Some {
        val n = "CAST(count(*) AS DOUBLE)"
        val sx = sqlDsum("l_quantity"); val sy = sqlDsum("l_extendedprice")
        val sxx = sqlDsum("l_quantity * l_quantity")
        val syy = sqlDsum("l_extendedprice * l_extendedprice")
        val sxy = sqlDsum("l_quantity * l_extendedprice")
        s"""WITH m AS (SELECT l_returnflag, $n AS n, $sx AS sx, $sy AS sy,
            CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) * 1000000
              AS BIGINT) AS sx_e6,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) * 1000000
              AS BIGINT) AS sy_e6,
            $n * $sxy - $sx * $sy AS cov_n,
            $n * $sxx - $sx * $sx AS varx_n,
            $n * $syy - $sy * $sy AS vary_n
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, sx_e6, sy_e6,
          round(cov_n / varx_n, 6) AS slope,
          round((sy - (cov_n / varx_n) * sx) / n, 6) AS intercept,
          round(cov_n * cov_n / (varx_n * vary_n), 6) AS r2
        FROM m ORDER BY l_returnflag"""
      }),

    QDef("q_agg_rollup",
      (s, d) => lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls")),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
        coalesce(l_linestatus, 'ALL') AS ls,
        ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // Cube re-aggregates a base-level pre-aggregate instead of cubing the
    // fact table: Expand multiplies its input ×4 (one copy per grouping
    // set), so cube(lineitem) pushes 4n rows through the aggregate while
    // cube(pre-agg) pushes 4·|groups| ≈ 24. Sums are decomposable (the
    // decimal partial sums re-sum exactly; count re-sums as sum), making
    // this THE cube pattern at 100 TB. Measured 1.9 s → sub-second.
    QDef("q_agg_cube",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsumPart(col("l_extendedprice")).as("ps"), count(lit(1)).as("pn"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsumMerge(col("ps")).as("sum_price"), sum(col("pn")).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_price"), col("n"))
        .orderBy(col("rf"), col("ls")),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
        coalesce(l_linestatus, 'ALL') AS ls,
        ${sqlDsum("l_extendedprice")} AS sum_price, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // Exact interpolated percentiles (both engines: linear interpolation on
    // the sorted set — identical arithmetic on identical doubles).
    QDef("q_agg_percentile",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
        round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Discrete percentiles: pick actual data elements (no interpolation),
    // so values match exactly across engines.
    QDef("q_agg_percentile_disc",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("median_price"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90_qty"))
        .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
        quantile_disc(l_extendedprice, 0.5) AS median_price,
        quantile_disc(l_quantity, 0.9) AS p90_qty
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // collect_set surface; the set is joined to one scalar cell because the
    // driver's pandas checker cannot sort frames with array-typed cells.
    QDef("q_agg_collect_set",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        count(DISTINCT o_orderstatus) AS n_statuses
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // HAVING: per-supplier totals filtered on the aggregate.
    QDef("q_agg_having",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n"))
        .filter(col("total_qty") > 1000.0)
        .orderBy(col("l_suppkey")),
      Some(s"""SELECT l_suppkey, ${sqlDsum("l_quantity")} AS total_qty, count(*) AS n
        FROM lineitem GROUP BY l_suppkey
        HAVING ${sqlDsum("l_quantity")} > 1000.0
        ORDER BY l_suppkey""")),

    QDef("q_distinct",
      (s, d) => lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem ORDER BY l_returnflag, l_linestatus""")),

    // Conditional aggregation (sum/count over CASE).
    QDef("q_agg_conditional",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          dsum(when(col("o_totalprice") > 200000.0, col("o_totalprice")).otherwise(lit(0.0))).as("big_total"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        ${sqlDsum("CASE WHEN o_totalprice > 200000.0 THEN o_totalprice ELSE 0.0 END")} AS big_total,
        count(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // argmax/argmin aggregates (deterministic: totalprice values are
    // continuous doubles, no representable ties in this data).
    QDef("q_agg_max_by",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("biggest_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("smallest_order"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        max_by(o_orderkey, o_totalprice) AS biggest_order,
        min_by(o_orderkey, o_totalprice) AS smallest_order,
        round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Ordered string aggregation (sorted-set join for cross-engine order).
    QDef("q_agg_string_agg",
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
        array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        count(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Boolean aggregates.
    QDef("q_agg_bool",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0.0).as("all_positive"),
          bool_or(col("l_discount") > 0.09).as("any_high_discount"),
          bool_and(col("l_tax") < 0.05).as("all_low_tax"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        bool_and(l_quantity > 0.0) AS all_positive,
        bool_or(l_discount > 0.09) AS any_high_discount,
        bool_and(l_tax < 0.05) AS all_low_tax
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HyperLogLog++ approximate distinct — no exact oracle by construction;
    // rows-only check here, tolerance-vs-exact asserted in ScalaTest.
    // HLL++ estimates are engine-specific, but their error BOUND is not:
    // emit exact counts plus a within-5σ flag (rsd=0.02) so the driver can
    // hash-compare against an oracle that computes the exact counts and
    // expects the flags to be 1. A wildly-off estimator fails the gate.
    QDef("q_agg_approx_distinct",
      (s, d) => {
        val l = lineitem(s, d)
        // two exact counts as separate two-stage aggs joined on the tiny
        // group key — NOT one multi-countDistinct agg, whose Expand plan
        // multiplies every input row by the number of distinct columns
        def exact(c: String, as: String) =
          l.select(col("l_returnflag"), col(c)).distinct()
            .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
        val approx = l.groupBy(col("l_returnflag")).agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        approx
          .join(exact("l_partkey", "exact_parts"), "l_returnflag")
          .join(exact("l_orderkey", "exact_orders"), "l_returnflag")
          .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
            (abs(col("ap") - col("exact_parts")).cast("double") /
              col("exact_parts") <= 0.1).cast("long").as("parts_ok"),
            (abs(col("ao") - col("exact_orders")).cast("double") /
              col("exact_orders") <= 0.1).cast("long").as("orders_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        count(DISTINCT l_partkey) AS exact_parts,
        count(DISTINCT l_orderkey) AS exact_orders,
        CAST(1 AS BIGINT) AS parts_ok,
        CAST(1 AS BIGINT) AS orders_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The SCALE path for percentiles. Exact `percentile` (q_agg_percentile)
    // is an ObjectHashAggregate that buffers EVERY group value in one
    // task's memory — at 100 TB with 3 l_returnflag groups that is tens of
    // billions of doubles in three aggregation buffers: OOM, not slow.
    // approx_percentile (Greenwald-Khanna sketch) keeps O(accuracy·log n)
    // state per group and merges map-side, so it survives any group size.
    // Estimates are engine-specific, but GK's RANK-error bound is not:
    // approx_percentile(_, p, acc) returns a data value whose rank is
    // within n/acc of p·n. Emit exact group counts plus a within-bound
    // flag per percentile — the oracle computes the counts and expects
    // the flags to be 1, so a wildly-off sketch fails the hash gate.
    QDef("q_agg_percentile_approx",
      (s, d) => {
        val l = lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
        val approx = l.groupBy(col("l_returnflag")).agg(
          expr("approx_percentile(l_quantity, 0.25, 1000)").as("a25"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("a50"),
          expr("approx_percentile(l_quantity, 0.9, 1000)").as("a90"))
        // rank-validate against the exact CDF; l_quantity is discrete, so
        // a returned value v is in-bound iff P(X < v) ≤ p+tol AND
        // P(X ≤ v) ≥ p−tol (the tie-aware form of the rank guarantee)
        val checked = l.join(broadcast(approx), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum((col("l_quantity") < col("a25")).cast("long")).as("lt25"),
            sum((col("l_quantity") <= col("a25")).cast("long")).as("le25"),
            sum((col("l_quantity") < col("a50")).cast("long")).as("lt50"),
            sum((col("l_quantity") <= col("a50")).cast("long")).as("le50"),
            sum((col("l_quantity") < col("a90")).cast("long")).as("lt90"),
            sum((col("l_quantity") <= col("a90")).cast("long")).as("le90"))
        def inBound(p: Double, lt: String, le: String) =
          ((col(lt).cast("double") / col("n") <= p + 0.005) &&
            (col(le).cast("double") / col("n") >= p - 0.005)).cast("long")
        checked.select(col("l_returnflag"), col("n"),
          inBound(0.25, "lt25", "le25").as("p25_ok"),
          inBound(0.50, "lt50", "le50").as("p50_ok"),
          inBound(0.90, "lt90", "le90").as("p90_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        CAST(1 AS BIGINT) AS p25_ok,
        CAST(1 AS BIGINT) AS p50_ok,
        CAST(1 AS BIGINT) AS p90_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // t-digest quantiles — the MERGEABLE sketch beside the GK twin above,
    // as a custom TypedImperativeAggregate (graft.functions.TDigestAgg):
    // O(δ) centroids per group, associative map-side merge, and rank
    // error ∝ q·(1−q) — tightest at the TAILS, exactly where GK's uniform
    // n/acc bound is loosest. Run over the continuous l_extendedprice
    // (interpolation path, unlike the GK twin's discrete l_quantity).
    // Estimates are merge-order-specific (class D), so the result is the
    // exact group count plus tie-aware rank-band flags: tails get the
    // TIGHTER band (0.005 vs 0.015 mid) to pin the t-digest's defining
    // property; the oracle computes the counts and expects every flag = 1.
    // AggregatesSpec re-measures the worst rank error each round and
    // requires ≥2× margin under these bands.
    QDef("q_agg_tdigest",
      (s, d) => {
        import graft.functions.TDigestQuantilesAgg.tdigest_quantiles
        val l = lineitem(s, d).select(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("price"))
        val sk = l.groupBy(col("l_returnflag")).agg(
          tdigest_quantiles(col("price"),
            Seq(0.01, 0.25, 0.50, 0.90, 0.99)).as("qs"))
        val checked = l.join(broadcast(sk), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum((col("price") < col("qs")(0)).cast("long")).as("lt01"),
            sum((col("price") <= col("qs")(0)).cast("long")).as("le01"),
            sum((col("price") < col("qs")(1)).cast("long")).as("lt25"),
            sum((col("price") <= col("qs")(1)).cast("long")).as("le25"),
            sum((col("price") < col("qs")(2)).cast("long")).as("lt50"),
            sum((col("price") <= col("qs")(2)).cast("long")).as("le50"),
            sum((col("price") < col("qs")(3)).cast("long")).as("lt90"),
            sum((col("price") <= col("qs")(3)).cast("long")).as("le90"),
            sum((col("price") < col("qs")(4)).cast("long")).as("lt99"),
            sum((col("price") <= col("qs")(4)).cast("long")).as("le99"))
        def inBound(p: Double, tol: Double, lt: String, le: String) =
          ((col(lt).cast("double") / col("n") <= p + tol) &&
            (col(le).cast("double") / col("n") >= p - tol)).cast("long")
        checked.select(col("l_returnflag"), col("n"),
          inBound(0.01, 0.005, "lt01", "le01").as("p01_ok"),
          inBound(0.25, 0.015, "lt25", "le25").as("p25_ok"),
          inBound(0.50, 0.015, "lt50", "le50").as("p50_ok"),
          inBound(0.90, 0.015, "lt90", "le90").as("p90_ok"),
          inBound(0.99, 0.005, "lt99", "le99").as("p99_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        CAST(1 AS BIGINT) AS p01_ok,
        CAST(1 AS BIGINT) AS p25_ok,
        CAST(1 AS BIGINT) AS p50_ok,
        CAST(1 AS BIGINT) AS p90_ok,
        CAST(1 AS BIGINT) AS p99_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // TWO-LEVEL t-digest rollup — mergeability proven IN-PLAN, not just
    // in the suite: level 1 sketches price per (l_returnflag,
    // l_linestatus) into SERIALIZED digests (tdigest_sketch → binary);
    // level 2 re-aggregates those partials per l_returnflag
    // (tdigest_merge_quantiles) and evaluates the merged digest. This is
    // the exact 100 TB shape — per-segment sketches materialize once
    // (O(groups · δ) bytes), the global percentile is a re-aggregation
    // over sketches, never a re-scan of the fact table — and the merge
    // path runs under the driver gate. Verification is identical to
    // q_agg_tdigest: exact rank-band flags against the raw rows, with the
    // same tail/mid tolerances (the second merge level is the same
    // associative centroid fold partials already use inside one
    // aggregation; AggregatesSpec measures the rollup's worst rank error
    // and requires the same ≥2× margin).
    QDef("q_agg_tdigest_rollup",
      (s, d) => {
        import graft.functions.TDigestQuantilesAgg.{tdigest_sketch, tdigest_merge_quantiles}
        val l = lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").cast("double").as("price"))
        val seg = l.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(tdigest_sketch(col("price")).as("sk"))
        val sk = seg.groupBy(col("l_returnflag")).agg(
          tdigest_merge_quantiles(col("sk"),
            Seq(0.01, 0.25, 0.50, 0.90, 0.99)).as("qs"))
        val checked = l.join(broadcast(sk), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum((col("price") < col("qs")(0)).cast("long")).as("lt01"),
            sum((col("price") <= col("qs")(0)).cast("long")).as("le01"),
            sum((col("price") < col("qs")(1)).cast("long")).as("lt25"),
            sum((col("price") <= col("qs")(1)).cast("long")).as("le25"),
            sum((col("price") < col("qs")(2)).cast("long")).as("lt50"),
            sum((col("price") <= col("qs")(2)).cast("long")).as("le50"),
            sum((col("price") < col("qs")(3)).cast("long")).as("lt90"),
            sum((col("price") <= col("qs")(3)).cast("long")).as("le90"),
            sum((col("price") < col("qs")(4)).cast("long")).as("lt99"),
            sum((col("price") <= col("qs")(4)).cast("long")).as("le99"))
        def inBound(p: Double, tol: Double, lt: String, le: String) =
          ((col(lt).cast("double") / col("n") <= p + tol) &&
            (col(le).cast("double") / col("n") >= p - tol)).cast("long")
        checked.select(col("l_returnflag"), col("n"),
          inBound(0.01, 0.005, "lt01", "le01").as("p01_ok"),
          inBound(0.25, 0.015, "lt25", "le25").as("p25_ok"),
          inBound(0.50, 0.015, "lt50", "le50").as("p50_ok"),
          inBound(0.90, 0.015, "lt90", "le90").as("p90_ok"),
          inBound(0.99, 0.005, "lt99", "le99").as("p99_ok"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        CAST(1 AS BIGINT) AS p01_ok,
        CAST(1 AS BIGINT) AS p25_ok,
        CAST(1 AS BIGINT) AS p50_ok,
        CAST(1 AS BIGINT) AS p90_ok,
        CAST(1 AS BIGINT) AS p99_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
