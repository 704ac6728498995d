package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Multi-join relational analytics over the star schema — the TPC-H
  * q7/q8/q13/q18 shapes adapted to the synthetic tables' cut-down
  * columns. The reference engine (audienceproject/kinesis-writer) has no
  * query surface; these declare the warehouse-side breadth a user of a
  * 100 TB corpus warehouse expects: bilateral fact slicing through two
  * independent dimension paths, exact integer market shares, a
  * left-join frequency distribution, and a having-gated fact self-roll.
  *
  * Scale notes: every dimension path (supplier→nation, customer→nation
  * →region) is a broadcast chain — the only fact shuffles are
  * lineitem ⋈ orders on orderkey and the final group-bys. Shares are
  * exact integer ppm over DECIMAL(30,6) micro-unit sums (TUNING.md
  * §Cross-engine determinism class A): the ×1,000,000 ppm product runs
  * in DECIMAL(38,0) on Spark and HUGEINT in DuckDB, both exact.
  */
object Relational {

  private val revMicro: org.apache.spark.sql.Column =
    (sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(org.apache.spark.sql.types.DecimalType(30, 6))) * lit(1000000))
      .cast("long")
  private val revMicroSql =
    "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) * 1000000 AS BIGINT)"

  val all: Seq[QDef] = Seq(

    // TPC-H q7 shape: bilateral trade volume between supplier nation and
    // customer nation per ship year. Two independent dimension paths off
    // the same fact row — supplier→nation broadcast on one side,
    // orders→customer→nation on the other; the only big join is
    // lineitem ⋈ orders. Revenue in exact micro-unit BIGINTs.
    QDef("q_trade_volume",
      (s, d) => {
        val supNation = supplier(s, d)
          .join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val custNation = customer(s, d)
          .join(broadcast(nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("ship_year"))
          .agg(revMicro.as("rev_micro"), count(lit(1)).as("n_lines"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      },
      Some(s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          year(l_shipdate) AS ship_year, $revMicroSql AS rev_micro,
          count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, ship_year""")),

    // TPC-H q9 shape (r12): product-type profit by supplier nation and
    // order year — the remaining partsupp-free member of the TPC-H
    // battery (this testdata ships no partsupp table, so ps_supplycost
    // is substituted by the DECLARED proxy cost 0.1·p_retailprice per
    // unit; the SHAPE — name-filtered part dim, 5-way join, nation ×
    // year rollup over a signed amount — is Q9's). Amount is exact
    // DECIMAL(30,6) per line (identical cast text both engines), summed
    // to micro-unit BIGINTs; part and supplier→nation ride broadcast,
    // the only big join is lineitem ⋈ orders.
    QDef("q9_profit_style",
      (s, d) => {
        val supNation = supplier(s, d)
          .join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        val parts = part(s, d).filter(col("p_name").contains("widget"))
          .select(col("p_partkey"), col("p_retailprice"))
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg((sum(expr("CAST(l_extendedprice * (1 - l_discount)" +
              " - p_retailprice * l_quantity * 0.1 AS DECIMAL(30,6))"))
              * lit(1000000)).cast("long").as("profit_micro"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("nation"), col("o_year"))
      },
      Some("""SELECT n_name AS nation, year(o_orderdate) AS o_year,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount)
            - p_retailprice * l_quantity * 0.1 AS DECIMAL(30,6)))
            * 1000000 AS BIGINT) AS profit_micro,
          count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2 ORDER BY nation, o_year""")),

    // TPC-H q2 shape (r13) — min-cost supplier per part within a
    // region: the classic correlated-argmin plan. The testdata ships
    // no partsupp, so the part↔supplier relation is the DISTINCT
    // (l_partkey, l_suppkey) pairs lineitem actually exercised (the q9
    // precedent), and ps_supplycost is the DECLARED surrogate
    // 0.1·p_retailprice (exact cents → ·10³ micro) plus a
    // deterministic per-pair integer jitter ((pk·31 + sk)·Knuth mod
    // 2³² mod 10⁴ micro) so the argmin is non-degenerate and
    // byte-identical in both engines. Tie rule: (cost, s_suppkey).
    // Scale: the pair-distinct is a map-side agg over lineitem; part/
    // supplier/nation/region ride broadcast; the per-part argmin
    // window partitions on p_partkey over ≤|suppliers| rows per part.
    QDef("q2_mincost_supplier",
      (s, d) => {
        val ps = lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val eur = supplier(s, d)
          .join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val pt = part(s, d).filter(col("p_size") <= 15)
          .select(col("p_partkey"), col("p_brand"),
            (expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)")
              * 1000L).as("base_micro"))
        ps.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
          .withColumn("cost_micro", col("base_micro") +
            pmod((col("l_partkey") * 31 + col("l_suppkey"))
              * lit(2654435761L), lit(4294967296L)) % 10000)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("p_partkey"))
              .orderBy(col("cost_micro"), col("l_suppkey"))))
          .filter(col("rn") === 1)
          .select(col("p_partkey"), col("p_brand"), col("s_name"),
            col("n_name"), col("cost_micro"))
          .orderBy(col("p_partkey"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
            FROM lineitem),
        eur AS (SELECT s_suppkey, s_name, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'),
        pt AS (SELECT p_partkey, p_brand,
            CAST(round(p_retailprice * 100, 0) AS BIGINT) * 1000
              AS base_micro
          FROM part WHERE p_size <= 15),
        c AS (SELECT p_partkey, p_brand, s_name, n_name,
            base_micro + (l_partkey * 31 + l_suppkey) * 2654435761
              % 4294967296 % 10000 AS cost_micro,
            row_number() OVER (PARTITION BY p_partkey ORDER BY
              base_micro + (l_partkey * 31 + l_suppkey) * 2654435761
                % 4294967296 % 10000, l_suppkey) AS rn
          FROM ps JOIN pt ON l_partkey = p_partkey
          JOIN eur ON l_suppkey = s_suppkey)
        SELECT p_partkey, p_brand, s_name, n_name, cost_micro
        FROM c WHERE rn = 1 ORDER BY p_partkey""")),

    // TPC-H q11 shape (r13) — "important stock": per-part inventory
    // value vs a global-threshold scalar subquery (the HAVING-vs-
    // global plan). Surrogates as in q2: avail = Σ l_quantity per
    // (part, supplier) pair (exact — quantities are integral doubles,
    // rounded once), value = avail · the q2 surrogate cost. A part is
    // "important" when value·200 > Σ all values (the 0.5% rule,
    // cleared to exact integer cross-multiplication — no division
    // ever). Scale: one map-side (part, supp) agg + one per-part agg;
    // the global total is a 1-row broadcast.
    QDef("q11_important_stock",
      (s, d) => {
        val avail = lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(expr("CAST(round(sum(l_quantity), 0) AS BIGINT)")
            .as("avail"))
        val pt = part(s, d)
          .select(col("p_partkey"),
            (expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)")
              * 1000L).as("base_micro"))
        val pv = avail
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .withColumn("cost_micro", col("base_micro") +
            pmod((col("l_partkey") * 31 + col("l_suppkey"))
              * lit(2654435761L), lit(4294967296L)) % 10000)
          .groupBy(col("p_partkey"))
          .agg(sum(col("avail") * col("cost_micro")).as("value_micro"))
        pv.crossJoin(broadcast(
            pv.agg(sum(col("value_micro")).as("total_micro"))))
          .filter(col("value_micro") * 200 > col("total_micro"))
          .select(col("p_partkey"), col("value_micro"))
          .orderBy(col("value_micro").desc, col("p_partkey"))
      },
      Some("""WITH avail AS (SELECT l_partkey, l_suppkey,
            CAST(round(sum(l_quantity), 0) AS BIGINT) AS avail
          FROM lineitem GROUP BY 1, 2),
        pv AS (SELECT p_partkey,
            CAST(sum(avail * (CAST(round(p_retailprice * 100, 0)
              AS BIGINT) * 1000 + (l_partkey * 31 + l_suppkey)
              * 2654435761 % 4294967296 % 10000)) AS BIGINT)
              AS value_micro
          FROM avail JOIN part ON l_partkey = p_partkey
          GROUP BY 1)
        SELECT p_partkey, value_micro FROM pv
        WHERE value_micro * 200 > (SELECT sum(value_micro) FROM pv)
        ORDER BY value_micro DESC, p_partkey""")),

    // TPC-H q16 shape (r13) — supplier counts per (brand, type, size)
    // with an excluded-supplier anti-join: the lineitem-derived pair
    // relation stands in for partsupp, and the q16 complaint filter
    // (testdata ships no s_comment) is the DECLARED exclusion s_name
    // LIKE '%1'. count(DISTINCT suppkey) per part group — the
    // distinct-agg-after-anti-join plan. Scale: pair-distinct map-side
    // agg; part broadcast; the excluded-supplier frame is ≤|suppliers|
    // rows, broadcast anti-join.
    QDef("q16_supplier_counts",
      (s, d) => {
        val ps = lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val excluded = supplier(s, d)
          .filter(col("s_name").like("%1")).select(col("s_suppkey"))
        val pt = part(s, d).filter(col("p_size") <= 25)
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        ps.join(broadcast(excluded),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"),
            col("p_type"), col("p_size"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
            FROM lineitem)
        SELECT p_brand, p_type, p_size,
          CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM ps JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 25
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
            WHERE s_name LIKE '%1')
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // TPC-H q8 shape: each supplier nation's market share of a customer
    // region's yearly revenue, in exact integer ppm. The per-(region,
    // year) total is a window sum over the already-aggregated BIGINT
    // micro-units (order-independent); the ppm quotient runs the
    // ×1,000,000 product in DECIMAL(38,0) / HUGEINT so nothing
    // overflows at any SF.
    QDef("q_market_share",
      (s, d) => {
        val custRegion = customer(s, d)
          .join(broadcast(nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"), col("r_name").as("mkt_region"))
        val supNation = supplier(s, d)
          .join(broadcast(nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val grouped = lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("mkt_region"), year(col("o_orderdate")).as("o_year"),
            col("supp_nation"))
          .agg(revMicro.as("rev_micro"))
        grouped
          .withColumn("total_micro",
            sum(col("rev_micro")).over(
              Window.partitionBy(col("mkt_region"), col("o_year"))))
          .withColumn("share_ppm",
            expr("CAST(CAST(rev_micro AS DECIMAL(38,0)) * 1000000" +
              " div total_micro AS BIGINT)"))
          .select(col("mkt_region"), col("o_year"), col("supp_nation"),
            col("rev_micro"), col("share_ppm"))
          .orderBy(col("mkt_region"), col("o_year"), col("supp_nation"))
      },
      Some(s"""WITH g AS (
          SELECT r_name AS mkt_region, year(o_orderdate) AS o_year,
            sn.n_name AS supp_nation, $revMicroSql AS rev_micro
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region ON cn.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          GROUP BY 1, 2, 3)
        SELECT mkt_region, o_year, supp_nation, rev_micro,
          CAST(CAST(rev_micro AS HUGEINT) * 1000000 //
            sum(rev_micro) OVER (PARTITION BY mkt_region, o_year)
            AS BIGINT) AS share_ppm
        FROM g ORDER BY mkt_region, o_year, supp_nation""")),

    // TPC-H q13 shape: distribution of customers by order count,
    // INCLUDING zero-order customers (the left join is the point — an
    // inner join silently drops them). Two cheap aggregations; the
    // orders→customer join broadcasts the customer side at small SF and
    // co-partitions on custkey at scale.
    QDef("q_cust_order_dist",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY 1)
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // TPC-H q18 shape: large-volume orders — orders whose total line
    // quantity exceeds 300 (p99 of the synthetic data is 262), joined
    // back to the customer. The HAVING gate compares the exact decimal
    // sum, so the threshold cannot flip on float ordering; the gated set
    // is tiny, so the join back to orders/customer broadcasts it.
    QDef("q_large_orders",
      (s, d) => {
        val big = lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300.0)
        big
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
            col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some(s"""SELECT c_name, c_custkey, o_orderkey,
          year(o_orderdate) AS o_year, o_totalprice, sum_qty
        FROM (SELECT l_orderkey, ${sqlDsum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY 1) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE sum_qty > 300.0
        ORDER BY o_totalprice DESC, o_orderkey""")),

    // TPC-H q4 shape: priority distribution of orders with at least one
    // late-shipped line. The synthetic schema has no commit/receipt
    // dates, so "late" is l_shipdate > o_orderdate + 60 days — the
    // correlated-EXISTS shape is the point: a left-semi join whose
    // condition spans both sides. The quarter filter prunes orders
    // before the semi probe; lineitem projects two columns.
    QDef("q4_order_priority",
      (s, d) => {
        val o = orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val late = lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"))
        o.join(late,
            col("o_orderkey") === col("l_orderkey")
              && col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY o_orderpriority""")),

    // TPC-H q12 shape: two-class conditional counts of late lines per
    // line status (stand-in for the missing shipmode column). Pure
    // integer CASE sums — exact on both engines; the only shuffle is
    // the final 2-group aggregation after the orderkey join.
    QDef("q12_late_line_priority",
      (s, d) => lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1 ORDER BY l_linestatus""")),

    // TPC-H q15 shape: the top supplier(s) by quarterly revenue. The
    // scalar-subquery max runs over exact micro-unit BIGINTs, so the
    // equality gate cannot flip on float ordering; the 1-row max frame
    // broadcasts into the revenue frame, and only the winners join
    // supplier.
    QDef("q15_top_supplier",
      (s, d) => {
        val rev = lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(revMicro.as("total_rev_micro"))
        val top = rev.agg(max(col("total_rev_micro")).as("max_rev"))
        rev.join(broadcast(top), col("total_rev_micro") === col("max_rev"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_micro"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH revenue AS (
          SELECT l_suppkey, $revMicroSql AS total_rev_micro
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_rev_micro
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_micro = (SELECT max(total_rev_micro) FROM revenue)
        ORDER BY s_suppkey""")),

    // TPC-H q17 shape: revenue sitting in small-quantity lines of one
    // brand, "small" meaning under 1/5 of the part's mean quantity. The
    // correlated per-part average is a pre-aggregation joined back on
    // partkey; the comparison is pure BIGINT (quantity is integral in
    // the synthetic data, so qty*5*n_lines < sum_qty is the exact form
    // of qty < 0.2*avg — no division, no float boundary). Brand filter
    // broadcasts the pruned part side.
    QDef("q17_small_qty_revenue",
      (s, d) => {
        val partStats = lineitem(s, d)
          .groupBy(col("l_partkey").as("ps_partkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("n_lines"))
        lineitem(s, d)
          .join(broadcast(part(s, d)
              .filter(col("p_brand") === "Brand#23")
              .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .join(partStats, col("l_partkey") === col("ps_partkey"))
          .filter(col("l_quantity").cast("long") * lit(5L) * col("n_lines")
            < col("sum_qty"))
          .agg((sum(col("l_extendedprice")
              .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
              * lit(1000000)).cast("long").as("rev_micro"),
            count(lit(1)).as("n_small"))
      },
      Some("""WITH stats AS (
          SELECT l_partkey AS ps_partkey,
            sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
            count(*) AS n_lines
          FROM lineitem GROUP BY 1)
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) * 1000000
            AS BIGINT) AS rev_micro,
          count(*) AS n_small
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN stats ON l_partkey = ps_partkey
        WHERE p_brand = 'Brand#23'
          AND CAST(l_quantity AS BIGINT) * 5 * n_lines < sum_qty""")),

    // TPC-H q19 shape: disjunctive brand/size/quantity predicates — the
    // classic "OR of conjunctions" the optimizer must both evaluate
    // post-join AND partially push down (the derived brand∈set ∧ size≤15
    // envelope prunes part before the broadcast). Revenue in exact
    // micro-units.
    QDef("q19_disjunctive_revenue",
      (s, d) => {
        val p = part(s, d)
          .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#24")
            && col("p_size").between(1, 15))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        lineitem(s, d)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
              && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
              && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#24" && col("p_size").between(1, 15)
              && col("l_quantity").between(20, 30)))
          .agg(revMicro.as("rev_micro"), count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT $revMicroSql AS rev_micro, count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 20 AND 30)""")),

    // TPC-H q21 shape: suppliers solely at fault — their line on a
    // finished multi-supplier order is returned while no other
    // supplier's line on that order is. EXISTS → left-semi with a
    // suppkey inequality in the condition, NOT EXISTS → left-anti; both
    // probe the same projected lineitem frame, co-partitioned on
    // orderkey with the driving scan.
    QDef("q21_sole_returned_supplier",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
        val oth = li
          .select(col("l_orderkey").as("o2_orderkey"),
            col("l_suppkey").as("o2_suppkey"))
        val othR = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o3_orderkey"),
            col("l_suppkey").as("o3_suppkey"))
        li.filter(col("l_returnflag") === "R")
          .join(orders(s, d).filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(oth, col("l_orderkey") === col("o2_orderkey")
            && col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
          .join(othR, col("l_orderkey") === col("o3_orderkey")
            && col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM orders
            WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
          AND EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY 1 ORDER BY numwait DESC, s_name""")),

    // TPC-H q22 shape: idle high-balance customers per market segment
    // (stand-in for the missing phone country code). The "above the
    // positive-balance average" gate multiplies through by the count —
    // acctbal·cnt > sum as exact decimals, no division — and the idle
    // gate is a left-anti join on custkey against recent orders (every
    // synthetic customer has SOME order, so the literal never-ordered
    // form is degenerate; "no order since 1999" keeps the anti-join
    // semantics and a non-empty answer at every SF).
    QDef("q22_idle_customers",
      (s, d) => {
        val c = customer(s, d)
        val pos = c.filter(col("c_acctbal") > 0.0)
          .agg(sum(col("c_acctbal")
              .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .as("sum_pos"),
            count(lit(1)).cast("int").as("cnt_pos"))
        c.crossJoin(broadcast(pos))
          .filter(col("c_acctbal")
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))
            * col("cnt_pos") > col("sum_pos"))
          .join(orders(s, d)
              .filter(col("o_orderdate") >=
                lit("1999-01-01").cast("timestamp"))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            (sum(col("c_acctbal")
              .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
              * lit(1000000)).cast("long").as("bal_micro"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH pos AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(18,6))) AS sum_pos,
            CAST(count(*) AS INTEGER) AS cnt_pos
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, count(*) AS numcust,
          CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) * 1000000 AS BIGINT)
            AS bal_micro
        FROM customer, pos
        WHERE CAST(c_acctbal AS DECIMAL(18,6)) * cnt_pos > sum_pos
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY 1 ORDER BY c_mktsegment""")),

    // Snapshot diff (CDC classification): per-customer order rollups at
    // two cutoff dates, FULL-outer joined and classified insert /
    // update / unchanged (the data is append-only, so deletes are
    // structurally impossible — the CASE still guards the branch).
    // Revenue deltas in exact micro-unit BIGINTs; the 100 TB form diffs
    // two bucketed snapshot tables co-partitioned on the key, so the
    // full-outer join is exchange-free.
    QDef("q_snapshot_diff",
      (s, d) => {
        def snap(cut: String) = orders(s, d)
          .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"),
            (sum(col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
              * lit(1000000)).cast("long").as("rev"))
        val s1 = snap("1998-01-01").select(col("o_custkey").as("k1"),
          col("cnt").as("cnt1"), col("rev").as("rev1"))
        val s2 = snap("2000-01-01").select(col("o_custkey").as("k2"),
          col("cnt").as("cnt2"), col("rev").as("rev2"))
        s1.join(s2, col("k1") === col("k2"), "full_outer")
          .select(
            when(col("k1").isNull, "insert")
              .when(col("k2").isNull, "delete")
              .when(col("cnt1") =!= col("cnt2")
                || col("rev1") =!= col("rev2"), "update")
              .otherwise("unchanged").as("status"),
            (coalesce(col("rev2"), lit(0L)) - coalesce(col("rev1"), lit(0L)))
              .as("delta"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_keys"),
            sum(col("delta")).as("delta_rev_micro"))
          .orderBy(col("status"))
      },
      Some("""WITH s1 AS (SELECT o_custkey, count(*) AS cnt1,
            CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) * 1000000
              AS BIGINT) AS rev1
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY 1),
        s2 AS (SELECT o_custkey, count(*) AS cnt2,
            CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) * 1000000
              AS BIGINT) AS rev2
          FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
          GROUP BY 1)
        SELECT status, count(*) AS n_keys,
          CAST(sum(delta) AS BIGINT) AS delta_rev_micro
        FROM (SELECT
            CASE WHEN s1.o_custkey IS NULL THEN 'insert'
                 WHEN s2.o_custkey IS NULL THEN 'delete'
                 WHEN cnt1 <> cnt2 OR rev1 <> rev2 THEN 'update'
                 ELSE 'unchanged' END AS status,
            coalesce(rev2, 0) - coalesce(rev1, 0) AS delta
          FROM s1 FULL JOIN s2 ON s1.o_custkey = s2.o_custkey)
        GROUP BY 1 ORDER BY status""")),

    // MARKET-BASKET association rules — the co-occurrence/lift analysis
    // behind "frequently bought together": part pairs co-occurring in an
    // order, support ≥ 2 orders, confidence and lift kept exact-rational
    // by basis-point truncating division (lift > 10000 ⇔ positive
    // association; class A, no float). Scale: the pair enumeration is a
    // SELF-JOIN ON THE ORDER KEY — one co-partitioned shuffle, per-order
    // fan-out bounded by the basket size squared (≤ 13² lines in TPC-H
    // shape, invariant in SF), never a part×part cross; per-part counts
    // are map-side combinable; the final top-25 is a distributed
    // TakeOrdered, not a global sort.
    QDef("q_basket_lift",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
          .localCheckpoint(true) // feeds pair join + item counts + total
        val nOrders = li.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        val itemCnt = li.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("cnt"))
        val sup = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("p_a"),
            col("b.l_partkey").as("p_b"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
        sup
          .join(itemCnt.select(col("l_partkey").as("p_a"),
            col("cnt").as("cnt_a")), Seq("p_a"))
          .join(itemCnt.select(col("l_partkey").as("p_b"),
            col("cnt").as("cnt_b")), Seq("p_b"))
          .crossJoin(broadcast(nOrders))
          .select(col("p_a"), col("p_b"), col("support"),
            col("cnt_a"), col("cnt_b"),
            expr("support * 10000 div cnt_a").as("conf_bp"),
            expr("support * n_orders * 10000 div (cnt_a * cnt_b)")
              .as("lift_bp"))
          .orderBy(col("lift_bp").desc, col("p_a"), col("p_b"))
          .limit(25)
      },
      Some("""WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
        ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
          FROM li GROUP BY l_partkey),
        sup AS (SELECT a.l_partkey AS p_a, b.l_partkey AS p_b,
            CAST(count(*) AS BIGINT) AS support
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p_a, p_b, support, ia.cnt AS cnt_a, ib.cnt AS cnt_b,
          CAST(support * 10000 // ia.cnt AS BIGINT) AS conf_bp,
          CAST(support * n_orders * 10000 // (ia.cnt * ib.cnt) AS BIGINT)
            AS lift_bp
        FROM sup JOIN ic ia ON sup.p_a = ia.l_partkey
        JOIN ic ib ON sup.p_b = ib.l_partkey
        CROSS JOIN n
        ORDER BY lift_bp DESC, p_a, p_b LIMIT 25""")),

    // ADAMIC–ADAR link prediction over the co-purchase graph — the
    // "customers who bought X also bought Y" recommender primitive: for
    // part pairs NOT yet co-purchased but sharing co-purchase neighbors,
    // Σ_z 1/ln(deg z) weights rare shared neighbors above promiscuous
    // hubs (Adamic & Adar 2003). (The shingle dup graph is the wrong
    // substrate here — at every threshold it decomposes into closed
    // cliques with zero open wedges; the basket graph is where missing
    // links mean something.) Determinism is the q_dsir_weights
    // scaled-integer mechanism: ln(deg) lands ONCE on the 1e-4 grid as
    // BIGINT (deg ≥ 2 for any common neighbor ⇒ grid value ≥ 6931,
    // never zero), each term is the truncating div 10⁸ div lnr_e4, and
    // the per-pair sum is exact BIGINT (class C scaled-integer + A).
    // Scale: edges come from the q_basket_lift order-key self-join; the
    // wedge join enumerates per-z neighbor pairs with a declared
    // deg ≤ 64 hub cap, so fan-out is ≤ 64² per neighbor list, NOT
    // Σ deg(z)² over unbounded hubs; the anti-join removes known edges;
    // top-50 is a distributed TakeOrdered. Ties inside the top-50 are
    // broken by the (aa_e4 desc, id_a, id_b) total order.
    QDef("q_link_adamic_adar",
      (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val edges = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("id_a"),
            col("b.l_partkey").as("id_b"))
          .agg(count(lit(1)).as("sup"))
          .filter(col("sup") >= 2)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint(true) // feeds und twice + the anti-join
        val und = edges.select(col("id_a").as("u"), col("id_b").as("v"))
          .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
        // deg = 1 nodes can never be a common neighbor (z adjacent to
        // both a and b has deg ≥ 2), so dropping them BEFORE the term
        // division is lossless — and keeps ln(1) = 0 out of the divisor.
        // The deg ≤ 64 HUB CAP is declared semantics (the tfidf df-cap
        // precedent): a hub's 1/ln(deg) term is the smallest signal in
        // the score but its deg² wedge fan-out is the whole cost — the
        // measured 10× corpus spilled 39 GB through hubs before the cap,
        // while at the declared corpus max deg is 13, so the cap never
        // binds (spec-asserted). Applying it BEFORE the wedge join
        // bounds enumeration at 64² per neighbor, not Σ deg².
        val degScored = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2 && col("deg") <= 64)
          .select(col("u").as("z"),
            expr("100000000 div CAST(round(ln(deg) * 10000) AS BIGINT)")
              .as("term_e4"))
          .localCheckpoint(true) // gates the wedge join AND scores terms
        val nb = und.select(col("v").as("z"), col("u").as("n"))
          .join(degScored.select(col("z")), Seq("z"), "left_semi")
        val wedges = nb.select(col("z"), col("n").as("a"))
          .join(nb.select(col("z"), col("n").as("b")), Seq("z"))
          .filter(col("a") < col("b"))
        wedges
          .join(edges.select(col("id_a").as("ea"), col("id_b").as("eb")),
            col("a") === col("ea") && col("b") === col("eb"), "left_anti")
          .join(degScored, Seq("z"))
          .groupBy(col("a").as("id_a"), col("b").as("id_b"))
          .agg(count(lit(1)).as("common"), sum(col("term_e4")).as("aa_e4"))
          .orderBy(col("aa_e4").desc, col("id_a"), col("id_b"))
          .limit(50)
      },
      Some("""WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
        und AS (SELECT id_a AS u, id_b AS v FROM e
          UNION ALL SELECT id_b, id_a FROM e),
        deg AS (SELECT u AS z,
            CAST(100000000 // CAST(round(ln(count(*)) * 10000) AS BIGINT)
              AS BIGINT) AS term_e4
          FROM und GROUP BY u HAVING count(*) BETWEEN 2 AND 64),
        nb AS (SELECT v AS z, u AS n FROM und
          WHERE v IN (SELECT z FROM deg)),
        wedges AS (SELECT x.z, x.n AS a, y.n AS b
          FROM nb x JOIN nb y ON x.z = y.z WHERE x.n < y.n),
        nonadj AS (SELECT a, b, z FROM wedges w
          WHERE NOT EXISTS (SELECT 1 FROM e
            WHERE e.id_a = w.a AND e.id_b = w.b))
        SELECT a AS id_a, b AS id_b, CAST(count(*) AS BIGINT) AS common,
          CAST(sum(term_e4) AS BIGINT) AS aa_e4
        FROM nonadj JOIN deg USING (z)
        GROUP BY a, b
        ORDER BY aa_e4 DESC, id_a, id_b LIMIT 50""")),

    // WILSON SCORE BOUNDS (r14) — rank suppliers by RETURN RATE with
    // small-sample honesty (Wilson 1927; the interval behind every
    // "sort by rating" ranking): the naive k/n rate ranks a 2/3
    // supplier above a 590/600 one; the Wilson lower bound shrinks
    // toward ½ by exactly the uncertainty the sample size warrants.
    // lb/ub = (2k + z² ∓ z·√(z² + 4k(n−k)/n)) / (2(n + z²)) with
    // z = 1.96 (z² = 3.8416 exact decimal literals in BOTH engine
    // texts) — exact integer (n, k) into ONE sqrt chain per bound,
    // rounded once to e6; the naive rate ships beside it as exact ppm
    // for the contrast. Scale: one map-side lineitem agg to the
    // |suppliers| frame, then TakeOrdered top-25 — never a global
    // sort.
    QDef("q_wilson_bounds",
      (s, d) => {
        lineitem(s, d)
          .groupBy(col("l_suppkey").cast("long").as("suppkey"))
          .agg(count(lit(1)).as("n"),
            sum((col("l_returnflag") === "R").cast("long")).as("k"))
          .select(col("suppkey"), col("n"), col("k"),
            expr("(k * 1000000) div n").as("rate_ppm"),
            expr("""CAST(round((2 * k + 3.8416
              - 1.96 * sqrt(3.8416 + 4.0 * k * (n - k) / n))
              / (2 * (n + 3.8416)) * 1000000, 0) AS BIGINT)""")
              .as("wilson_lb_e6"),
            expr("""CAST(round((2 * k + 3.8416
              + 1.96 * sqrt(3.8416 + 4.0 * k * (n - k) / n))
              / (2 * (n + 3.8416)) * 1000000, 0) AS BIGINT)""")
              .as("wilson_ub_e6"))
          .orderBy(col("wilson_lb_e6").desc, col("suppkey"))
          .limit(25)
      },
      Some("""WITH st AS (SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
            CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
          FROM lineitem GROUP BY 1)
        SELECT suppkey, n, k, (k * 1000000) // n AS rate_ppm,
          CAST(round((2 * k + 3.8416
            - 1.96 * sqrt(3.8416 + 4.0 * k * (n - k) / n))
            / (2 * (n + 3.8416)) * 1000000, 0) AS BIGINT)
            AS wilson_lb_e6,
          CAST(round((2 * k + 3.8416
            + 1.96 * sqrt(3.8416 + 4.0 * k * (n - k) / n))
            / (2 * (n + 3.8416)) * 1000000, 0) AS BIGINT)
            AS wilson_ub_e6
        FROM st ORDER BY wilson_lb_e6 DESC, suppkey LIMIT 25"""))
  )
}
