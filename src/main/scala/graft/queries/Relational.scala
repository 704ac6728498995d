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
        ORDER BY o_totalprice DESC, o_orderkey"""))
  )
}
