package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Input-relative invariants of the multi-join relational analytics
  * (graft.queries.Relational) — conservation and share-sum properties
  * the DuckDB parity gate can't express. */
class RelationalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("market shares per (region, year) sum to 1e6 within floor loss") {
    // floor division drops < 1 ppm per nation row, so the per-market sum
    // lands in (1e6 - n_rows, 1e6]
    val bad = run("q_market_share")
      .groupBy(col("mkt_region"), col("o_year"))
      .agg(sum(col("share_ppm")).as("s"), count(lit(1)).as("n"))
      .filter(col("s") > 1000000L || col("s") <= lit(1000000L) - col("n"))
    assert(bad.count() == 0, "share_ppm must sum to 1e6 minus floor loss")
  }

  test("market-share micro revenue is conserved against the fact table") {
    val total = run("q_market_share")
      .agg(sum(col("rev_micro"))).head().getLong(0)
    val expected = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(30, 6))) * lit(1000000))
        .cast("long")).head().getLong(0)
    assert(total == expected, s"rev_micro total $total != fact $expected")
  }

  test("customer order distribution conserves customers and orders") {
    val dist = run("q_cust_order_dist").cache()
    val nCust = dist.agg(sum(col("custdist"))).head().getLong(0)
    val nOrd = dist.agg(sum(col("c_count") * col("custdist"))).head().getLong(0)
    assert(nCust == graft.tables.Tables.customer(spark, sf).count(),
      "every customer appears exactly once across the distribution")
    assert(nOrd == graft.tables.Tables.orders(spark, sf).count(),
      "weighted order counts must equal the orders table")
  }

  test("trade volume excludes domestic pairs and conserves foreign lines") {
    val tv = run("q_trade_volume").cache()
    assert(tv.filter(col("supp_nation") === col("cust_nation")).count() == 0)
    val foreign = tv.agg(sum(col("n_lines"))).head().getLong(0)
    val li = graft.tables.Tables.lineitem(spark, sf).count()
    assert(foreign > 0 && foreign < li,
      s"foreign lines $foreign must be a proper subset of $li lineitems")
  }

  test("large orders all clear the 300-quantity gate") {
    val lo = run("q_large_orders").cache()
    assert(lo.filter(col("sum_qty") <= 300.0).count() == 0)
    // the gate is a per-order aggregate: recompute independently
    val expected = graft.tables.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(graft.queries.Q.dsum(col("l_quantity")).as("q"))
      .filter(col("q") > 300.0).count()
    assert(lo.count() == expected)
  }
}
