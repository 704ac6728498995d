package graft.tables

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bucketed co-located join: both sides pre-bucketed on the join key must
  * plan with ZERO Exchange — the storage-side strategy q_join_bucketed
  * declares. Plan-pinned here the way AnnPlanSpec pins the ANN shapes. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def shuffles(plan: String): Int = Bucketing.countExchanges(plan)

  test("bucketed join + same-key aggregation: zero Exchange, merge join") {
    spark.sharedState.cacheManager.clearCache()
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey").as("okey"), col("o_totalprice"))
    val items = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey").as("okey"), col("l_extendedprice"))
    Bucketing.writeBucketed(orders, "spec_bkt_orders", "okey", buckets = 4)
    Bucketing.writeBucketed(items, "spec_bkt_lineitem", "okey", buckets = 4)

    val joined = Bucketing
      .bucketedJoin(spark, "spec_bkt_orders", "spec_bkt_lineitem", "okey")
      .groupBy(col("okey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(shuffles(plan) == 0,
      s"expected zero exchanges on a co-located join+agg:\n${plan.take(3000)}")
    assert(plan.contains("SortMergeJoin"), plan.take(1500))

    // co-location must be result-invariant vs the plain shuffled join
    val expected = orders.join(items, "okey").groupBy(col("okey"))
      .agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
  }

  test("mismatched bucket counts still join correctly (exchange returns)") {
    Bucketing.writeBucketed(
      Tables.customer(spark, TestSpark.sf0001)
        .select(col("c_custkey").as("ckey")),
      "spec_bkt_cust3", "ckey", buckets = 3)
    val other = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey").as("ckey"))
    // one side bucketed, other not: correctness holds, Spark re-shuffles
    val joined = spark.table("spec_bkt_cust3").hint("merge")
      .join(other.hint("merge"), "ckey")
    assert(joined.count() ==
      Tables.customer(spark, TestSpark.sf0001).as("c")
        .join(Tables.orders(spark, TestSpark.sf0001).as("o"),
          col("c.c_custkey") === col("o.o_custkey")).count())
  }
}
