package graft.tables

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scan-level efficiency guarantees, pinned: predicates reach the parquet
  * reader as PushedFilters and projections prune ReadSchema. At 100 TB
  * these are the difference between scanning terabytes and scanning the
  * few columns/row-groups a query touches — so a regression (a filter
  * evaluated post-scan, a scan reading every column) must fail a test,
  * not be discovered in a bill. Inspects FileSourceScanExec directly:
  * plan strings truncate long filter lists.
  */
class PushdownSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def scanMeta(df: org.apache.spark.sql.DataFrame): Seq[Map[String, String]] = {
    spark.sharedState.cacheManager.clearCache()
    // queries with exchanges arrive wrapped in AdaptiveSparkPlanExec,
    // which collect() does not descend into — unwrap to the inner plan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectWithSubqueries { case f: FileSourceScanExec => f.metadata }
  }

  test("filters are pushed to the parquet scan") {
    val m = scanMeta(Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_totalprice") > 100000.0 && col("o_orderstatus") === "F")
      .select(col("o_orderkey")))
    assert(m.nonEmpty, "no parquet scan in plan")
    val pushed = m.head("PushedFilters")
    assert(pushed.contains("GreaterThan(o_totalprice,100000.0)") &&
      pushed.contains("EqualTo(o_orderstatus,F)"), pushed)
  }

  test("IN and BETWEEN predicates push down") {
    val m = scanMeta(Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_returnflag").isin("A", "R") &&
        col("l_quantity").between(10, 20))
      .select(col("l_orderkey")))
    val pushed = m.head("PushedFilters")
    assert(pushed.contains("In(l_returnflag") &&
      pushed.contains("GreaterThanOrEqual(l_quantity,10") &&
      pushed.contains("LessThanOrEqual(l_quantity,20"), pushed)
  }

  test("projection prunes ReadSchema to the touched columns only") {
    // lineitem has 11 columns; this query touches 2 — the scan must not
    // read the other 9
    val m = scanMeta(Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("q")))
    assert(m.nonEmpty)
    val schema = m.head("ReadSchema")
    assert(schema.contains("l_returnflag") && schema.contains("l_quantity"), schema)
    Seq("l_extendedprice", "l_shipdate", "l_partkey", "l_orderkey").foreach { c =>
      assert(!schema.contains(c), s"unpruned column $c in $schema")
    }
  }

  test("pushdown survives the events ns-timestamp normalization projection") {
    // Tables.events wraps the scan in a conversion select; the filter must
    // still reach the file scan rather than evaluate post-scan
    val m = scanMeta(Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "click")
      .select(col("event_id")))
    assert(m.exists(_("PushedFilters").contains("EqualTo(event_type,click)")),
      m.map(_("PushedFilters")).mkString("\n"))
  }

  test("footer-metadata rowCount equals a counting scan, without a job") {
    for (t <- Seq("embeddings", "nation", "lineitem")) {
      val meta = Tables.rowCount(spark, TestSpark.sf0001, t)
      val scan = spark.read.parquet(s"${TestSpark.sf0001}/$t.parquet").count()
      assert(meta === scan, s"$t: footer=$meta scan=$scan")
    }
  }
}
