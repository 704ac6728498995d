package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Physical-layout scale proofs as DECLARED queries: the two 100 TB
  * storage-side strategies — bucketed co-located joins (pay the join
  * shuffle once at write time, never per query) and partition-pruned
  * scans (date predicates never touch non-matching files) — each run
  * end-to-end with its layout property ASSERTED inside the query, so the
  * driver's correctness gate also re-proves the plan shape every round.
  */
object Physical {

  /** Throws unless the plan fragment contains zero exchanges of the named
    * kind. Checked on the PRE-output fragment (the final orderBy of a
    * declared query legitimately range-shuffles). */
  private def assertNoExchange(df: DataFrame, what: String): DataFrame = {
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange (hashpartitioning|rangepartitioning|RoundRobin|SinglePartition)"
      .r.findAllIn(plan).size
    if (shuffles > 0)
      throw new IllegalStateException(
        s"$what: expected a shuffle-free plan, found $shuffles exchange(s):\n" +
          plan.take(4000))
    df
  }

  val all: Seq[QDef] = Seq(

    // Co-located fact-fact join: both sides written bucketed+sorted on the
    // join key (8 buckets), then joined AND aggregated on that key with
    // ZERO Exchange anywhere before the final presentation sort — the
    // plan shape asserted in-query on every run. At 100 TB this is the
    // difference between re-shuffling two fact tables per query and
    // scanning co-located buckets; the aggregation reuses the same bucket
    // distribution, so it too is exchange-free.
    QDef("q_join_bucketed",
      (s, d) => {
        import graft.tables.Bucketing
        Bucketing.writeBucketed(
          orders(s, d).select(col("o_orderkey").as("okey"),
            col("o_totalprice")),
          "graft_bkt_orders", "okey", buckets = 8)
        Bucketing.writeBucketed(
          lineitem(s, d).select(col("l_orderkey").as("okey"),
            col("l_extendedprice")),
          "graft_bkt_lineitem", "okey", buckets = 8)
        val joined = Bucketing
          .bucketedJoin(s, "graft_bkt_orders", "graft_bkt_lineitem", "okey")
          .groupBy(col("okey"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("rev"),
            max(col("o_totalprice")).as("o_price"))
        assertNoExchange(joined, "q_join_bucketed")
          .orderBy(col("okey"))
          .limit(2000)
      },
      Some(s"""SELECT o_orderkey AS okey, count(*) AS n_items,
          ${sqlDsum("l_extendedprice")} AS rev,
          max(o_totalprice) AS o_price
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY okey LIMIT 2000""")),

    // Partition-pruned scan: events re-laid-out Hive-style by event_date,
    // then a one-day query — the scan must carry a partition filter (no
    // non-matching directory is even listed), asserted in-query. The
    // rewrite cost is the point: pay the layout once, prune forever.
    QDef("q_scan_pruned",
      (s, d) => {
        val dir = s"/tmp/graft_part_events_${Integer.toHexString(d.hashCode)}"
        events(s, d)
          .withColumn("event_date", to_date(col("ts")))
          .write.mode("overwrite").partitionBy("event_date").parquet(dir)
        val pruned = s.read.parquet(dir)
          .filter(col("event_date") === "2024-01-05")
        val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
        if (!scan.contains("PartitionFilters: [isnotnull(event_date"))
          throw new IllegalStateException(
            s"q_scan_pruned: scan lost its partition filter:\n${scan.take(2000)}")
        pruned
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, count(*) AS n, ${sqlDsum("value")} AS sv
        FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        GROUP BY 1 ORDER BY event_type"""))
  )
}
