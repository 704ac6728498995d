package graft.tables

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Hive-style partitioned layout + partition pruning: the 100 TB layout
  * where date/tenant predicates never touch non-matching files. */
class PartitioningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("date-partitioned write prunes partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.tables.Tables.events(spark, TestSpark.sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"expected partition filters in:\n$plan")
    // physically: only the matching partition directory is read
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("PartitionFilters: []"))
    assert(pruned.count() ==
      graft.tables.Tables.events(spark, TestSpark.sf0001)
        .filter(to_date(col("ts")) === "2024-01-05").count())
  }
}
