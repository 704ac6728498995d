package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: persist both sides of a recurring fact-fact
  * join bucketed + sorted on the join key, so the join plans with zero
  * Exchange — the canonical 100 TB co-location strategy (pay the shuffle
  * once at write time, never per query).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (replacing any
    * previous table AND any orphaned warehouse directory a crashed run
    * left behind — Spark refuses to reuse an existing location). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val orphan = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(orphan)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(orphan).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Count shuffle Exchanges in a physical-plan string — the ONE place
    * the recognized partitioning kinds are listed (q_join_bucketed's
    * in-query assertion and BucketingSpec both call this, so a Spark
    * upgrade renaming a partitioning cannot desynchronize them). */
  def countExchanges(plan: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|RoundRobin|SinglePartition)"
      .r.findAllIn(plan).size

  /** Join two pre-bucketed tables on their bucket key: with matching
    * bucket counts Spark plans a sort-merge join with NO shuffle on
    * either side. Hinted to merge — these are fact-fact joins where
    * neither side broadcasts at real scale. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)
}
