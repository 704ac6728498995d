package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY.md §2 is a named query here; those
  * with ANSI-SQL-expressible semantics also carry DuckDB oracle SQL for the
  * driver's hash-compare. Non-SQL operators (hash-based LSH, Kinesis sink
  * packing) are rows-only here and property-tested in src/test.
  */
object SparkEntry {

  /** All declared queries, grouped by module. */
  val defs: Seq[QDef] =
    Aggregates.all ++ Scalars.all ++ Joins.all ++ Windows.all ++
      SetOps.all ++ EventWindows.all ++ Llm.all ++ KinesisQueries.all ++
      Extras.all ++ Extras.all2 ++ Physical.all ++ Corpus.all ++
      Curation.all ++ Relational.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.sql.map(q.name -> _)).toMap
}
