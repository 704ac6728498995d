package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Joins

/** The native as-of plan node must match the composed (join + ranked
  * window) formulation exactly, and must plan as a merge — no window,
  * no pair materialization. */
class AsOfJoinPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native as-of equals the composed formulation on synthetic data") {
    val rnd = new scala.util.Random(11)
    val quotes = (0 until 2000).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100000).toLong, rnd.nextDouble()))
      .toDF("sym", "qt", "px").dropDuplicates("sym", "qt") // unique times per key
    val trades = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(100000).toLong))
      .toDF("id", "sym", "tt")
    val composed = Joins.asof(trades, quotes, Seq("sym"),
        col("id"), col("tt"), col("qt"), col("qt"))
      .select(col("id"), col("qt"), col("px"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val native = Joins.asofNative(trades, quotes, Seq("sym"), "tt", "qt")
      .select(col("id"), col("qt"), col("px"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("NULL join keys never match, like the composed equi-join form") {
    // natural row ordering treats NULL==NULL as equal; the exec must skip
    // NULL-keyed rows instead (SortMergeJoin / DuckDB ASOF semantics)
    val quotes = Seq((Option(1L), 10L, 5.0), (Option.empty[Long], 5L, 7.0))
      .toDF("k", "qt", "px")
    val trades = Seq((1L, Option(1L), 20L), (2L, Option.empty[Long], 20L))
      .toDF("id", "k", "tt")
    val composed = Joins.asof(trades, quotes, Seq("k"),
        col("id"), col("tt"), col("qt"), col("qt"))
      .select(col("id"), col("px")).as[(Long, Double)].collect().toMap
    val native = Joins.asofNative(trades, quotes, Seq("k"), "tt", "qt")
      .select(col("id"), col("px")).as[(Long, Double)].collect().toMap
    assert(composed == Map(1L -> 5.0))
    assert(native == composed)
    // outer: the NULL-keyed left row survives with NULL right columns
    val outer = Joins.asofNative(trades, quotes, Seq("k"), "tt", "qt",
        outer = true)
      .select(col("id"), col("px")).as[(Long, Option[Double])].collect().toMap
    assert(outer == Map(1L -> Some(5.0), 2L -> None))
  }

  test("non-strict (≤) matches rows at the exact timestamp") {
    val quotes = Seq((1L, 10L, 5.0)).toDF("k", "qt", "px")
    val trades = Seq((1L, 1L, 10L)).toDF("id", "k", "tt")
    assert(Joins.asofNative(trades, quotes, Seq("k"), "tt", "qt",
      strict = true).count() == 0)
    assert(Joins.asofNative(trades, quotes, Seq("k"), "tt", "qt",
      strict = false).count() == 1)
  }

  test("left-outer keeps unmatched left rows with NULL right columns") {
    val quotes = Seq((1L, 10L, 5.0)).toDF("k", "qt", "px")
    val trades = Seq((1L, 1L, 20L), (2L, 1L, 5L), (3L, 9L, 30L))
      .toDF("id", "k", "tt")
    val got = Joins.asofNative(trades, quotes, Seq("k"), "tt", "qt",
        outer = true)
      .select(col("id"), col("px")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(1L -> Some(5.0), 2L -> None, 3L -> None))
  }

  test("native tolerance bounds the lookback like the composed form") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 90L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq((1L, "A", 100L), (2L, "A", 50L)).toDF("id", "sym", "tt")
    val got = Joins.asofNative(trades, quotes, Seq("sym"), "tt", "qt",
        toleranceUs = Some(20L))
      .select(col("id"), col("px")).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 9.0)) // trade 2's only candidate is 40 ticks back
  }

  test("plans as AsOfJoinExec merge: no Window, no SortMergeJoin") {
    val e = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withColumnRenamed("c_user", "user_id")
    val joined = Joins.asofNative(p, c, Seq("user_id"), "p_ts", "c_ts")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(joined.count() > 0)
  }

  test("native as-of reproduces q_join_asof on the events table") {
    val e = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_value"))
    val native = Joins.asofNative(p, c, Seq("user_id"), "p_ts", "c_ts")
      .select(col("p_id"), unix_micros(col("c_ts")).as("click_us"))
      .as[(Long, Long)].collect().toMap
    val declared = graft.SparkEntry.queries("q_join_asof")(spark, TestSpark.sf0001)
      .select(col("p_id"), col("click_us")).as[(Long, Long)].collect().toMap
    assert(native == declared)
  }
}
