package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** as-of correctness vs a hand-computed answer; salted join equivalence
  * to the plain join; bucketed join planning without a shuffle. */
class JoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof picks the latest right row before each left row") {
    val quotes = Seq( // (sym, t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq( // (id, sym, t)
      (1L, "A", 25L), (2L, "A", 30L), (3L, "B", 14L), (4L, "B", 99L))
      .toDF("id", "sym", "tt")
    val keyed = Joins.asof(trades, quotes, Seq("sym"), col("id"), col("tt"),
        col("qt"), col("px"))
      .select(col("id"), col("px")).as[(Long, Double)].collect().toMap
    assert(keyed == Map(1L -> 2.0, 2L -> 2.0, 4L -> 9.0)) // id 3: no quote < 14
  }

  test("asof tolerance bounds the lookback") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 90L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq((1L, "A", 100L), (2L, "A", 50L)).toDF("id", "sym", "tt")
    val got = Joins.asof(trades, quotes, Seq("sym"), col("id"), col("tt"),
        col("qt"), col("px"), tolerance = Some(lit(20L)))
      .select(col("id"), col("px")).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 9.0)) // trade 2's only quote is 40 ticks back
  }

  test("binned range join equals the naive BETWEEN join, exactly once each") {
    // points 0..999, intervals of assorted widths incl. bin-straddling and
    // degenerate (lo == hi) ones
    val points = (0 until 1000).map(i => (i.toLong, i * 2L)).toDF("pid", "v")
      .withColumn("v", col("v") % 997) // collisions + uneven coverage
    val ivals = Seq(
      (1L, 0L, 10L), (2L, 5L, 5L), (3L, 90L, 260L), (4L, 995L, 996L),
      (5L, 100L, 100L), (6L, 0L, 996L), (7L, 400L, 449L))
      .toDF("iid", "lo", "hi")
    val naive = points.join(ivals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().sorted.toSeq
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val binned = Joins.binnedRangeJoin(points, "v", ivals, "lo", "hi", w)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().sorted.toSeq
      assert(binned == naive, s"binWidth=$w")
    }
  }

  test("binned range join plans as a shuffle equi-join, not nested-loop") {
    val points = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("pid", "v")
    val ivals = (0 until 50).map(i => (i.toLong, i * 3L, i * 3L + 10L))
      .toDF("iid", "lo", "hi")
    val plan = Joins.binnedRangeJoin(points, "v",
      ivals.hint("shuffle_hash"), "lo", "hi", 10L).queryExecution.executedPlan
    val str = plan.toString
    assert(!str.contains("BroadcastNestedLoopJoin"), str)
    assert(str.contains("ShuffledHashJoin") || str.contains("SortMergeJoin"), str)
  }

  test("salted join returns exactly the plain join's rows under skew") {
    val skewedLeft = (0 until 5000).map(i =>
      (if (i % 10 == 0) 1L else i.toLong % 97, i.toLong)).toDF("k", "v")
    val right = (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewedLeft.join(right, "k")
      .select(col("v"), col("name")).as[(Long, String)].collect().sorted.toSeq
    val salted = Joins.saltedEquiJoin(skewedLeft, right, "k")
      .select(col("v"), col("name")).as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("salted join plan: right side fans out ×salt, join keys carry the salt") {
    val left = (0 until 100).map(i => (1L, i.toLong)).toDF("k", "v")
    val right = (0L until 5L).map(k => (k, s"dim$k")).toDF("k", "name")
    val df = Joins.saltedEquiJoin(left, right, "k", salt = 8)
    val p = df.queryExecution.executedPlan.toString
    // the replication is a Generate(explode(sequence(0, salt-1))), and the
    // equi-join must include __salt so the hot key spreads over 8 reducers
    assert(p.contains("Generate explode"), p.take(600))
    assert(p.contains("__salt"), p.take(600))
    val joined = df.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joined.exists(_.condition.exists(_.references.exists(_.name == "__salt"))),
      "join condition lost the salt key")
    // broadcast would sidestep the reducer hot-spot entirely — with a
    // shuffle_hash hint (the declared q_join_skew_salted shape) the join
    // must stay a SHUFFLE join partitioned on (k, __salt)
    val shuffled = Joins.saltedEquiJoin(left, right.hint("shuffle_hash"), "k", salt = 8)
    val sp = shuffled.queryExecution.executedPlan.toString
    assert(sp.contains("ShuffledHashJoin") || sp.contains("SortMergeJoin"),
      s"hinted salted join still broadcasts:\n${sp.take(600)}")
    assert(!sp.contains("BroadcastHashJoin"), sp.take(600))
  }

  test("AQE skew join splits the hot partition natively (salted join's built-in twin)") {
    // the manual salted join (q_join_skew_salted) exists because a hot
    // key melts one reducer; Spark's OptimizeSkewedJoin does the same
    // split at runtime from shuffle statistics. Demonstrate it natively:
    // thresholds lowered to test scale, broadcast disabled so the join
    // must shuffle, and the final adaptive plan must carry a skew=true
    // sort-merge join while returning exactly the plain-join rows.
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pad = "x" * 100
      // half the rows land on key 1 → one reducer gets ~100× the median
      val left = (0 until 20000).map(i =>
        (if (i % 2 == 0) 1L else i.toLong % 97, pad + i)).toDF("k", "v")
      val right = (0L until 97L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = left.join(right, "k").select(col("v"), col("name"))
      // collect through THIS Dataset so its own QueryExecution runs —
      // .as[...] would plan (and adaptively finalize) a separate one
      val rows = joined.collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(800)}")
      assert(plan.contains("isFinalPlan=true"), plan.take(200))
      val salted = Joins.saltedEquiJoin(left, right.hint("shuffle_hash"), "k", salt = 8)
        .select(col("v"), col("name")).as[(String, String)].collect().sorted.toSeq
      assert(rows == salted, "AQE skew join and salted join disagree")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with zero Exchange") {
    import graft.tables.{Bucketing, Tables}
    val l = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(l, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan must be bucketed:\n$plan")
    assert(joined.count() == l.join(o, "l_orderkey").count())
  }

  test("skew profiler: stats replay and the verdict rule flips on the " +
    "manufactured hot key") {
    val rows = graft.SparkEntry.queries("q_skew_profile")(
      spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7)))).toMap
    // driver-side replay over the raw events
    val ev = graft.tables.Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def profile(key: ((Long, String)) => Long) = {
      val sizes = ev.groupBy(key).values.map(_.size.toLong).toSeq
      val nKeys = sizes.size.toLong; val nRows = sizes.sum
      val maxSz = sizes.max
      val sorted = sizes.sorted
      def sel(cond: (Long, Long) => Boolean): Long = {
        // smallest size whose cumulative key count satisfies cond —
        // over the value-sorted list, identical to the histogram scan
        var cum = 0L
        sorted.foreach { s2 => cum += 1
          if (cond(cum, nKeys)) return s2 }
        sorted.last
      }
      val p50 = sel((c, n) => c * 2 >= n)
      val p99 = sel((c, n) => c * 100 >= n * 99)
      val skew = (BigInt(maxSz) * nKeys * 1000000 / nRows).toLong
      val verdict = if (skew >= 10000000L) "salt_hot_keys"
        else if (nKeys <= 1024L) "broadcast_keys" else "plain_shuffle"
      (nRows, nKeys, maxSz, p50, p99, skew, verdict)
    }
    assert(rows("natural_user_id") == profile(_._1))
    assert(rows("click_rerouted") ==
      profile(e => if (e._2 == "click") 1L else e._1))
    // the profiler must separate the two regimes on this corpus (at
    // sf0.001 the mean is high — 15 users — so even the 20% hot key
    // sits under the 10× salt threshold; the verdict flip to
    // salt_hot_keys is exercised at sf0.01+, where the driver gate
    // pins it through the oracle)
    assert(rows("click_rerouted")._6 > rows("natural_user_id")._6 * 2,
      "manufactured hot key must register clearly higher skew")
    assert(rows("natural_user_id")._7 != "salt_hot_keys",
      "the natural key is not skewed and must not route to salting")
    // threshold fixtures for the branch the corpus does not reach
    assert({ val nKeys = 2000L; val skew = 1500000L
      !(skew >= 10000000L) && !(nKeys <= 1024L) }, "plain_shuffle branch")
  }

  test("q_skew_routed dispatches on the profiled regimes: salt fan for " +
    "the hot key, broadcast for the small-key side") {
    // sf0.01 is the smallest SF where the two regimes' verdicts diverge
    // (sf0.001's corpus is too small to trip the 10x skew rule): the
    // manufactured hot key must route through the salted join (Generate
    // x8 salt fan, __salt in the keys) while the natural sub-1024-key
    // regime broadcasts the dim — both visible in ONE executed plan.
    val sf = "/root/testdata/sf0.01"
    val prof = graft.SparkEntry.queries("q_skew_profile")(spark, sf)
      .select(col("profile"), col("verdict"))
      .as[(String, String)].collect().toMap
    assert(prof("click_rerouted") == "salt_hot_keys", prof.toString)
    assert(prof("natural_user_id") == "broadcast_keys", prof.toString)
    val routed = graft.SparkEntry.queries("q_skew_routed")(spark, sf)
    val p = routed.queryExecution.executedPlan.toString
    assert(p.contains("Generate explode") && p.contains("__salt"),
      "salt branch missing from the routed plan: " + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "broadcast branch missing from the routed plan: " + p.take(800))
    // the emitted verdict column is the routing decision under the gate's
    // hash — it must agree with the profiler row for row
    val emitted = routed.select(col("profile"), col("verdict")).distinct()
      .as[(String, String)].collect().toMap
    assert(emitted == prof, s"routed verdicts $emitted != profiler $prof")
  }
}
