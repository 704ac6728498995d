package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable distributed join operators beyond the built-in join types:
  * as-of joins and salt-based skew mitigation.
  */
object Joins {

  /** As-of join: for each left row (identified by the unique `leftId`),
    * the single right row with the largest `rightTime` ≤ (or <, when
    * `strict`) `leftTime` within the same `keys` group — composed from an
    * equi-join + ranked window (SURVEY §7.2: built-ins express this; no
    * custom SparkPlan needed). `tolerance` optionally bounds how far back
    * a match may reach, which also bounds the per-key match set at scale.
    *
    * Scale: both the join and the window shuffle on the same key space;
    * `tieBreak` must totally order the right side for determinism.
    */
  def asof(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftId: Column, leftTime: Column, rightTime: Column, tieBreak: Column,
      strict: Boolean = true,
      tolerance: Option[Column] = None): DataFrame = {
    val timeCond = if (strict) rightTime < leftTime else rightTime <= leftTime
    val cond = keys.map(k => left(k) === right(k))
      .reduceOption(_ && _).map(_ && timeCond).getOrElse(timeCond)
    val condTol = tolerance.map(t => cond && rightTime >= leftTime - t).getOrElse(cond)
    val w = Window.partitionBy(leftId).orderBy(rightTime.desc, tieBreak)
    left.join(right, condTol, "inner")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** As-of join on the native plan node ([[graft.plans.AsOfJoinExec]]):
    * same semantics as [[asof]] but executed as a co-partitioned sorted
    * merge — O(n+m) per partition, one buffered right row of state, no
    * pair materialization and no window exchange. Inner semantics
    * (unmatched left rows drop); output = left columns ++ right columns.
    * Time columns must be non-null TimestampType/LongType.
    */
  def asofNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      strict: Boolean = true,
      outer: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so a self-join gets fresh attribute ids —
    // DeduplicateRelations doesn't visit custom logical nodes.
    val rPlan = right
      .select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val plan = graft.plans.AsOfJoin(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), strict,
      outer, toleranceUs)
    // drop the right-side key duplicates (standard as-of output shape)
    val keep = lPlan.output ++ rPlan.output.filterNot(a => keys.contains(a.name))
    org.apache.spark.sql.GraftBridge.ofRows(spark, plan)
      .select(keep.map(a =>
        org.apache.spark.sql.GraftBridge.toColumn(a)).toIndexedSeq: _*)
  }

  /** Skew-mitigating equi-join: scatter each left row to one of `salt`
    * sub-keys and replicate every right row to all of them, so a hot key
    * spreads over `salt` reduce partitions instead of hot-spotting one.
    * Result is identical to `left.join(right, key)` (inner). Use for
    * deterministic layout control where AQE skew handling can't reach
    * (e.g. a skewed aggregate feeding a non-AQE stage).
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 1, "salt must spread keys")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Pure range join (`left.vCol` BETWEEN `right.loCol` AND `right.hiCol`
    * with NO equi key) executed as an equi-join on overlapping bins —
    * open-source Spark plans the naive form as a broadcast-nested-loop
    * join, which compares every pair and dies at fact×fact scale.
    *
    * Each right interval replicates to the `⌈width/binWidth⌉+1` bins it
    * overlaps (`sequence(floor(lo/w), floor(hi/w))`); each left point
    * lands in exactly one bin, so after the bin equi-join the exact
    * BETWEEN re-filter yields each matching pair EXACTLY once (a point's
    * bin is unique, and it lies within an interval's bin list iff the
    * point could match). Cost: one hash shuffle on bin ids + interval
    * replication ×(avg-width/binWidth + 1); pick `binWidth` ≈ the typical
    * interval width so replication stays O(1) per interval. Result is
    * identical to `left.join(right, v between lo and hi)` — the declared
    * query's oracle IS the naive form. Columns must be numeric (map
    * times to epoch days/seconds first).
    */
  def binnedRangeJoin(left: DataFrame, vCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", floor(col(vCol) / binWidth))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    l.join(r, Seq("__bin"))
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__bin")
  }
}
