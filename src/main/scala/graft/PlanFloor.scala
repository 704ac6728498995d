package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: where does the ~0.6 s/query fixed floor go?
  *
  * For every declared query, splits wall time into Catalyst's tracked
  * phases (analysis / optimization / physical planning) and execution
  * (which embeds whole-stage codegen + janino compile). Prints a sorted
  * table plus totals, and the JVM-wide janino compile counters from
  * CodegenMetrics. Run at a small SF so execution is mostly overhead:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.PlanFloor"
  */
object PlanFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // static conf: the janino class cache defaults to 100 entries — far
      // below this suite's ~1,700 generated classes; measure eviction churn
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tables.Tables.enableCache()
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    // `build` = query-construction wall time, which for the ANN queries
    // INCLUDES their eager training jobs (localCheckpoint actions fire
    // while the DataFrame is being assembled) — it is an upper bound on
    // analysis, not pure Catalyst time. optim/plan are tracker-exact.
    final case class Row(name: String, buildMs: Long, optMs: Long,
        planMs: Long, execMs: Long) {
      def totalMs: Long = buildMs + optMs + planMs + execMs
    }
    val rows = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1000000
      val qe = df.queryExecution
      qe.executedPlan // force optimization + planning
      val phases = qe.tracker.phases
      def ms(p: String): Long = phases.get(p).map(s => s.endTimeMs - s.startTimeMs).getOrElse(0L)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val exec = (System.nanoTime() - t1) / 1000000
      Row(name, math.max(ms("analysis"), built), ms("optimization"), ms("planning"), exec)
    }
    println(f"${"query"}%-28s ${"build"}%6s ${"optim"}%6s ${"plan"}%6s ${"exec"}%7s ${"total"}%7s")
    rows.sortBy(-_.totalMs).foreach { r =>
      println(f"${r.name}%-28s ${r.buildMs}%6d ${r.optMs}%6d ${r.planMs}%6d ${r.execMs}%7d ${r.totalMs}%7d")
    }
    val tA = rows.map(_.buildMs).sum; val tO = rows.map(_.optMs).sum
    val tP = rows.map(_.planMs).sum; val tE = rows.map(_.execMs).sum
    println(f"TOTALS  build(incl. eager training)=${tA / 1000.0}%.1fs " +
      f"optimization=${tO / 1000.0}%.1fs " +
      f"planning=${tP / 1000.0}%.1fs exec=${tE / 1000.0}%.1fs  n=${rows.size}")
    // JVM-wide janino compile cost (histograms: count of compilations and
    // sampled mean ms — the total is approximately count × mean)
    import org.apache.spark.metrics.source.CodegenMetrics._
    val n = METRIC_COMPILATION_TIME.getCount
    val mean = METRIC_COMPILATION_TIME.getSnapshot.getMean
    println(f"codegen: compilations=$n meanMs=$mean%.1f approxTotal=${n * mean / 1000.0}%.1fs")
    spark.stop()
  }
}
