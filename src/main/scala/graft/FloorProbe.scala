package graft

import org.apache.spark.sql.SparkSession

/** Micro-probe for the per-query exec floor: run a few representative
  * queries repeatedly in one session. Repeat runs hit the codegen cache
  * (same generated source), so (first − repeat) isolates janino compile;
  * the repeat time itself is pure scheduling + execution. Also prints
  * the job count each query triggers (AQE runs one job per shuffle
  * stage) — a 3-job trivial query pays 3 driver round-trips.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.tables.Tables.enableCache()
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val names = Seq("q_null_handling", "q_math_funs", "q_try_cast",
      "q_agg_percentile_disc", "q_agg_cube", "q_window_rank", "q1_pricing_summary")
    names.foreach { name =>
      val times = (0 until 4).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1000000, jobs.get() - j0)
      }
      println(f"$name%-24s " + times.map { case (ms, j) => f"$ms%5d ms/$j%d jobs" }.mkString("  "))
    }
    import org.apache.spark.metrics.source.CodegenMetrics._
    val n = METRIC_COMPILATION_TIME.getCount
    val mean = METRIC_COMPILATION_TIME.getSnapshot.getMean
    println(f"codegen: compilations=$n meanMs=$mean%.1f approxTotal=${n * mean / 1000.0}%.1fs")
    spark.stop()
  }
}
