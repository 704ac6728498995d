package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke (NEXT.md #7): synthesize an sf1-equivalent lineitem/orders
  * (~6M/1.5M rows) in /tmp by replicating sf0.1 with shifted keys, then
  * run the headline join/agg/window shapes and print per-query seconds.
  * Proves the plans survive a 10× scale-up with bounded shuffle
  * partitions (spills instead of OOM). Usage: runMain graft.ScaleProof
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors)}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.tables.Tables

    val base = "/root/testdata/sf0.1"
    val dir = "/tmp/graft_sf1"
    val t0 = System.nanoTime()
    // replicate with a fixed key shift (same for both tables, so
    // l_orderkey ↔ o_orderkey joins stay aligned across copies)
    val Shift = 10000000L
    def replicate(name: String, keyCols: Seq[String]): Unit = {
      val df = Tables.table(spark, base, name)
      val out = (0 until copies).map { i =>
        keyCols.foldLeft(df) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * Shift)) }
      }.reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey"))
    spark.read.parquet(s"$base/customer.parquet").write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    println(f"[scale] synthesized ${copies}x data in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(s"[scale] lineitem rows: ${spark.read.parquet(s"$dir/lineitem.parquet").count()}")

    Seq("q1_pricing_summary", "q_join_shuffle", "q_window_rank",
      "q_agg_count_distinct", "q_join_range").foreach { name =>
      val t = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[scale] $name%-24s ${(System.nanoTime() - t) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
