package graft.kinesis

import org.scalatest.funsuite.AnyFunSuite

/** Single-thread packer/codec throughput — the engine-side analog of the
  * reference's "maximum throughput possible" goal. The reference is
  * network-bound against real Kinesis (1 MiB/s/shard service cap); the
  * library-side cost is the aggregation itself, measured here. Spark then
  * multiplies this per-partition rate by the task count.
  */
class ThroughputSpec extends AnyFunSuite {

  test("packing sustains >100 MB/s and >500k records/s single-threaded") {
    val payload = Array.fill[Byte](100)(7)
    val n = 200000
    // warmup
    new BatchingIterator(Iterator.fill(20000)(("a", None, payload)), () => "1").foreach(_ => ())
    val t0 = System.nanoTime()
    var records = 0L; var bytes = 0L
    new BatchingIterator(Iterator.fill(n)(("a", Option.empty[String], payload)), () => "1")
      .foreach { b => records += b.numUserRecords; bytes += b.sizeBytes }
    val secs = (System.nanoTime() - t0) / 1e9
    val mbps = bytes / 1e6 / secs
    val rps = records / secs
    info(f"packer: $mbps%.0f MB/s, $rps%.0f records/s (n=$n, 100B records)")
    assert(records == n)
    assert(mbps > 100, f"packing too slow: $mbps%.1f MB/s")
    assert(rps > 500000, f"packing too slow: $rps%.0f records/s")
  }

  test("wire serialization + decode sustain >100 MB/s") {
    val payload = Array.fill[Byte](1000)(3)
    val b = new AggRecordCodec.Builder
    while (b.add("a", Some("123"), payload)) ()
    val agg = b.clearAndGet().get
    val wire = agg.toRecordBytes // ~1MB
    // warmup
    (0 until 20).foreach(_ => AggRecordCodec.decode(agg.toRecordBytes))
    val rounds = 200
    val t0 = System.nanoTime()
    var total = 0L
    (0 until rounds).foreach { _ =>
      total += AggRecordCodec.decode(agg.toRecordBytes).numUserRecords
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val mbps = rounds.toLong * wire.length * 2 / 1e6 / secs // encode + decode
    info(f"codec: $mbps%.0f MB/s round-trip (1MB aggregates)")
    assert(total == rounds.toLong * agg.numUserRecords)
    assert(mbps > 100, f"codec too slow: $mbps%.1f MB/s")
  }
}
