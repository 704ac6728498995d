package graft.kinesis

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.Check

/** Packing invariants of the size-bounded greedy batcher (SURVEY §5.2.3):
  * no record lost/reordered/split, hard cap respected, batch boundaries
  * only where the gate demands, counts sum, determinism.
  */
class BatchingSpec extends AnyFunSuite {

  private val MaxAgg = 10000
  private val MaxLast = 1000

  private def pack(payloads: Seq[Array[Byte]],
      maxAgg: Int = MaxAgg, maxLast: Int = MaxLast): Seq[PackedBatch] = {
    val router = new ShardModel.Router(Array("1", "2", "3"), 7L)
    new BatchingIterator(
      payloads.iterator.map(p => ("a", Option.empty[String], p)),
      () => router.next(), maxAgg, maxLast).toSeq
  }

  private val genPayloads: Gen[List[Array[Byte]]] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n,
      Gen.frequency(
        5 -> Gen.chooseNum(0, 400),    // typical small records
        2 -> Gen.chooseNum(400, 1000), // near the last-record bound
        1 -> Gen.chooseNum(1001, 1500) // force the flush-first path
      ).map(sz => Array.fill[Byte](sz)((sz % 31).toByte))))

  test("no record lost, reordered, or split; counts sum") {
    Check.okNoShrink(genPayloads) { payloads =>
      val batches = pack(payloads)
      val roundTrip = batches.flatMap(_.aggregate.records.map(_.data.toSeq))
      roundTrip == payloads.map(_.toSeq) &&
        batches.map(_.numUserRecords).sum == payloads.length &&
        batches.forall(b => b.shadow.map(_.toSeq) ==
          b.aggregate.records.map(_.data.toSeq))
    }
  }

  test("every non-final batch was closed by the gate; none exceed cap") {
    Check.okNoShrink(genPayloads) { payloads =>
      val batches = pack(payloads)
      val wireOk = batches.forall { b =>
        val wire = b.aggregate.toRecordBytes
        wire.length == b.sizeBytes && wire.length <= AggRecordCodec.MaxBytesPerRecord
      }
      // records here are far below the hard cap, so every emission is via
      // the maxAgg gate ⇒ each non-final batch reached the gate. Upper
      // bound: crossing record (≤1500+slack) + admitted last record
      // (≤ maxLast+slack) on top of gate-1.
      val boundsOk = batches.dropRight(1).forall { b =>
        b.sizeBytes >= MaxAgg && b.sizeBytes <= MaxAgg + 1600 + MaxLast + 200
      }
      wireOk && boundsOk
    }
  }

  test("deterministic: same input gives identical batches") {
    Check.okNoShrink(genPayloads) { payloads =>
      val a = pack(payloads).map(b => (b.sizeBytes, b.numUserRecords, b.explicitHashKey))
      val b = pack(payloads).map(b => (b.sizeBytes, b.numUserRecords, b.explicitHashKey))
      a == b
    }
  }

  // 20 × 500B ≈ 10.2KB encoded: below the gate after 19 records, at/over
  // it after the 20th — so the 21st record arrives exactly at the gate.
  private val fillToGate = Seq.fill(20)(Array.fill[Byte](500)(1))

  test("big record (> maxLast) at the gate flushes first, then opens next batch") {
    val big = Array.fill[Byte](1200)(2)
    val batches = pack(fillToGate :+ big)
    assert(batches.size == 2)
    assert(batches(0).numUserRecords == 20, "full batch flushed without the big record")
    assert(batches(1).aggregate.records.head.data.length == 1200,
      "big record must open the next batch")
  }

  test("small record at the gate is admitted as the last record") {
    val smallLast = Array.fill[Byte](200)(3)
    val batches = pack(fillToGate :+ smallLast)
    assert(batches.size == 1 && batches.head.numUserRecords == 21)
    // the 200B record rides along as the last record of the full batch
    assert(batches.head.aggregate.records.last.data.length == 200)
  }

  test("completion listeners fire once per emitted aggregate (R22)") {
    val payloads = (0 until 50).map(i => Array.fill[Byte](400)((i % 31).toByte))
    val router = new ShardModel.Router(Array("1", "2", "3"), 7L)
    val seen = scala.collection.mutable.ArrayBuffer.empty[PackedBatch]
    val it = new BatchingIterator(
      payloads.iterator.map(p => ("a", Option.empty[String], p)),
      () => router.next(), MaxAgg, MaxLast)
    it.onRecordComplete((b: PackedBatch) => seen.synchronized { seen += b; () })
    val batches = it.toSeq
    assert(batches.size > 1)
    assert(seen.toSeq.map(_.explicitHashKey) == batches.map(_.explicitHashKey))
    assert(seen.map(_.numUserRecords).sum == 50)
  }

  test("completion listeners run on the supplied executor (async, R22)") {
    val payloads = (0 until 50).map(i => Array.fill[Byte](400)((i % 31).toByte))
    val router = new ShardModel.Router(Array("1", "2", "3"), 7L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    val callerThreads = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    try {
      val it = new BatchingIterator(
        payloads.iterator.map(p => ("a", Option.empty[String], p)),
        () => router.next(), MaxAgg, MaxLast)
      it.onRecordComplete((b: PackedBatch) => {
        callerThreads.add(Thread.currentThread().getId)
        count.incrementAndGet(); ()
      }, pool)
      val n = it.toSeq.size
      pool.shutdown()
      assert(pool.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS))
      assert(count.get() == n)
      assert(!callerThreads.contains(Thread.currentThread().getId))
    } finally pool.shutdownNow()
  }

  test("a throwing listener does not abort packing; FIFO order kept") {
    val payloads = (0 until 50).map(i => Array.fill[Byte](400)((i % 31).toByte))
    val router = new ShardModel.Router(Array("1", "2", "3"), 7L)
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = new BatchingIterator(
      payloads.iterator.map(p => ("a", Option.empty[String], p)),
      () => router.next(), MaxAgg, MaxLast)
    it.onRecordComplete((_: PackedBatch) => { order += "first"; () })
    it.onRecordComplete((_: PackedBatch) =>
      throw new RuntimeException("observer boom"))
    it.onRecordComplete((_: PackedBatch) => { order += "third"; () })
    val batches = it.toSeq // must not throw
    assert(batches.map(_.numUserRecords).sum == 50)
    assert(order.take(2) == Seq("first", "third")) // FIFO, boom skipped
  }

  test("reference constants: ~1MB aggregates from 100B records") {
    val payloads = (0 until 25000).map(i => Array.fill[Byte](100)((i % 100).toByte))
    val router = new ShardModel.Router(Array("5"), 1L)
    val batches = new BatchingIterator(
      payloads.iterator.map(p => ("a", Option.empty[String], p)),
      () => router.next()).toSeq
    assert(batches.map(_.numUserRecords).sum == 25000)
    batches.dropRight(1).foreach { b =>
      assert(b.sizeBytes >= 1000000 && b.sizeBytes <= AggRecordCodec.MaxBytesPerRecord)
    }
    // ~104B encoded per record → ≈9600 records per aggregate
    assert(batches.head.numUserRecords > 9000)
  }
}
