package graft.kinesis

import AggRecordCodec.{Aggregate, Builder}

/** A completed batch leaving the packer: the aggregate plus the raw
  * payload shadow list the sink needs to rebuild it on failure
  * (reference: `MyAggregator.scala:11-22`). Unlike the reference, the
  * shadow list always contains exactly the emitted aggregate's payloads —
  * the reference leaks prior payloads into the next batch when the
  * aggregator auto-emits on hard-cap overflow (it never clears
  * `dataList` on that path).
  */
final case class PackedBatch(
    aggregate: Aggregate,
    shadow: IndexedSeq[Array[Byte]]) {
  def numUserRecords: Int = aggregate.numUserRecords
  def sizeBytes: Int = aggregate.sizeBytes
  /** Routing key = the first record's EHK (reference `AggRecord.java:
    * 177-180`) — derived, so it can't drift from actual wire routing. */
  def explicitHashKey: String = aggregate.explicitHashKey
}

/** Completion listener (R22 analog, reference `RecordAggregator.java:
  * 40-46,78-85`): notified with each aggregate the packer emits, on the
  * supplied `Executor` (the reference defaults to the common pool; the
  * packer defaults to the calling thread so Spark task code stays
  * deterministic unless a caller opts into async). */
trait RecordCompleteListener {
  def recordComplete(batch: PackedBatch): Unit
}

/** Size-bounded greedy packer (reference driver loop,
  * `KinesisWriter.scala:147-197`): an order-preserving iterator
  * transformation with O(1 aggregate) memory — exactly the shape Spark
  * wants inside `mapPartitions`, where each partition's iterator is
  * packed independently and in parallel across executors.
  *
  * Gate semantics (reproduced exactly):
  *  - while the current aggregate's serialized size is below
  *    `maxAggSize` (1,000,000 B), keep adding;
  *  - once at/over `maxAggSize`: a record ≤ `maxLastSize` (100,000 B) is
  *    admitted as the *last* record (then flush), a larger one forces a
  *    flush first (reference `:152-180`);
  *  - the 1,048,576 B wire hard cap is never exceeded — the builder
  *    rejects and the packer emits + re-adds (reference
  *    `RecordAggregator.java:72-95`, the "should not actually happen"
  *    branch, which in fact can happen);
  *  - end of input flushes the remainder (reference `:188-196`).
  *
  * `routeEhk` is drawn once per emitted aggregate (reference `:184`).
  */
final class BatchingIterator(
    records: Iterator[(String, Option[String], Array[Byte])],
    routeEhk: () => String,
    maxAggSize: Int = 1000000,
    maxLastSize: Int = 100000)
  extends Iterator[PackedBatch] {

  private val builder = new Builder
  private val shadow = IndexedSeq.newBuilder[Array[Byte]]
  private var currentEhk: String = routeEhk()
  private var pending: Option[PackedBatch] = None
  private var exhausted = false
  private var listeners =
    List.empty[(RecordCompleteListener, java.util.concurrent.Executor)]

  /** Register a completion listener (R22; reference
    * `RecordAggregator.onRecordComplete`). Default executor is the
    * calling thread — pass a pool to match the reference's async default. */
  def onRecordComplete(l: RecordCompleteListener,
      executor: java.util.concurrent.Executor = (r: Runnable) => r.run()): this.type = {
    listeners = listeners :+ ((l, executor)) // FIFO, like the reference
    this
  }

  def clearListeners(): Unit = listeners = Nil

  private def emit(): Option[PackedBatch] =
    builder.clearAndGet().map { agg =>
      val batch = PackedBatch(agg, shadow.result())
      shadow.clear()
      currentEhk = routeEhk()
      listeners.foreach { case (l, ex) =>
        // a throwing listener must not abort the packing iterator (and
        // thereby fail the Spark task mid-write → duplicate re-sends);
        // observers are best-effort, as the reference's executor isolation
        // implies
        try ex.execute(() => l.recordComplete(batch))
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[batching] recordComplete listener failed: $e")
        }
      }
      batch
    }

  /** Add to a just-emptied builder; a single record that cannot fit in an
    * empty aggregate is an error (reference: `RecordAggregator.java:91-93`). */
  private def addOrThrow(pk: String, ehk: Option[String], data: Array[Byte]): Unit = {
    require(builder.add(pk, ehk, data),
      s"Unable to add user record of ${data.length} bytes to an empty aggregate")
    shadow += data
  }

  private def advance(): Unit = {
    while (pending.isEmpty && !exhausted) {
      if (!records.hasNext) {
        exhausted = true
        pending = emit()
      } else {
        val (pk, ehkOpt, data) = records.next()
        val ehk = ehkOpt.orElse(Some(currentEhk)) // routed before any flush
        if (builder.sizeBytes >= maxAggSize) {
          if (data.length > maxLastSize) {
            // too big to be the last record: flush first, record opens the
            // next aggregate (reference `:153-160`)
            val done = emit()
            addOrThrow(pk, ehk, data)
            pending = done
          } else if (builder.add(pk, ehk, data)) {
            // admitted as the final record, then flush (reference `:161-175`)
            shadow += data
            pending = emit()
          } else {
            // hard-cap reject at the gate (reference's "should not actually
            // happen" warn branch): emit without the record, re-add to fresh
            val done = emit()
            addOrThrow(pk, ehk, data)
            pending = done
          }
        } else if (builder.add(pk, ehk, data)) {
          shadow += data // still filling; nothing to emit
        } else {
          // hard-cap overflow below the gate (large record): emit + re-add
          val done = emit()
          addOrThrow(pk, ehk, data)
          pending = done
        }
      }
    }
  }

  override def hasNext: Boolean = { advance(); pending.isDefined }

  override def next(): PackedBatch = {
    advance()
    val out = pending.getOrElse(throw new NoSuchElementException("empty"))
    pending = None
    out
  }
}
