package graft.kinesis

import java.math.BigInteger
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.annotation.tailrec
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** One PutRecords entry: the aggregate's first PK/EHK + wire bytes
  * (reference: `AggRecord.java:186-193`). */
final case class PutEntry(partitionKey: String, explicitHashKey: String, data: Array[Byte])

final case class PutResult(failedRecordCount: Int, shardIds: Seq[String])

/** Transport boundary. The AWS SDK is not resolvable offline (and the
  * engine is cloud-agnostic); production would implement this with
  * `KinesisClient.putRecords`. Tests use [[InMemoryKinesis]], including
  * injected fault schedules for the retry path. Must be serializable:
  * instances ship to executor tasks.
  */
trait PutRecordsTransport extends Serializable {
  def putRecords(streamName: String, entries: Seq[PutEntry]): PutResult
}

/** In-memory Kinesis stand-in: n open shards evenly splitting the uint128
  * keyspace; records land on the shard whose hash range contains their
  * EHK. `failEvery` injects a deterministic failure on every k-th call to
  * exercise the rebuild-retry path.
  *
  * State lives in a JVM-static registry keyed by instance id: Spark
  * serializes task closures even under `local[*]`, so instance fields
  * would silo state per task copy — the static map keeps all task copies
  * and the driver looking at the same stream (single-JVM test transport).
  */
object InMemoryKinesis {
  private[kinesis] final class State {
    val calls = new AtomicLong(0)
    val received = new ConcurrentHashMap[String, java.util.List[Array[Byte]]]()
  }
  private val registry = new ConcurrentHashMap[String, State]()
  private[kinesis] def state(id: String): State =
    registry.computeIfAbsent(id, _ => new State)
}

final class InMemoryKinesis(numShards: Int, failEvery: Int = 0,
    /** stable name so the streaming source can address this stream */
    val id: String = java.util.UUID.randomUUID().toString)
  extends PutRecordsTransport with ShardLister {
  private val ranges = ShardModel.evenRanges(numShards)
  private def st = InMemoryKinesis.state(id)
  def received: ConcurrentHashMap[String, java.util.List[Array[Byte]]] = st.received

  override def page(streamName: String, token: Option[String]): (Seq[ShardInfo], Boolean) = {
    // two pages to exercise the pagination path
    val shards = ranges.zipWithIndex.map { case ((lo, hi), i) =>
      ShardInfo(f"shardId-$i%012d", lo.toString, hi.toString, None)
    }
    token match {
      case None => (shards.take((numShards + 1) / 2), numShards > 1)
      case Some(t) => (shards.dropWhile(_.shardId <= t), false)
    }
  }

  private def shardFor(ehk: String): String = {
    val k = new BigInteger(ehk)
    val i = ranges.indexWhere { case (lo, hi) => k.compareTo(lo) >= 0 && k.compareTo(hi) <= 0 }
    f"shardId-$i%012d"
  }

  override def putRecords(streamName: String, entries: Seq[PutEntry]): PutResult = {
    val s = st
    val n = s.calls.incrementAndGet()
    if (failEvery > 0 && n % failEvery == 0) return PutResult(entries.size, Seq.empty)
    val shards = entries.map { e =>
      val sid = shardFor(e.explicitHashKey)
      s.received.computeIfAbsent(sid, _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Array[Byte]]()))
        .add(e.data)
      sid
    }
    PutResult(0, shards)
  }
}

/** At-least-once sink with rebuild-retry (reference:
  * `KinesisWriter.scala:199-228`): any failed record fails the whole
  * aggregate; on failure the aggregate is rebuilt from the raw shadow
  * payloads with a freshly drawn EHK (so a hot shard is re-rolled) and
  * resent. Two deliberate deviations from the reference, which has an
  * un-incremented `failCount` (`KinesisWriter.scala:92` returns it
  * unchanged) making its 30-retry cap dead code and its back-off a flat
  * 2 s forever: retries here are bounded and exponential.
  */
object KinesisSinkSemantics {

  final case class Config(
      streamName: String,
      maxRetries: Int = 30,
      /** base back-off; doubles per attempt, capped at 30 s */
      backoffMillis: Long = 100,
      maxAggSize: Int = 1000000,
      maxLastSize: Int = 100000,
      partitionKey: String = "a", // the reference routes purely by EHK ("a" for every record, `KinesisWriter.scala:154`)
      routerSeed: Long = 42L,
      /** per-shard 1 MiB/s + 1000 rec/s budget ([[ShardThrottle]]);
        * None = unthrottled (tests, unlimited transports) */
      throttle: Option[ShardThrottle] = None)

  private def backoff(cfg: Config, attempt: Int): Unit =
    Thread.sleep(math.min(cfg.backoffMillis << attempt, 30000L))

  /** Send one packed batch, rebuilding from the shadow payloads with a
    * freshly drawn EHK on each failure (re-rolling a hot shard, reference
    * `:217-224`). The rebuild repacks through the full gate logic: a
    * longer replacement EHK can push an at-the-cap aggregate over 1 MiB,
    * in which case the rebuild legitimately splits into several entries
    * rather than failing. Rebuilt records carry `cfg.partitionKey`, as in
    * the reference (routing is EHK-only; the shadow holds payloads only,
    * `MyAggregator.scala:11-22`). Semantics are at-least-once: a failure
    * after a partial multi-entry send re-sends the whole shadow.
    */
  def sendWithRetry(
      batch: PackedBatch,
      transport: PutRecordsTransport,
      router: ShardModel.Router,
      cfg: Config): Unit = {
    @tailrec
    def attempt(entries: Seq[PutEntry], failCount: Int): Unit = {
      val ok = try entries.forall { e =>
        // backpressure: block until the target shard (identified by its
        // routing EHK) has 1 MiB/s + 1000 rec/s budget for this entry
        cfg.throttle.foreach(_.acquire(e.explicitHashKey, e.data.length.toLong))
        transport.putRecords(cfg.streamName, Seq(e)).failedRecordCount == 0
      }
      catch { case scala.util.control.NonFatal(_) => false }
      if (!ok) {
        if (failCount >= cfg.maxRetries)
          throw new IllegalStateException(
            s"Exponential back-off failed after $failCount retries. Giving up.")
        backoff(cfg, failCount)
        val ehk = router.next()
        val rebuilt = new BatchingIterator(
          batch.shadow.iterator.map(p => (cfg.partitionKey, Some(ehk), p)),
          () => router.next(), cfg.maxAggSize, cfg.maxLastSize)
          .map(b => PutEntry(b.aggregate.partitionKey,
            b.aggregate.explicitHashKey, b.aggregate.toRecordBytes))
          .toSeq
        attempt(rebuilt, failCount + 1)
      }
    }
    val agg = batch.aggregate
    attempt(Seq(PutEntry(agg.partitionKey, agg.explicitHashKey, agg.toRecordBytes)), 0)
  }

  /** Write one partition's payload iterator: pack (R8–R15) → send (R19).
    * Returns the number of user records written (R21). */
  def writePartition(
      payloads: Iterator[Array[Byte]],
      transport: PutRecordsTransport,
      ehks: Array[String],
      cfg: Config,
      partitionId: Int = 0): Long = {
    // per-partition seed keeps routing deterministic yet de-correlated
    val router = new ShardModel.Router(ehks, cfg.routerSeed + partitionId)
    val batches = new BatchingIterator(
      payloads.map(p => (cfg.partitionKey, Option.empty[String], p)),
      () => router.next(), cfg.maxAggSize, cfg.maxLastSize)
    var count = 0L
    batches.foreach { b =>
      sendWithRetry(b, transport, router, cfg)
      count += b.numUserRecords
    }
    count
  }

  /** Distributed write of a binary-payload Dataset/DataFrame column.
    * Shard metadata is fetched once on the driver (as the reference does
    * once per `write` call); each partition packs and sends independently —
    * the Spark-native equivalent of the reference's single-threaded loop,
    * with Spark task retry supplying at-least-once on top.
    */
  def write(df: DataFrame, payloadCol: String, transport: PutRecordsTransport,
      lister: ShardLister, cfg: Config): Long = {
    val ehks = ShardModel.explicitHashKeys(cfg.streamName, lister)
    require(ehks.nonEmpty, s"stream ${cfg.streamName} has no open shards")
    val acc = df.sparkSession.sparkContext.longAccumulator("kinesis.userRecords")
    df.select(col(payloadCol)).queryExecution.toRdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val payloads = rows.map(_.getBinary(0))
      acc.add(writePartition(payloads, transport, ehks, cfg, pid))
    }
    acc.value
  }

  /** Structured Streaming entry: attach as `df.writeStream.foreachBatch(
    * KinesisSinkSemantics.foreachBatch(payloadCol, transport, lister, cfg))`. */
  def foreachBatch(payloadCol: String, transport: PutRecordsTransport,
      lister: ShardLister, cfg: Config): (DataFrame, Long) => Unit =
    (df: DataFrame, _: Long) => { write(df, payloadCol, transport, lister, cfg); () }
}
