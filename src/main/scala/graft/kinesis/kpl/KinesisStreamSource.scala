package graft.kinesis.kpl

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.kinesis.{AggRecordCodec, InMemoryKinesis}

/** Structured Streaming source with Kinesis consumer semantics
  * (BASELINE.json's "Structured Streaming + Kinesis source"): micro-batch
  * offsets are per-shard cursors into each shard's aggregate sequence —
  * exactly how a Kinesis consumer tracks per-shard sequence numbers — and
  * each micro-batch plans one input partition per shard with new data, so
  * read parallelism = shard count, as on the real service.
  *
  * Aggregates are decoded (KPL magic‖protobuf‖MD5 → user records) in the
  * reader, yielding one row per user record:
  * (shard_id, agg_seq, partition_key, explicit_hash_key, data).
  *
  * Backed by [[InMemoryKinesis]] (addressed via option `kinesis.id`) —
  * the production path would implement the same two classes over
  * GetShardIterator/GetRecords; offsets, planning, and decode are
  * transport-independent.
  * Usage: {{{
  *   spark.readStream.format("graft.kinesis.kpl.KinesisStreamSource")
  *     .option("kinesis.id", stream.id).load()
  * }}}
  */
class KinesisStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisStreamTable(properties.get("kinesis.id"))
}

object KinesisStreamSource {
  val Name = "graft.kinesis.kpl.KinesisStreamSource"
  val schema: StructType = StructType(Seq(
    StructField("shard_id", StringType, nullable = false),
    StructField("agg_seq", IntegerType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField("explicit_hash_key", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  /** shard → number of aggregates currently readable. */
  private[kpl] def shardSizes(id: String): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    InMemoryKinesis.state(id).received.asScala.map { case (k, v) => k -> v.size }.toMap
  }

  /** shard → (parent ids, count-at-close if closed) — the lineage the
    * parent-before-child gate in [[KinesisMicroBatchStream]] consults. */
  private[kpl] def shardLineage(id: String): Map[String, (Seq[String], Option[Int])] = {
    val st = InMemoryKinesis.state(id)
    st.shards.synchronized {
      import scala.jdk.CollectionConverters._
      st.shards.entrySet().iterator().asScala
        .map(e => e.getKey -> (e.getValue.parents, e.getValue.closedAt)).toMap
    }
  }
  private[kpl] def slice(id: String, shard: String, from: Int, until: Int): Seq[Array[Byte]] = {
    val list = InMemoryKinesis.state(id).received.get(shard)
    if (list == null) Seq.empty
    else list.synchronized {
      (from until math.min(until, list.size)).map(list.get)
    }
  }
}

final class KinesisStreamTable(id: String) extends Table with SupportsRead {
  require(id != null, "option kinesis.id required")
  override def name(): String = s"kinesis:$id"
  override def schema(): StructType = KinesisStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisMicroBatchStream(id)
      }
    }
}

/** Per-shard cursor offset, JSON-serialized for the checkpoint log. */
final case class ShardCursors(cursors: Map[String, Int]) extends Offset {
  override def json(): String =
    cursors.toSeq.sortBy(_._1)
      .map { case (s, c) => s""""$s":$c""" }.mkString("{", ",", "}")
}

object ShardCursors {
  private val entry = """"([^"]+)"\s*:\s*(\d+)""".r
  def fromJson(json: String): ShardCursors =
    ShardCursors(entry.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toInt).toMap)
}

final class KinesisMicroBatchStream(id: String) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  override def initialOffset(): Offset = ShardCursors(Map.empty)

  /** Kinesis resharding ordering: a child shard's cursor may not advance
    * until every parent is fully drained as of this batch's START offset
    * (cursor ≥ the parent's count-at-close). Until then the child reports
    * its start cursor, so its rows surface only in a later micro-batch —
    * parent before child, the KCL lease ordering guarantee. Implemented
    * via SupportsAdmissionControl (the start-aware latestOffset);
    * commit-time tracking would lag a batch and stall processAllAvailable.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val done = start.asInstanceOf[ShardCursors].cursors
    val sizes = KinesisStreamSource.shardSizes(id)
    val lineage = KinesisStreamSource.shardLineage(id)
    ShardCursors(sizes.map { case (shard, size) =>
      val parents = lineage.get(shard).map(_._1).getOrElse(Seq.empty)
      val parentsDrained = parents.forall { p =>
        lineage.get(p).flatMap(_._2)
          .exists(closedAt => done.getOrElse(p, 0) >= closedAt)
      }
      shard -> (if (parentsDrained) size else done.getOrElse(shard, 0))
    })
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset = ShardCursors.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ShardCursors].cursors
    val to = end.asInstanceOf[ShardCursors].cursors
    to.toSeq.sortBy(_._1).flatMap { case (shard, hi) =>
      val lo = from.getOrElse(shard, 0)
      if (hi > lo) Some(KinesisShardRange(id, shard, lo, hi): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new KinesisShardReader(p.asInstanceOf[KinesisShardRange])
}

final case class KinesisShardRange(id: String, shard: String, from: Int, until: Int)
  extends InputPartition

final class KinesisShardReader(range: KinesisShardRange) extends PartitionReader[InternalRow] {
  private lazy val rows: Iterator[InternalRow] = {
    val shardUtf8 = UTF8String.fromString(range.shard)
    KinesisStreamSource.slice(range.id, range.shard, range.from, range.until)
      .iterator.zipWithIndex.flatMap { case (wire, i) =>
        val agg = AggRecordCodec.decode(wire)
        agg.records.iterator.map { r =>
          new GenericInternalRow(Array[Any](
            shardUtf8,
            range.from + i,
            UTF8String.fromString(agg.partitionKeyTable(r.pkIndex)),
            UTF8String.fromString(agg.explicitHashKeyTable(r.ehkIndex)),
            r.data))
        }
      }
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
