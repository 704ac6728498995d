package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY §2.B "custom typed agg"): the number of
  * size-bounded aggregates (PutRecords calls) the Kinesis sink needs for a
  * group's payload bytes — the capacity-planning estimator for the R8
  * packer: ceil(totalBytes / limit), with at least one batch for any
  * non-empty group.
  *
  * Deliberately order-insensitive (pure byte budgeting, not the
  * order-dependent greedy boundaries — those live in BatchingIterator),
  * so partial aggregation merges in any order give one deterministic
  * answer: map-side combine works, and the DuckDB oracle can check it
  * exactly. Exercises the typed Aggregator + udaf path end to end.
  */
class BatchCountAggregator(limit: Long) extends Aggregator[Long, (Long, Long), Long] {
  require(limit > 0)

  /** (totalBytes, rowCount) */
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), size: Long): (Long, Long) =
    (b._1 + size, b._2 + 1)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Long, Long)): Long =
    if (r._2 == 0) 0L else math.max(1L, (r._1 + limit - 1) / limit)

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BatchCountAggregator {
  /** Column form, usable inside groupBy().agg(...). */
  def batch_count(sizeCol: Column, limit: Long): Column =
    udaf(new BatchCountAggregator(limit), Encoders.scalaLong).apply(sizeCol)
}
