package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS'12) — the
  * deterministic-BOUND heavy-hitter sketch beside the hash-based
  * `approx_top_k`/CMS pair:
  *
  *  - ≤ k counters, O(k) state per group regardless of n;
  *  - estimates never overcount (a counter only increments on an exact
  *    match) and undercount by at most n/(k+1) — so every item with
  *    true count > n/(k+1) is GUARANTEED present in the summary;
  *  - partials merge associatively: add counts pairwise, then subtract
  *    the (k+1)-th largest count from every counter and drop the
  *    non-positive ones. The merged summary keeps the combined
  *    n/(k+1) bound (the PODS'12 result), which is what makes this the
  *    100 TB shape — segment summaries roll up without re-scanning.
  *
  * Which 32 items survive (beyond the guaranteed ones) and their exact
  * estimates ARE processing-order-specific, so queries must compare
  * only exact counts plus the provable flags (presence, est ≤ true,
  * 33·(true − est) ≤ n for k=32), never the raw estimates — the
  * q_agg_tdigest band-flag pattern.
  */
final class MGSummary(val k: Int) extends Serializable {
  val counts = new mutable.HashMap[String, Long]()
  var n: Long = 0L
  /** True once any decrement/subtract step has fired — from then on
    * `counts` is an ESTIMATE (each entry ≤ true count, error ≤
    * n/(k+1)) and `counts.size` is a lower bound on the distinct
    * count. While false, the summary is EXACT (distinct domain never
    * exceeded k), which is what lets the streaming twins derive exact
    * per-key columns from it — they `require(!decremented)` so a
    * future corpus exceeding k fails LOUDLY at the gate instead of
    * silently drifting from the oracle. Serialized with the summary. */
  var decremented: Boolean = false

  def add(x: String): Unit = {
    n += 1
    counts.get(x) match {
      case Some(c) => counts.update(x, c + 1)
      case None if counts.size < k => counts.update(x, 1L)
      case None =>
        decremented = true
        // decrement-all step: one "vote" against every held counter
        for ((key, c) <- counts.toList) {
          if (c == 1L) counts.remove(key) else counts.update(key, c - 1)
        }
    }
  }

  def mergeIn(o: MGSummary): Unit = {
    n += o.n
    decremented ||= o.decremented
    for ((key, c) <- o.counts)
      counts.update(key, counts.getOrElse(key, 0L) + c)
    if (counts.size > k) {
      decremented = true
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val sorted = counts.values.toArray.sortWith(_ > _)
      val m = sorted(k)
      for ((key, c) <- counts.toList) {
        if (c - m <= 0L) counts.remove(key) else counts.update(key, c - m)
      }
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // Leading format-version byte (r15 ADVICE): the r15 `decremented`
    // field changed the byte layout silently — persisted state from
    // before it (a streaming checkpoint holding MGSummary bytes) would
    // MISPARSE instead of failing. A version marker turns any future
    // layout change into a loud, attributable error at restore time.
    out.writeByte(MGSummary.FormatVersion)
    out.writeInt(k); out.writeLong(n); out.writeBoolean(decremented)
    out.writeInt(counts.size)
    // sorted for a canonical byte form (not semantically required);
    // keys are length-prefixed raw UTF-8 (writeUTF caps at 65535 bytes
    // and this is a general string aggregate — arbitrarily long keys
    // must survive the shuffle)
    counts.toSeq.sortBy(_._1).foreach { case (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }
}

object MGSummary {
  /** Serialized-layout version. v2 = version byte ‖ k ‖ n ‖ decremented
    * ‖ size ‖ (len ‖ utf8 ‖ count)*. Bump on ANY layout change; old
    * streaming checkpoints then fail loudly here instead of misparsing. */
  val FormatVersion: Byte = 2

  def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readByte()
    require(v == FormatVersion,
      s"MGSummary: serialized format version $v, expected $FormatVersion" +
        " — persisted state (e.g. a streaming checkpoint) predates a" +
        " layout change and must be reset")
    val s = new MGSummary(in.readInt())
    s.n = in.readLong()
    s.decremented = in.readBoolean()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      s.counts.update(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    s
  }
}

/** `misra_gries(col, k)` — aggregates a string column into the MG
  * summary and evaluates to `map<string,bigint>` of item → estimate. */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  override def prettyName: String = "misra_gries"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(b1: MGSummary, b2: MGSummary): MGSummary = {
    b1.mergeIn(b2); b1
  }

  override def eval(buffer: MGSummary): Any =
    if (buffer.n == 0L) null
    else {
      val entries = buffer.counts.toSeq.sortBy(_._1)
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(e =>
          UTF8String.fromString(e._1)).toArray[Any]),
        new GenericArrayData(entries.map(e =>
          java.lang.Long.valueOf(e._2)).toArray[Any]))
    }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  /** Column façade: `misra_gries(c, k)` inside an agg. */
  def misra_gries(c: Column, k: Int = 32): Column =
    toColumn(MisraGriesAgg(toExpression(c), k).toAggregateExpression())
}
