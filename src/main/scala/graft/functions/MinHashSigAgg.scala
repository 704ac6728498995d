package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable MinHash signature (Broder 1997; mergeable per Agarwal et
  * al. PODS'12 trivially — elementwise min is associative, commutative,
  * and idempotent) — the third custom `TypedImperativeAggregate` beside
  * t-digest and Misra–Gries, and the only one of the three whose output
  * is EXACTLY reproducible by the oracle: min is order-free, so the
  * signature is a pure function of the input SET, never of processing
  * order (TUNING.md determinism class A — no band flags needed).
  *
  *  - P=16 permutations h_i(x) = (a_i·h0(x) + b_i) mod M over the
  *    Mersenne prime M = 2³¹−1; h0 is the first-8-hex-chars md5 value
  *    mod M — the repo's established cross-engine base hash (Spark
  *    `conv(substr(md5,1,8),16,10)` ≡ DuckDB nibble-Horner ≡ this
  *    class's JVM MessageDigest parse, byte-identical).
  *  - a_i = (2i+3)·40503 mod M (odd, non-zero), b_i = (i+1)·2654435761
  *    mod M — fixed public constants; a_i·h0 ≤ (2³¹)² < 2⁶³ keeps every
  *    product in exact long/BIGINT range in BOTH engines.
  *  - O(P) state per group; partials merge by elementwise min, so
  *    per-segment signatures roll up without rescanning — the 100 TB
  *    shape for set-similarity over any grouping.
  *  - E[matches/P] = Jaccard(A,B); RSE = 1/√P = 0.25 at P=16.
  */
object MinHashSig {
  val P = 16
  val M = 2147483647L // 2^31 - 1
  val A: Array[Long] = Array.tabulate(P)(i => ((2L * i + 3) * 40503L) % M)
  val B: Array[Long] = Array.tabulate(P)(i => ((i + 1L) * 2654435761L) % M)

  /** First-8-hex-chars md5 value mod M — identical to the SQL side. */
  def h0(x: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 4 bytes as an unsigned 32-bit value == first 8 hex chars
    val v = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    v % M
  }

  def perm(i: Int, h: Long): Long = (A(i) * h + B(i)) % M
}

final class MinHashState extends Serializable {
  import MinHashSig._
  val mins: Array[Long] = Array.fill(P)(Long.MaxValue)
  var nonEmpty: Boolean = false

  def add(x: String): Unit = {
    nonEmpty = true
    val h = h0(x)
    var i = 0
    while (i < P) {
      val v = perm(i, h)
      if (v < mins(i)) mins(i) = v
      i += 1
    }
  }

  def mergeIn(o: MinHashState): Unit = {
    nonEmpty ||= o.nonEmpty
    var i = 0
    while (i < P) { if (o.mins(i) < mins(i)) mins(i) = o.mins(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(nonEmpty)
    mins.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }
}

object MinHashState {
  def deserialize(bytes: Array[Byte]): MinHashState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MinHashState
    s.nonEmpty = in.readBoolean()
    var i = 0
    while (i < MinHashSig.P) { s.mins(i) = in.readLong(); i += 1 }
    s
  }
}

/** `minhash_sig(col)` — aggregates a string column into the 16-long
  * MinHash signature array (null for an all-null/empty group). */
case class MinHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinHashState] {

  override def prettyName: String = "minhash_sig"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): MinHashState = new MinHashState

  override def update(buffer: MinHashState, input: InternalRow): MinHashState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(b1: MinHashState, b2: MinHashState): MinHashState = {
    b1.mergeIn(b2); b1
  }

  override def eval(buffer: MinHashState): Any =
    if (!buffer.nonEmpty) null
    else new GenericArrayData(buffer.mins.map(java.lang.Long.valueOf(_)
      .asInstanceOf[Any]))

  override def serialize(buffer: MinHashState): Array[Byte] =
    buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MinHashState =
    MinHashState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  /** Column façade: `minhash_sig(c)` inside an agg. */
  def minhash_sig(c: Column): Column =
    toColumn(MinHashSigAgg(toExpression(c)).toAggregateExpression())
}
