package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Elementwise vector-sum aggregate: Σ rows of an `array<float|double>`
  * column as one `array<double>` — the centroid-update reduction of
  * Lloyd's k-means in a single aggregation pass.
  *
  * The relational alternative (`posexplode` → per-(group, pos) avg →
  * re-`collect_list` by group) multiplies the input by the vector
  * dimension and needs TWO shuffles per iteration; this aggregate keeps
  * rows intact, carries a fixed double[dim] buffer (serialized as raw
  * doubles between partial and final), and map-side combines like any
  * other partial aggregate. Rows whose array is NULL are ignored; a
  * dimension mismatch within a group fails loudly (it means corrupt
  * input, not a value); an empty group evaluates to NULL.
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "vec_sum"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[Double](n)
      else {
        require(buffer.length == n,
          s"$prettyName: dimension mismatch within a group (${buffer.length} vs $n)")
        buffer
      }
    var i = 0
    if (isFloat) while (i < n) { if (!arr.isNullAt(i)) buf(i) += arr.getFloat(i); i += 1 }
    else while (i < n) { if (!arr.isNullAt(i)) buf(i) += arr.getDouble(i); i += 1 }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.isEmpty) return b2
    if (b2.isEmpty) return b1
    require(b1.length == b2.length,
      s"$prettyName: dimension mismatch across partials (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else ArrayData.toArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  /** Column façade: `vec_sum(vecCol)` inside an agg. */
  def vec_sum(c: Column): Column =
    toColumn(VectorSumAgg(toExpression(c)).toAggregateExpression())
}
