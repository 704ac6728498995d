package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests") — the MERGEABLE quantile sketch.
  *
  * Centroids are (mean, weight) pairs kept sorted by mean; the k1 scale
  * function k(q) = δ·(asin(2q−1)/π + ½) caps each centroid's k-width at 1,
  * so centroids near the tails stay tiny (singletons at the extremes) and
  * mid-distribution centroids grow to ~n/δ — rank error is proportional
  * to q·(1−q), tightest exactly where GK's uniform bound is loosest
  * (p01/p99). State is O(δ) doubles per group regardless of n, partials
  * merge associatively map-side (this is the 100 TB quantile path beside
  * `approx_percentile`), and serialization between partial and final is
  * the compressed centroid list.
  *
  * Incoming values buffer unsorted (weight-1 points) and fold into the
  * centroid list when the buffer fills — amortized O(log δ) per row from
  * the sort being over O(δ + buffer) elements.
  */
final class TDigest(val compression: Double) extends Serializable {
  import TDigest.BufCap
  var means: Array[Double] = new Array[Double](0)
  var weights: Array[Double] = new Array[Double](0)
  var total: Double = 0.0
  private var buf: Array[Double] = new Array[Double](BufCap)
  private var bufN: Int = 0

  private def kScale(q: Double): Double = {
    val qc = math.min(1.0, math.max(0.0, q))
    compression * (math.asin(2 * qc - 1) / math.Pi + 0.5)
  }

  def add(x: Double): Unit = {
    buf(bufN) = x; bufN += 1
    if (bufN == BufCap) compress()
  }

  def mergeIn(o: TDigest): Unit = {
    o.compress()
    if (o.means.isEmpty) return
    // fold the other digest's centroids in as weighted points
    val m = means.length + o.means.length
    val pm = new Array[Double](m); val pw = new Array[Double](m)
    System.arraycopy(means, 0, pm, 0, means.length)
    System.arraycopy(weights, 0, pw, 0, weights.length)
    System.arraycopy(o.means, 0, pm, means.length, o.means.length)
    System.arraycopy(o.weights, 0, pw, means.length, o.weights.length)
    means = pm; weights = pw
    compressedFlag = false // concatenated lists violate the sorted invariant
    compress()
  }

  def compress(): Unit = {
    val m = means.length + bufN
    if (m == 0 || (bufN == 0 && isCompressed)) return
    val idx = new Array[(Double, Double)](m)
    var i = 0
    while (i < means.length) { idx(i) = (means(i), weights(i)); i += 1 }
    var j = 0
    while (j < bufN) { idx(i) = (buf(j), 1.0); i += 1; j += 1 }
    bufN = 0
    java.util.Arrays.sort(idx, Ordering.by((p: (Double, Double)) => p._1))
    total = { var s = 0.0; var t = 0; while (t < m) { s += idx(t)._2; t += 1 }; s }
    val om = new Array[Double](m); val ow = new Array[Double](m)
    var outN = 0
    var curMean = idx(0)._1; var curW = idx(0)._2
    var wSoFar = 0.0
    var kLo = kScale(0.0)
    var p = 1
    while (p < m) {
      val (xm, xw) = idx(p)
      val proposed = curW + xw
      if (kScale((wSoFar + proposed) / total) - kLo <= 1.0) {
        curMean += (xm - curMean) * xw / proposed
        curW = proposed
      } else {
        om(outN) = curMean; ow(outN) = curW; outN += 1
        wSoFar += curW
        kLo = kScale(wSoFar / total)
        curMean = xm; curW = xw
      }
      p += 1
    }
    om(outN) = curMean; ow(outN) = curW; outN += 1
    means = java.util.Arrays.copyOf(om, outN)
    weights = java.util.Arrays.copyOf(ow, outN)
    compressedFlag = true
  }

  private var compressedFlag = false
  private def isCompressed: Boolean = compressedFlag

  def isEmpty: Boolean = means.isEmpty && bufN == 0

  /** Quantile by midpoint-interpolation over the centroid CDF. */
  def quantile(q: Double): Double = {
    compress()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2
        val t = (target - prevMid) / (mid - prevMid)
        return means(i - 1) + t * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 16 * means.length)
    bb.putDouble(compression)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)); bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  private[functions] val BufCap = 512
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    val n = bb.getInt
    d.means = new Array[Double](n); d.weights = new Array[Double](n)
    var i = 0
    var tot = 0.0
    while (i < n) {
      d.means(i) = bb.getDouble; d.weights(i) = bb.getDouble
      tot += d.weights(i); i += 1
    }
    d.total = tot
    // serialize() always compresses first, so the stored list already
    // satisfies the compressed invariant — without this, the first
    // quantile()/serialize()/mergeIn() after a shuffle would re-run a
    // full O(δ log δ) compress pass (and could merge centroids further,
    // making round-tripped digests drift from unshuffled ones)
    d.compressedFlag = true
    d
  }
}

/** `tdigest_quantiles(col, percentiles, compression)` — evaluates the
  * digest at each requested percentile and returns `array<double>`.
  * Estimates are sketch- and merge-order-specific, so queries must gate
  * them through rank-band flags (the q_agg_percentile_approx pattern),
  * never emit the raw values into a hash-compared result. */
case class TDigestQuantilesAgg(
    child: Expression,
    percentiles: Seq[Double],
    compression: Double = 300.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def prettyName: String = "tdigest_quantiles"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
         _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric child, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    })
    buffer
  }

  override def merge(b1: TDigest, b2: TDigest): TDigest = { b1.mergeIn(b2); b1 }

  override def eval(buffer: TDigest): Any =
    if (buffer.isEmpty) null
    else ArrayData.toArrayData(percentiles.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `tdigest_sketch(col, compression)` — same accumulation as
  * [[TDigestQuantilesAgg]] but evaluates to the SERIALIZED digest
  * (`binary`) instead of quantiles, so a second aggregation level can
  * re-merge the partials in-plan. This is the 100 TB rollup shape:
  * per-segment sketches materialize once, the global quantile is a
  * re-aggregation over O(groups · δ) bytes, never a re-scan of the
  * fact table. */
case class TDigestSketchAgg(
    child: Expression,
    compression: Double = 300.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def prettyName: String = "tdigest_sketch"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
         _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric child, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    })
    buffer
  }

  override def merge(b1: TDigest, b2: TDigest): TDigest = { b1.mergeIn(b2); b1 }

  override def eval(buffer: TDigest): Any =
    if (buffer.isEmpty) null else buffer.serialize()

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `tdigest_merge_quantiles(sketchCol, percentiles)` — the second level
  * of the rollup: merges SERIALIZED digests (output of
  * [[TDigestSketchAgg]]) and evaluates the merged digest at each
  * percentile. Merge is the same associative centroid fold partials use
  * inside one aggregation, so one-level and two-level plans share the
  * accuracy analysis (band-gated like every sketch estimate). */
case class TDigestMergeQuantilesAgg(
    child: Expression,
    percentiles: Seq[Double],
    compression: Double = 300.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  override def prettyName: String = "tdigest_merge_quantiles"
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary tdigest_sketch child, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buffer.mergeIn(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(b1: TDigest, b2: TDigest): TDigest = { b1.mergeIn(b2); b1 }

  override def eval(buffer: TDigest): Any =
    if (buffer.isEmpty) null
    else ArrayData.toArrayData(percentiles.map(buffer.quantile).toArray)

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TDigestQuantilesAgg {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  /** Column façade: `tdigest_quantiles(c, ps)` inside an agg. */
  def tdigest_quantiles(c: Column, ps: Seq[Double],
      compression: Double = 300.0): Column =
    toColumn(TDigestQuantilesAgg(toExpression(c), ps, compression)
      .toAggregateExpression())
  /** Column façade: `tdigest_sketch(c)` — serialized digest (binary). */
  def tdigest_sketch(c: Column, compression: Double = 300.0): Column =
    toColumn(TDigestSketchAgg(toExpression(c), compression)
      .toAggregateExpression())
  /** Column façade: `tdigest_merge_quantiles(sk, ps)` over sketches. */
  def tdigest_merge_quantiles(c: Column, ps: Seq[Double],
      compression: Double = 300.0): Column =
    toColumn(TDigestMergeQuantilesAgg(toExpression(c), ps, compression)
      .toAggregateExpression())
}
