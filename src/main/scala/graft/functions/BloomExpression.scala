package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — THE 100 TB shuffle-reduction pattern.
  *
  * A selective filter on the dimension/build side of a join normally does
  * nothing for the probe side: every fact row still shuffles to its join
  * partition only to be dropped there. The fix is to collapse the build
  * side's surviving keys into a bloom filter (a few MB regardless of fact
  * size), broadcast it, and pre-filter the fact table BEFORE its shuffle.
  * False positives are removed by the exact join that follows, so the
  * result is exact for any fpp — the bloom only decides how much of the
  * shuffle is saved. This mirrors Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.*`), but as an explicit,
  * plannable operator: the builder sizes the filter from parquet footer
  * statistics (no count() job) and the probe is a codegen'd Catalyst
  * expression, not a UDF, so it stays inside whole-stage codegen.
  *
  * Reference scope note: the reference engine (kinesis-writer) has no
  * joins at all; this operator is part of the engine surface SURVEY.md §2.B
  * declares beyond it.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.simpleString}")
  }

  /** Deserialized once per task (the expression ships with the serialized
    * bytes; the sketch itself is rebuilt lazily executor-side). */
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column façade + the build-side helper. */
object BloomFunctions {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}

  /** Hard cap on bloom bits (8 MB), mirroring Spark's own runtime
    * row-level filter default (`spark.sql.optimizer.runtime.bloomFilter.
    * maxNumBits` = 67108864): a billion-key dim side would otherwise ask
    * for a ~1.2 GB broadcast. Past the cap the fpp floats up instead —
    * the join stays exact, the filter just prunes less. */
  val MaxNumBits: Long = 67108864L

  /** Build a bloom over `keyCol` of `build` (distributed treeAggregate —
    * the driver only ever holds the sketch, never the keys).
    * `expectedItems` should come from footer/catalog stats; oversizing is
    * safe, undersizing only raises fpp. Bits sized for `fpp` at the
    * expected cardinality, then clamped to [[MaxNumBits]]. */
  def buildLongBloom(build: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(expectedItems, 1L)
    val optimalBits = math.ceil(
      -n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bits = math.min(math.max(optimalBits, 64L), MaxNumBits)
    val bf = build.stat.bloomFilter(keyCol, n, bits)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Probe: true if `key` might be in the serialized bloom. */
  def bloom_might_contain(key: Column, bloomBytes: Array[Byte]): Column =
    toColumn(BloomMightContainLong(toExpression(key), bloomBytes))
}
