package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch point-frequency probe — mergeable frequency estimation
  * for the keys a 100 TB corpus cannot hold an exact map over.
  *
  * The sketch is built distributed (per-partition sketches merged in a
  * treeAggregate — `DataFrameStatFunctions.countMinSketch`), is a few KB
  * at any corpus size, and broadcasts to executors where this expression
  * answers point queries inside whole-stage codegen. Guarantees:
  * estimate ≥ true count always (hash collisions only ADD), and
  * estimate ≤ true + ε·N with probability 1−δ per query — which is what
  * the declared query turns into oracle-checkable flags.
  */
case class CmsEstimateLong(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.simpleString}")
  }

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long => cms.estimateCount(l)
    case i: java.lang.Integer => cms.estimateCount(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.estimateCount((Object) ((long) $c));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsFunctions {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}

  /** Distributed CMS build over `keyCol` (treeAggregate of mergeable
    * per-partition sketches; the driver holds only the d×w counter
    * array). Deterministic for a fixed seed. */
  def buildLongCms(df: DataFrame, keyCol: String,
      eps: Double, confidence: Double, seed: Int = 42): Array[Byte] = {
    val cms = df.stat.countMinSketch(keyCol, eps, confidence, seed)
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** Point-frequency estimate of `key` from the serialized sketch. */
  def cms_estimate(key: Column, sketchBytes: Array[Byte]): Column =
    toColumn(CmsEstimateLong(toExpression(key), sketchBytes))
}
