package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array as a single projection expression.
  *
  * Equivalent to (and tested against) the relational formulation —
  * explode(tokens) → xxhash64(token) → 64 × sum(±bit) → majority pack —
  * but with no explode, no shuffle, and no 64-column aggregate: the whole
  * fingerprint folds per row inside whole-stage codegen. On a 100 TB
  * corpus this turns near-dup fingerprinting into a map-only scan.
  *
  * Token hashing matches Spark's `xxhash64(token)` exactly (XXH64 over
  * UTF-8 bytes, seed 42), so fingerprints are stable across both
  * formulations and across queries that mix them.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    SimHash64.ofTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash64.ofTokens($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** Static so generated code can call it: one pass, int[64] counters. */
  def ofTokens(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val s: UTF8String = tokens.getUTF8String(t)
        // identical to Spark's xxhash64(string) (XxHash64, seed 42)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      SimHash64(org.apache.spark.sql.GraftBridge.toExpression(tokens)))
}
