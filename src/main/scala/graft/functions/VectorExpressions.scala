package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The brute-force / blocked similarity searches evaluate a dot product
  * per candidate pair — the innermost loop of an O(n·k) (or worse) join.
  * The `zip_with` + `aggregate` HOF formulation is correct but allocates
  * an intermediate array and a lambda frame per row; this expression
  * compiles to a tight primitive loop inside whole-stage codegen (and its
  * interpreted path matches bit-for-bit: sequential left-to-right double
  * accumulation, same as the HOF version and the DuckDB oracle SQL).
  */
abstract class FloatVectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  /** A null ELEMENT nulls the whole fold (the HOF forms propagate null
    * through acc + v — these expressions must match them exactly). The
    * per-element check is only emitted when the array type admits nulls,
    * so provably null-free inputs keep the branch-free loop. */
  protected def anyContainsNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  /** Codegen fragment: null element ⇒ result NULL, exit loop. The loop
    * condition must include `!isNull` for the early exit to take effect. */
  protected def genElemNullCheck(ev: ExprCode, a: String, b: String, i: String): String =
    if (anyContainsNull)
      s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; continue; }"
    else ""
}

/** Fold over two numeric arrays that may independently be array<float> or
  * array<double> (PQ subvectors and residuals are double; raw embeddings
  * are float) — each side reads with its own typed accessor. */
abstract class NumericVectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def readerFor(e: Expression): (ArrayData, Int) => Double =
    if (isFloat(e)) (a, i) => a.getFloat(i).toDouble else (a, i) => a.getDouble(i)
  protected def genRead(e: Expression, arr: String, i: String): String =
    if (isFloat(e)) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
  /** See [[FloatVectorFold.anyContainsNull]]: null element ⇒ NULL result,
    * matching the HOF forms; check emitted only for nullable arrays. */
  protected def anyContainsNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })
  protected def genElemNullCheck(ev: ExprCode, a: String, b: String, i: String): String =
    if (anyContainsNull)
      s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; continue; }"
    else ""
}

/** ‖a − b‖² = Σ (a_i − b_i)², accumulated in double — the innermost loop
  * of PQ/k-means nearest-centroid assignment (51M evaluations per encode
  * pass at sf0.1; the HOF `zip_with`+`aggregate` form allocates an
  * intermediate array and lambda frames per row). */
case class SquaredDistance(left: Expression, right: Expression) extends NumericVectorFold {
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // match HOF: dim mismatch ⇒ NULL
    val rx = readerFor(left); val ry = readerFor(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match HOF: null element ⇒ NULL
      val d = rx(x, i) - ry(y, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see DotProduct.doGenCode
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    ${genElemNullCheck(ev, a, b, i)}
         |    double $d = ${genRead(left, a, i)} - ${genRead(right, b, i)};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) over float|double arrays (see [[DotProduct]] for the
  * float-only original kept for the declared-query surface). */
case class DotProductAny(left: Expression, right: Expression) extends NumericVectorFold {
  override def prettyName: String = "vec_dot_any"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val rx = readerFor(left); val ry = readerFor(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match HOF: null element ⇒ NULL
      acc += rx(x, i) * ry(y, i); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    ${genElemNullCheck(ev, a, b, i)}
         |    $acc += ${genRead(left, a, i)} * ${genRead(right, b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a, b) = Σ a_i * b_i over float arrays, accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorFold {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // match HOF/oracle: dim mismatch ⇒ NULL
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match HOF: null element ⇒ NULL
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local via freshName: two instances of this expression can
      // share one codegen scope (non-nullable children leave the code
      // unbraced), and fixed names would collide at janino compile time
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    ${genElemNullCheck(ev, a, b, i)}
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), single pass, double accumulation.
  * Matches the HOF/DuckDB formulation to the last bit (same op order). */
case class CosineSimilarity(left: Expression, right: Expression) extends FloatVectorFold {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // match HOF/oracle: dim mismatch ⇒ NULL
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // match HOF: null element ⇒ NULL
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see DotProduct.doGenCode
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    ${genElemNullCheck(ev, a, b, i)}
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** y = M·x for a d×d matrix flattened row-major into an array<float>
  * literal — the OPQ rotation applied ahead of PQ training/encoding
  * (Optimized Product Quantization: an orthogonal rotation spreads
  * variance evenly across the m subspaces so each sub-quantizer carries
  * equal load; see Ge et al., OPQ, CVPR 2013). One fused pass per row in
  * whole-stage codegen: d² multiply-adds, no intermediate arrays.
  * NULL on: null input, length mismatch (|M| ≠ d²), or a null element. */
case class MatVecProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_rotate"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (matrix: array<float>, vec: array<float>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  private def containsNulls: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  // left = flattened matrix, right = vector
  override def nullSafeEval(a: Any, b: Any): Any = {
    val mat = a.asInstanceOf[ArrayData]
    val vec = b.asInstanceOf[ArrayData]
    val d = vec.numElements()
    if (mat.numElements() != d * d) return null
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var acc = 0.0
      var j = 0
      while (j < d) {
        if (mat.isNullAt(i * d + j) || vec.isNullAt(j)) return null
        acc += mat.getFloat(i * d + j).toDouble * vec.getFloat(j).toDouble
        j += 1
      }
      out(i) = acc.toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, v) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val nullCheck =
        if (containsNulls)
          s"if ($m.isNullAt($i * $d + $j) || $v.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $d = $v.numElements();
         |if ($m.numElements() != $d * $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[$d];
         |  for (int $i = 0; $i < $d && !${ev.isNull}; $i++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      $nullCheck
         |      $acc += ((double) $m.getFloat($i * $d + $j)) * ((double) $v.getFloat($j));
         |    }
         |    $out[$i] = (float) $acc;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API façade + SQL registration. */
object VectorFunctions {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  def vec_dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
  def vec_cosine(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpression(a), toExpression(b)))
  def vec_sqdist(a: Column, b: Column): Column =
    toColumn(SquaredDistance(toExpression(a), toExpression(b)))
  def vec_dot_any(a: Column, b: Column): Column =
    toColumn(DotProductAny(toExpression(a), toExpression(b)))
  def vec_rotate(mat: Column, vec: Column): Column =
    toColumn(MatVecProduct(toExpression(mat), toExpression(vec)))

  /** Register the vector functions for spark.sql(...) use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sqdist", exprs => SquaredDistance(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_any", exprs => DotProductAny(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_rotate", exprs => MatVecProduct(exprs.head, exprs(1)), "built-in")
  }
}
