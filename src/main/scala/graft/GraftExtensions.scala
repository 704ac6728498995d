package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, DotProduct, DotProductAny, MatVecProduct, SquaredDistance}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions and planner strategy into any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`): `vec_dot`/`vec_cosine` for
  * SQL, and the AsOfJoin strategy so the native as-of plan node resolves
  * on clusters that load the library jar. (No optimizer rules — SURVEY
  * §4.2: Catalyst's existing rules cover the declarative surface; this
  * is the hook where a blocking rewrite for unblocked similarity joins
  * would land if ever needed.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "vec_sqdist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SquaredDistance(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_any"),
      new ExpressionInfo(classOf[DotProductAny].getName, "vec_dot_any"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductAny(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_rotate"),
      new ExpressionInfo(classOf[MatVecProduct].getName, "vec_rotate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MatVecProduct(exprs.head, exprs(1))))
  }
}
