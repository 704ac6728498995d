package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Count-min sketch probe: one-sided error (never under-estimates),
  * bounded over-estimation at the configured ε·N, codegen/interpreted
  * agreement, and determinism for a fixed seed.
  */
class CmsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import CmsFunctions._

  test("estimates never undercount and stay within eps*N above truth") {
    import spark.implicits._
    // skewed frequencies: key k appears k+1 times, keys 0..199
    val rows = (0L until 200L).flatMap(k => Seq.fill((k + 1).toInt)(k))
    val df = rows.toDF("k")
    val eps = 0.001
    val n = rows.size
    val bytes = buildLongCms(df, "k", eps, confidence = 0.999)
    val got = df.groupBy(col("k")).agg(count(lit(1)).as("true_n"))
      .withColumn("est", cms_estimate(col("k"), bytes))
      .select(col("k"), col("true_n"), col("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (k, t, e) =>
      assert(e >= t, s"CMS under-counted key $k: est $e < true $t")
      assert(e <= t + math.ceil(eps * n).toLong + 1,
        s"CMS over-estimate beyond eps*N for key $k: est $e vs true $t")
    }
  }

  test("codegen and interpreted estimate agree; fixed seed is deterministic") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("k")
    val b1 = buildLongCms(df, "k", 0.01, 0.99)
    val b2 = buildLongCms(df, "k", 0.01, 0.99)
    assert(java.util.Arrays.equals(b1, b2), "seeded CMS build not deterministic")
    val gen = df.withColumn("e", cms_estimate(col("k"), b1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expr = CmsEstimateLong(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false), b1)
    (0L until 1000L by 97L).foreach { k =>
      val row = org.apache.spark.sql.catalyst.InternalRow(k)
      assert(expr.eval(row) == gen(k), s"codegen/interpreted mismatch at $k")
    }
  }
}
