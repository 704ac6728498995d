package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native codegen'd expressions must match the HOF formulation
  * bit-for-bit (same sequential double accumulation), in both codegen and
  * interpreted paths, and register for SQL use. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofCosine = graft.queries.Llm.cosine _

  private lazy val pairs = {
    val e = graft.tables.Tables.embeddings(spark, TestSpark.sf0001)
    e.select(col("vec_id").as("a_id"), col("embedding").as("a")).limit(40)
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")).limit(40))
  }

  test("vec_cosine equals the HOF cosine bit-for-bit") {
    val diff = pairs
      .select(VectorFunctions.vec_cosine(col("a"), col("b")).as("native"),
        hofCosine(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("vec_dot equals the HOF dot bit-for-bit") {
    val hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val diff = pairs
      .select(VectorFunctions.vec_dot(col("a"), col("b")).as("native"),
        hofDot.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("dimension mismatch yields NULL; two instances share a codegen scope") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
    val out = df.select(
      VectorFunctions.vec_dot(col("a"), col("b")).as("d1"),
      // second instance in the same project: regression for fixed-name
      // codegen locals colliding at janino compile time
      VectorFunctions.vec_dot(col("b"), col("b")).as("d2"),
      VectorFunctions.vec_cosine(col("a"), col("b")).as("c1")).head()
    assert(out.isNullAt(0) && out.isNullAt(2))
    assert(out.getDouble(1) == 9.0)
  }

  test("null ELEMENTS null the fold, matching the HOF forms (codegen + eval)") {
    // HOF: acc + NULL = NULL, so one null element nulls the whole result —
    // the native expressions must agree in both execution paths
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f))
    ).toDF("a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      VectorFunctions.vec_dot(col("a"), col("b")).as("dot"),
      VectorFunctions.vec_cosine(col("a"), col("b")).as("cos"),
      VectorFunctions.vec_sqdist(col("a"), col("b")).as("sq"),
      VectorFunctions.vec_dot_any(col("a"), col("b")).as("dany"),
      hofDot.as("hof")).collect()
    assert((0 until 4).forall(rows(0).isNullAt), s"null element must null the fold: ${rows(0)}")
    assert(rows(0).isNullAt(4), "HOF reference itself should be NULL")
    assert(rows(1).getDouble(0) == 32.0 && rows(1).getDouble(4) == 32.0)
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val withNull = Literal.create(
      ArrayData.toArrayData(Array[Any](1.0f, null, 3.0f)), ArrayType(FloatType, containsNull = true))
    val clean = Literal.create(
      ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f)), ArrayType(FloatType))
    assert(DotProduct(withNull, clean).eval(null) == null)
    assert(CosineSimilarity(withNull, clean).eval(null) == null)
    assert(SquaredDistance(withNull, clean).eval(null) == null)
    assert(DotProductAny(withNull, clean).eval(null) == null)
  }

  test("interpreted path matches codegen (eval directly)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = Literal.create(ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)), ArrayType(FloatType))
    val b = Literal.create(ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f)), ArrayType(FloatType))
    assert(DotProduct(a, b).eval(null) == (4.0 + 10.0 + 18.0))
    val cos = CosineSimilarity(a, b).eval(null).asInstanceOf[Double]
    assert(math.abs(cos - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
  }

  test("vec_sum aggregate equals the posexplode + avg formulation exactly") {
    import graft.functions.VectorSumAgg.vec_sum
    val df = Seq(
      (1, Seq(1.0f, 2.0f)), (1, Seq(3.0f, 4.0f)), (1, Seq(5.0f, 6.0f)),
      (2, Seq(10.0f, 20.0f))).toDF("g", "v")
    val viaAgg = df.groupBy(col("g"))
      .agg(vec_sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("g"), transform(col("s"), x => x / col("n")).as("mean"))
    val viaExplode = df.select(col("g"), posexplode(col("v")))
      .groupBy(col("g"), col("pos"))
      .agg(avg(col("col").cast("double")).as("x"))
      .groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("pos"), col("x")))).as("pv"))
      .select(col("g"), transform(col("pv"), p => p.getField("x")).as("mean"))
    val a = viaAgg.orderBy(col("g")).as[(Int, Seq[Double])].collect().toSeq
    val b = viaExplode.orderBy(col("g")).as[(Int, Seq[Double])].collect().toSeq
    assert(a == b, s"$a vs $b") // identical doubles, not approximate
    // NULL rows are ignored; an all-NULL group evaluates to NULL
    val withNulls = Seq((1, Some(Seq(1.0f, 1.0f))), (1, None), (3, None))
      .toDF("g", "v")
    val r = withNulls.groupBy(col("g")).agg(vec_sum(col("v")).as("s"))
      .orderBy(col("g")).collect()
    assert(r(0).getSeq[Double](1) == Seq(1.0, 1.0))
    assert(r(1).isNullAt(1))
  }

  test("SQL registration: vec_cosine usable from spark.sql") {
    VectorFunctions.register(spark)
    graft.tables.Tables.embeddings(spark, TestSpark.sf0001)
      .limit(10).createOrReplaceTempView("emb_test")
    val n = spark.sql(
      """SELECT a.vec_id, vec_cosine(a.embedding, b.embedding) AS c,
         vec_dot(a.embedding, b.embedding) AS d
         FROM emb_test a JOIN emb_test b ON a.vec_id < b.vec_id""").count()
    assert(n == 45)
  }

  test("vec_sqdist / vec_dot_any equal the HOF forms on double arrays") {
    val d = pairs.select(
      transform(col("a"), x => x.cast("double")).as("a"),
      transform(col("b"), x => x.cast("double")).as("b"))
    val hofSq = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val diffs = d.select(
        VectorFunctions.vec_sqdist(col("a"), col("b")).as("nsq"), hofSq.as("hsq"),
        VectorFunctions.vec_dot_any(col("a"), col("b")).as("nd"), hofDot.as("hd"))
      .filter(col("nsq") =!= col("hsq") || col("nd") =!= col("hd"))
      .count()
    assert(diffs == 0)
  }

  test("vec_sqdist mixes float and double sides; dim mismatch is NULL") {
    val d = pairs.select(col("a"),
      transform(col("b"), x => x.cast("double")).as("bd"),
      slice(col("b"), 1, 3).as("short"))
    assert(d.select(VectorFunctions.vec_sqdist(col("a"), col("bd")))
      .filter(col("vec_sqdist(a, bd)").isNull).count() == 0)
    assert(d.select(VectorFunctions.vec_sqdist(col("a"), col("short")).as("x"))
      .filter(col("x").isNotNull).count() == 0)
  }
}
