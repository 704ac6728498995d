package graft.tables

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-order clustering: the Column expression matches the reference
  * interleave bit-for-bit, and the clustered layout concentrates 2-D box
  * matches into strictly fewer files than the natural orderkey layout —
  * the data-skipping property q_zorder_cluster asserts in-query.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("zvalue matches the reference interleave") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong)) ++
      Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 20) - 1, (1L << 20) - 1))
    val got = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.zvalue(col("a"), col("b"), bits = 20))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == ZOrder.zvalueRef(a, b, 20),
        s"zvalue($a,$b) = ${got((a, b))} != ref ${ZOrder.zvalueRef(a, b, 20)}")
    }
  }

  test("z-ordered layout touches fewer files than natural layout for a 2-D box") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val n = 8
    val zDir = "/tmp/graft_spec_zorder"
    val natDir = "/tmp/graft_spec_natural"
    li.withColumn("z", ZOrder.zvalue(col("l_partkey"), col("l_suppkey"), 20))
      .repartitionByRange(n, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(zDir)
    li.repartitionByRange(n, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(natDir)

    def touched(dir: String): Long = spark.read.parquet(dir)
      .filter(col("l_partkey") <= 50 && col("l_suppkey") <= 5)
      .select(input_file_name()).distinct().count()

    val z = touched(zDir)
    val nat = touched(natDir)
    // partkey/suppkey are ~random per orderkey, so the natural layout
    // scatters box rows across ~all files; z-order concentrates them.
    assert(z < nat, s"z-order touched $z files, natural layout $nat")
    assert(nat >= n - 1, s"natural layout unexpectedly clustered: $nat of $n")
  }
}
