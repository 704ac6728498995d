package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.tables.Tables

/** Bloom-pruned join: no false negatives ever (the exactness guarantee),
  * measured false-positive rate near the configured fpp, probe survives
  * into codegen, and the declared q_join_bloom_pruned equals its
  * un-pruned twin row-for-row.
  */
class BloomSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import BloomFunctions._

  test("no false negatives; fp rate near configured fpp") {
    import spark.implicits._
    val keys = (0L until 20000L).toDF("k")
    val inSet = keys.filter(col("k") % 2 === 0) // evens
    val bytes = buildLongBloom(inSet, "k", expectedItems = 10000, fpp = 0.01)

    // every inserted key must probe true
    val misses = inSet.filter(!bloom_might_contain(col("k"), bytes)).count()
    assert(misses == 0, s"bloom dropped $misses inserted keys (false negatives)")

    // disjoint keys (odds) should pass at ~fpp
    val odds = keys.filter(col("k") % 2 === 1)
    val fp = odds.filter(bloom_might_contain(col("k"), bytes)).count()
    assert(fp < 1000, s"fp rate ${fp / 10000.0} far above configured 0.01")
  }

  test("codegen and interpreted probe agree") {
    import spark.implicits._
    val bytes = buildLongBloom((0L until 100L).toDF("k"), "k", 100)
    val df = (0L until 1000L).toDF("k")
      .withColumn("hit", bloom_might_contain(col("k"), bytes))
    val gen = df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    // force the interpreted path through a fresh expression eval
    val expr = BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false), bytes)
    (0L until 1000L).foreach { k =>
      val row = org.apache.spark.sql.catalyst.InternalRow(k)
      assert(expr.eval(row) == gen(k), s"codegen/interpreted mismatch at $k")
    }
  }

  test("int keys probe through the same long bloom") {
    import spark.implicits._
    val bytes = buildLongBloom((0L until 50L).toDF("k"), "k", 50)
    val hits = (0 until 50).toDF("ik")
      .filter(bloom_might_contain(col("ik"), bytes)).count()
    assert(hits == 50)
  }

  test("q_join_bloom_pruned equals the un-pruned join and actually prunes") {
    val d = TestSpark.sf0001
    val q = graft.SparkEntry.queries("q_join_bloom_pruned")(spark, d)

    val dim = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plain = Tables.lineitem(spark, d)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        graft.queries.Q.dsum(col("l_extendedprice")).as("rev"))
      .orderBy(col("l_returnflag"))
    assert(q.exceptAll(plain).isEmpty && plain.exceptAll(q).isEmpty)

    // the bloom must remove most non-matching fact rows pre-shuffle:
    // ~20% of orders are 1-URGENT, so <=40% of lineitem may survive
    val bytes = buildLongBloom(dim, "o_orderkey",
      Tables.rowCount(spark, d, "orders"))
    val li = Tables.lineitem(spark, d)
    val total = li.count()
    val kept = li.filter(bloom_might_contain(col("l_orderkey"), bytes)).count()
    assert(kept < total * 0.4,
      s"bloom kept $kept of $total fact rows — no real pruning")
  }
}
