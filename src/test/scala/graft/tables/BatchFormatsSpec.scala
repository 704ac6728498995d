package graft.tables

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Batch source/sink formats beyond parquet: CSV, JSON(-lines), ORC, and
  * text round-trip through the engine with schema intact — a user
  * switching from the reference can land data in any of them.
  */
class BatchFormatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val sample = Tables.lineitem(spark, TestSpark.sf0001)
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_returnflag"), col("l_shipdate"))
    .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    .limit(500)
    .cache()

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"fmt_$name").toString + "/out"

  private def assertRoundTrip(back: org.apache.spark.sql.DataFrame): Unit = {
    val a = sample.collect().map(_.toSeq).toSeq
    val b = back
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("csv round trip with header + explicit schema") {
    val dir = tmp("csv")
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)
    assertRoundTrip(back)
  }

  test("json-lines round trip with explicit schema") {
    val dir = tmp("json")
    sample.write.json(dir)
    assertRoundTrip(spark.read.schema(sample.schema).json(dir))
  }

  test("orc round trip preserves schema without hints") {
    val dir = tmp("orc")
    sample.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assertRoundTrip(back)
  }

  test("text sink/source carries one line per row") {
    val dir = tmp("text")
    sample.select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag")).as("value")).write.text(dir)
    val n = spark.read.text(dir).count()
    assert(n == 500)
  }
}
