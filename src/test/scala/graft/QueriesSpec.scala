package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry sanity + flagship smoke (full oracle parity is driven by
  * graft.Verify + the driver's DuckDB compare; see .claude/skills/verify). */
class QueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("registry: unique names, every oracle key has a query") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 70)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("representative queries return rows at sf0.001") {
    val reps = Seq("q1_pricing_summary", "q5_local_supplier", "q_window_rank",
      "q_cosine_topk", "q_session_window_1h", "q_minhash_lsh",
      "q_kinesis_pack_stats")
    reps.foreach { name =>
      val n = SparkEntry.queries(name)(spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
