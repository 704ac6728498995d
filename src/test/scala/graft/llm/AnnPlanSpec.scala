package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Physical-plan assertions for the ANN operators — the shuffle-diet
  * guarantees are structural, so pin them: codebook joins broadcast,
  * argmax/argmin run as (partial-aggregating) hash aggregates rather than
  * sort-window exchanges, and nothing degenerates to a cartesian product.
  */
class AnnPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val e = graft.tables.Tables.embeddings(spark, TestSpark.sf0001)
    .filter(col("vec_id") < 200)

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    // other suites cache codebooks/codes; cached fragments substitute
    // InMemoryRelations into these plans and skew the node counts
    spark.sharedState.cacheManager.clearCache()
    df.queryExecution.executedPlan.toString
  }

  /** WindowExec nodes only — `WindowGroupLimit` (Spark 4's rank-pushdown
    * before a window, which CUTS rows) must not count against the plan. */
  private def windowExecs(p: String): Int =
    "(?m)Window \\[".r.findAllIn(p).size

  test("IVF assignment: broadcast codebook + partial-aggregating argmax, no window") {
    val cents = VectorIvf.train(e, "vec_id", "embedding", nlist = 8)
    val assigned = VectorIvf.assign(
      e.select(col("vec_id").as("vid"), col("embedding").as("vec")), cents)
    val p = plan(assigned)
    assert(p.contains("Broadcast"), p.take(800))
    // map-side combine: n·nlist scored rows reduce to ~n BEFORE the
    // exchange (the round-1 window formulation shuffled all of them)
    assert(p.contains("partial_max_by"), p.take(800))
    // the codebook's own seed selection carries one bounded global window
    // (row_number over nlist rows); assignment must add none
    assert(windowExecs(p) == windowExecs(plan(cents)),
      "argmax regressed to a window exchange")
  }

  test("PQ encode: broadcast codebook, partial-aggregating argmin, no window") {
    val cb = VectorPq.train(e, "vec_id", "embedding", m = 8, k = 16)
    val p = plan(VectorPq.encode(e, "vec_id", "embedding", cb))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(800))
    assert(p.contains("partial_max_by"), p.take(800))
    // codebook seeds carry one bounded global window; encode adds none
    assert(windowExecs(p) == windowExecs(plan(cb)),
      "encode regressed to a window exchange")
  }

  test("LSH topk: the only window is the final per-query ranking") {
    val p = plan(VectorLsh.topkApprox(e, "vec_id", "embedding", k = 3))
    // candidate generation must be an equi-join on the bucket key
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), "LSH degenerated to a cartesian")
    assert(windowExecs(p) <= 1, s"extra window exchanges in LSH:\n${p.take(800)}")
  }

  test("IVF probe: bounded top-nprobe aggregate, no full collect_list buffer") {
    // checkpoint the codebook as topkApprox does: the training tree has
    // its own (dim-bounded) collect_list that is not the probe's plan
    val cents = VectorIvf.train(e, "vec_id", "embedding", nlist = 8)
      .localCheckpoint(true)
    val probes = VectorIvf.probeCells(
      e.select(col("vec_id").as("vid"), col("embedding").as("vec")), cents, nprobe = 2)
    val p = plan(probes)
    assert(p.contains("collect_top_k"), s"probe lost the bounded aggregate:\n${p.take(800)}")
    assert(!p.contains("collect_list"),
      s"probe buffers all nlist cell scores per query:\n${p.take(800)}")
    // and the bounded aggregate still partial-merges map-side
    assert(p.contains("partial_collect_top_k"), p.take(800))
  }

  test("brute-force pairs are the ONLY place a nested-loop self-join appears") {
    // IVFADC end-to-end: no cartesian between corpus-sized relations
    val p = plan(VectorPq.topkIvfAdc(e, "vec_id", "embedding", topk = 3,
      nlist = 8, nprobe = 2, residual = true))
    assert(!p.contains("CartesianProduct"), "IVFADC contains a cartesian product")
  }
}
