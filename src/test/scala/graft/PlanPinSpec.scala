package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drive the committed plan-fingerprint artifact INTO the gate (NEXT
  * r15 candidate #4): re-fingerprint a pinned set of load-bearing
  * queries in the test session and compare byte-for-byte against the
  * committed `PLANS_r14.txt` lines — a plan regression (broadcast →
  * SMJ, a lost pushdown, a new Exchange, a window losing its
  * partitioning) now FAILS TESTS instead of waiting for bench triage
  * or review. The canonicalizer is partition-count-blind, so the
  * 4-thread test session reproduces the 8-thread dump's fingerprints
  * exactly.
  *
  * The pinned set deliberately avoids session-memoized frames (the
  * dup-edge memo) whose plans legitimately depend on what ran earlier
  * in the shared JVM.
  */
class PlanPinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val artifact = "PLANS_r14.txt"

  private val pinned = Seq(
    // the flagship scan+agg, a broadcast star join, a ranked window
    "q1_pricing_summary", "q_join_broadcast", "q_window_rank",
    // the r13-weak-mark fix: sharded curriculum must KEEP its
    // partitioned-window + theta-prefix-sum shape
    "q_curriculum_order",
    // two-level bucketed rank (the scalable global-order shape)
    "q_mannwhitney_u",
    // the per-lang prefix-sum packer
    "q_token_packing",
    // the calendar-bounded dense-grid family's representative
    "q_acf_daily",
    // wave 6's scale twin: the fingerprint path must stay the shape
    // that earned its measured shuffle/spill win
    "q_boilerplate_fingerprint",
    // the custom-plan-node as-of join: a silent fallback to BNLJ is
    // the regression this pin exists to catch. (q_pit_join would be
    // the natural second pin but QueriesSpec .cache()s its result —
    // the session cache manager then substitutes an InMemoryRelation
    // into any later identical plan, so its fingerprint legitimately
    // differs under full-suite order; pinning it would flap.)
    "q_join_asof_native",
    // the salted skew join and the bloom-pruned join: the salt fan
    // and the probe-below-the-Exchange placement are the load-bearing
    // shapes
    "q_join_skew_salted", "q_join_bloom_pruned")

  private lazy val committed: Map[String, String] =
    scala.io.Source.fromFile(artifact)(scala.io.Codec.UTF8).getLines()
      .filterNot(_.startsWith("#"))
      .map(l => l.split("\\s+")(0) -> l).toMap

  test("pinned plan fingerprints match the committed artifact") {
    val mode =
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val mismatches = pinned.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
      val line = PlanDump.fingerprint(name,
        df.queryExecution.explainString(mode))
      if (committed.get(name).contains(line)) None
      else Some(s"  expected: ${committed.getOrElse(name, "<missing>")}\n" +
        s"  actual:   $line")
    }
    assert(mismatches.isEmpty,
      "plan fingerprints drifted from PLANS_r14.txt — if the change is" +
        " intentional, regenerate via `sbt \"runMain graft.PlanDump" +
        " /root/testdata/sf0.001 PLANS_r14.txt\"`:\n" +
        mismatches.mkString("\n"))
  }

  test("the committed artifact covers the full declared surface") {
    val declared = SparkEntry.defs.map(_.name).toSet
    val inFile = committed.keySet
    assert(declared.subsetOf(inFile),
      s"artifact missing queries: ${(declared -- inFile).toSeq.sorted}")
    assert(inFile.subsetOf(declared),
      s"artifact has stale queries: ${(inFile -- declared).toSeq.sorted}")
  }
}
