package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drive the committed plan-fingerprint artifacts INTO the gate: re-
  * fingerprint the pinned load-bearing queries in the test session and
  * compare byte-for-byte against the committed `PLANS_r17.txt` /
  * `PLANS_EXEC_r17.txt` lines — a plan regression (broadcast → SMJ, a
  * lost pushdown, a new Exchange, a window losing its partitioning, a
  * codegen span breaking apart) FAILS TESTS instead of waiting for
  * bench triage or review. The canonicalizer is partition-count-blind,
  * so the 4-thread test session reproduces the 8-thread dump's
  * fingerprints exactly.
  *
  * The pinned lists live in main-source [[PlanPins]], shared with the
  * artifact generator, so generator and gate can never drift. Cached-
  * frame interference (QueriesSpec .cache()s q_pit_join's result — the
  * session cache manager then substitutes an InMemoryRelation into any
  * later identical plan) is neutralized by unpersisting the query's
  * own plan before re-fingerprinting; `df.unpersist()` is a no-op when
  * nothing is cached, so doing it for every pinned query is safe under
  * any suite order.
  */
class PlanPinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val artifact = "PLANS_r17.txt"
  private val execArtifact = "PLANS_EXEC_r17.txt"

  private def load(path: String): Map[String, String] =
    scala.io.Source.fromFile(path)(scala.io.Codec.UTF8).getLines()
      .filterNot(_.startsWith("#"))
      .map(l => l.split("\\s+")(0) -> l).toMap

  private lazy val committed: Map[String, String] = load(artifact)
  private lazy val committedExec: Map[String, String] = load(execArtifact)

  /** Build the query twice: the first build locates any cached copy to
    * unpersist (no-op when none), the second yields a substitution-free
    * plan to fingerprint. */
  private def freshDf(name: String) = {
    SparkEntry.queries(name)(spark, TestSpark.sf0001).unpersist(false)
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
  }

  test("pinned plan fingerprints match the committed artifact") {
    val mode =
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val mismatches = PlanPins.pre.flatMap { name =>
      val line = PlanDump.fingerprint(name,
        freshDf(name).queryExecution.explainString(mode))
      if (committed.get(name).contains(line)) None
      else Some(s"  expected: ${committed.getOrElse(name, "<missing>")}\n" +
        s"  actual:   $line")
    }
    assert(mismatches.isEmpty,
      s"plan fingerprints drifted from $artifact — if the change is" +
        " intentional, regenerate via `sbt \"runMain graft.PlanDump" +
        s" /root/testdata/sf0.001 $artifact $execArtifact\"`:\n" +
        mismatches.mkString("\n"))
  }

  test("executed (post-AQE) fingerprints match, with real codegen spans") {
    val mismatches = PlanPins.exec.flatMap { name =>
      // shared with the dump (one definition): clears the session cache
      // (so no suite's cached frame substitutes an InMemoryRelation into
      // the replan) and fingerprints the PlanPins.execAqeOff subset
      // with AQE disabled (deterministic static plan — the AQE-final
      // shape races on a runtime build-side flip)
      val (line, _) =
        PlanDump.execFingerprintFor(spark, name, TestSpark.sf0001)
      if (committedExec.get(name).contains(line)) None
      else Some(s"  expected: ${committedExec.getOrElse(name, "<missing>")}\n" +
        s"  actual:   $line")
    }
    assert(mismatches.isEmpty,
      s"executed-plan fingerprints drifted from $execArtifact — if" +
        " intentional, regenerate via `sbt \"runMain graft.PlanDump" +
        s" /root/testdata/sf0.001 $artifact $execArtifact\"`:\n" +
        mismatches.mkString("\n"))
    // the point of the exec artifact: codegen ids are real here. Every
    // exec-pinned query must show at least one whole-stage span (the
    // pre-exec artifact records 0 for all exchange-bearing plans).
    val noCodegen = committedExec.filterNot(_._2.contains("ERROR"))
      .filter(_._2.contains("codegen_spans=0 "))
    assert(noCodegen.isEmpty,
      s"exec-pinned queries lost all codegen spans: ${noCodegen.keys.toSeq.sorted}")
  }

  test("the committed artifact covers the full declared surface") {
    val declared = SparkEntry.defs.map(_.name).toSet
    val inFile = committed.keySet
    assert(declared.subsetOf(inFile),
      s"artifact missing queries: ${(declared -- inFile).toSeq.sorted}")
    assert(inFile.subsetOf(declared),
      s"artifact has stale queries: ${(inFile -- declared).toSeq.sorted}")
    // r14 ADVICE: name-set equality alone would let a committed
    // `<name> ERROR ...` line (PlanDump catches Throwable per query)
    // count as coverage — a query that fails to BUILD at dump time
    // must fail this gate, not silently pass it
    val broken = (committed.values ++ committedExec.values)
      .filterNot(_.contains(" ops=")).toSeq.sorted
    assert(broken.isEmpty,
      s"artifact carries non-fingerprint (ERROR) lines:\n${broken.mkString("\n")}")
    // and every pin must actually be declared + covered
    assert((PlanPins.pre ++ PlanPins.exec).forall(declared.contains),
      "PlanPins names a query that is not declared")
    assert(PlanPins.exec.forall(committedExec.contains),
      "exec artifact missing pinned queries — regenerate with the" +
        " execOut argument")
    // r16: every AQE-off exec pin fingerprints the STATIC plan — the
    // AQE-FINAL shape of those queries is only covered if each also
    // carries a pre-exec pin, so losing one from `pre` must fail here
    // rather than silently narrow coverage
    assert(PlanPins.execAqeOff.forall(PlanPins.pre.contains),
      "every execAqeOff member needs a pre-exec pin: " +
        PlanPins.execAqeOff.filterNot(PlanPins.pre.contains).mkString(","))
  }
}
