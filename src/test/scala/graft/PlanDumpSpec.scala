package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fingerprint canonicalizer's own contracts. */
class PlanDumpSpec extends AnyFunSuite {

  test("sortAttrList is paren-aware and stable") {
    val in = "Keys [3]: [b#x, knownfloatingpointnormalized(f(a#x, c#x))" +
      " AS k#x, a#x]"
    val out = PlanDump.sortAttrList(in)
    assert(out == "Keys [3]: [a#x, b#x, " +
      "knownfloatingpointnormalized(f(a#x, c#x)) AS k#x]",
      s"got: $out")
    // non-attribute lines pass through untouched
    val other = "(3) Exchange [codegen id : 1]"
    assert(PlanDump.sortAttrList(other) == other)
  }

  test("canonicalize strips every run-specific token class") {
    val raw = Seq(
      "Arguments: [x#123L], MapPartitionsRDD[7360] at localCheckpoint",
      "Location: InMemoryFileIndex [file:/root/testdata/sf0.001/x.parquet]",
      "graft.queries.Extras$$$Lambda$2882/0x00007f3f50de3848@1a2b3c4d",
      "state info [ checkpoint = , runId = fe8e352e-b821-4426-b9ca-" +
        "0f08d7bbb4e3, opId = 0], 1786848855893, false",
      "Exchange hashpartitioning(b#12, a#7, 8), ENSURE_REQUIREMENTS," +
        " [plan_id=42]").mkString("\n")
    val canon = PlanDump.canonicalize(raw)
    assert(!canon.contains("7360") && !canon.contains("#123"))
    assert(!canon.contains("0x00007f3f") && !canon.contains("@1a2b"))
    assert(!canon.contains("fe8e352e") && !canon.contains("1786848855893"))
    assert(canon.contains("hashpartitioning(a#x, b#x, n)"),
      s"partition keys must be sorted: $canon")
    // idempotent: canonicalizing a canonical plan is a no-op
    assert(PlanDump.canonicalize(canon) == canon)
  }
}
