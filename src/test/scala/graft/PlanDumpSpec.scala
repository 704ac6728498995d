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
        "0f08d7bbb4e3, opId = 0, ver = 0, numPartitions = 8]" +
        " stateStoreCkptIds = None, 1786848855893, false",
      // r15 ADVICE: a POPULATED ckpt-id value (state-store checkpoint
      // format v2 prints Some(...) with commas) must still anchor the
      // batch-timestamp blinding
      "state info [ checkpoint = , runId = fe8e352e-b821-4426-b9ca-" +
        "0f08d7bbb4e3, opId = 0, ver = 0, numPartitions = 8]" +
        " stateStoreCkptIds = Some(List(a1b2, c3d4)), 1786848855894, false",
      "Exchange hashpartitioning(b#12, a#7, 8), ENSURE_REQUIREMENTS," +
        " [plan_id=42]").mkString("\n")
    val canon = PlanDump.canonicalize(raw)
    assert(!canon.contains("7360") && !canon.contains("#123"))
    assert(!canon.contains("0x00007f3f") && !canon.contains("@1a2b"))
    assert(!canon.contains("fe8e352e") && !canon.contains("1786848855893"))
    assert(!canon.contains("1786848855894"),
      "populated Some(...) ckpt-ids must not break timestamp blinding")
    // r16: LayoutCache bucketed-table tokens (md5 + writer pid) must
    // blind — they vary per dump JVM with zero plan change
    val bkt = PlanDump.canonicalize(
      "Scan parquet spark_catalog.default.lineitem_b_root_testdata" +
        "_sf0_001_a1b2c3d4e5f6_p12345")
    assert(!bkt.contains("a1b2c3d4e5f6") && !bkt.contains("p12345"),
      s"LayoutCache md5+pid token must blind: $bkt")
    assert(canon.contains("hashpartitioning(a#x, b#x, n)"),
      s"partition keys must be sorted: $canon")
    // idempotent: canonicalizing a canonical plan is a no-op
    assert(PlanDump.canonicalize(canon) == canon)
  }

  test("hashpartitioning blinding is paren-aware (r14 ADVICE)") {
    // a computed exchange key with nested parens — the old [^()]* regex
    // skipped this clause entirely, letting the raw count survive
    val in = "Exchange hashpartitioning(pmod(xxhash64(d#x, 42), 16)," +
      " lang#x, 200), ENSURE_REQUIREMENTS, [plan_id=x]\nrest (balanced)"
    val out = PlanDump.blindHashPartitioning(in)
    assert(out == "Exchange hashpartitioning(lang#x," +
      " n, pmod(xxhash64(d#x, 42), 16)), ENSURE_REQUIREMENTS," +
      " [plan_id=x]\nrest (balanced)", s"got: $out")
    // no clause -> identity; text after the clause is preserved verbatim
    assert(PlanDump.blindHashPartitioning("plain text (x, 1)") ==
      "plain text (x, 1)")
  }

  test("epoch-ms blinding only fires in the state-info context (r14 ADVICE)") {
    // a genuine 13-digit query literal (the e12 grid scale) must SURVIVE
    // canonicalization so a change to it moves the fingerprint
    val lit = "Condition : (s_e12#x < 1000000000000)"
    assert(PlanDump.canonicalize(lit).contains("1000000000000"))
  }
}
