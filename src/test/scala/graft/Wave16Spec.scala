package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property/replay specs for the round-16 additions. */
class Wave16Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- cascade-on-candidates (q_dedup_cascade_banded) ----

  test("banded cascade: funnel counts are consistent with the exact cascade") {
    val exact = run("q_dedup_cascade").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val banded = run("q_dedup_cascade_banded").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // stages 0 and 1 are the SAME computation (raw rollup, exact md5
    // keeper) — identical by construction, so any drift is a shared-
    // pipeline regression
    assert(banded("0_raw") == exact("0_raw"))
    assert(banded("1_exact") == exact("1_exact"))
    // stage 2: the banded twin merges at the HIGHER 0.9 threshold over a
    // SUBSET of the exact ≥0.2 graph — it can only keep more docs/tokens
    assert(banded("2_neardup")._1 >= exact("2_neardup")._1,
      "0.9-threshold cascade must remove no more docs than the 0.2 one")
    assert(banded("2_neardup")._2 >= exact("2_neardup")._2)
    // and the funnel is monotone
    assert(banded("0_raw")._1 >= banded("1_exact")._1)
    assert(banded("1_exact")._1 >= banded("2_neardup")._1)
  }

  test("banded cascade: verified candidate edges equal the exact >=0.9 edge set") {
    // the oracle's validity precondition, asserted directly: banded
    // candidate generation (recall) + exact verification (precision)
    // over the stage-1 survivors must reproduce exactly the true >=0.9
    // pairs among survivors from the exact ground-truth build
    val docs = graft.tables.Tables.table(spark, sf, "documents")
    val base = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("h"))
    val k1 = base.withColumn("kid",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("kid")).select(col("doc_id"))
    val survivors = docs.join(k1, "doc_id")
    val cand = graft.llm.TextDedup
      .minhashCandidates(survivors, "doc_id", "text")
    val verified = graft.llm.TextDedup
      .verifyCandidatePairs(survivors, cand, "doc_id", "text")
      .filter(col("jaccard") >= 0.9)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.llm.TextDedup
      .jaccardPairs(docs, "doc_id", "text", threshold = 0.9)
      .join(k1.select(col("doc_id").as("id_a")), "id_a")
      .join(k1.select(col("doc_id").as("id_b")), "id_b")
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == exact,
      s"banded+verified edges (${verified.size}) must equal the exact " +
        s">=0.9 set (${exact.size}); missing=${(exact -- verified).take(5)}" +
        s" extra=${(verified -- exact).take(5)}")
  }

  test("verifyCandidatePairs: jaccard matches jaccardPairs on its pair set") {
    // the verifier is a second implementation of exact Jaccard — pin it
    // to the ground-truth build value-for-value on the pairs both emit
    val docs = graft.tables.Tables.table(spark, sf, "documents")
    val truth = graft.llm.TextDedup
      .jaccardPairs(docs, "doc_id", "text", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cand = spark.createDataFrame(
      truth.keys.toSeq.map(p => (p._1, p._2))).toDF("id_a", "id_b")
    val ver = graft.llm.TextDedup
      .verifyCandidatePairs(docs, cand, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ver.keySet == truth.keySet)
    truth.foreach { case (p, j) =>
      assert(ver(p) == j, s"pair $p: verifier ${ver(p)} != truth $j") }
  }
}
