package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MinHash signature aggregate: exact JVM replay, merge algebra
  * (associativity/commutativity/idempotence of elementwise min),
  * serialization round-trip, and estimator sanity. */
class MinHashSigSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import MinHashSigAgg.minhash_sig

  private def sigOf(items: Seq[String]): Array[Long] = {
    import spark.implicits._
    items.toDF("s").agg(minhash_sig(col("s"))).head()
      .getSeq[Long](0).toArray
  }

  test("signature equals the plain-Scala min over every permutation") {
    val items = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val expected = Array.tabulate(MinHashSig.P) { i =>
      items.map(x => MinHashSig.perm(i, MinHashSig.h0(x))).min
    }
    assert(sigOf(items).sameElements(expected))
  }

  test("order- and duplication-free: shuffled + duplicated input, same sig") {
    val items = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val base = sigOf(items)
    assert(sigOf(scala.util.Random.shuffle(items ++ items ++ items))
      .sameElements(base))
  }

  test("merge is associative/commutative/idempotent and survives serde") {
    val xs = (1 to 50).map(i => s"item_$i")
    def state(items: Seq[String]): MinHashState = {
      val s = new MinHashState; items.foreach(s.add); s
    }
    val (p1, p2, p3) = (xs.take(15), xs.slice(15, 30), xs.drop(30))
    val whole = state(xs)
    // (p1 + p2) + p3
    val l = state(p1); l.mergeIn(state(p2)); l.mergeIn(state(p3))
    // p3 + (p2 + p1), through a serialization hop
    val r0 = state(p2); r0.mergeIn(state(p1))
    val r = MinHashState.deserialize(
      state(p3).serialize()); r.mergeIn(
      MinHashState.deserialize(r0.serialize()))
    assert(l.mins.sameElements(whole.mins))
    assert(r.mins.sameElements(whole.mins))
    // idempotence: merging a copy of itself changes nothing
    val dup = MinHashState.deserialize(whole.serialize())
    dup.mergeIn(whole)
    assert(dup.mins.sameElements(whole.mins))
  }

  test("estimator sanity: identical sets match 16/16, disjoint nearly 0") {
    val a = (1 to 200).map(i => s"tok_$i")
    val b = (201 to 400).map(i => s"tok_$i")
    val sa = sigOf(a)
    assert(sigOf(a).sameElements(sa), "identical set, identical signature")
    val disjointMatches = sa.zip(sigOf(b)).count { case (x, y) => x == y }
    assert(disjointMatches <= 3,
      s"disjoint 200-sets should share almost no minima ($disjointMatches)")
  }

  test("empty / all-null group evaluates to null") {
    import spark.implicits._
    val row = Seq.empty[String].toDF("s").agg(minhash_sig(col("s"))).head()
    assert(row.isNullAt(0))
    val nulls = Seq[Option[String]](None, None).toDF("s")
      .agg(minhash_sig(col("s"))).head()
    assert(nulls.isNullAt(0))
  }

  test("declared pair query: mean estimator error is inside the RSE band") {
    val df = graft.SparkEntry.queries("q_minhash_sig_pairs")(
      spark, TestSpark.sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val meanErr = rows.map(_.getAs[Long]("err_bp")).sum.toDouble / rows.length
    // RSE = 1/sqrt(16) = 0.25 => 2500 bp expected sd per pair; the MEAN
    // absolute error across 190 pairs must sit well inside one sd
    assert(meanErr <= 2500.0, s"mean |est - exact| = $meanErr bp")
  }
}
