package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries summary guarantees: never overcounts, undercounts by at
  * most n/(k+1), guaranteed presence of true heavy hitters — and the
  * bounds SURVIVE arbitrary merge trees (the mergeable-summaries
  * property the 100 TB rollup relies on). */
class MisraGriesSpec extends AnyFunSuite {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def check(s: MGSummary, xs: Seq[String]): Unit = {
    val exact = exactCounts(xs)
    val n = xs.size.toLong
    val bound = n / (s.k + 1)
    s.counts.foreach { case (item, est) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est <= truth, s"$item overcounted: $est > $truth")
      assert(truth - est <= bound,
        s"$item undercount ${truth - est} exceeds n/(k+1)=$bound")
    }
    exact.foreach { case (item, truth) =>
      if (truth > bound)
        assert(s.counts.contains(item),
          s"guaranteed hitter $item (count $truth > $bound) missing")
    }
  }

  /** Deterministic pseudo-random stream: Zipf-ish over a vocab. */
  private def stream(seed: Long, len: Int, vocab: Int): Seq[String] = {
    var x = seed
    (0 until len).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      val u = ((x >>> 33).toDouble / (1L << 31).toDouble)
      // quadratic skew: low ids much more frequent
      val id = math.min(vocab - 1, (u * u * vocab).toInt)
      s"w$id"
    }
  }

  test("single-pass summary obeys MG bounds on skewed streams") {
    Seq(1L, 7L, 42L).foreach { seed =>
      val xs = stream(seed, 20000, 500)
      val s = new MGSummary(32)
      xs.foreach(s.add)
      assert(s.n == xs.size)
      check(s, xs)
    }
  }

  test("merged summaries keep the combined bound under arbitrary merge trees") {
    val xs = stream(99L, 30000, 300)
    // simulate 6 partitions, then a lopsided merge tree
    val parts = xs.grouped(5000).map { chunk =>
      val s = new MGSummary(32); chunk.foreach(s.add); s
    }.toList
    val left = parts.take(2).reduce { (a, b) => a.mergeIn(b); a }
    val right = parts.drop(2).reduce { (a, b) => a.mergeIn(b); a }
    left.mergeIn(right)
    assert(left.n == xs.size)
    check(left, xs)
  }

  test("the decremented sentinel trips exactly when exactness is lost") {
    // domain <= k: never decrements, counts are EXACT, sentinel stays off
    val small = new MGSummary(4)
    Seq("a", "b", "a", "c", "b", "a").foreach(small.add)
    assert(!small.decremented && small.n == 6 &&
      small.counts == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    // the (k+1)-th distinct item fires the decrement-all step
    small.add("d"); small.add("e")
    assert(small.decremented && small.n == 8)
    // ... and the flag survives serialization and infects merges
    val r = MGSummary.deserialize(small.serialize())
    assert(r.decremented)
    val clean = new MGSummary(4); clean.add("z")
    clean.mergeIn(r)
    assert(clean.decremented)
    // merge-side overflow also trips it (no pointwise add involved)
    val m1 = new MGSummary(2); Seq("a", "b").foreach(m1.add)
    val m2 = new MGSummary(2); Seq("c", "d").foreach(m2.add)
    assert(!m1.decremented && !m2.decremented)
    m1.mergeIn(m2)
    assert(m1.decremented)
  }

  test("serialize round-trips the summary exactly") {
    val xs = stream(5L, 8000, 200)
    val s = new MGSummary(32); xs.foreach(s.add)
    val r = MGSummary.deserialize(s.serialize())
    assert(r.k == s.k && r.n == s.n && r.counts == s.counts &&
      r.decremented == s.decremented)
    // and a deserialized partial keeps merging correctly
    val more = stream(6L, 8000, 200)
    val s2 = new MGSummary(32); more.foreach(s2.add)
    r.mergeIn(s2)
    check(r, xs ++ more)
  }

  test("an all-distinct stream leaves no spurious confident counts") {
    val xs = (0 until 5000).map(i => s"u$i")
    val s = new MGSummary(32); xs.foreach(s.add)
    // every estimate is <= truth (1) and the guarantee set is empty
    s.counts.foreach { case (_, est) => assert(est <= 1L) }
  }
}
