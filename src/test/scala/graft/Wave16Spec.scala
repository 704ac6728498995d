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

  // ---- wave 2: q_stupid_backoff ----

  test("stupid backoff: imperative replay of the score") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSeq).toMap
    val isTrain = (id: Long) => (id * 2654435761L) % 4294967296L % 100 < 80
    val trainToks = docs.filter(k => isTrain(k._1)).values.flatten.toSeq
    val c1 = trainToks.groupBy(identity).map { case (w, o) => w -> o.size }
    val c2 = docs.filter(k => isTrain(k._1)).values
      .flatMap(t => t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .toSeq.groupBy(identity).map { case (b, o) => b -> o.size }
    val v = c1.size.toLong
    val tt = trainToks.size.toLong
    val expected = docs.filter(k => !isTrain(k._1)).map { case (id, t) =>
      val terms = t.sliding(2).filter(_.size == 2).map { p =>
        val s2 = c2.getOrElse((p(0), p(1)), 0)
        val sc = if (s2 > 0) s2.toDouble / c1(p(0))
          else (c1.getOrElse(p(1), 0) + 1.0) / (tt + v) * 0.4
        (if (s2 == 0) 1L else 0L, math.round((0.0 - math.log(sc)) * 10000))
      }.toSeq
      id -> (terms.size.toLong, terms.map(_._1).sum, terms.map(_._2).sum)
    }.filter(_._2._1 > 0)
    val got = run("q_stupid_backoff").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e") }
  }

  // ---- wave 2: q_stl_seasonal ----

  test("stl seasonal: imperative replay on the densified daily series") {
    val days = graft.tables.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(_.getLong(0))
    val byDay = days.groupBy(identity).map { case (d, o) => d -> o.size.toLong }
    val (d0, d1) = (days.min, days.max)
    val dense = (d0 to d1).map(d => d -> byDay.getOrElse(d, 0L))
    val expected = dense.zipWithIndex
      .filter { case ((d, _), i) => d >= d0 + 3 && d <= d1 - 3 }
      .map { case ((d, n), i) =>
        val s7 = (i - 3 to i + 3).map(j => dense(j)._2).sum
        (d % 7, n * 100 - s7 * 100 / 7)
      }
      .groupBy(_._1).map { case (dow, rs) =>
        dow -> (rs.size.toLong, rs.map(_._2).sum)
      }
    val got = run("q_stl_seasonal").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (dow, (nd, sr)) =>
      val (gnd, gsr, gse) = got(dow)
      assert((gnd, gsr) == ((nd, sr)), s"dow $dow counts/resid")
      // seasonal_e2 is the truncating division (Spark div ≡ Scala
      // Long /, both toward zero — sr can be negative)
      assert(gse == sr / nd, s"dow $dow seasonal")
    }
  }

  // ---- wave 2: q_weighted_jaccard_join ----

  test("weighted jaccard: imperative replay on the exact >=0.9 keeper pairs") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
    val txt = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exact-dup keepers: min doc_id per identical text
    val keep = txt.groupBy(_._2).values.map(_.keys.min).toSet
    val toks = txt.view.filterKeys(keep).mapValues(
      _.split(" ").filter(_.nonEmpty).toSeq).toMap
    val tf = toks.map { case (id, t) =>
      id -> t.groupBy(identity).map { case (w, o) => w -> o.size.toLong } }
    // ground-truth pair set: exact set-Jaccard >= 0.9 among keepers —
    // the oracle-validity identity Wave16Spec already pins for the
    // banded+verified path on this corpus
    val edges = graft.llm.TextDedup
      .jaccardPairs(docs.join(
          docs.sparkSession.createDataFrame(keep.toSeq.map(Tuple1(_)))
            .toDF("doc_id"), "doc_id"),
        "doc_id", "text", threshold = 0.9)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = edges.map { case (a, b) =>
      val (fa, fb) = (tf(a), tf(b))
      val inter = fa.keySet.intersect(fb.keySet).toSeq
        .map(w => math.min(fa(w), fb(w))).sum
      val union = fa.values.sum + fb.values.sum - inter
      (a, b) -> (inter, union, inter * 1000000L / union)
    }.toMap
    val got = run("q_weighted_jaccard_join").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expected.keySet,
      s"pair sets differ: missing=${(expected.keySet -- got.keySet).take(3)}")
    expected.foreach { case (p, e) =>
      assert(got(p) == e, s"pair $p: got ${got(p)}, expected $e") }
  }

  test("weighted jaccard: bounded by set jaccard structure") {
    // J_w <= 1, inter <= union, and a pair of identical texts scores 1e6
    val rows = run("q_weighted_jaccard_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
  }

  // ---- wave 2: q_rake_keyphrases ----

  test("rake: imperative replay of phrases, word scores, phrase scores") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, o) => w -> o.size }
    val stop = freq.toSeq.sortBy { case (w, c) => (-c, w) }.take(5)
      .map(_._1).toSet
    // phrases: maximal stopword-free runs, capped at 4 words
    val phrases = docs.flatMap { case (_, t) =>
      val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      t.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) runs += cur.toSeq; cur.clear() }
        else cur += w
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.filter(_.size <= 4)
    }
    val pfreq = phrases.flatten.groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val pdeg = phrases.flatMap(p => p.map(w => w -> p.size.toLong))
      .groupBy(_._1).map { case (w, o) => w -> o.map(_._2).sum }
    val wscore = pfreq.keys.map(w => w -> pdeg(w) * 10000L / pfreq(w)).toMap
    val expected = phrases
      .map(p => p.mkString(" ") -> p.map(wscore).sum)
      .groupBy(_._1)
      .map { case (ph, o) => ph -> (o.size.toLong, o.head._2) }
    val got = run("q_rake_keyphrases").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet,
      s"phrase sets differ (got ${got.size}, expected ${expected.size})")
    expected.foreach { case (ph, e) =>
      assert(got(ph) == e, s"phrase '$ph': got ${got(ph)}, expected $e") }
  }

  // ---- weighted MinHash (wave 3) ----

  /** tf per (source, tok) replayed imperatively — the shared fixture
    * for both weighted-MinHash tests (whitespace tokens, non-empty). */
  private def sourceTf(): Map[(String, String), Long] = {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
    val tf = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { r =>
      val src = r.getString(0)
      r.getString(1).split(" ").filter(_.nonEmpty).foreach { t =>
        val k = (src, t); tf(k) = tf.getOrElse(k, 0L) + 1L
      }
    }
    tf.toMap
  }

  test("weighted minhash: signature replays the integer-expansion " +
    "definition over (tok, 1..tf)") {
    import graft.functions.MinHashSig
    val mins = scala.collection.mutable.Map[String, Array[Long]]()
    sourceTf().foreach { case ((src, tok), n) =>
      val m = mins.getOrElseUpdate(src,
        Array.fill(MinHashSig.P)(Long.MaxValue))
      var r = 1L
      while (r <= n) {
        val h = MinHashSig.h0(s"$tok#$r")
        var i = 0
        while (i < MinHashSig.P) {
          val v = MinHashSig.perm(i, h)
          if (v < m(i)) m(i) = v
          i += 1
        }
        r += 1
      }
    }
    val got = run("q_weighted_minhash_sig").collect()
    assert(got.length == mins.size * MinHashSig.P,
      s"expected ${mins.size} sources x ${MinHashSig.P} perms")
    got.foreach { r =>
      val (src, perm, sv) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(mins(src)(perm.toInt) == sv,
        s"source $src perm $perm: got $sv, expected ${mins(src)(perm.toInt)}")
    }
  }

  test("weighted minhash pairs: exact side replays sum-min/sum-max and " +
    "the estimator columns are internally consistent") {
    val tf = sourceTf()
    val sources = tf.keys.map(_._1).toSeq.distinct.sorted
    val tot = sources.map(s =>
      s -> tf.collect { case ((src, _), n) if src == s => n }.sum).toMap
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield {
      val toksA = tf.collect { case ((s, t), n) if s == a => t -> n }.toMap
      val interW = toksA.iterator.map { case (t, na) =>
        math.min(na, tf.getOrElse((b, t), 0L)) }.sum
      (a, b) -> (interW * 10000L / (tot(a) + tot(b) - interW))
    }).toMap
    val got = run("q_weighted_minhash_pairs").collect()
    assert(got.length == expected.size,
      s"every source pair must appear: got ${got.length}")
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (matches, est, exact, err) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(matches >= 0 && matches <= 16)
      assert(est == matches * 625, s"$key: est_bp must be matches*625")
      assert(exact == expected(key),
        s"$key: exact_bp got $exact, replay ${expected(key)}")
      assert(err == math.abs(est - exact))
    }
    // the sketch must carry signal: mean |err| well inside the RSE=0.25
    // band (2500 bp) on this corpus — re-measured each round
    val meanErr = got.map(_.getLong(5)).sum / got.length
    assert(meanErr < 2500, s"mean err_bp $meanErr exceeds the RSE band")
  }
}
