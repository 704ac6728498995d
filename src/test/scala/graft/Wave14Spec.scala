package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property/replay specs for the round-14 widening wave. */
class Wave14Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("kruskal-wallis: imperative tied-rank replay reproduces H exactly") {
    val rows = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byV = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sortedV = byV.keys.toArray.sorted
    val below = {
      var cum = 0L
      sortedV.map { v => val b = cum; cum += byV(v); v -> b }.toMap
    }
    val s2 = rows.groupBy(_._1).view.mapValues { g =>
      g.map { case (_, v) => 2 * below(v) + byV(v) + 1 }.sum
    }.toMap
    val nT = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val q = s2.toSeq.map { case (t, s) =>
      BigInt(s) * s / (4 * nT(t)) }.sum
    val d = BigInt(n) * (n + 1)
    val hPpm = ((12 * q * 1000000 - BigInt(3000000) * (n + 1) * d)
      .max(0) / d).toLong
    val tt = byV.values.map(c => BigInt(c) * c * c - c).sum
    val n3 = BigInt(n) * n * n - n
    val hTie = (BigInt(hPpm) * n3 / (n3 - tt).max(1)).toLong
    val got = run("q_kruskal_wallis").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    got.foreach { case (t, nt, rs2, hp, htp) =>
      assert(nt == nT(t) && rs2 == s2(t), s"rank sums diverged for $t")
      assert(hp == hPpm, s"H diverged: engine $hp replay $hPpm")
      assert(htp == hTie, s"tie-corrected H diverged: $htp vs $hTie")
    }
    // rank-sum conservation: sum of all doubled rank sums = N(N+1)
    assert(s2.values.sum == n * (n + 1), "doubled rank sums must conserve")
  }

  test("cramers v: chi2 equals the chi2_independence grid sum; V in [0, 1e6]") {
    val grid = run("q_chi2_independence")
      .agg(sum(col("contrib_ppm")).cast("long")).head().getLong(0)
    val v = run("q_cramers_v").head()
    assert(v.getAs[Long]("chi2_ppm") == grid,
      "cramers chi2 must equal the independence grid's exact sum")
    val vppm = v.getAs[Long]("v_ppm")
    assert(vppm >= 0L && vppm <= 1000000L, s"V out of [0,1]: $vppm")
    assert(v.getAs[Long]("dof") ==
      (v.getAs[Long]("n_rows") - 1) * (v.getAs[Long]("n_cols") - 1))
  }

  test("js divergence: bounded by ln 2, symmetric-complete pair matrix") {
    val js = run("q_js_divergence").collect()
    val nSrc = graft.tables.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(js.length == nSrc * (nSrc - 1) / 2, "pair matrix incomplete")
    js.foreach { r =>
      val v = r.getAs[Long]("js_e6")
      assert(v >= 0L && v <= 693148L, s"JS out of [0, ln2]: $v")
    }
  }

  test("hill tail: replay of the top-101 selection and the ln-term sum") {
    val xs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, nc) => (-nc, id) }
    val xRef = xs(100)._2
    def rnd(x: Double) = new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val sumLn = xs.take(100)
      .map { case (_, nc) => rnd(math.log(nc.toDouble / xRef)) }.sum
    val alpha = 100L * 1000000000000L / math.max(sumLn, 1L)
    val got = run("q_hill_tail").head()
    assert(got.getAs[Long]("k") == 100L)
    assert(got.getAs[Long]("x_ref") == xRef, "reference order stat diverged")
    assert(got.getAs[Long]("sum_ln_e6") == sumLn)
    assert(got.getAs[Long]("alpha_ppm") == alpha)
  }

  test("good-turing: freq-of-freq identities and exact r* replay") {
    val counts = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).count().collect().map(_.getLong(1))
    val nr = counts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = counts.sum
    val got = run("q_good_turing").collect()
    assert(got.length == 10)
    got.foreach { r =>
      val (rr, nR, nR1) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nR == nr.getOrElse(rr, 0L), s"N_$rr diverged")
      assert(nR1 == nr.getOrElse(rr + 1, 0L))
      assert(r.getAs[Long]("r_star_e6") ==
        (rr + 1) * nR1 * 1000000L / math.max(nR, 1L))
      assert(r.getAs[Long]("p0_ppm") ==
        nr.getOrElse(1L, 0L) * 1000000L / nTok)
    }
  }

  test("ngram novelty: per-lang totals equal an independent eval-gram count") {
    val got = run("q_ngram_novelty").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.values.foreach { case (n, nov) =>
      assert(nov >= 0L && nov <= n, "novel count must be within totals")
    }
    // independent recompute of the eval split's per-lang gram totals
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        filter(split(col("text"), " "), t => t =!= "").as("t"))
      .filter(size(col("t")) >= 8)
    val trainPred = expr(
      "pmod(doc_id * 2654435761, 4294967296) % 100 < 80")
    val evalTotals = docs.filter(!trainPred)
      .select(col("lang"), (size(col("t")) - 7).cast("long").as("g"))
      .groupBy(col("lang")).agg(sum(col("g")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == evalTotals.keySet)
    got.foreach { case (l, (n, _)) =>
      assert(n == evalTotals(l), s"gram total diverged for $l") }
  }

  test("bigram entropy: bounded by ln(distinct bigrams), deterministic") {
    val a = run("q_bigram_entropy").collect()
    a.foreach { r =>
      val h = r.getAs[Long]("h_cond_e6")
      val nd = r.getAs[Long]("n_distinct")
      assert(h >= 0L, s"conditional entropy must be nonnegative: $h")
      assert(h <= (math.log(nd.toDouble) * 1e6).toLong + a.length,
        s"H must not exceed ln(|bigrams|): $h vs nd=$nd")
    }
    val b = run("q_bigram_entropy").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("random projection: imperative sign-matrix replay + unbiased norms") {
    def sign(i: Int, j: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val nib = (md.digest(s"${i}_$j".getBytes("UTF-8"))(0) >> 4) & 0xf
      if (nib % 2 == 1) 1L else -1L
    }
    def rnd(x: Double) = new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => rnd(f.toDouble)).toArray).toMap
    val got = run("q_random_projection").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == vecs.size)
    got.take(20).foreach { case (id, norm2, proj2, ratio) =>
      val q = vecs(id)
      assert(norm2 == q.map(x => x * x).sum, s"norm2 diverged for $id")
      val p2 = (0 until 16).map { i =>
        val y = q.indices.map(j => sign(i, j) * q(j)).sum
        y * y
      }.sum
      assert(proj2 == p2, s"projection diverged for $id")
      assert(ratio ==
        (BigInt(p2) * 1000000 / BigInt(16L * norm2).max(1)).toLong)
    }
    // JL unbiasedness: the mean ratio over the corpus sits near 1e6
    val mean = got.map(_._4).sum / got.length
    assert(mean > 700000L && mean < 1300000L,
      s"mean norm ratio far from 1 (ppm): $mean")
  }

  test("wilcoxon signed-rank: imperative paired replay + conservation") {
    def rnd(x: Double) = new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val byUser = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), rnd(r.getDouble(2))))
      .groupBy(_._1)
    val ds = byUser.values.flatMap { g =>
      val a = g.filter(_._2 == "click").map(_._3)
      val b = g.filter(_._2 == "view").map(_._3)
      if (a.nonEmpty && b.nonEmpty && a.sum != b.sum)
        Some(a.sum - b.sum) else None
    }.toSeq
    val n = ds.length.toLong
    val byAd = ds.map(math.abs).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val sortedAd = byAd.keys.toArray.sorted
    val below = { var c = 0L
      sortedAd.map { v => val b = c; c += byAd(v); v -> b }.toMap }
    def rank2(d: Long) = 2 * below(math.abs(d)) + byAd(math.abs(d)) + 1
    val sPlus = ds.filter(_ > 0).map(rank2).sum
    val sMinus = ds.filter(_ < 0).map(rank2).sum
    val got = run("q_wilcoxon_signed_rank").head()
    assert(got.getAs[Long]("n_pairs") == n)
    assert(got.getAs[Long]("s_plus2") == sPlus, "positive rank sum diverged")
    assert(got.getAs[Long]("s_minus2") == sMinus)
    assert(sPlus + sMinus == n * (n + 1), "doubled rank sums must conserve")
  }

  test("daily ACF: lag-0 is exactly 1, terms shrink by lag, bounded") {
    val acf = run("q_acf_daily").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(acf.length == 8)
    assert(acf.head == ((0L, acf.head._2, 1000000L)),
      s"lag 0 must be exactly 1e6: ${acf.head}")
    acf.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._2 - 1, "n_terms must shrink by one per lag")
      case _ => ()
    }
    acf.foreach { case (_, _, v) =>
      assert(math.abs(v) <= 1000000L, s"|acf| must be <= 1: $v") }
  }

  test("classifier metrics: margin identities, macro mean, MCC bounds") {
    val m = run("q_classifier_metrics").collect()
    val nTot = m.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).sum
    m.foreach { r =>
      val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn == nTot,
        "one-vs-rest cells must partition the held-out set")
      assert(r.getAs[Long]("f1_ppm") ==
        2 * tp * 1000000L / math.max(2 * tp + fp + fn, 1L))
      val mcc = r.getAs[Long]("mcc_e6")
      assert(mcc >= -1000000L && mcc <= 1000000L, s"MCC out of range: $mcc")
    }
    val macroF1 = m.map(_.getAs[Long]("f1_ppm")).sum / m.length
    assert(m.forall(_.getAs[Long]("macro_f1_ppm") == macroF1),
      "macro F1 must be the integer mean of the per-class F1s")
  }

  test("mutual information: nonneg, bounded by the smaller entropy") {
    val r = run("q_mutual_information").head()
    val (mi, hl, hs) = (r.getAs[Long]("mi_e6"),
      r.getAs[Long]("h_lang_e6"), r.getAs[Long]("h_source_e6"))
    assert(hl >= 0L && hs >= 0L)
    // rounding slack: each pre-rounded term can carry half a grid unit
    assert(mi >= -100L, s"MI must be nonnegative up to grid slack: $mi")
    assert(mi <= math.min(hl, hs) + 1000L,
      s"MI must not exceed min entropy: $mi vs $hl/$hs")
    val nmi = r.getAs[Long]("nmi_ppm")
    assert(nmi >= -100L && nmi <= 1001000L, s"NMI out of [0,1]: $nmi")
  }

  test("dp quantile: deterministic release near the true median") {
    val a = run("q_dp_quantile").collect()
    val b = run("q_dp_quantile").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "seeded exponential mechanism must be reproducible")
    a.foreach { r =>
      val (n, err) = (r.getAs[Long]("n"), r.getAs[Long]("rank_err"))
      assert(err >= 0L && err <= n / 2, s"rank error out of range: $err/$n")
      assert(r.getAs[Long]("true_p50_c") >= 0L &&
        r.getAs[Long]("released_c") >= 0L)
    }
  }

  test("csv/json roundtrips equal the same certificate on the originals") {
    def cert(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(conv(substring(md5(col("text").cast("binary")), 1, 8),
          16, 10).cast("long")).as("text_sum32"))
      .orderBy(col("lang")).collect().map(_.toSeq).toSeq
    val direct = cert(graft.tables.Tables.documents(spark, sf))
    assert(run("q_format_csv_roundtrip").collect().map(_.toSeq).toSeq
      == direct, "CSV round trip lost fidelity")
    assert(run("q_format_json_roundtrip").collect().map(_.toSeq).toSeq
      == direct, "JSON round trip lost fidelity")
  }
}
