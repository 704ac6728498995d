package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property/replay specs for the round-14 third (continuation) wave. */
class Wave14bSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Zero-filled dense daily (clicks, purchases) series, imperatively. */
  private lazy val dailyXY: Seq[(Long, Long, Long)] = {
    val byDay = graft.tables.Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
    val d0 = byDay.keys.min
    val d1 = byDay.keys.max
    (d0 to d1).map { d =>
      val ts = byDay.getOrElse(d, Array.empty[(Long, String)]).map(_._2)
      (d, ts.count(_ == "click").toLong, ts.count(_ == "purchase").toLong)
    }
  }

  test("kendall tau: imperative pair replay matches every count and tau") {
    val pairs = for {
      (da, xa, ya) <- dailyXY; (db, xb, yb) <- dailyXY if da < db
    } yield (java.lang.Long.compare(xb, xa), java.lang.Long.compare(yb, ya))
    val n0 = pairs.size.toLong
    val nc = pairs.count { case (sx, sy) => sx * sy > 0 }.toLong
    val nd = pairs.count { case (sx, sy) => sx * sy < 0 }.toLong
    val tx = pairs.count(_._1 == 0).toLong
    val ty = pairs.count(_._2 == 0).toLong
    val tau = new java.math.BigDecimal((nc - nd) * 1000000
      / (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble)))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val got = run("q_kendall_tau").head()
    assert(got.getAs[Long]("n0") == n0 && got.getAs[Long]("nc") == nc &&
      got.getAs[Long]("nd") == nd && got.getAs[Long]("tx") == tx &&
      got.getAs[Long]("ty") == ty, "pair counts diverged from the replay")
    assert(got.getAs[Long]("tau_e6") == tau, "tau diverged from the replay")
    assert(nc + nd <= n0 && math.abs(tau) <= 1000000L)
  }

  test("friedman: doubled rank sums conserve and chi2 replays exactly") {
    val rows = run("q_friedman").collect()
    val k = rows.length.toLong
    val n = rows.head.getAs[Long]("n_blocks")
    assert(rows.forall(_.getAs[Long]("n_blocks") == n),
      "balanced blocks: every type must appear in every kept day")
    val r2s = rows.map(_.getAs[Long]("ranksum2"))
    assert(r2s.sum == n * k * (k + 1), "doubled rank sums must conserve")
    val ss = r2s.map(r => r * r).sum
    val chi2 = math.max(3L * 1000000L * (ss - n * n * k * (k + 1) * (k + 1))
      / (n * k * (k + 1)), 0L)
    assert(rows.forall(_.getAs[Long]("chi2_ppm") == chi2),
      "chi2 must replay from the rank sums")
  }

  test("runs test: imperative median/runs replay, run-count bounds") {
    // recompute daily TOTAL counts (the query counts all events)
    val byDay = graft.tables.Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long").as("day"))
      .collect().map(_.getLong(0)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val d0 = byDay.keys.min; val d1 = byDay.keys.max
    val dense = (d0 to d1).map(d => (d, byDay.getOrElse(d, 0L)))
    val med = dense.sortBy { case (d, x) => (x, d) }
      .apply(((dense.size + 1) / 2 - 1).toInt)._2
    val signs = dense.filter(_._2 != med).map(_._2 > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(w => w.size == 2 && w(0) != w(1))
    val got = run("q_runs_test").head()
    assert(got.getAs[Long]("n1") == n1 && got.getAs[Long]("n2") == n2,
      "sign split diverged from the replay")
    assert(got.getAs[Long]("runs") == runs, "run count diverged")
    assert(runs >= 1L && runs <= n1 + n2, "run count out of bounds")
    val n = n1 + n2
    val z = new java.math.BigDecimal((runs * n - n - 2 * n1 * n2)
      * math.sqrt((n - 1).toDouble)
      / math.sqrt(2.0 * n1 * n2 * (2 * n1 * n2 - n)) * 1000000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    assert(got.getAs[Long]("z_e6") == z, "z diverged from the replay")
  }

  test("wilson bounds: lb <= naive rate <= ub, per-row chain replay") {
    val rows = run("q_wilson_bounds").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      def w(sgn: Double) = new java.math.BigDecimal(
        (2 * k + 3.8416 + sgn * 1.96 *
          math.sqrt(3.8416 + 4.0 * k * (n - k) / n))
          / (2 * (n + 3.8416)) * 1000000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      assert(r.getAs[Long]("wilson_lb_e6") == w(-1), "lb chain diverged")
      assert(r.getAs[Long]("wilson_ub_e6") == w(1), "ub chain diverged")
      // the bound brackets the naive rate (1 ulp rounding slack each side)
      assert(r.getAs[Long]("wilson_lb_e6") <= r.getAs[Long]("rate_ppm") + 1)
      assert(r.getAs[Long]("wilson_ub_e6") >= r.getAs[Long]("rate_ppm") - 1)
    }
    val lbs = rows.map(_.getAs[Long]("wilson_lb_e6"))
    assert(lbs.sameElements(lbs.sorted.reverse), "must rank by lower bound")
  }

  test("simpson: identities against the raw (source, lang) counts") {
    val cnts = graft.tables.Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    run("q_simpson_diversity").collect().foreach { r =>
      val cs = cnts(r.getString(0)).map(_._3)
      val n = cs.sum; val ds = cs.map(c => c * (c - 1)).sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_langs") == cs.length.toLong)
      assert(r.getAs[Long]("simpson_ppm") ==
        ds * 1000000L / math.max(n * (n - 1), 1L))
      assert(r.getAs[Long]("inv_simpson_e2") ==
        n * (n - 1) * 100L / math.max(ds, 1L))
      assert(r.getAs[Long]("berger_ppm") == cs.max * 1000000L / n)
      // inverse Simpson is an effective count: between 1 and |langs|
      assert(r.getAs[Long]("inv_simpson_e2") >= 100L &&
        r.getAs[Long]("inv_simpson_e2") <= cs.length * 100L + 100L)
    }
  }

  test("chao1: richness dominates observed, coverage replay") {
    val hist = graft.tables.Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("lang"), col("w")).count().collect()
      .map(r => (r.getString(0), r.getLong(2))).groupBy(_._1)
    run("q_chao1").collect().foreach { r =>
      val rs = hist(r.getString(0)).map(_._2)
      val (sObs, nTok) = (rs.length.toLong, rs.sum)
      val f1 = rs.count(_ == 1L).toLong; val f2 = rs.count(_ == 2L).toLong
      assert(r.getAs[Long]("s_obs") == sObs && r.getAs[Long]("n_tok") == nTok)
      assert(r.getAs[Long]("f1") == f1 && r.getAs[Long]("f2") == f2)
      assert(r.getAs[Long]("chao1_e2") ==
        sObs * 100 + f1 * (f1 - 1) * 100 / (2 * (f2 + 1)))
      assert(r.getAs[Long]("chao1_e2") >= sObs * 100,
        "estimated richness must dominate observed richness")
      assert(r.getAs[Long]("coverage_ppm") ==
        1000000L - f1 * 1000000L / math.max(nTok, 1L))
    }
  }

  test("hellinger: complete pair matrix, BC bounds, term replay") {
    val cnts = graft.tables.Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = cnts.groupBy(_._1).view
      .mapValues(g => g.map(x => x._2 -> x._3).toMap).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val got = run("q_hellinger_matrix").collect()
    assert(got.length == srcs.size * (srcs.size - 1) / 2,
      "pair matrix incomplete")
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (ca, cb) = (bySrc(a), bySrc(b))
      val (na, nb) = (ca.values.sum, cb.values.sum)
      val bc = ca.keySet.intersect(cb.keySet).toSeq.map { l =>
        new java.math.BigDecimal(math.sqrt(
          (ca(l) * cb(l)).toDouble / (na * nb).toDouble) * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      }.sum
      assert(r.getAs[Long]("bc_e6") == bc, s"BC diverged for ($a,$b)")
      assert(r.getAs[Long]("h2_e6") == math.max(1000000L - bc, 0L))
      // BC <= 1 up to half-unit-per-cell rounding slack
      assert(bc <= 1000000L + r.getAs[Long]("n_common"),
        s"BC above 1 beyond grid slack for ($a,$b)")
    }
  }

  test("dp gaussian: reproducible, polar-transform replay, hard tail cap") {
    val a = run("q_dp_gaussian").collect()
    val b = run("q_dp_gaussian").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "seeded Gaussian mechanism must be reproducible")
    def u(tag: String, nat: Long, k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$tag:$nat:$k".getBytes("UTF-8"))
        .take(4).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 999998L + 1L
    }
    a.foreach { r =>
      val nat = r.getAs[Long]("nat")
      val attempts = (1L to 8L).map { k =>
        val v1 = u("dpgA", nat, k) * 2 - 1000000L
        val v2 = u("dpgB", nat, k) * 2 - 1000000L
        (k, v1, v1 * v1 + v2 * v2)
      }
      attempts.find { case (_, _, s) => s > 0 && s < 1000000000000L } match {
        case Some((k, v1, sE12)) =>
          assert(r.getAs[Long]("pick_k") == k, s"pick diverged for $nat")
          val sDb = sE12 / 1000000000000.0
          val noise = new java.math.BigDecimal(v1 / 1000000.0
            * math.sqrt(-2 * math.log(sDb) / sDb) * 4.844805 * 100)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          assert(r.getAs[Long]("noise_e2") == noise,
            s"polar chain diverged for $nat")
        case None =>
          assert(r.getAs[Long]("pick_k") == 0L &&
            r.getAs[Long]("noise_e2") == 0L)
      }
      assert(r.getAs[Long]("released_e2") ==
        r.getAs[Long]("n") * 100 + r.getAs[Long]("noise_e2"))
      assert(r.getAs[Long]("bound_ok") == 1L,
        "the mechanism's hard tail cap must hold under this seed grid")
    }
  }

  test("boilerplate ngrams: imperative df replay, share bounds") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
    val grams = docs.filter(_._3.length >= 8).flatMap { case (s0, id, t) =>
      t.sliding(8).map(w => (s0, id, w.mkString(" "))).toSet
    }
    val dfMap = grams.groupBy(g => (g._1, g._3)).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    val boiler = dfMap.filter(_._2 >= 2).keySet
    val affected = grams.filter(g => boiler((g._1, g._3)))
      .map(g => (g._1, g._2)).distinct.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    run("q_boilerplate_ngrams").collect().foreach { r =>
      val s0 = r.getString(0)
      assert(r.getAs[Long]("n_grams") ==
        dfMap.keys.count(_._1 == s0).toLong, s"gram count diverged: $s0")
      assert(r.getAs[Long]("n_boiler") ==
        boiler.count(_._1 == s0).toLong, s"blacklist diverged: $s0")
      assert(r.getAs[Long]("affected_docs") ==
        affected.getOrElse(s0, 0L), s"affected share diverged: $s0")
      assert(r.getAs[Long]("affected_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Long]("affected_ppm") ==
        r.getAs[Long]("affected_docs") * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("dp stable histogram: reproducible, threshold bites both ways, " +
    "noise chain replay") {
    val a = run("q_dp_stable_histogram").collect()
    val b = run("q_dp_stable_histogram").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "seeded stable histogram must be reproducible")
    a.foreach { r =>
      assert(r.getAs[Long]("released_e2") > 2542L,
        "every released row must clear the stability threshold")
      assert(r.getAs[Long]("released_e2") ==
        r.getAs[Long]("n") * 100 + r.getAs[Long]("noise_e2"))
      assert(math.abs(r.getAs[Long]("noise_e2")) <= 2700L,
        "Laplace(2) tail cap under the seed grid")
    }
    // suppression is real: some bigrams exist but are not released
    val total = graft.tables.Tables.documents(spark, sf)
      .select(explode(expr("""transform(sequence(1,
        size(filter(split(text, ' '), t -> t <> '')) - 1),
        i -> array_join(slice(filter(split(text, ' '), t -> t <> ''),
        i, 2), ' '))""")).as("g"))
      .select(col("g")).distinct().count()
    assert(a.length < total,
      s"threshold must suppress some items: released ${a.length}/$total")
    // noise replay for the first 10 released grams
    a.take(10).foreach { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dph:${r.getString(0)}".getBytes("UTF-8"))
        .take(4).map(x => f"$x%02x").mkString
      val t0 = java.lang.Long.parseLong(hex, 16) % 999998L + 1L - 500000L
      val noise = new java.math.BigDecimal(-2.0 * math.signum(t0.toDouble)
        * math.log((1000000L - math.abs(t0) * 2) / 1000000.0) * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      assert(r.getAs[Long]("noise_e2") == noise,
        s"noise chain diverged for ${r.getString(0)}")
    }
  }

  test("pearson matrix: complete pair grid, bounds, moment replay") {
    val got = run("q_pearson_matrix").collect()
    val types = graft.tables.Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    assert(got.length == types * (types - 1) / 2, "pair matrix incomplete")
    got.foreach(r => assert(math.abs(r.getAs[Long]("r_e6")) <= 1000000L,
      s"|r| must be <= 1: ${r.toSeq}"))
    // imperative replay for the first pair
    val r0 = got.head
    val (ta, tb) = (r0.getString(0), r0.getString(1))
    val byDay = graft.tables.Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long").as("day"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val d0 = byDay.map(_._1).min; val d1 = byDay.map(_._1).max
    val xs = (d0 to d1).map(d => byDay.count(e => e._1 == d && e._2 == ta).toLong)
    val ys = (d0 to d1).map(d => byDay.count(e => e._1 == d && e._2 == tb).toLong)
    val n = xs.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val r = new java.math.BigDecimal((n * sxy - sx * sy) * 1000000
      / (math.sqrt((n * sxx - sx * sx).toDouble)
        * math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    assert(r0.getAs[Long]("n") == n && r0.getAs[Long]("r_e6") == r,
      s"pearson replay diverged for ($ta,$tb): ${r0.toSeq} vs $r")
  }

  test("durbin-watson: residual sum is exactly zero, DW in [0,4]") {
    val got = run("q_durbin_watson").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("resid_sum") == 0L,
        "cleared OLS residuals must sum to exactly zero")
      val dw = r.getAs[Long]("dw_ppm")
      assert(dw >= 0L && dw <= 4000000L, s"DW out of [0,4]: $dw")
    }
  }

  test("ljung-box: Q replays from the acf_daily ppm grid") {
    val acf = run("q_acf_daily").collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("acf_ppm"))).toMap
    val n = acf(0L)._1 // lag-0 term count = n_days
    val q = (1L to 7L).map { k =>
      val r = acf(k)._2
      n * (n + 2) * (r * r) / ((n - k) * 1000000L)
    }.sum
    val got = run("q_ljung_box").head()
    assert(got.getAs[Long]("n_days") == n && got.getAs[Long]("m") == 7L)
    assert(got.getAs[Long]("q_lb_ppm") == q,
      s"LB must replay from the shared ACF grid: ${got.getAs[Long]("q_lb_ppm")} vs $q")
    assert(q >= 0L, "Q is a sum of squares")
  }

  test("dispersion index: replay + chi2 certificate identity") {
    val byTd = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long").as("day")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val d0 = byTd.map(_._2).min; val d1 = byTd.map(_._2).max
    run("q_dispersion_index").collect().foreach { r =>
      val t = r.getString(0)
      val xs = (d0 to d1).map(d => byTd.count(e => e == ((t, d))).toLong)
      val n = xs.length.toLong; val s0 = xs.sum
      val syy = xs.map(x => x * x).sum
      val disp = (BigInt(n * syy - s0 * s0) * 1000000 /
        BigInt((n - 1) * s0).max(1)).toLong
      assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("n_events") == s0)
      assert(r.getAs[Long]("dispersion_ppm") == disp, s"D diverged for $t")
      assert(r.getAs[Long]("chi2_ppm") == disp * (n - 1),
        "chi2 certificate must be D*(n-1) exactly")
    }
  }

  test("markov entropy rate: rate equals the pi-weighted conditional mix " +
    "up to grid slack, bounded by ln|types|") {
    val rows = run("q_markov_entropy_rate").collect()
    val hRate = rows.head.getAs[Long]("h_rate_e6")
    assert(rows.forall(_.getAs[Long]("h_rate_e6") == hRate))
    val k = rows.length.toLong
    assert(hRate >= 0L && hRate <= (math.log(k.toDouble) * 1e6).toLong + k * k,
      s"entropy rate out of [0, ln k]: $hRate")
    // pi sums to 1 on the ppm grid (truncation slack <= |types|)
    val piSum = rows.map(_.getAs[Long]("pi_ppm")).sum
    assert(piSum > 1000000L - k && piSum <= 1000000L,
      s"empirical occupancy must sum to ~1e6: $piSum")
    // the rate is the pi-weighted mix of conditionals up to the
    // per-term rounding slack (each of the <=k^2 terms carries <=1)
    val mix = rows.map(r => r.getAs[Long]("pi_ppm").toDouble / 1e6 *
      r.getAs[Long]("h_cond_e6")).sum
    assert(math.abs(mix - hRate) <= k * k + k,
      s"rate must track the weighted conditional mix: $mix vs $hRate")
  }

  test("mde power: SE chain replay, powered flag is the integer compare") {
    val m = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    def mom(t: String) = {
      val vs = m(t).map(v => BigDecimal(v._2).setScale(6,
        BigDecimal.RoundingMode.HALF_UP))
      (vs.length.toLong, vs.sum,
        m(t).map(v => BigDecimal(v._2 * v._2).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum)
    }
    run("q_mde_power").collect().foreach { r =>
      val (na, sva, svva) = mom(r.getString(0))
      val (nb, svb, svvb) = mom(r.getString(1))
      def rnd(x: Double) = new java.math.BigDecimal(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      val diff = rnd(sva.toDouble / na - svb.toDouble / nb)
      val mde = rnd(2.801585 * math.sqrt(
        (svva.toDouble - sva.toDouble * sva.toDouble / na) / (na - 1) / na
          + (svvb.toDouble - svb.toDouble * svb.toDouble / nb)
          / (nb - 1) / nb))
      assert(r.getAs[Long]("diff_e6") == diff, s"diff diverged: ${r.toSeq}")
      assert(r.getAs[Long]("mde_e6") == mde, s"MDE diverged: ${r.toSeq}")
      assert(r.getAs[Long]("powered") ==
        (if (math.abs(diff) >= mde) 1L else 0L))
      assert(mde >= 0L)
    }
  }

  test("boilerplate fingerprint twin equals the exact gram form") {
    val exact = run("q_boilerplate_ngrams").collect().map(_.toSeq).toSeq
    val fp = run("q_boilerplate_fingerprint").collect().map(_.toSeq).toSeq
    assert(fp == exact,
      "48-bit fingerprint df must equal gram df at the gate corpus")
  }

  test("auc-pr: imperative average-precision replay, bounds") {
    val rows = graft.tables.Tables.documents(spark, sf)
      .select(col("n_chars"), (col("lang") === "en").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (_, g) => (g.map(_._2).sum, g.length - g.map(_._2).sum) }
    var (cp, cn, tsum) = (0L, 0L, BigInt(0))
    groups.foreach { case (p, q) =>
      cp += p; cn += q
      tsum += BigInt(p) * cp * 1000000 / (cp + cn)
    }
    val got = run("q_auc_pr").head()
    assert(got.getAs[Long]("n_pos") == cp && got.getAs[Long]("n_neg") == cn)
    assert(got.getAs[Long]("ap_ppm") == (tsum / cp).toLong,
      "AP must replay from the tie-grouped cumulative walk")
    val ap = got.getAs[Long]("ap_ppm")
    assert(ap >= 0L && ap <= 1000000L, s"AP out of [0,1]: $ap")
    assert(got.getAs[Long]("prev_ppm") == cp * 1000000L / (cp + cn))
  }

  test("rbo: imperative replay, bounds, weight-table mass") {
    // the builder-time weight table carries mass 1 - 0.9^50 on e12
    val mass = graft.queries.RboW.table.map(_._2).sum
    val expect = math.round((1 - math.pow(0.9, 50)) * 1e12)
    assert(math.abs(mass - expect) <= 50L, s"weight mass off: $mass")
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def top(score: ((Long, Long, Long)) => Long) = docs
      .sortBy(x => (-score(x), x._1)).take(50).map(_._1).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val (ra, rb) = (top(_._2), top(_._3))
    val ms = ra.keySet.intersect(rb.keySet).toSeq
      .map(id => math.max(ra(id), rb(id)))
    val rbo = graft.queries.RboW.table.map { case (dd, w) =>
      w * ms.count(_ <= dd) / (dd * 1000000L)
    }.sum
    val got = run("q_rbo_rankings").head()
    assert(got.getAs[Long]("k") == 50L)
    assert(got.getAs[Long]("n_common") == ms.length.toLong,
      "top-50 intersection diverged")
    assert(got.getAs[Long]("rbo_ppm") == rbo, "RBO diverged from replay")
    assert(rbo >= 0L && rbo <= 1000000L)
  }
}
