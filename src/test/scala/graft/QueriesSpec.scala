package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry sanity + flagship smoke (full oracle parity is driven by
  * graft.Verify + the driver's DuckDB compare; see .claude/skills/verify). */
class QueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("registry: unique names, every oracle key has a query") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 70)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("wave-10 statistics invariants: chi2 grid, covariance psd diag, cdc, coeff") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // chi2: the full grid covers rows×cols, observed counts sum to n,
    // and every exact-integer contribution is non-negative
    val chi = run("q_chi2_independence").cache()
    val docs = graft.tables.Tables.documents(spark, sf)
    val nLang = docs.select(col("lang")).distinct().count()
    val nSrc = docs.select(col("source")).distinct().count()
    assert(chi.count() == nLang * nSrc, "grid must be the full cross product")
    assert(chi.agg(sum(col("o"))).head().getLong(0) == docs.count())
    assert(chi.filter(col("contrib_ppm") < 0).count() == 0)

    // covariance: variances (diagonal) are non-negative; 36 upper cells
    val cov = run("q_embed_covariance").cache()
    assert(cov.count() == 36)
    assert(cov.filter(col("i") === col("j"))
      .filter(col("cov_pico") < 0).count() == 0,
      "diagonal of a covariance matrix is non-negative")

    // snapshot diff: append-only data ⇒ no deletes, and the delta total
    // equals the revenue that arrived between the two cutoffs
    val cdc = run("q_snapshot_diff").cache()
    assert(cdc.filter(col("status") === "delete").count() == 0)
    val delta = cdc.agg(sum(col("delta_rev_micro"))).head().getLong(0)
    val arrived = graft.tables.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")
        && col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      .agg((sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        * lit(1000000)).cast("long")).head().getLong(0)
    assert(delta == arrived, s"delta $delta != between-cutoff revenue $arrived")

    // clustering coefficient is a ppm in [0, 1e6]
    val cc = run("q_clustering_coeff")
    assert(cc.filter(col("coeff_ppm") < 0 || col("coeff_ppm") > 1000000)
      .count() == 0)
  }

  test("wave-13 invariants: sequence conservation, per-bucket decay identity") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val pat = SparkEntry.queries("q_event_pattern_regex")(spark, sf).cache()
    val evCount = graft.tables.Tables.events(spark, sf).count()
    assert(pat.agg(sum(col("n_events"))).head().getLong(0) == evCount,
      "initials strings must conserve every event exactly once")
    assert(pat.filter(col("n_journeys") > 0).count() > 0,
      "the journey pattern must occur in the corpus")

    val dec = SparkEntry.queries("q_attribution_time_decay")(spark, sf).cache()
    assert(dec.filter(col("dh") < 0 || col("dh") > 23).count() == 0)
    // every pair in a dh bucket carries the identical power-of-two
    // weight, so the bucket sum must equal n_pairs · (1e6 >> dh)
    val bad = dec.filter(col("credit_sum") =!=
      col("n_pairs") * expr("1000000 div shiftleft(CAST(1 AS BIGINT), CAST(dh AS INT))"))
    assert(bad.count() == 0, "per-bucket credit identity must hold exactly")
  }

  test("wave-14 invariants: ewma bounds and time-range frame vs self-join") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    // EWMA: each smoothed value is bounded by 2x the running max input
    // (geometric series bound: sum of v>>k over k>=0 < 2·max v)
    val ew = SparkEntry.queries("q_ewma_halflife")(spark, sf).cache()
    val vmax = graft.tables.Tables.events(spark, sf)
      .agg(max(round(col("value") * 1000000, 0).cast("long")))
      .head().getLong(0)
    assert(ew.filter(col("ewma_micro") < 0
      || col("ewma_micro") >= vmax * 2).count() == 0,
      "ewma must sit in [0, 2·max_micro)")

    // class-C decay twin: (a) no weight constant sits near a rounding
    // midpoint (the determinism argument for cross-libm pow), (b) the
    // geometric-series bound Σ 0.7^k·10⁴ < 10⁴/0.3, (c) a driver-side
    // recompute of one user's filter matches the query exactly
    for (k <- 0 until 28) {
      val x = math.pow(0.7, k) * 10000
      val frac = x - math.floor(x)
      assert(math.abs(frac - 0.5) >= 1e-3,
        f"tap $k weight $x%.6f within 1e-3 of a rounding midpoint")
    }
    val ed = SparkEntry.queries("q_ewma_decay")(spark, sf).cache()
    assert(ed.filter(col("ewma_e10") < 0
      || col("ewma_e10") >= vmax * 33334).count() == 0,
      "decay ewma must sit in [0, max_micro·Σw)")
    val weights = (0 until 28).map(k => math.round(math.pow(0.7, k) * 10000))
    val u0 = ed.select(col("user_id")).head().getLong(0)
    val vs = graft.tables.Tables.events(spark, sf)
      .filter(col("user_id") === u0)
      .select(col("event_id"), unix_micros(col("ts")).as("t"),
        round(col("value") * 1000000, 0).cast("long").as("v"))
      .orderBy(col("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val expect = vs.indices.map { i =>
      vs(i)._1 -> (0 until math.min(28, i + 1))
        .map(k => vs(i - k)._2 * weights(k)).sum
    }.toMap
    val gotEd = ed.filter(col("user_id") === u0)
      .select(col("event_id"), col("ewma_e10"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotEd == expect, "driver-side decay recompute must match exactly")

    // time-range frame: recompute one user's trailing counts by
    // self-join and compare exactly
    val tr = SparkEntry.queries("q_window_time_range")(spark, sf).cache()
    val u = tr.select(col("user_id")).head().getLong(0)
    val ev = graft.tables.Tables.events(spark, sf)
      .filter(col("user_id") === u)
      .select(col("event_id"), unix_micros(col("ts")).as("t"))
    val viaJoin = ev.as("a").join(ev.as("b"),
        col("b.t") <= col("a.t") && col("b.t") >= col("a.t") - 3600000000L)
      .groupBy(col("a.event_id")).agg(count(lit(1)).as("n2"))
    val mism = tr.filter(col("user_id") === u)
      .join(viaJoin, "event_id")
      .filter(col("n_1h") =!= col("n2")).count()
    assert(mism == 0, "RANGE frame counts must equal the self-join truth")
  }

  test("wave-15 invariants: quota sums to budget exactly; HLL band has margin") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val q = SparkEntry.queries("q_quota_allocate")(spark, sf).cache()
    assert(q.agg(sum(col("alloc"))).head().getLong(0) == 1000L,
      "largest-remainder allocation must hit the budget exactly")
    // every allocation is within 1 slot of the exact proportional share
    val tot = q.agg(sum(col("cnt"))).head().getLong(0)
    val off = q.filter(
      abs(col("alloc") * tot - lit(1000L) * col("cnt")) > tot).count()
    assert(off == 0, "each shard within one slot of exact proportionality")

    // re-measure the HLL inclusion-exclusion deviation (band is 10% of
    // union; declared comment claims measured <=2% — keep it honest)
    val e = graft.tables.Tables.events(spark, sf)
    val a = e.filter(col("event_type") === "click").select(col("user_id"))
    val b = e.filter(col("event_type") === "purchase").select(col("user_id"))
    val est = a.agg(hll_sketch_agg(col("user_id")).as("ska"))
      .crossJoin(b.agg(hll_sketch_agg(col("user_id")).as("skb")))
      .crossJoin(a.union(b).agg(hll_sketch_agg(col("user_id")).as("sku")))
      .select(hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb"))
        - hll_sketch_estimate(col("sku"))).head().getLong(0).toDouble
    val exactInter = a.intersect(b).count().toDouble
    val union = a.union(b).distinct().count().toDouble
    assert(math.abs(est - exactInter) <= 0.02 * union,
      f"HLL intersect deviation ${math.abs(est - exactInter) / union}%.4f" +
        " exceeds the 2% measured-margin claim (band is 10%)")
  }

  test("wave-16 invariants: forward asof direction, bounce conservation") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val fwd = SparkEntry.queries("q_join_asof_forward")(spark, sf).cache()
    assert(fwd.filter(col("next_click_us") < col("p_us")).count() == 0,
      "forward as-of must only pair clicks at-or-after the purchase")
    val purchases = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(fwd.count() <= purchases && fwd.count() > 0)

    val b = SparkEntry.queries("q_session_bounce")(spark, sf).cache()
    assert(b.filter(col("bounce_ppm") < 0 || col("bounce_ppm") > 1000000)
      .count() == 0)
    val nSess = SparkEntry.queries("q_sessionize_lag")(spark, sf).count()
    assert(b.agg(sum(col("n_sessions"))).head().getLong(0) == nSess,
      "bounce rollup must conserve the sessionizer's session count")
  }

  test("wave-r9 invariants: cusum exact replay, tfidf cosine bounds") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val cu = SparkEntry.queries("q_cusum_changepoint")(spark, sf).cache()
    assert(cu.filter(col("max_cusum") < 0).count() == 0,
      "CUSUM+ is a max over S_k - runmin(S) and cannot be negative")
    val evTotal = graft.tables.Tables.events(spark, sf).count()
    assert(cu.agg(sum(col("n_events"))).head().getLong(0) == evTotal,
      "per-user event counts must conserve the events table")
    // exact driver-side replay for the user with the largest peak
    val top = cu.orderBy(col("max_cusum").desc).head()
    val uid = top.getLong(0)
    val rows = graft.tables.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * lit(1000000), 0).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val mu = rows.map(_._3).sum / rows.length // Long div truncates like div
    // rmin is min over s_1..s_k (the window includes the current row,
    // never an empty-prefix 0) — cusum_1 is 0 by construction
    var s = 0L; var rmin = Long.MaxValue; var best = 0L
    var peakUs = Long.MaxValue
    rows.foreach { case (tsUs, _, v) =>
      s += v - mu
      rmin = math.min(rmin, s)
      val c = s - rmin
      // first achiever in (ts, event_id) order == min ts among achievers
      if (c > best) { best = c; peakUs = tsUs }
    }
    if (best == 0L) peakUs = rows.head._1
    assert(top.getLong(2) == best,
      s"driver replay of user $uid: max_cusum ${top.getLong(2)} != $best")
    assert(top.getLong(3) == peakUs,
      s"peak_us must be the earliest attaining timestamp ($peakUs)")

    val tc = SparkEntry.queries("q_tfidf_cosine_join")(spark, sf).cache()
    assert(tc.count() > 0, "tfidf cosine pairs unexpectedly empty")
    assert(tc.filter(col("cos2_ppm") < 250000 || col("cos2_ppm") > 1000000)
      .count() == 0,
      "cos2_ppm must sit in [threshold 0.25e6, Cauchy-Schwarz 1e6]")
    // identical documents (that carry at least one df<=64 token) are
    // cosine-1 pairs: the integer division is exact there (dot == n2)
    assert(tc.filter(col("cos2_ppm") === 1000000).count() > 0,
      "exact-dup documents must appear at cos2_ppm == 1e6")
  }

  test("wave-r9b invariants: pit join totality, keeper quality, confusion conservation") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val pit = SparkEntry.queries("q_pit_join")(spark, sf).cache()
    val purchases = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(pit.count() == purchases,
      "point-in-time join must match every purchase to EXACTLY one version")
    assert(pit.filter(col("valid_from_us") > col("p_us")).count() == 0,
      "matched version must already be valid at the purchase time")
    assert(pit.select(col("p_id")).distinct().count() == purchases,
      "no purchase may match two versions (intervals tile)")

    val keep = SparkEntry.queries("q_dedup_keeper")(spark, sf).cache()
    val docsN = graft.tables.Tables.documents(spark, sf).count()
    assert(keep.agg(sum(col("n_members"))).head().getLong(0) == docsN,
      "cluster members must conserve the corpus")
    // the keeper really is a max-quality member: its n_uniq equals the
    // cluster's max_quality
    val q = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id").as("keep_id"),
        size(array_distinct(filter(split(col("text"), " "), t => t =!= "")))
          .cast("long").as("n_uniq"))
    assert(keep.join(q, "keep_id")
      .filter(col("n_uniq") =!= col("max_quality")).count() == 0,
      "keep_id must attain the cluster's max quality")

    val cm = SparkEntry.queries("q_lang_confusion")(spark, sf).cache()
    val preds = SparkEntry.queries("q_lang_id")(spark, sf).count()
    assert(cm.agg(sum(col("n"))).head().getLong(0) == preds,
      "confusion cells must conserve the per-doc predictions")
    assert(cm.filter(col("row_ppm") < 0 || col("row_ppm") > 1000000)
      .count() == 0)
  }

  test("wave-r9c invariants: interval-overlap conservation, weighted jaccard bounds") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val ov = SparkEntry.queries("q_interval_overlap")(spark, sf).cache()
    // states tile [first_event, u_max+1) and sessions sit inside it, so
    // summing overlap over states must reproduce each user's total
    // session time exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessTime = graft.tables.Tables.events(spark, sf)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 3600000000L).cast("long"))
      .withColumn("sess_no", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg((max(unix_micros(col("ts"))) + 1
        - min(unix_micros(col("ts")))).as("dur"))
      .groupBy(col("user_id")).agg(sum(col("dur")).as("total"))
    val got = ov.groupBy(col("user_id")).agg(sum(col("overlap_us")).as("total"))
    assert(got.as("g").join(sessTime.as("t"), "user_id")
      .filter(col("g.total") =!= col("t.total")).count() == 0,
      "per-user overlap totals must equal total session time (states tile)")

    val wj = SparkEntry.queries("q_jaccard_weighted")(spark, sf).cache()
    assert(wj.count() > 0)
    assert(wj.filter(col("wj_ppm") < 500000 || col("wj_ppm") > 1000000)
      .count() == 0,
      "weighted jaccard ppm must sit in [threshold 0.5e6, 1e6]")
    // independent driver-side recompute of the top pair: shingle sets,
    // global df, idf_e2 grid, integer ppm — the whole pipeline replayed
    // in plain Scala (JVM Math.log == Spark's log)
    val top = wj.orderBy(col("wj_ppm").desc, col("id_a"), col("id_b")).head()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val allSh = docs.map { case (id, t) => id -> shingles(t) }
    val df = allSh.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val n = docs.size.toDouble
    def shW(sh: String): Long = math.round(math.log(n / df(sh)) * 100)
    val (sa, sb) = (allSh(top.getLong(0)), allSh(top.getLong(1)))
    val interW = (sa & sb).toSeq.map(shW).sum
    val unionW = sa.toSeq.map(shW).sum + sb.toSeq.map(shW).sum - interW
    assert(top.getLong(2) == interW * 1000000L / unionW,
      s"driver replay of top pair: ${top.getLong(2)} != ${interW * 1000000L / unionW}")
  }

  test("wave-r10 invariants: source-overlap matrix algebra, rrf fusion replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val ov = SparkEntry.queries("q_source_overlap")(spark, sf).collect()
    // matrix-complete: exactly C(20,2) ordered pairs, each once
    assert(ov.length == 190, s"expected 190 source pairs, got ${ov.length}")
    assert(ov.map(r => (r.getString(0), r.getString(1))).distinct.length == 190)
    ov.foreach { r =>
      val (na, nb, inter, jbp) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getString(0) < r.getString(1), "pairs must be oriented a < b")
      assert(inter >= 0 && inter <= math.min(na, nb),
        s"intersection outside [0, min sizes]: $r")
      assert(jbp == inter * 10000 / (na + nb - inter),
        s"jaccard_bp must be recomputable from the declared counts: $r")
    }
    // driver-side brute recompute of one pair's shingle intersection
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def srcShingles(src: String): Set[String] = docs.filter(_._1 == src)
      .flatMap { case (_, t) =>
        val toks = t.split(" ").filter(_.nonEmpty)
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      }.toSet
    val (s0, s1) = (srcShingles("src0"), srcShingles("src1"))
    val row01 = ov.find(r =>
      r.getString(0) == "src0" && r.getString(1) == "src1").get
    assert(row01.getLong(2) == s0.size && row01.getLong(3) == s1.size &&
      row01.getLong(4) == (s0 & s1).size,
      s"src0/src1 brute shingle counts diverge: $row01")

    val fused = SparkEntry.queries("q_rank_fusion")(spark, sf).collect()
    assert(fused.length == 20)
    fused.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.isDefined || sem.isDefined, "fused doc in neither list")
      (lex ++ sem).foreach(k => assert(k >= 1 && k <= 50))
      val expectRrf = BigDecimal(
        lex.map(k => BigDecimal(1.0 / (60 + k))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .getOrElse(0.0) +
        sem.map(k => BigDecimal(1.0 / (60 + k))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .getOrElse(0.0))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expectRrf) < 1e-12,
        s"rrf must be recomputable from the declared ranks: $r")
    }
    // fused order is non-increasing with doc_id tiebreak
    val scores = fused.map(r => (r.getDouble(3), r.getLong(0)))
    assert(scores.sliding(2).forall { case Array((sa2, ia), (sb2, ib)) =>
      sa2 > sb2 || (sa2 == sb2 && ia < ib) }, "fused order violated")
    // driver-side replay of the lexical ranking top-50
    val docToks = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSet).toMap
    val q = docToks(0L)
    val lexTop = docToks.toSeq.filter(_._1 > 0)
      .map { case (id, t) => (id, (t & q).size.toLong) }
      .filter(_._2 > 0)
      .sortBy { case (id, o) => (-o, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    fused.foreach { r =>
      val id = r.getLong(0)
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(lexTop.get(id) == lex,
        s"lexical rank replay diverged for doc $id: ${lexTop.get(id)} != $lex")
    }
  }

  test("representative queries return rows at sf0.001") {
    val reps = Seq("q1_pricing_summary", "q5_local_supplier", "q_window_rank",
      "q_cosine_topk", "q_session_window_1h", "q_minhash_lsh",
      "q_kinesis_pack_stats")
    reps.foreach { name =>
      val n = SparkEntry.queries(name)(spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("wave-r10c invariants: ks matrix, zipf fit, heaps conservation, " +
    "basket lift identity, seasonal closure, adamic-adar bounds, dupspan") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val docs = graft.tables.Tables.documents(spark, sf)

    // KS drift: matrix-complete over source pairs; the statistic is a
    // basis-point fraction; the cross-multiplied numerator never exceeds
    // its denominator
    val nSrc = docs.select(col("source")).distinct().count()
    val ks = run("q_ks_drift").cache()
    assert(ks.count() == nSrc * (nSrc - 1) / 2, "one row per source pair")
    assert(ks.filter(col("ks_bp") < 0 || col("ks_bp") > 10000).count() == 0)
    assert(ks.filter(col("d_num") > col("n_a") * col("n_b")).count() == 0)
    // imperative replay of one pair's exact KS numerator
    val r0 = ks.orderBy(col("source_a"), col("source_b")).head()
    val (sa, sb) = (r0.getString(0), r0.getString(1))
    val lens = docs.filter(col("source").isin(sa, sb))
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (la, lb) = (lens.filter(_._1 == sa).map(_._2).sorted,
      lens.filter(_._1 == sb).map(_._2).sorted)
    val dExp = (la ++ lb).distinct.sorted.map { v =>
      math.abs(la.count(_ <= v).toLong * lb.length -
        lb.count(_ <= v).toLong * la.length)
    }.max
    assert(r0.getAs[Long]("d_num") == dExp, "KS numerator replay")

    // Zipf: natural-ish text has a negative slope; R² is a valid bp
    val zipf = run("q_zipf_slope").head()
    assert(zipf.getAs[Long]("slope_e6") < 0, "zipf slope must be negative")
    val r2 = zipf.getAs[Long]("r2_bp")
    assert(r2 >= 0 && r2 <= 10000)

    // Heaps: cumulative columns are conserved — the last decile's
    // inst_cum/vocab_cum equal the corpus totals, and both are monotone
    val vg = run("q_vocab_growth").cache()
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val last = vg.orderBy(col("decile").desc).head()
    assert(last.getAs[Long]("inst_cum") == toks.count())
    assert(last.getAs[Long]("vocab_cum") ==
      toks.select(col("t")).distinct().count())
    val decs = vg.orderBy(col("decile")).collect()
    assert(decs.sliding(2).forall(p => p.length < 2 ||
      (p(0).getAs[Long]("inst_cum") <= p(1).getAs[Long]("inst_cum") &&
        p(0).getAs[Long]("vocab_cum") <= p(1).getAs[Long]("vocab_cum"))))

    // Basket lift: support bounded by both item counts, confidence is a
    // valid bp, and the lift identity replays exactly on the head row
    val bl = run("q_basket_lift").cache()
    assert(bl.filter(col("support") > least(col("cnt_a"), col("cnt_b")))
      .count() == 0)
    assert(bl.filter(col("conf_bp") > 10000).count() == 0)
    bl.collect().headOption.foreach { r =>
      val li = graft.tables.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey")).distinct().cache()
      val n = li.select(col("l_orderkey")).distinct().count()
      val lift = r.getAs[Long]("support") * n * 10000L /
        (r.getAs[Long]("cnt_a") * r.getAs[Long]("cnt_b"))
      assert(r.getAs[Long]("lift_bp") == lift, "lift identity replay")
    }

    // Seasonal: the 7x-unit algebra closes row-by-row, and the per-dow
    // residual sum is the truncation remainder — strictly inside ±count
    val sd = run("q_seasonal_decompose").cache()
    assert(sd.filter(col("detrend7") =!= col("cnt") * 7 - col("sum7"))
      .count() == 0)
    assert(sd.filter(col("resid7") =!= col("detrend7") - col("seas7"))
      .count() == 0)
    val badDow = sd.groupBy(col("dow"))
      .agg(sum(col("resid7")).as("rsum"), count(lit(1)).as("n"))
      .filter(abs(col("rsum")) >= col("n")).count()
    assert(badDow == 0, "per-dow truncation remainder must be < count")

    // Adamic-Adar: predictions are non-edges with >= 1 common neighbor;
    // each term is at most 1e8 div round(ln(2)*1e4) = 14427 (deg >= 2)
    val aa = run("q_link_adamic_adar").cache()
    assert(aa.filter(col("common") < 1).count() == 0)
    assert(aa.filter(col("aa_e4") > col("common") * 14427L).count() == 0)
    assert(aa.filter(col("aa_e4") <= 0).count() == 0)
    // the declared deg <= 64 hub cap must NOT bind on the real corpus
    // (it exists to bound the wedge fan-out on dup-replicated data)
    val liAA = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val eAA = liAA.as("x").join(liAA.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("ia"), col("y.l_partkey").as("ib"))
      .agg(count(lit(1)).as("sup")).filter(col("sup") >= 2)
    val maxDeg = eAA.select(col("ia").as("u"))
      .union(eAA.select(col("ib").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).head().getLong(0)
    assert(maxDeg <= 64, s"hub cap binds at sf0.001 (max deg $maxDeg)")

    // Dupspan: shared mass is a sub-fraction of the doc's fingerprints
    val dsm = run("q_dupspan_mass").cache()
    assert(dsm.filter(col("n_shared") > col("n_fp")).count() == 0)
    assert(dsm.filter(col("dup_bp") < 0 || col("dup_bp") > 10000)
      .count() == 0)
    assert(dsm.filter(col("n_fp") < 5).count() == 0)
  }

  test("wave-r10d invariants: pmi replay, gini full-sort replay, hll band margin") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // PMI: support floor holds, a bigram can't outnumber its parts, and
    // the head row's score replays in plain Scala (JVM Math.log over the
    // identical IEEE product chain)
    val pmi = run("q_pmi_collocations").cache()
    assert(pmi.count() > 0)
    assert(pmi.filter(col("c_xy") < 5).count() == 0)
    assert(pmi.filter(col("c_xy") > least(col("c_x"), col("c_y")))
      .count() == 0)
    val toks = graft.tables.Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("ts"))
      .collect().map(_.getSeq[String](0).filter(_.nonEmpty))
    val nUni = toks.map(_.length.toLong).sum
    val bigCounts = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nBig = bigCounts.values.sum
    val uniCounts = toks.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val h = pmi.head()
    val expPmi = BigDecimal(math.log(
      h.getAs[Long]("c_xy").toDouble * nUni.toDouble * nUni.toDouble /
        (nBig.toDouble * uniCounts(h.getAs[String]("x")).toDouble *
          uniCounts(h.getAs[String]("y")).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h.getAs[Double]("pmi") == expPmi, "head-row PMI replay")

    // Gini: the histogram identity must equal the naive full-sort Gini
    val g = run("q_gini_vocab").head()
    val counts = toks.flatten.groupBy(identity).values
      .map(_.length.toLong).toArray.sorted
    val n = counts.length.toLong
    val tot = counts.sum
    val sRankC = counts.zipWithIndex
      .map { case (c, i) => BigInt(c) * (i + 1L) }.sum
    val expG = ((2 * sRankC - BigInt(n + 1) * tot) * 1000000 /
      (BigInt(n) * tot)).toLong
    assert(g.getAs[Long]("n_types") == n)
    assert(g.getAs[Long]("total_tokens") == tot)
    assert(g.getAs[Long]("gini_e6") == expG, "full-sort Gini replay")
    assert(g.getAs[Long]("gini_e6") >= 0 &&
      g.getAs[Long]("gini_e6") <= 1000000)

    // HLL cumulative series: every day inside the ±5% band, exact_cum
    // monotone, final row = total distinct users; re-measure the actual
    // worst relative deviation to keep the band's >=2x margin honest
    val hc = run("q_hll_cum_users").cache()
    assert(hc.filter(col("within_band") =!= 1L).count() == 0)
    val days = hc.orderBy(col("day")).collect()
    assert(days.sliding(2).forall(p => p.length < 2 ||
      p(0).getAs[Long]("exact_cum") <= p(1).getAs[Long]("exact_cum")))
    val events = graft.tables.Tables.events(spark, sf)
    assert(days.last.getAs[Long]("exact_cum") ==
      events.select(col("user_id")).distinct().count())
    val sk = events.select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long").as("day"))
      .groupBy(col("day")).agg(hll_sketch_agg(col("user_id")).as("sk"))
    val est = sk.as("a").join(sk.as("b"), col("b.day") <= col("a.day"))
      .groupBy(col("a.day").as("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("b.sk"))).as("est"))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("est"))
      .toMap
    val worstDev = days.map { r =>
      math.abs(est(r.getAs[Long]("day")) - r.getAs[Long]("exact_cum"))
        .toDouble / r.getAs[Long]("exact_cum")
    }.max
    assert(worstDev <= 0.025,
      s"measured HLL deviation $worstDev must keep 2x margin under 5%")
  }

  test("wave-r10e invariants: symspell completeness, dupspan replay, " +
    "winsorize full-sort replay, held-out perplexity OOV") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // SymSpell: the delete-neighborhood join must equal an INDEPENDENT
    // JVM brute force (classic DP levenshtein) over the full vocabulary
    // — completeness (no ed<=1 pair missed by candidate generation) AND
    // soundness (verify prunes the distance-2 collisions) in one set
    // equality
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val names = graft.tables.Tables.customer(spark, sf)
      .select(col("c_name")).distinct().collect().map(_.getString(0))
    val expPairs = (for {
      a <- names; b <- names
      if a < b && math.abs(a.length - b.length) <= 1 && lev(a, b) <= 1
    } yield (a, b)).toSet
    val gotPairs = run("q_symspell_join").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotPairs == expPairs, "symspell join != brute-force ed<=1 set")
    assert(expPairs.nonEmpty, "fixture must actually exercise the join")

    // Dupspan pairs: full imperative replay — 8-gram position maps,
    // df-cap 64, diagonal runs — must reproduce every
    // (pair -> max_span, n_runs, n_matches) triple exactly
    val docToks = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
    val gramPos = docToks.flatMap { case (id, ts) =>
      ts.sliding(8).zipWithIndex.collect {
        case (w, i) if w.length == 8 => (w.mkString(" "), id, i + 1L)
      }
    }
    val hotOk = gramPos.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size <= 64).keySet
    val kept = gramPos.filter(g => hotOk(g._1))
    val byGram = kept.toSeq.groupBy(_._1)
    val matches = byGram.values.toSeq.flatMap { ps =>
      ps.flatMap { case (_, ia, pa) =>
        ps.collect { case (_, ib, pb) if ia < ib =>
          ((ia, ib), (pa - pb, pa)) }
      }
    }
    val expSpan = matches.groupBy(_._1).map { case (pair, ms) =>
      val runs = ms.map(_._2).groupBy(_._1).values.flatMap { diag =>
        val ps = diag.map(_._2).sorted
        ps.zipWithIndex.map { case (p, i) => p - i }
          .groupBy(identity).values.map(_.size.toLong)
      }.toSeq
      pair -> ((runs.max + 7, runs.size.toLong, runs.sum))
    }
    val gotSpan = run("q_dupspan_pairs").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("max_span"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("n_matches")))
    }.toMap
    assert(gotSpan == expSpan, "dupspan pairs != imperative replay")
    assert(expSpan.nonEmpty, "fixture must contain shared 8-gram spans")

    // sampled dupspan audit: monotone containment law. The stratum is
    // doc-level (nibble ≤ 3, recomputed independently here) and the
    // df-cap runs on the subsample, so every full-run pair whose docs
    // are both in the stratum must appear in the audit with max_span
    // and n_matches ≥ the full run's (sample df ≤ global df — the
    // subsample can only keep MORE grams), and every audit pair's
    // docs are in the stratum.
    def spanNib(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf).toLong
    }
    val gotSampled = run("q_dupspan_pairs_sampled").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("max_span"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("n_matches")))
    }.toMap
    assert(gotSampled.keys.forall { case (ia, ib) =>
      spanNib(ia) <= 3 && spanNib(ib) <= 3 },
      "audit emitted a pair outside the doc stratum")
    gotSpan.foreach { case ((ia, ib), (span, _, nm)) =>
      if (spanNib(ia) <= 3 && spanNib(ib) <= 3) {
        val s2 = gotSampled.get((ia, ib))
        assert(s2.isDefined, s"full pair ($ia,$ib) missing from audit")
        assert(s2.get._1 >= span && s2.get._3 >= nm,
          s"audit stats must dominate the full run's for ($ia,$ib)")
      }
    }

    // Winsorize: the histogram-identity cutoffs and clipped means must
    // equal a naive full-sort winsorize per lang
    val winGot = run("q_winsorize_stats").collect()
      .map(r => r.getString(0) -> r).toMap
    val byLang = graft.tables.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(winGot.keySet == byLang.keySet)
    byLang.foreach { case (lang, vs) =>
      val sortedV = vs.map(_._2).sorted
      val n = sortedV.length
      def rankVal(num: Int, den: Int): Long =
        sortedV((n * num + den - 1) / den - 1) // value at rank ceil(n*num/den)
      val lo = rankVal(1, 10); val hi = rankVal(9, 10)
      val winSum = sortedV.map(v => math.min(math.max(v, lo), hi)).sum
      val r = winGot(lang)
      assert(r.getAs[Long]("lo") == lo && r.getAs[Long]("hi") == hi,
        s"$lang cutoffs")
      assert(r.getAs[Long]("win_sum") == winSum, s"$lang clipped sum")
      assert(r.getAs[Long]("win_mean") == winSum / n &&
        r.getAs[Long]("raw_mean") == sortedV.sum / n, s"$lang means")
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
    }

    // Held-out perplexity: exactly the held-out docs (with >= 2 tokens)
    // are scored, the unseen count is bounded by the bigram count, and
    // the OOV path is actually exercised somewhere in the fixture
    val hp = run("q_heldout_perplexity").cache()
    val expHeld = docToks.filter { case (id, ts) =>
      (((id * 2654435761L) % 4294967296L + 4294967296L) % 4294967296L
        % 100 >= 80) && ts.length >= 2
    }.map(_._1).toSet
    assert(hp.collect().map(_.getLong(0)).toSet == expHeld)
    assert(hp.filter(col("n_unseen") > col("n_bigrams")).count() == 0)
    assert(hp.filter(col("n_unseen") > 0).count() > 0,
      "fixture must exercise the unseen-bigram path")
    assert(hp.filter(col("nll") <= 0.0).count() == 0)
  }

  test("wave-r10f invariants: hard-negative label disjointness + top-1 " +
    "replay, MMR greedy trajectory replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    val embs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def e6(x: Double): Long =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000)).toLongExact

    // Hard negatives: labels always differ, exactly 3 per anchor, and
    // the per-anchor top-1 matches the JVM brute force over the
    // different-label candidate set
    val hn = run("q_hard_negatives").cache()
    assert(hn.filter(col("q_label") === col("c_label")).count() == 0)
    val perAnchor = hn.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
    assert(perAnchor.filter(col("k") =!= 3L).count() == 0)
    val top1 = hn.filter(col("rn") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    embs.filter(_._1 < 50).foreach { case (qid, qe, ql) =>
      val best = embs.filter(_._3 != ql)
        .map { case (cid, ce, _) => (cid, e6(cos(qe, ce))) }
        .maxBy { case (cid, s) => (s, -cid) }._1
      assert(top1(qid) == best, s"anchor $qid top-1 negative")
    }

    // MMR: replay the full greedy trajectory (top-20 candidates, e6
    // integer scores, lambda=1/2 cleared to 2*simq - maxpen) in plain
    // Scala and require the identical (rn, c_id, score) sequence
    val probe = embs.find(_._1 == 0L).get._2
    val cands = embs.filter(_._1 > 0)
      .map { case (id, e, _) => (id, e, e6(cos(probe, e))) }
      .sortBy { case (id, _, s) => (-s, id) }.take(20)
    val ps = (for ((ia, ea, _) <- cands; (ib, eb, _) <- cands if ia != ib)
      yield ((ia, ib), e6(cos(ea, eb)))).toMap
    var sel = Vector(cands.maxBy { case (id, _, s) => (s, -id) })
    var expect = Vector((sel.head._1, 1L, sel.head._3, sel.head._3 * 2))
    for (r <- 2 to 5) {
      val rest = cands.filter(c => !sel.exists(_._1 == c._1))
      val scored = rest.map { case (id, e, sq) =>
        val pen = sel.map(s => ps((id, s._1))).max
        (id, e, sq, sq * 2 - pen)
      }
      val pick = scored.maxBy { case (id, _, _, sc) => (sc, -id) }
      sel :+= ((pick._1, pick._2, pick._3))
      expect :+= ((pick._1, r.toLong, pick._3, pick._4))
    }
    val got = run("q_mmr_select").orderBy(col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(got == expect, "MMR trajectory replay")
    // diversity must actually bind on the fixture: the MMR set differs
    // from the plain similarity top-5
    val plainTop5 = cands.take(5).map(_._1).toSet
    assert(got.map(_._1).toSet != plainTop5,
      "fixture must make MMR diverge from plain top-k")
  }

  test("wave-r10g invariants: skyline brute-force dominance, quantile-norm " +
    "grid replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // Skyline: the two-phase window algorithm must equal the O(n²)
    // dominance definition evaluated directly over the distinct groups
    val groups = graft.tables.Tables.part(spark, sf)
      .groupBy(col("p_retailprice"), col("p_size"))
      .agg(count(lit(1)).as("m")).collect()
      .map(r => (r.getDouble(0), r.getInt(1).toLong, r.getLong(2)))
    val expSky = groups.filter { case (p, sz, _) =>
      !groups.exists { case (p2, sz2, _) =>
        p2 <= p && sz2 >= sz && (p2 < p || sz2 > sz) }
    }.map { case (p, sz, m) => (p, sz, m) }.toSet
    val gotSky = run("q_skyline_pareto").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSky == expSky, "skyline != brute-force dominance set")
    assert(expSky.nonEmpty)
    // frontier sanity: along increasing price, sizes strictly increase
    val sky = gotSky.toSeq.sortBy(_._1)
    assert(sky.sliding(2).forall(p => p.length < 2 || p(0)._2 < p(1)._2))

    // Quantile norm: every doc mapped exactly once, percentiles valid,
    // and the grid value replays the type-1 global quantile off the
    // full-sort definition
    val qn = run("q_quantile_norm").cache()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(qn.count() == docs.length)
    assert(qn.filter(col("pctl") < 1 || col("pctl") > 100).count() == 0)
    val globalSorted = docs.map(_._3).sorted
    val nGlob = globalSorted.length
    def typ1(p: Long): Long = globalSorted(((p * nGlob + 99) / 100 - 1).toInt)
    qn.collect().foreach { r =>
      assert(r.getAs[Long]("norm_chars") == typ1(r.getAs[Long]("pctl")),
        s"grid value at pctl ${r.getAs[Long]("pctl")}")
    }
    // per-source rank replay on one source: percentile of the r-th doc
    // in (n_chars, doc_id) order is ceil(100 r / n_s)
    val src0 = docs.filter(_._2 == docs.head._2)
      .sortBy(t => (t._3, t._1))
    val gotSrc0 = qn.filter(col("source") === docs.head._2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pctl")).toMap
    src0.zipWithIndex.foreach { case ((id, _, _), i) =>
      val exp = (100L * (i + 1) + src0.length - 1) / src0.length
      assert(gotSrc0(id) == exp, s"per-source percentile of doc $id")
    }
  }

  test("wave-r10h invariants: session-path replay, welch moment replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

    // Session paths: full JVM sessionize (1h gap, (us, event_id) order)
    // + path counting must reproduce the top-15 exactly
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._2 - prev > 3600000000L)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4.substring(0, 1)
        prev = e._2
      }
      sessions.map(s => (uid, s.mkString))
    }
    val expTop = paths.groupBy(_._2).map { case (p, ss) =>
      (p, ss.size.toLong, ss.map(_._1).distinct.size.toLong)
    }.toSeq.sortBy { case (p, n, _) => (-n, p) }.take(15)
    val gotTop = run("q_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotTop == expTop, "session-path top-15 replay")
    assert(expTop.head._2 > 1, "fixture must have repeated journeys")

    // Welch: moments via scale-6 decimal sums, identical IEEE formula,
    // round 6 — every pair replayed
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val mom = ev.groupBy(_._4).map { case (t, es) =>
      t -> ((es.length.toLong,
        es.map(e => d6(e._5)).sum,
        es.map(e => d6(e._5 * e._5)).sum))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotW = run("q_welch_ttest").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    for (ta <- mom.keys; tb <- mom.keys if ta < tb) {
      val (na, sa, ssa) = mom(ta); val (nb, sb, ssb) = mom(tb)
      val ma = sa.toDouble / na; val mb = sb.toDouble / nb
      val va = (ssa.toDouble - sa.toDouble * sa.toDouble / na) / (na - 1) / na
      val vb = (ssb.toDouble - sb.toDouble * sb.toDouble / nb) / (nb - 1) / nb
      val (gn_a, gn_b, gMd, gT2) = gotW((ta, tb))
      assert(gn_a == na && gn_b == nb)
      assert(gMd == r6(ma - mb), s"mean_diff $ta/$tb")
      assert(gT2 == r6((ma - mb) * (ma - mb) / (va + vb)), s"t2 $ta/$tb")
      assert(gT2 >= 0.0)
    }
  }

  test("wave-r10i invariants: anova moment replay, nearest-asof replay, " +
    "rfm score replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = d6(x).toDouble

    // ANOVA: replay F from the identical decimal-moment chain
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val groups = ev.groupBy(_._4).values.toSeq
    val k = groups.size
    val nTot = ev.length
    val sbn = groups.map { g =>
      val sv = g.map(e => d6(e._5)).sum
      d6(sv.toDouble * sv.toDouble / g.length)
    }.sum.toDouble
    val svAll = groups.map(_.map(e => d6(e._5)).sum).sum.toDouble
    val svvAll = groups.map(_.map(e => d6(e._5 * e._5)).sum).sum.toDouble
    val fRow = run("q_anova_f").head()
    assert(fRow.getAs[Long]("k") == k && fRow.getAs[Long]("n_total") == nTot)
    assert(fRow.getAs[Double]("ssb") == r6(sbn - svAll * svAll / nTot))
    assert(fRow.getAs[Double]("ssw") == r6(svvAll - sbn))
    assert(fRow.getAs[Double]("f_stat") ==
      r6(((sbn - svAll * svAll / nTot) / (k - 1)) / ((svvAll - sbn) / (nTot - k))))
    assert(fRow.getAs[Double]("f_stat") > 0.0)

    // Nearest as-of: per purchase, the (|dt|, backward-first, c_id)
    // minimum over the user's clicks
    val clicks = ev.filter(_._4 == "click").groupBy(_._1)
    val expNear = ev.filter(_._4 == "purchase").flatMap { p =>
      clicks.get(p._1).map { cs =>
        val best = cs.map(c => (c._2 - p._2, c._3))
          .minBy { case (dt, cid) =>
            (math.abs(dt), if (dt <= 0) 0 else 1, cid) }
        p._3 -> best
      }
    }.toMap
    val gotNear = run("q_join_asof_nearest").collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(2)))).toMap
    assert(gotNear == expNear.map { case (p, (dt, cid)) => p -> ((dt, cid)) },
      "nearest-asof replay")
    assert(gotNear.nonEmpty)

    // RFM: replay scores from sorted ranks over per-customer aggregates
    val ords = graft.tables.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val per = ords.groupBy(_._1).map { case (ck, os) =>
      (ck, os.map(_._2).max, os.length.toLong, os.map(o => d6(o._3)).sum)
    }.toSeq
    val nc = per.size
    def toScores(ranked: Seq[Long]): Map[Long, Long] =
      ranked.zipWithIndex
        .map { case (ck, i) => ck -> (i.toLong * 3 / nc + 1) }.toMap
    val rS = toScores(per.sortBy(c => (c._2, c._1)).map(_._1))
    val fS = toScores(per.sortBy(c => (c._3, c._1)).map(_._1))
    val mS = toScores(per.sortBy(c => (c._4, c._1)).map(_._1))
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expSeg2 = per.groupBy(c => s"${rS(c._1)}${fS(c._1)}${mS(c._1)}")
      .map { case (seg, cs) =>
        seg -> ((cs.size.toLong, cs.map(_._3).sum,
          round4(cs.map(_._4).sum.toDouble))) }
    val gotSeg = run("q_rfm_segments").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gotSeg == expSeg2, "rfm segment replay")
    assert(gotSeg.size > 3, "fixture must spread customers across segments")
  }

  test("wave-r10j invariants: dupspan-trim rebuild replay, jackknife replay") {
    import org.apache.spark.sql.functions._
    import java.security.MessageDigest
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // Trim: recompute covered positions from the same run semantics and
    // rebuild every trimmed doc imperatively; md5 must match exactly
    val docToks = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty))
    val gramPos = docToks.flatMap { case (id, ts) =>
      ts.sliding(8).zipWithIndex.collect {
        case (w, i) if w.length == 8 => (w.mkString(" "), id, i + 1L) }
    }
    val hotOk = gramPos.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size <= 64).keySet
    val kept = gramPos.filter(g => hotOk(g._1)).toSeq
    val covered = kept.groupBy(_._1).values.toSeq.flatMap { ps =>
      ps.flatMap { case (_, ia, pa) =>
        ps.collect { case (_, ib, pb) if ia < ib => (ib, pb) } }
    }.flatMap { case (ib, pb) => (pb to pb + 7).map(ib -> _) }
      .groupBy(_._1).map { case (id, vs) => id -> vs.map(_._2).toSet }
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expTrim = covered.map { case (id, cut) =>
      val ts = docToks.toMap.apply(id)
      val rebuilt = ts.zipWithIndex
        .collect { case (t, i) if !cut((i + 1).toLong) => t }
      id -> ((ts.length.toLong, cut.size.toLong, md5hex(rebuilt.mkString(" "))))
    }
    val gotTrim = run("q_dupspan_trim").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(gotTrim == expTrim, "dupspan-trim rebuild replay")
    assert(expTrim.nonEmpty)
    assert(expTrim.exists { case (_, (n, rm, _)) => rm < n },
      "fixture must contain a partial trim")
    assert(expTrim.forall { case (_, (n, rm, _)) => rm <= n })

    // Note: covered positions here chain per matched WINDOW (pb..pb+7
    // per match), which unions to exactly the run-extent semantics the
    // query declares (consecutive matched windows = start..start+run+6).

    // Jackknife: replay from integer sums with the identical rounding
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perSrc = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (src, vs) => (src, vs.size.toLong, vs.map(_._2).sum) }
      .toSeq
    val g = perSrc.size
    val n = perSrc.map(_._2).sum
    val sAll = perSrc.map(_._3).sum
    val thetas = perSrc.map { case (_, ni, si) =>
      r6((sAll - si).toDouble / (n - ni)) }
    val jbar = (thetas.map(t => BigDecimal(t)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / g)
    val dev2 = thetas.map(t => BigDecimal(r4((t - jbar) * (t - jbar)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val row = run("q_jackknife_mean").head()
    assert(row.getAs[Long]("g") == g && row.getAs[Long]("n") == n)
    assert(row.getAs[Double]("theta_all") == r6(sAll.toDouble / n))
    assert(row.getAs[Double]("theta_jack") == r6(jbar))
    assert(row.getAs[Double]("jack_var") == r4(dev2 * (g - 1) / g))
    assert(row.getAs[Double]("jack_var") >= 0.0)
  }

  test("wave-r10k invariants: cuped moment replay + guaranteed reduction, " +
    "interval-union replay, k-core fixpoint") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = d6(x).toDouble

    // CUPED: replay theta/variances from the identical decimal-moment
    // chain; var_adj = var_post - cov^2/var_pre must never exceed
    // var_post (the guaranteed-reduction theorem)
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).as("isPre"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    val perU = ev.groupBy(_._1).map { case (_, es) =>
      val pre = es.filter(_._2).foldLeft(BigDecimal(0))((a, e) => a + d6(e._3))
      val post = es.filterNot(_._2).foldLeft(BigDecimal(0))((a, e) => a + d6(e._3))
      (pre, post)
    }.toSeq
    val n = perU.size
    val sp = perU.map(_._1).sum.toDouble
    val sq = perU.map(_._2).sum.toDouble
    val spp = perU.map(p => d6(p._1.toDouble * p._1.toDouble)).sum.toDouble
    val sqq = perU.map(p => d6(p._2.toDouble * p._2.toDouble)).sum.toDouble
    val spq = perU.map(p => d6(p._1.toDouble * p._2.toDouble)).sum.toDouble
    val cov = spq - sp * sq / n
    val varPre = spp - sp * sp / n
    val varPost = sqq - sq * sq / n
    val c = run("q_abtest_cuped").head()
    assert(c.getAs[Long]("n") == n)
    assert(c.getAs[Double]("theta") == r6(cov / varPre))
    assert(c.getAs[Double]("var_post") == r6(varPost / (n - 1)))
    assert(c.getAs[Double]("var_adj") ==
      r6((varPost - cov * cov / varPre) / (n - 1)))
    assert(c.getAs[Double]("var_adj") <= c.getAs[Double]("var_post"))

    // Interval union: JVM merge replay per user
    val byUser = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val expIv = byUser.map { case (u, es) =>
      val ivs = es.map(_._2).sorted.map(s => (s, s + 300000000L))
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s0, e0)) => acc match {
          case (s1, e1) :: rest if s0 <= e1 =>
            (s1, math.max(e1, e0)) :: rest
          case _ => (s0, e0) :: acc
        }
      }
      u -> ((merged.size.toLong, merged.map(p => p._2 - p._1).sum))
    }
    val gotIv = run("q_interval_union").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotIv == expIv, "interval-union replay")
    assert(expIv.exists(_._2._1 > 1), "fixture must have disjoint islands")

    // K-core: peel in the JVM until FIXPOINT; 4 rounds must reach it at
    // sf0.001, final degrees all >= 3, and the query's degree table
    // matches exactly
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges0 = li.toSeq.groupBy(_._1).values.toSeq.flatMap { os =>
      val ps = os.map(_._2).distinct
      ps.flatMap(a => ps.collect { case b if a < b => (a, b) })
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    var es = edges0
    var rounds = 0
    var changed = true
    while (changed && rounds < 50) {
      val deg = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
        .groupBy(identity).map { case (u, vs) => u -> vs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next != es
      es = next
      rounds += 1
    }
    assert(rounds <= 4, s"fixpoint must be reached within 4 peels ($rounds)")
    val expDeg = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
      .groupBy(identity).map { case (u, vs) => u -> vs.size.toLong }
    val gotDeg = run("q_graph_kcore").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDeg == expDeg, "k-core degree table replay")
    assert(gotDeg.nonEmpty && gotDeg.values.forall(_ >= 3),
      "fixpoint core degrees must all be >= k")
  }

  test("wave-r10l invariants: auc pairwise replay, spearman rank replay, " +
    "mann-whitney conservation, kappa confusion replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // AUC: brute-force over all pos×neg pairs — 2·wins + ties must equal
    // the histogram-prefix auc_num2 exactly
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("n_chars"), (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val posS = docs.filter(_._2).map(_._1)
    val negS = docs.filterNot(_._2).map(_._1)
    val expNum2 = posS.map(p =>
      2L * negS.count(_ < p) + negS.count(_ == p)).sum
    val a = run("q_auc_roc").head()
    assert(a.getAs[Long]("n_pos") == posS.length.toLong)
    assert(a.getAs[Long]("n_neg") == negS.length.toLong)
    assert(a.getAs[Long]("auc_num2") == expNum2, "pairwise AUC replay")
    assert(a.getAs[Double]("auc") >= 0.0 && a.getAs[Double]("auc") <= 1.0)

    // Spearman: JVM average-rank transform, exact integer moments
    val xy = graft.tables.Tables.documents(spark, sf)
      .select(col("n_chars"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      cnt.map { case (v, m) =>
        v -> (2L * vs.count(_ < v) + m + 1) }
    }
    val rx = rank2(xy.map(_._1).toSeq); val ry = rank2(xy.map(_._2).toSeq)
    val n = xy.length.toLong
    val ds = xy.map { case (x, y) => (rx(x) - n - 1, ry(y) - n - 1) }
    val (sxy, sxx, syy) = (ds.map(p => p._1 * p._2).sum,
      ds.map(p => p._1 * p._1).sum, ds.map(p => p._2 * p._2).sum)
    val sp = run("q_spearman_corr").head()
    assert(sp.getAs[Long]("n") == n)
    assert(sp.getAs[Long]("sxy") == sxy, "spearman numerator replay")
    assert(sp.getAs[Long]("sxx") == sxx && sp.getAs[Long]("syy") == syy)
    assert(math.abs(sp.getAs[Double]("rho")) <= 1.0)

    // Mann–Whitney: brute-force cross-group pair count + conservation
    val ev = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("value"), col("event_type"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    val as = ev.filter(_._2 == "click").map(_._1)
    val bs = ev.filter(_._2 == "purchase").map(_._1)
    val expU2a = as.map(x =>
      2L * bs.count(_ < x) + bs.count(_ == x)).sum
    val m = run("q_mannwhitney_u").head()
    assert(m.getAs[Long]("n1") == as.length.toLong)
    assert(m.getAs[Long]("n2") == bs.length.toLong)
    assert(m.getAs[Long]("u2_a") == expU2a, "pairwise U replay")
    assert(m.getAs[Long]("u2_a") + m.getAs[Long]("u2_b") ==
      2L * as.length * bs.length, "rank-sum conservation")

    // Kappa: rebuild the confusion from q_lang_id's own output — the
    // two queries share langIdFrame, so the identity is exact
    val pred = run("q_lang_id")
      .select(col("true_lang"), col("pred_lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val kn = pred.length.toLong
    val diag = pred.count(p => p._1 == p._2).toLong
    val rowm = pred.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val colm = pred.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val src = rowm.keysIterator
      .map(l => rowm(l) * colm.getOrElse(l, 0L)).sum
    val k = run("q_cohens_kappa").head()
    assert(k.getAs[Long]("n") == kn && k.getAs[Long]("diag") == diag)
    assert(k.getAs[Long]("kappa_num") == kn * diag - src)
    assert(k.getAs[Long]("kappa_den") == kn * kn - src)
    assert(k.getAs[Double]("kappa") <= 1.0)
    assert(diag > 0, "fixture: classifier must get something right")
  }

  test("wave-r10m invariants: rendezvous + ring routing replays, ndcg " +
    "replay, label-disjoint ivf, jm perplexity replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h15(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

    val docIds = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))

    // Rendezvous: JVM argmax replay + minimal-disruption accounting
    val nodes = (0 until 8).map(i => s"n$i")
    val assignments = docIds.map { id =>
      val byW = nodes.map(nd => (nd, h15(s"$nd:$id")))
        .sortBy { case (nd, w) => (-w, nd) }
      (id, byW(0)._1, byW(1)._1)
    }
    val expLoad = assignments.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expTake = assignments.filter(_._2 == "n7")
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val gotRv = run("q_rendezvous_route").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotRv.keySet == expLoad.keySet)
    gotRv.foreach { case (nd, (nDocs, nTake)) =>
      assert(nDocs == expLoad(nd), s"rendezvous load $nd")
      assert(nTake == expTake.getOrElse(nd, 0L), s"takeover $nd")
    }
    assert(gotRv.values.map(_._1).sum == docIds.length.toLong)
    assert(gotRv.get("n7").forall(_._2 == 0L),
      "a removed node cannot take over its own docs")

    // Hash ring: JVM successor-scan replay
    val ring = for (i <- 0 until 8; v <- 0 until 4)
      yield (s"n$i", h15(s"n$i#$v"))
    val expRing = docIds.map { id =>
      val kpos = h15(id.toString)
      val cand = ring.map { case (nd, rp) =>
        (nd, (if (rp >= kpos) 0L else 1L << 61) + rp) }
      cand.minBy(_._2)._1
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotRing = run("q_hash_ring").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotRing.view.mapValues(_._1).toMap == expRing, "ring loads")
    val totDocs = docIds.length.toLong
    gotRing.foreach { case (nd, (nDocs, ppm)) =>
      assert(ppm == nDocs * 1000000L / totDocs, s"share_ppm identity $nd")
    }

    // nDCG: JVM ranking replay with the same round-6 cosine fold
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val embs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val W = graft.queries.Llm.NdcgW
    val CumW = graft.queries.Llm.NdcgCum
    val gotN = run("q_ndcg_at_k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    embs.filter(_._1 < 8).foreach { case (qid, qlbl, qv) =>
      val ranked = embs.filter(_._1 != qid)
        .map { case (cid, clbl, cv) => (cid, clbl, d6(cos(qv, cv))) }
        .sortBy { case (cid, _, s) => (-s, cid) }
      val nRel = ranked.count(_._2 == qlbl).toLong
      val dcg = ranked.take(10).zipWithIndex.map { case ((_, clbl, _), i) =>
        if (clbl == qlbl) W(i) else 0L }.sum
      val idcg = if (nRel == 0) 0L else CumW(math.min(nRel, 10L).toInt - 1)
      val (gRel, gDcg, gIdcg, gN) = gotN(qid)
      assert(gRel == nRel && gDcg == dcg && gIdcg == idcg,
        s"ndcg replay q=$qid")
      assert(gN >= 0.0 && gN <= 1.0)
    }

    // Label-disjoint IVF: structural validity + the gate row
    val e = graft.tables.Tables.embeddings(spark, sf)
    val approx = graft.llm.VectorIvf.topkApproxLabelDisjoint(
      e, "vec_id", "embedding", "label", k = 3, nlist = 16, nprobe = 4,
      queries = Some(e.filter(col("vec_id") < 50)), trainFraction = 0.2)
      .collect()
    assert(approx.forall(r => r.getAs[Int]("q_label") !=
      r.getAs[Int]("c_label")), "every mined negative is label-disjoint")
    assert(approx.groupBy(_.getLong(0)).values.forall { rs =>
      rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rs.size) },
      "per-anchor ranks are dense from 1")
    val gate = run("q_hard_negatives_ivf").head()
    assert(gate.getAs[Long]("n_queries") == 50L)
    assert(gate.getAs[Long]("floor_ok") == 1L)

    // JM perplexity: full JVM count + Math.log replay (Spark's log IS
    // java.lang.Math.log, so t_e4 must match exactly)
    val docsTx = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    def isTrain(id: Long) =
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 < 80
    val trainToks = docsTx.filter(p => isTrain(p._1)).flatMap(p => toks(p._2))
    val c1 = trainToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c2 = docsTx.filter(p => isTrain(p._1))
      .flatMap(p => toks(p._2).sliding(2).filter(_.length == 2)
        .map(a => a(0) + " " + a(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vV = c1.size.toLong; val tT = trainToks.length.toLong
    val expJm = docsTx.filter(p => !isTrain(p._1))
      .filter(p => toks(p._2).length >= 2).map { case (id, tx) =>
        val ts = toks(tx)
        val terms = ts.sliding(2).filter(_.length == 2).map { a =>
          val c2v = c2.getOrElse(a(0) + " " + a(1), 0L)
          val c1v = c1.getOrElse(a(0), 0L)
          val cuv = c1.getOrElse(a(1), 0L)
          val p = (if (c1v > 0) c2v.toDouble / c1v else 0.0) * 0.5 +
            (cuv + 1.0) / (tT + vV) * 0.5
          (c2v == 0L,
            BigDecimal((0.0 - math.log(p)) * 10000)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }.toSeq
        id -> ((terms.size.toLong, terms.count(_._1).toLong,
          terms.map(_._2).sum))
      }.toMap
    val gotJm = run("q_heldout_perplexity_jm").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(gotJm.keySet == expJm.keySet, "held-out doc set")
    gotJm.foreach { case (id, (nb, nz, ne4, nll)) =>
      val (enb, enz, ene4) = expJm(id)
      assert(nb == enb && nz == enz && ne4 == ene4, s"jm replay doc $id")
      assert(nll == ne4.toDouble / (nb * 10000L), s"jm mean identity $id")
    }
    assert(expJm.values.exists(_._2 > 0),
      "fixture must contain unseen-context bigrams")
  }

  test("wave-r10n invariants: expectation battery, theil-sen replay, " +
    "permutation replay, stream-twin equality") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    // Expectation suite: the synthetic tables are clean by construction,
    // so every declared check must pass with metric == n
    val checks = run("q_expect_checks").collect()
    assert(checks.length == 6)
    checks.foreach { r =>
      assert(r.getAs[Long]("passed") == 1L, s"check ${r.getString(0)}")
      assert(r.getAs[Long]("metric_ppm") == 1000000L)
      assert(r.getAs[Long]("ok") == r.getAs[Long]("n"))
    }

    // Theil–Sen: JVM replay of daily counts → pairwise slopes → type-1
    // lower median under the (slope, d1, d2) total order
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gotTs = run("q_theil_sen").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    ev.groupBy(_._1).foreach { case (t, es) =>
      val daily = es.groupBy(_._2).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      val slopes = for {
        (d1, y1) <- daily; (d2, y2) <- daily if d1 < d2
      } yield (((y2 - y1).toDouble / (d2 - d1)), d1, d2)
      val sortedS = slopes.sortBy { case (sl, d1, d2) => (sl, d1, d2) }
      val med = sortedS((sortedS.size + 1) / 2 - 1)._1
      val (nDays, nPairs, gotMed) = gotTs(t)
      assert(nDays == daily.size.toLong)
      assert(nPairs == daily.size.toLong * (daily.size - 1) / 2)
      assert(gotMed == med, s"theil-sen median $t")
    }

    // Permutation test: full 32-replicate JVM replay (md5 nibble parity,
    // scale-6 decimal sums, one IEEE divide per mean)
    val pe = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def md5n(s: String): Char =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.charAt(0)
    def mean(vs: Seq[Double]): Double =
      vs.map(d6).sum.toDouble / vs.size
    val dObs = mean(pe.filter(_._2 == "click").map(_._3).toSeq) -
      mean(pe.filter(_._2 == "purchase").map(_._3).toSeq)
    val even = "02468ace".toSet
    val dReps = (1 to 32).map { r =>
      val (a, b) = pe.partition(p => even(md5n(s"${p._1}#$r")))
      mean(a.map(_._3).toSeq) - mean(b.map(_._3).toSeq)
    }
    val nExt = dReps.count(dr => math.abs(dr) >= math.abs(dObs)).toLong
    val pt = run("q_permutation_test").head()
    assert(pt.getAs[Long]("n_reps") == 32L)
    assert(pt.getAs[Double]("d_obs") == dObs, "observed delta replay")
    assert(pt.getAs[Long]("n_extreme") == nExt, "extreme-count replay")
    assert(pt.getAs[Long]("p_ppm") == (nExt + 1) * 1000000L / 33L)

    // Stream twin: the stateful processor's rollup equals the batch
    // sessionizer's row for row
    val batch = run("q_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val twin = run("q_session_paths_stream_twin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(twin == batch, "stream twin must equal the batch top-15")
  }

  test("wave-r10o invariants: label-prop round replay, eigen-centrality " +
    "integer replay, burst islands replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // Label propagation: take the ENGINE's edge frame, replay the two
    // majority rounds in the JVM with the identical tie order
    val docsL = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val e0 = graft.llm.TextDedup.jaccardEdgesShared(
      graft.tables.Tables.documents(spark, sf), "doc_id", "text",
      threshold = 0.2, corpusKey = sf)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (e0.map(p => (p._1, p._2)) ++ e0.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lbl = docsL.toMap
    for (_ <- 1 to 2) {
      lbl = lbl.map { case (id, old) =>
        nbrs.get(id) match {
          case None => id -> old
          case Some(ns) =>
            val counted = ns.map(lbl).groupBy(identity).view
              .mapValues(_.size).toSeq
            id -> counted.minBy { case (l, n) => (-n, l) }._1
        }
      }
    }
    val gotLp = run("q_label_prop").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotLp == lbl, "label-propagation 2-round replay")
    assert(e0.nonEmpty, "fixture must have dup edges")
    assert(lbl.exists { case (id, l) => l != docsL.toMap.apply(id) },
      "propagation must actually flip some label")

    // Eigenvector centrality: full integer power-iteration replay
    val docsT = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")
        .filter(_.nonEmpty).distinct.toSeq))
    val cnt = docsT.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size).toMap
    val top50 = cnt.toSeq.sortBy { case (t, n) => (-n, t) }.take(50)
      .map(_._1).toSet
    val aMat = scala.collection.mutable.Map.empty[(String, String), Long]
    docsT.foreach { case (_, ts) =>
      val in = ts.filter(top50)
      for (a <- in; b <- in if a != b)
        aMat((a, b)) = aMat.getOrElse((a, b), 0L) + 1L
    }
    def matvec(x: Map[String, Long]): Map[String, Long] =
      aMat.toSeq.flatMap { case ((i, j), a) =>
        x.get(j).map(xj => i -> a * xj) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def rescale(x: Map[String, Long]): Map[String, Long] = {
      val sc = x.values.max / 1000000L + 1L
      x.view.mapValues(_ / sc).toMap
    }
    val x1 = rescale(matvec(top50.map(_ -> 1L).toMap))
    val x2 = matvec(x1)
    val x3 = matvec(rescale(x2))
    val m3 = x3.values.max
    val gotEc = run("q_eigen_centrality").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotEc.keySet == x3.keySet, "centrality token set")
    x3.foreach { case (t, v) =>
      assert(gotEc(t) == ((v, v * 1000000L / m3)), s"eigen replay $t")
    }

    // Burst detection: hourly threshold + islands replay
    val evH = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0),
        (r.getLong(1) - 1704067200000000L) / 3600000000L))
    val expBursts = evH.groupBy(_._1).flatMap { case (t, es) =>
      val hourly = es.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val nEv = hourly.map(_._2).sum; val nHr = hourly.size.toLong
      val burst = hourly.filter { case (_, c) => c * nHr > nEv * 2 }
      burst.zipWithIndex.groupBy { case ((h, _), i) => h - i }
        .map { case (_, run) =>
          val hs = run.map(_._1)
          (t, hs.map(_._1).min, hs.map(_._1).max, hs.size.toLong,
            hs.map(_._2).sum, hs.map(_._2).max)
        }
    }.toSet
    val gotB = run("q_burst_detect").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(gotB == expBursts, "burst islands replay")
    assert(expBursts.nonEmpty, "fixture must contain burst hours")
    // multi-hour episodes appear from sf0.01 up (sparse sf0.001 hours
    // burst singly); the islands arithmetic is covered by the replay
  }

  test("wave-r10p invariants: kneser-ney count+log replay, dbscan " +
    "brute-force classification replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // Kneser–Ney: full JVM replay — continuation/context counts, the
    // ×4-cleared discount formula, Math.log, integer quantization
    val docsTx = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    def isTrain(id: Long) =
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 < 80
    val trBis = docsTx.filter(p => isTrain(p._1))
      .flatMap(p => toks(p._2).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
    val c2 = trBis.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cv = trBis.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1f = trBis.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    val n1r = trBis.distinct.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.length.toLong).toMap
    val n1all = trBis.distinct.length.toLong
    val expKn = docsTx.filter(p => !isTrain(p._1))
      .filter(p => toks(p._2).length >= 2).map { case (id, tx) =>
        val terms = toks(tx).sliding(2).filter(_.length == 2).map { a =>
          val cvv = cv.getOrElse(a(0), 0L)
          val floor = 1.0 / (n1all * 2)
          val p =
            if (cvv > 0)
              math.max(
                math.max(c2.getOrElse((a(0), a(1)), 0L) * 4 - 3, 0L)
                  .toDouble / (cvv * 4) +
                (n1f(a(0)) * 3).toDouble / (cvv * 4) *
                  (n1r.getOrElse(a(1), 0L).toDouble / n1all), floor)
            else math.max(n1r.getOrElse(a(1), 0L).toDouble / n1all, floor)
          (cvv == 0L,
            BigDecimal((0.0 - math.log(p)) * 10000)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }.toSeq
        id -> ((terms.size.toLong, terms.count(_._1).toLong,
          terms.map(_._2).sum))
      }.toMap
    val gotKn = run("q_kneser_ney").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(gotKn.keySet == expKn.keySet)
    gotKn.foreach { case (id, (nb, nbk, ne4, nll)) =>
      val (enb, enbk, ene4) = expKn(id)
      assert(nb == enb && nbk == enbk && ne4 == ene4, s"kn replay doc $id")
      assert(nll == ne4.toDouble / (nb * 10000L))
    }
    // KN and JM must be DIFFERENT models on this corpus (continuation
    // weighting has to move at least one doc's score)
    val jm = run("q_heldout_perplexity_jm").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(gotKn.exists { case (id, (_, _, ne4, _)) => jm(id) != ne4 },
      "KN must differ from JM somewhere")

    // DBSCAN: brute-force all-pairs classification replay
    val pts = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        def q(v: Float): Long =
          BigDecimal(v.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (r.getLong(0), q(e.head), q(e(1)))
      }
    val eps2 = 400000000L
    val nnb = pts.map { case (id, x, y) =>
      id -> pts.count { case (id2, x2, y2) =>
        id2 != id && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= eps2
      }.toLong
    }.toMap
    val core = nnb.filter(_._2 >= 4).keySet
    val expKind = pts.map { case (id, x, y) =>
      val kind =
        if (core(id)) "core"
        else if (pts.exists { case (id2, x2, y2) => id2 != id &&
          core(id2) &&
          (x - x2) * (x - x2) + (y - y2) * (y - y2) <= eps2 }) "border"
        else "noise"
      id -> ((nnb(id), kind))
    }.toMap
    val gotDb = run("q_dbscan_core").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(gotDb == expKind, "dbscan classification replay")
    val kinds = gotDb.values.map(_._2).toSet
    assert(kinds == Set("core", "border", "noise"),
      "fixture must exercise all three point classes")
  }

  test("wave-r10q invariants: srm chi2 replay, hits integer replay, " +
    "calibration bin replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // SRM: replay the arm counts + cleared-denominator chi2
    val users = graft.tables.Tables.events(spark, sf)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val oA = users.count(u =>
      java.lang.Math.floorMod(u * 2654435761L, 4294967296L) % 100 < 80).toLong
    val n = users.length.toLong; val oB = n - oA
    val num = (oA * 5 - n * 4) * (oA * 5 - n * 4) +
      (oB * 5 - n) * (oB * 5 - n) * 4
    val srm = run("q_ab_srm").head()
    assert(srm.getAs[Long]("n") == n && srm.getAs[Long]("o_a") == oA)
    assert(srm.getAs[Long]("chi2_num") == num, "chi2 numerator replay")
    assert(srm.getAs[Double]("chi2") == num.toDouble / (n * 20))
    assert(srm.getAs[Long]("srm_flag") ==
      (if (num * 100 > n * 7680) 1L else 0L))
    assert(srm.getAs[Long]("srm_flag") == 0L,
      "a correct Knuth-hash randomizer must not trip SRM")

    // HITS: full integer replay over the distinct purchase graph
    val li = graft.tables.Tables.lineitem(spark, sf)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a1 = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val h1 = li.groupBy(_._1).view
      .mapValues(_.map(e => a1(e._2)).sum).toMap
    val hsc = h1.values.max / 1000000L + 1L
    val h1s = h1.view.mapValues(_ / hsc).toMap
    val a2 = li.groupBy(_._2).view
      .mapValues(_.map(e => h1s(e._1)).sum).toMap
    val ma = a2.values.max; val mh = h1s.values.max
    def top20(m: Map[Long, Long], mx: Long) =
      m.toSeq.map { case (id, v) => (id, v * 1000000L / mx) }
        .sortBy { case (id, s) => (-s, id) }.take(20)
        .zipWithIndex.map { case ((id, s), i) => (i + 1, id, s) }
    val expHits = top20(a2, ma).map(t => ("authority", t._1, t._2, t._3)) ++
      top20(h1s, mh).map(t => ("hub", t._1, t._2, t._3))
    val gotHits = run("q_hits_scores").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(gotHits == expHits, "hits top-20 replay")

    // Calibration: replay decile bins from the rank-ppm scorer
    val docsC = graft.tables.Tables.documents(spark, sf)
      .select(col("n_chars"), (col("lang") === "en").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nC = docsC.length.toLong
    val cBelow = docsC.map(_._1).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    def pppm(v: Long): Long = {
      val below = docsC.count(_._1 < v).toLong
      (below * 2 + cBelow(v)) * 1000000L / (nC * 2)
    }
    val expBins = docsC.map { case (v, y) => (pppm(v), y) }
      .groupBy { case (p, _) => math.min(p / 100000L, 9L) }
      .map { case (b, vs) =>
        b -> ((vs.length.toLong, vs.map(_._1).sum / vs.length,
          vs.map(_._2).sum * 1000000L / vs.length,
          vs.map { case (p, y) =>
            (p - y * 1000000L) * (p - y * 1000000L) }.sum))
      }
    val gotCal = run("q_calibration_brier").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))).toMap
    assert(gotCal.keySet == expBins.keySet)
    expBins.foreach { case (b, (nb, mp, fp, sq)) =>
      val (gn, gm, gf, gs) = gotCal(b)
      assert(gn == nb && gm == mp && gf == fp && gs == sq,
        s"calibration bin $b replay")
    }
    assert(expBins.size >= 5, "score deciles must spread across bins")
  }

  test("wave-r10r invariants: poisson bootstrap replay, mrr replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    // Poisson bootstrap: weight distribution sanity + full replicate
    // replay (md5 60-bit uniform vs the embedded CDF thresholds)
    def h15(s2: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest
        .getInstance("MD5").digest(s2.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val pe = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // thresholds replayed independently from the Poisson(1) pmf
    val cdf = { var f = 1.0; var acc = 0.0
      (0 to 4).map { k => if (k > 0) f *= k; acc += 1.0 / f
        (math.exp(-1.0) * acc * math.pow(2.0, 60)).toLong } }
    val means = (1 to 32).map { r =>
      val ws = pe.map { case (id, v) =>
        val u = h15(s"$id#$r")
        (v, cdf.indexWhere(u < _) match {
          case -1 => 5L; case k => k.toLong })
      }
      val sw = ws.map(_._2).sum
      r -> (ws.map { case (v, wt) => d6(v * wt) }.sum.toDouble / sw)
    }
    val sortedM = means.sortBy { case (r, m) => (m, r) }.map(_._2)
    val obs = pe.map(p => d6(p._2)).sum.toDouble / pe.length
    val bs = run("q_bootstrap_poisson").head()
    assert(bs.getAs[Long]("n_reps") == 32L)
    assert(bs.getAs[Double]("mean_obs") == obs)
    assert(bs.getAs[Double]("ci_lo") == sortedM(1), "2nd order statistic")
    assert(bs.getAs[Double]("ci_hi") == sortedM(30), "31st order statistic")
    assert(bs.getAs[Double]("ci_lo") <= obs && obs <= bs.getAs[Double]("ci_hi"),
      "the observed mean sits inside its own 90% CI on this corpus")

    // MRR: identity against q_ndcg_at_k's ranking — first_rel_rank must
    // be the first rank where ndcg's graded list has rel=1, and the
    // mean-reciprocal table must match the builder constants
    val gotM = run("q_mrr_at_k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotM.length == 8)
    gotM.foreach { case (_, fr, rr) =>
      if (fr == 0L) assert(rr == 0L)
      else assert(rr == math.round(1e6 / fr), s"rr table rank $fr")
    }
    assert(gotM.exists(_._2 > 0), "fixture must contain a relevant hit")
  }

  test("wave-r10s invariants: dbscan cluster replay, isotonic PAVA " +
    "equivalence, mann-kendall replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // DBSCAN clusters: brute-force CC over the core graph + nearest-core
    // border attachment, replayed in the JVM
    val pts = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        def q(v: Float): Long =
          BigDecimal(v.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (r.getLong(0), q(e.head), q(e(1)))
      }
    val eps2 = 400000000L
    def d2(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbr = pts.map(a =>
      a._1 -> pts.filter(b => b._1 != a._1 && d2(a, b) <= eps2)).toMap
    val core = pts.filter(p => nbr(p._1).length >= 4).map(_._1).toSet
    // CC over core-core edges by min-label fixpoint
    var lbl = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      val byId = pts.map(p => p._1 -> p).toMap
      core.foreach { c =>
        val ns = nbr(c).filter(b => core(b._1))
          .filter(b => d2(byId(c), b) <= eps2).map(b => lbl(b._1))
        val m = (lbl(c) +: ns).min
        if (m != lbl(c)) { lbl += c -> m; changed = true }
      }
    }
    val expDb = pts.map { p =>
      if (core(p._1)) (p._1, "core", lbl(p._1))
      else {
        val coreNb = nbr(p._1).filter(b => core(b._1))
        if (coreNb.isEmpty) (p._1, "noise", -1L)
        else {
          val best = coreNb.minBy(b => (d2(p, b), b._1))
          (p._1, "border", lbl(best._1))
        }
      }
    }.toSet
    val gotDb = run("q_dbscan_clusters").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(gotDb == expDb, "dbscan cluster replay")
    assert(expDb.count(_._2 == "core") > 0 &&
      expDb.map(_._3).count(_ >= 0) > 0)
    // classification must agree with q_dbscan_core exactly
    val kinds = run("q_dbscan_core").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(expDb.forall { case (id, k, _) => kinds(id) == k },
      "cluster query and classification query must agree on kinds")

    // Isotonic: the minimax fit must equal an independent imperative
    // PAVA over the same bins, and must be monotone non-decreasing
    val cal = run("q_calibration_brier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    val iso = run("q_isotonic_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(iso.map(i => (i._1, i._2)).toSeq ==
      cal.map(c => (c._1, c._2)).toSeq,
      "same bins as the calibration table")
    // independent imperative PAVA on exact (pos, n) reconstructed
    // from the docs
    val docsC = graft.tables.Tables.documents(spark, sf)
      .select(col("n_chars"), (col("lang") === "en").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nC = docsC.length.toLong
    val below = docsC.map(_._1).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    def pppm(v: Long): Long = {
      val b = docsC.count(_._1 < v).toLong
      (b * 2 + below(v)) * 1000000L / (nC * 2)
    }
    val binAgg = docsC.map { case (v, y) => (math.min(pppm(v) / 100000L, 9L), y) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, vs) => (b, vs.length.toLong, vs.map(_._2).sum) }
    val res = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    binAgg.foreach { case (_, w, pos) =>
      res += Array(pos * 1000000L, w, 1L)
      while (res.length > 1 && {
        val a = res(res.length - 2); val b = res.last
        a(0) * b(1) > b(0) * a(1)
      }) {
        val b = res.remove(res.length - 1); val a = res.remove(res.length - 1)
        res += Array(a(0) + b(0), a(1) + b(1), a(2) + b(2))
      }
    }
    val expFit = res.flatMap(blk =>
      Seq.fill(blk(2).toInt)(blk(0).toDouble / blk(1)))
    iso.map(_._4).zip(expFit).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) < 1e-6, s"PAVA fit bin $i: $g vs $e")
    }
    assert(iso.map(_._4).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)), "fit must be monotone")

    // Mann-Kendall: S, tie variance, z replayed
    val evD = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gotMk = run("q_mann_kendall").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    evD.groupBy(_._1).foreach { case (t, es) =>
      val daily = es.groupBy(_._2).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      val sStat = (for {
        (d1, y1) <- daily; (d2x, y2) <- daily if d1 < d2x
      } yield java.lang.Long.signum(y2 - y1).toLong).sum
      val n = daily.length.toLong
      val tie = daily.groupBy(_._2).values
        .map(g => { val tt = g.size.toLong; tt * (tt - 1) * (tt * 2 + 5) })
        .sum
      val varN = n * (n - 1) * (n * 2 + 5) - tie
      val z =
        if (sStat > 0) (sStat - 1).toDouble / math.sqrt(varN.toDouble / 18)
        else if (sStat < 0) (sStat + 1).toDouble / math.sqrt(varN.toDouble / 18)
        else 0.0
      val (gn, gs, gv, gz) = gotMk(t)
      assert(gn == n && gs == sStat && gv == varN, s"mk counts $t")
      assert(gz == z, s"mk z $t")
    }

    // IVM merge: every row's consistent flag must be 1 (the decimal
    // partial/merge identity) and the merged view must equal a direct
    // full aggregation row for row
    val ivm = run("q_ivm_merge").collect()
    assert(ivm.nonEmpty)
    assert(ivm.forall(_.getAs[Long]("consistent") == 1L),
      "partial-merge must reproduce the full recompute exactly")
  }


  test("wave-r10t invariants: modified-KN replay, stratified-ATE replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)

    // Modified KN: full JVM replay — count-of-counts discounts, context
    // gammas, continuation back-off, integer quantization
    val docsTx = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    def isTrain(id: Long) =
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 < 80
    val trBis = docsTx.filter(p => isTrain(p._1))
      .flatMap(p => toks(p._2).sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))))
    val c2 = trBis.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val Seq(n1c, n2c, n3c, n4c) = (1 to 4).map(k =>
      c2.values.count(_ == k).toLong)
    val y = n1c.toDouble / math.max(n1c + n2c * 2, 1L)
    val d1 = 1.0 - y * 2 * (n2c.toDouble / math.max(n1c, 1L))
    val d2 = 2.0 - y * 3 * (n3c.toDouble / math.max(n2c, 1L))
    val d3 = 3.0 - y * 4 * (n4c.toDouble / math.max(n3c, 1L))
    val cvM = c2.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val n1vM = c2.toSeq.groupBy(_._1._1).view
      .mapValues(_.count(_._2 == 1L).toLong).toMap
    val n2vM = c2.toSeq.groupBy(_._1._1).view
      .mapValues(_.count(_._2 == 2L).toLong).toMap
    val n3pM = c2.toSeq.groupBy(_._1._1).view
      .mapValues(_.count(_._2 >= 3L).toLong).toMap
    val n1rM = trBis.distinct.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.length.toLong).toMap
    val n1all = trBis.distinct.length.toLong
    val expMkn = docsTx.filter(p => !isTrain(p._1))
      .filter(p => toks(p._2).length >= 2).map { case (id, tx) =>
        val terms = toks(tx).sliding(2).filter(_.length == 2).map { a =>
          val cvv = cvM.getOrElse(a(0), 0L)
          val floor = 1.0 / (n1all * 2)
          val p =
            if (cvv > 0) {
              val c = c2.getOrElse((a(0), a(1)), 0L)
              val dOf = if (c == 1) d1 else if (c == 2) d2
                else if (c >= 3) d3 else 0.0
              math.max(
                math.max(c.toDouble - dOf, 0.0) / cvv +
                ((d1 * n1vM.getOrElse(a(0), 0L) +
                  d2 * n2vM.getOrElse(a(0), 0L) +
                  d3 * n3pM.getOrElse(a(0), 0L)) / cvv) *
                  (n1rM.getOrElse(a(1), 0L).toDouble / n1all), floor)
            } else
              math.max(n1rM.getOrElse(a(1), 0L).toDouble / n1all, floor)
          (cvv == 0L,
            BigDecimal((0.0 - math.log(p)) * 10000)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }.toSeq
        id -> ((terms.size.toLong, terms.count(_._1).toLong,
          terms.map(_._2).sum))
      }.toMap
    val gotMkn = run("q_kn_modified").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(gotMkn == expMkn, "modified-KN full replay")
    // the smoothers must produce genuinely different models
    val kn = run("q_kneser_ney").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(gotMkn.exists { case (id, (_, _, ne4)) => kn(id) != ne4 },
      "MKN must differ from single-discount KN somewhere")

    // Stratified ATE: JVM replay of arms, terciles, per-stratum means
    def d6s(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val splitUs = java.time.Instant.parse("2024-01-16T00:00:00Z")
      .toEpochMilli * 1000L
    val perU = ev.groupBy(_._1).map { case (u, es) =>
      val pre = es.filter(_._2 < splitUs).map(e => d6s(e._3)).sum
      val post = es.filterNot(_._2 < splitUs).map(e => d6s(e._3)).sum
      (u, pre, post,
        if (java.lang.Math.floorMod(u * 2654435761L, 4294967296L) % 100 < 80)
          1L else 0L)
    }.toSeq.sortBy(p => (p._2, p._1))
    val nU = perU.size.toLong
    val strata = perU.zipWithIndex.groupBy { case (_, i) =>
      3L * i / nU + 1L }
    // a tiny-SF stratum can have ZERO controls (15 users at sf0.001) —
    // the mean is then NULL in BOTH engines (parity-identical); the
    // replay asserts the null logic and compares values where defined
    val gotPs = run("q_propensity_strata").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        r.getLong(7))))
      .toMap
    strata.foreach { case (st, members) =>
      val t = members.filter(_._1._4 == 1L)
      val c = members.filter(_._1._4 == 0L)
      val mT = if (t.isEmpty) None
        else Some(t.map(_._1._3).sum.toDouble / t.size)
      val mC = if (c.isEmpty) None
        else Some(c.map(_._1._3).sum.toDouble / c.size)
      val (nS, nT, gT, gC, gD, wPpm) = gotPs(st)
      assert(nS == members.size.toLong && nT == t.size.toLong, s"stratum $st")
      assert(gT == mT && gC == mC, s"stratum $st means")
      assert(gD == (for (a <- mT; b <- mC) yield a - b), s"stratum $st diff")
      assert(wPpm == members.size.toLong * 1000000L / nU)
    }
    assert(strata.size == 3, "three terciles")
  }

  test("wave-r10u invariants: cross-correlation moment replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val ev = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def series(t: String) = ev.filter(_._1 == t).groupBy(_._2)
      .view.mapValues(_.length.toLong).toMap
    val xs = series("click"); val ys = series("purchase")
    val got = SparkEntry.queries("q_cross_correlation")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    (-7L to 7L).foreach { lag =>
      val pairs = xs.keys.toSeq.sorted.flatMap(d =>
        ys.get(d + lag).map(yv => (xs(d), yv)))
      if (pairs.nonEmpty) {
        val n = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val r = (n * sxy - sx * sy).toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) *
           math.sqrt((n * syy - sy * sy).toDouble))
        val (gn, gr) = got(lag)
        assert(gn == n, s"lag $lag n")
        if (n * sxx - sx * sx > 0 && n * syy - sy * sy > 0) {
          assert(gr.contains(r), s"lag $lag r")
          assert(math.abs(gr.get) <= 1.0 + 1e-12)
        }
      }
    }
    assert(got.size == 15, "all 15 lags present at sf0.001")

    // burst stream twin: the stateful processor's episode set must
    // equal the batch islands query's rows exactly
    val bb = SparkEntry.queries("q_burst_detect")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val bt = SparkEntry.queries("q_burst_stream_twin")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(bt == bb, "burst stream twin must equal the batch episodes")
  }

  test("wave-r11 q_semantic_dedup: shared k-means trajectory, " +
    "per-cluster top-pair replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val rows = run("q_semantic_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    // cluster sizes must agree with the declared k-means query's own
    // rollup — the shared-machinery identity
    val km = run("q_kmeans_lloyd").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._2)).toMap == km,
      "semantic-dedup cluster sizes must equal q_kmeans_lloyd's")
    // full JVM replay: quantize, walk the identical Lloyd trajectory,
    // enumerate within-cluster pairs, argmax the rounded cosine
    def d6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray).sortBy(_._1)
    var cents: Seq[(Long, Array[Long])] = vecs.take(8)
      .map { case (id, q2) => (id, q2.clone) }.toSeq
    def assign(): Map[Long, Long] = vecs.map { case (id, q2) =>
      id -> cents.map { case (ck, m) =>
        ((0 until 8).map(i => (q2(i) - m(i)) * (q2(i) - m(i))).sum, ck)
      }.min._2
    }.toMap
    (1 to 3).foreach { _ =>
      val a = assign()
      cents = a.values.toSeq.distinct.sorted.map { ck =>
        val members = vecs.filter(v => a(v._1) == ck)
        ck -> Array.tabulate(8)(i =>
          members.map(_._2(i)).sum / members.length)
      }
    }
    val a = assign()
    val byCluster = vecs.groupBy(v => a(v._1))
    val expect = byCluster.toSeq.map { case (ck, ms) =>
      val pairs = for {
        x <- ms; y <- ms if x._1 < y._1
      } yield {
        val dot = (0 until 8).map(i => x._2(i) * y._2(i)).sum
        val na = math.sqrt((0 until 8).map(i => x._2(i) * x._2(i)).sum
          .toDouble)
        val nb = math.sqrt((0 until 8).map(i => y._2(i) * y._2(i)).sum
          .toDouble)
        (x._1, y._1, d6(dot.toDouble / (na * nb)))
      }
      val best = pairs.minBy(p => (-p._3, p._1, p._2))
      (ck, ms.length.toLong, Some(best._1), Some(best._2), Some(best._3))
    }.sortBy(_._1)
    assert(rows == expect, s"semantic-dedup replay diverged")
  }

  test("wave-r12 q_semantic_dedup auto-k: operating point engages and " +
    "bounds expected cell population") {
    // r11 verdict directive 4: the SemDeDup k ≈ n/target_cell rule is
    // part of the operator. sf0.001 (n=20) sits on the k=8 floor — the
    // shared-trajectory identity above proves that branch; sf0.1
    // (n=2000) must take the auto branch: k = n/200 = 10 > 8.
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf01
    val n = graft.tables.Tables.rowCount(spark, sf, "embeddings")
    val target = 200L
    val k = math.max(8L, n / target)
    assert(k > 8, s"sf0.1 must engage the auto-k branch (n=$n, k=$k)")
    assert(n / k <= target,
      "expected cell population is bounded by the target by construction")
    val rows = SparkEntry.queries("q_semantic_dedup")(spark, sf).collect()
    assert(rows.length.toLong <= k,
      s"at most k=$k clusters, got ${rows.length}")
    assert(rows.length > 8,
      "auto-k must produce more clusters than the fixed-k floor here")
    assert(rows.map(_.getLong(1)).sum == n,
      "cluster sizes must partition the corpus")
  }

  test("wave-r12 q_kmeans_seeded: full two-level IVF-seeded Lloyd " +
    "replay, orphan accounting included") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q_kmeans_seeded")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray).sortBy(_._1)
    def assignTo(cs: Seq[(Long, Array[Long])],
        q2: Array[Long]): (Long, Long) = {
      val (dd, ck) = cs.map { case (ck2, m) =>
        ((0 until 8).map(i => (q2(i) - m(i)) * (q2(i) - m(i))).sum, ck2)
      }.min
      (ck, dd)
    }
    val n = vecs.length.toLong
    val k = math.max(8L, n / 200L)
    // r13: √k coarse book — kc = max(8, ceil(sqrt(k))), same floor rule
    // as the operator (identical to the k=8 trajectory until k > 64)
    val kc = math.max(8L, math.ceil(math.sqrt(k.toDouble)).toLong)
    // coarse trajectory — the q_kmeans_lloyd replay shape at size kc
    var cents: Seq[(Long, Array[Long])] = vecs.take(kc.toInt)
      .map { case (id, q2) => (id, q2.clone) }.toSeq
    (1 to 3).foreach { _ =>
      val a = vecs.map { case (id, q2) => id -> assignTo(cents, q2)._1 }
        .toMap
      cents = a.values.toSeq.distinct.sorted.map { ck =>
        val ms = vecs.filter(v => a(v._1) == ck)
        ck -> Array.tabulate(8)(i => ms.map(_._2(i)).sum / ms.length)
      }
    }
    val cell = vecs.map { case (id, q2) => id -> assignTo(cents, q2)._1 }
      .toMap
    var fine: Seq[(Long, Array[Long])] = vecs.filter(_._1 < k)
      .map { case (id, q2) => (id, q2.clone) }.toSeq
    // seeded assignment: candidates = fine centroids sharing the
    // vector's coarse cell; empty cell → full-scan orphan fallback
    def seededAssign(f: Seq[(Long, Array[Long])])
        : Map[Long, (Long, Long, Long)] = {
      val fcell = f.map { case (fk, m) => (fk, assignTo(cents, m)._1, m) }
      vecs.map { case (id, q2) =>
        val cand = fcell.filter(_._2 == cell(id))
        val (cs, orphan) =
          if (cand.nonEmpty) (cand, 0L) else (fcell, 1L)
        val (dd, fk) = cs.map { case (fk2, _, m) =>
          ((0 until 8).map(i => (q2(i) - m(i)) * (q2(i) - m(i))).sum, fk2)
        }.min
        id -> ((fk, dd, orphan))
      }.toMap
    }
    (1 to 3).foreach { _ =>
      val a = seededAssign(fine)
      fine = a.values.map(_._1).toSeq.distinct.sorted.map { fk =>
        val ms = vecs.filter(v => a(v._1)._1 == fk)
        fk -> Array.tabulate(8)(i => ms.map(_._2(i)).sum / ms.length)
      }
    }
    val fa = seededAssign(fine)
    val expect = fa.groupBy(_._2._1).toSeq.map { case (fk, g) =>
      val ds = g.values.toSeq
      (fk, ds.size.toLong, ds.map(_._3).sum, ds.map(_._2).sum / ds.size)
    }.sortBy(_._1)
    assert(rows == expect, s"seeded replay diverged: $rows != $expect")
    assert(rows.map(_._2).sum == n,
      "seeded clusters must partition the corpus")
  }

  test("wave-r12 q_kmeans_silhouette: centroid-silhouette replay on " +
    "the shared Lloyd trajectory") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q_kmeans_silhouette")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray).sortBy(_._1)
    var cents: Seq[(Long, Array[Long])] = vecs.take(8)
      .map { case (id, q2) => (id, q2.clone) }.toSeq
    def d2(q2: Array[Long], m: Array[Long]): Long =
      (0 until 8).map(i => (q2(i) - m(i)) * (q2(i) - m(i))).sum
    (1 to 3).foreach { _ =>
      val a = vecs.map { case (id, q2) =>
        id -> cents.map { case (ck, m) => (d2(q2, m), ck) }.min._2 }.toMap
      cents = a.values.toSeq.distinct.sorted.map { ck =>
        val ms = vecs.filter(v => a(v._1) == ck)
        ck -> Array.tabulate(8)(i => ms.map(_._2(i)).sum / ms.length)
      }
    }
    val expect = vecs.map { case (id, q2) =>
      val scored = cents.map { case (ck, m) => (d2(q2, m), ck) }
      val (a2, ck) = scored.min
      val b2 = scored.filter(_._2 != ck).map(_._1).min
      val s2 =
        if (math.max(a2, b2) == 0L) 0L
        else new java.math.BigDecimal(
          (math.sqrt(b2.toDouble) - math.sqrt(a2.toDouble)) /
            math.sqrt(math.max(a2, b2).toDouble) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      (ck, s2)
    }.groupBy(_._1).toSeq.map { case (ck, g) =>
      (ck, g.length.toLong, g.map(_._2).sum / g.length)
    }.sortBy(_._1)
    assert(rows == expect, s"silhouette replay diverged: $rows != $expect")
    // silhouette values live in [-1, 1] by construction
    assert(rows.forall(r => r._3 >= -1000000L && r._3 <= 1000000L))
  }

  test("wave-r12b q_graph_modularity: exact integer modularity replay " +
    "on the shared label-prop partition") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    // labels: the engine's OWN converged partition (q_label_prop is
    // replay-verified against the JVM propagation separately)
    val lbl = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val e0 = graft.llm.TextDedup.jaccardEdgesShared(
      graft.tables.Tables.documents(spark, sf), "doc_id", "text",
      threshold = 0.2, corpusKey = sf)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = BigInt(e0.length)
    val deg = (e0.map(_._1) ++ e0.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = lbl.groupBy(_._2).toSeq.map { case (c, members) =>
      val ids = members.keySet
      val eIn = e0.count(p => lbl(p._1) == c && lbl(p._2) == c).toLong
      val degSum = ids.toSeq.map(id => deg.getOrElse(id, 0L)).sum
      val contrib = (4 * m * eIn - BigInt(degSum) * degSum) *
        BigInt(1000000000000L) / (4 * m * m)
      (c, ids.size.toLong, eIn, degSum, contrib.toLong)
    }.sortBy(_._1)
    val rows = SparkEntry.queries("q_graph_modularity")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows == expect, s"modularity replay diverged")
    // partition identity: degree sums add to 2m, intra edges <= m
    assert(rows.map(_._4).sum == 2 * m.toLong)
    assert(rows.map(_._3).sum <= m.toLong)
    // Q = sum of contributions is a valid modularity in [-1, 1]
    val q = rows.map(_._5).sum
    assert(q >= -1000000000000L && q <= 1000000000000L)
  }

  test("wave-r12b q_psi_drift: scaled-integer PSI replay on the " +
    "80/20 split") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val li = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice")).collect()
      .map(r => (new java.math.BigDecimal(r.getDouble(1) * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact(),
        if (r.getLong(0) % 10 < 8) 1L else 0L))
    val mn = li.map(_._1).min; val mx = li.map(_._1).max
    val binned = li.groupBy { case (c, _) =>
      math.min(9L, (c - mn) * 10 / (mx - mn + 1)) }
    val nTr = li.map(_._2).sum + 10L
    val nTe = li.count(_._2 == 0L) + 10L
    // explicit 0-9 grid: empty bins still contribute their smoothed term
    val expect = (0L to 9L).map { bin =>
      val vs = binned.getOrElse(bin, Array.empty[(Long, Long)])
      val cTr = vs.map(_._2).sum
      val cTe = vs.length - cTr
      val dp = (cTr + 1) * 1000000L / nTr - (cTe + 1) * 1000000L / nTe
      val lnr = math.round(math.log(((cTr + 1.0) * nTe) /
        ((cTe + 1.0) * nTr)) * 10000)
      (bin, cTr, cTe, dp, lnr, dp * lnr)
    }.toSeq
    val rows = SparkEntry.queries("q_psi_drift")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows == expect, s"PSI replay diverged: $rows != $expect")
    // same-direction invariant: every term is non-negative (dp and
    // ln(p/q) share sign by construction of the smoothed ratio)
    assert(rows.forall(r => r._6 >= 0L), "PSI terms must be >= 0")
  }

  test("wave-r12b q_benford_digits: first-digit audit replay with " +
    "builder-time expected masses") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val cents = graft.tables.Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect()
      .map(r => new java.math.BigDecimal(r.getDouble(0) * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
    val tot = cents.length.toLong
    val expect = cents.map(_.toString.charAt(0).asDigit.toLong)
      .groupBy(identity).toSeq.map { case (d, g) =>
        val n = g.length.toLong
        val actual = n * 1000000L / tot
        val benford = math.round(math.log10(1.0 + 1.0 / d) * 1e6)
        (d, n, actual, benford, actual - benford,
          (actual - benford) * (actual - benford) / benford)
      }.sortBy(_._1)
    val rows = SparkEntry.queries("q_benford_digits")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(rows == expect, s"Benford replay diverged: $rows != $expect")
    // the benford_ppm column is the embedded constant table
    assert(rows.map(r => (r._1, r._4)).forall { case (d, p) =>
      p == math.round(math.log10(1.0 + 1.0 / d) * 1e6) })
  }

  test("wave-r12b q_k_anonymity: equivalence-class replay; records " +
    "partition; k-level is the first row") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val cust = graft.tables.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map { r =>
        val cents = new java.math.BigDecimal(r.getDouble(3) * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        (r.getInt(1).toLong, r.getString(2), cents / 100000L)
      }
    val expect = cust.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).toSeq.map { case (sz, cs) =>
        (sz, cs.size.toLong, sz * cs.size, if (sz < 5) 1L else 0L)
      }.sortBy(_._1)
    val rows = SparkEntry.queries("q_k_anonymity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows == expect, s"k-anonymity replay diverged")
    assert(rows.map(_._3).sum == cust.length.toLong,
      "class sizes must partition the records")
  }

  test("wave-r12b q_ivf_recall_sweep: four operating points, floors " +
    "hold, recall monotone at the shared codebook") {
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q_ivf_recall_sweep")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 4L, 8L), "the declared points")
    assert(rows.forall(_._2 == 50L), "the bounded 50-query audit")
    assert(rows.forall(_._3 == 1L), s"every floor must hold: $rows")
    // monotone by the candidate-superset argument — a flag per point
    assert(rows.forall(_._4 == 1L), s"recall must be monotone: $rows")
  }

  test("wave-r12b q_coreset_kcenter: full greedy replay; radii " +
    "non-increasing; certificate row covers") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray).sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 8).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var chosen = Vector((1L, vecs.head._1, 0L))
    var centers = Vector(vecs.head._2)
    val chosenIds = scala.collection.mutable.Set(vecs.head._1)
    for (r <- 2 to 9) {
      val (id, dd) = vecs.filterNot(v => chosenIds(v._1))
        .map { case (id, q) => (id, centers.map(c => d2(q, c)).min) }
        .maxBy { case (id, dd) => (dd, -id) }
      chosen :+= ((r.toLong, id, dd))
      centers :+= vecs.find(_._1 == id).get._2
      chosenIds += id
    }
    val expect = chosen.map { case (p, id, dd) =>
      (p, id, dd, if (p <= 8) 1L else 0L) }
    val rows = SparkEntry.queries("q_coreset_kcenter")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows == expect, s"greedy replay diverged: $rows != $expect")
    // greedy invariant: pick radii never increase after the seed
    val radii = rows.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radii must be non-increasing: $radii")
    // certificate: row 9's dist2 is the exact coverage radius^2 of the
    // 8 picks (every vector within it)
    val picks = rows.filter(_._4 == 1L).map(_._2)
      .map(id => vecs.find(_._1 == id).get._2)
    val cover = vecs.filterNot(v => rows.take(8).exists(_._2 == v._1))
      .map { case (_, q) => picks.map(c => d2(q, c)).min }.max
    assert(cover == rows.last._3, "certificate row must be the coverage")
  }

  test("r13 q_coreset_weighted: quality-weighted greedy replay; the " +
    "weight provably changes at least one pick vs the plain coreset") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val weights = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> (math.min(4L, r.getLong(1) / 100L) + 1L))
      .toMap
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray).sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 8).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var chosen = Vector((1L, vecs.head._1, weights(vecs.head._1), 0L))
    var centers = Vector(vecs.head._2)
    val chosenIds = scala.collection.mutable.Set(vecs.head._1)
    for (r <- 2 to 9) {
      val (id, dd) = vecs.filterNot(v => chosenIds(v._1))
        .map { case (id, q) => (id, centers.map(c => d2(q, c)).min) }
        .maxBy { case (id, dd) => (dd * weights(id), -id) }
      chosen :+= ((r.toLong, id, weights(id), dd))
      centers :+= vecs.find(_._1 == id).get._2
      chosenIds += id
    }
    val expect = chosen.map { case (p, id, w, dd) =>
      (p, id, w, dd, w * dd, if (p <= 8) 1L else 0L) }
    val rows = SparkEntry.queries("q_coreset_weighted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(rows == expect, s"weighted greedy replay diverged")
    // the weighting must DO something on this corpus: the pick set
    // differs from the unweighted coreset's (else the band is vacuous)
    val plain = SparkEntry.queries("q_coreset_kcenter")(spark, sf)
      .collect().map(_.getLong(1)).toSet
    assert(rows.map(_._2).toSet != plain,
      "weighted picks identical to unweighted — weight band vacuous")
  }

  test("wave-r12b q_psi_timeseries: per-day PSI replay against the " +
    "fixed reference window") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val ev = graft.tables.Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")),
        lit("2024-01-01").cast("date")).cast("long").as("day"),
        col("value")).collect()
      .map(r => (r.getLong(0), new java.math.BigDecimal(r.getDouble(1) * 100)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()))
    val refC = ev.filter(_._1 <= 6).map(_._2)
    val (mn, mx) = (refC.min, refC.max)
    def bin(c: Long): Long =
      math.min(9L, math.max(0L, (c - mn) * 10 / (mx - mn + 1)))
    val binned = ev.map { case (d, c) => (d, bin(c)) }
    val ref = binned.filter(_._1 <= 6).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val dR = binned.count(_._1 <= 6).toLong + 10L
    val expect = binned.groupBy(_._1).toSeq.map { case (day, rows) =>
      val dD = rows.length.toLong + 10L
      val cnt = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val psi = (0L to 9L).map { b =>
        val cd = cnt.getOrElse(b, 0L) + 1L
        val cr = ref.getOrElse(b, 0L) + 1L
        val dp = cd * 1000000L / dD - cr * 1000000L / dR
        val lnr = math.round(math.log((cd * dR).toDouble / (cr * dD))
          * 10000)
        dp * lnr
      }.sum
      (day, psi, if (psi > 2000000000L) 1L else 0L)
    }.sortBy(_._1)
    val rows = SparkEntry.queries("q_psi_timeseries")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(rows == expect, s"PSI time-series replay diverged")
    // one row per day, alert = declared threshold on psi_e10 (NOTE:
    // single days DO sometimes alert against the pooled reference at
    // this tiny SF — ~200 events/day makes PSI noise O(bins/n) ≈ 0.05
    // with a heavy tail — so alert VALUES are data, not an invariant)
    assert(rows.map(_._1) == binned.map(_._1).distinct.sorted.toSeq)
    assert(rows.forall(r => (r._2 > 2000000000L) == (r._3 == 1L)))
  }

  test("wave-r12b plan pin: the Lloyd/SemDeDup argmin stays in codegen " +
    "HashAggregate — no ObjectHashAggregate, no Window") {
    // The round-12 measured lesson (TUNING argmin ladder, 137.4 s /
    // 85 GB spill → 23.5 s / zero at 100×): a row_number window
    // sort-buffers the n·k assignment fan and min(struct) falls into
    // ObjectHashAggregate's sort fallback; the shipped encoded-BIGINT
    // min must stay in whole-stage-codegen HashAggregate with true
    // partial aggregation. This pins the PLAN so a refactor can't
    // silently reintroduce either regression.
    for (name <- Seq("q_kmeans_lloyd", "q_kmeans_seeded")) {
      val plan = SparkEntry.queries(name)(spark, TestSpark.sf0001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ObjectHashAggregate"),
        s"$name argmin fell into ObjectHashAggregate")
      assert(!plan.contains("WindowExec") && !plan.contains("Window ("),
        s"$name argmin fell back to a window sort")
      assert(plan.contains("HashAggregate"),
        s"$name lost the hash-agg argmin entirely")
    }
  }

  test("wave-r11 q_pca_power: full integer power-iteration replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val dims = 8
    // quantize exactly as the engine does (HALF_UP on the double)
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(dims).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray)
    val n = BigInt(vecs.length)
    val s2 = Array.tabulate(dims)(i => BigInt(vecs.map(_(i)).sum))
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val pij = vecs.map(v => BigInt(v(i)) * v(j)).sum
      (n * pij - s2(i) * s2(j)) / (n * n) // BigInt / truncates to zero
    }
    def matvec(x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * x(j)).sum)
    def rescale(y: Array[BigInt]): Array[BigInt] = {
      val sc = y.map(_.abs).max / 1000000 + 1
      y.map(_ / sc)
    }
    val x1 = rescale(matvec(Array.fill(dims)(BigInt(1))))
    val x2 = rescale(matvec(x1))
    val y3 = matvec(x2)
    val m3 = y3.map(_.abs).max
    val lam = (y3.zip(x2).map { case (a, b) => a * b }.sum /
      x2.map(b => b * b).sum).toLong
    val expect = (0 until dims).map(i =>
      (i.toLong, (y3(i) * 1000000 / m3).toLong, lam))
    val got = run("q_pca_power").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"pca replay diverged: $got != $expect")
    assert(got.exists(_._2 == 1000000L),
      "some dimension must carry the max |loading|")
    assert(lam > 0, "top eigenvalue of a covariance matrix is positive")
  }

  test("wave-r11b q_pca_deflate: deflated second-chain replay, " +
    "eigenvalue order, orthogonality bound") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val dims = 8
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(dims).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray)
    val n = BigInt(vecs.length)
    val s2 = Array.tabulate(dims)(i => BigInt(vecs.map(_(i)).sum))
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val pij = vecs.map(v => BigInt(v(i)) * v(j)).sum
      (n * pij - s2(i) * s2(j)) / (n * n)
    }
    def matvec(a: Array[Array[BigInt]], x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dims)(i => (0 until dims).map(j => a(i)(j) * x(j)).sum)
    def rescale(y: Array[BigInt]): Array[BigInt] = {
      val sc = y.map(_.abs).max / 1000000 + 1
      y.map(_ / sc)
    }
    def chain(a: Array[Array[BigInt]]): (Array[BigInt], BigInt) = {
      val x1 = rescale(matvec(a, Array.fill(dims)(BigInt(1))))
      val x2 = rescale(matvec(a, x1))
      val y3 = matvec(a, x2)
      val lam = y3.zip(x2).map { case (p, q) => p * q }.sum /
        x2.map(b => b * b).sum
      (y3, lam)
    }
    val (y3a, lam1) = chain(cov)
    val v1 = rescale(y3a)
    val vtv = v1.map(b => b * b).sum
    val cov2 = Array.tabulate(dims, dims) { (i, j) =>
      cov(i)(j) - (lam1 * v1(i) * v1(j)) / vtv
    }
    val (y3b, lam2) = chain(cov2)
    val m3a = y3a.map(_.abs).max
    val m3b = y3b.map(_.abs).max
    val l1 = y3a.map(y => (y * 1000000 / m3a).toLong)
    val l2 = y3b.map(y => (y * 1000000 / m3b).toLong)
    def d6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val ortho = d6(l1.zip(l2).map { case (p, q) => p * q }.sum.toDouble /
      (math.sqrt(l1.map(v => v * v).sum.toDouble) *
        math.sqrt(l2.map(v => v * v).sum.toDouble)))
    val expect = (0 until dims).map(i =>
      (i.toLong, l1(i), l2(i), lam1.toLong, lam2.toLong, ortho))
    val got = run("q_pca_deflate").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect, s"deflate replay diverged: $got != $expect")
    // NOTE: λ̂₂ ≤ λ̂₁ holds only at convergence — both are Rayleigh
    // quotients of 3-round iterates, and on this corpus's flat spectrum
    // the sf0.001 estimates invert (λ̂₂ = 1.706e10 > λ̂₁ = 1.635e10)
    // while sf0.1 orders correctly; the declared contract is the exact
    // trajectory replay above plus the orthogonality bound, never an
    // eigenvalue ordering the unconverged estimates do not promise.
    assert(lam2 > 0, "second eigenvalue of this covariance is positive")
    assert(math.abs(ortho) < 0.1,
      "deflated component must be near-orthogonal to the first")
  }

  test("wave-r12 q_pca_whiten: projection-moment replay, variance ratio " +
    "near 1e6 ppm") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val dims = 8
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(dims).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray)
    val n = BigInt(vecs.length)
    val s2 = Array.tabulate(dims)(i => BigInt(vecs.map(_(i)).sum))
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val pij = vecs.map(v => BigInt(v(i)) * v(j)).sum
      (n * pij - s2(i) * s2(j)) / (n * n)
    }
    def matvec(a: Array[Array[BigInt]], x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dims)(i => (0 until dims).map(j => a(i)(j) * x(j)).sum)
    def rescale(y: Array[BigInt]): Array[BigInt] = {
      val sc = y.map(_.abs).max / 1000000 + 1
      y.map(_ / sc)
    }
    def chain(a: Array[Array[BigInt]]): (Array[BigInt], BigInt) = {
      val x1 = rescale(matvec(a, Array.fill(dims)(BigInt(1))))
      val x2 = rescale(matvec(a, x1))
      val y3 = matvec(a, x2)
      (y3, y3.zip(x2).map { case (p, q) => p * q }.sum /
        x2.map(b => b * b).sum)
    }
    val (y3a, lam1) = chain(cov)
    val v1 = rescale(y3a)
    val vtv = v1.map(b => b * b).sum
    val cov2 = Array.tabulate(dims, dims) { (i, j) =>
      cov(i)(j) - (lam1 * v1(i) * v1(j)) / vtv
    }
    val (y3b, lam2) = chain(cov2)
    val m3a = y3a.map(_.abs).max
    val m3b = y3b.map(_.abs).max
    val l1 = y3a.map(y => y * 1000000 / m3a)
    val l2 = y3b.map(y => y * 1000000 / m3b)
    // per-row projections, downscaled exactly as the engine (div 1e6)
    val ts = vecs.map { v =>
      val t1 = (0 until dims).map(i => l1(i) * v(i)).sum / 1000000
      val t2 = (0 until dims).map(i => l2(i) * v(i)).sum / 1000000
      (t1, t2)
    }
    val (st1, st2) = (ts.map(_._1).sum, ts.map(_._2).sum)
    val q1 = ts.map(t => t._1 * t._1).sum
    val q2 = ts.map(t => t._2 * t._2).sum
    val c12 = ts.map(t => t._1 * t._2).sum
    val var1 = (n * q1 - st1 * st1) / (n * n)
    val var2 = (n * q2 - st2 * st2) / (n * n)
    val cov12 = (n * c12 - st1 * st2) / (n * n)
    val ll1 = l1.map(v => v * v).sum
    val ll2 = l2.map(v => v * v).sum
    val r1 = (var1 * BigInt("1000000000000000000") / (lam1 * ll1)).toLong
    val r2 = (var2 * BigInt("1000000000000000000") / (lam2 * ll2)).toLong
    def d6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val corr = d6(cov12.toDouble /
      math.sqrt(var1.toDouble * var2.toDouble))
    val got = run("q_pca_whiten").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSeq
    val expect = Seq((n.toLong, r1, r2, corr, lam1.toLong, lam2.toLong))
    assert(got == expect, s"whiten replay diverged: $got != $expect")
    // the whitening identity: variance along an eigen direction equals
    // its eigenvalue, so each ratio sits near 1e6 ppm up to the
    // power-iteration residual (flat spectrum ⇒ percent-level, not ppm)
    assert(math.abs(r1 - 1000000L) < 100000, s"var1 ratio off: $r1")
    assert(math.abs(r2 - 1000000L) < 100000, s"var2 ratio off: $r2")
    assert(math.abs(corr) < 0.5,
      "projected components must be far from collinear")
  }

  test("wave-r11 q_conformal_interval: split + fit + selection replay, " +
    "guaranteed calibration coverage") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    def d6(x: Double): Double = {
      val b = new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      b.doubleValue
    }
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), hour(col("ts")).cast("long"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def train(id: Long) = ((id * 2654435761L) % 4294967296L) % 100 < 80
    val tr = ev.filter(e => train(e._1)); val cal = ev.filterNot(e => train(e._1))
    val n = tr.length.toDouble
    // decimal-exact sums as the engine's dsum does (round each term to
    // the 1e-6 grid, sum exactly)
    def ds(vs: Seq[Double]): Double =
      vs.map(v => BigDecimal(d6(v))).sum.toDouble
    val sx = ds(tr.map(_._2.toDouble)); val sy = ds(tr.map(_._3))
    val sxx = ds(tr.map(e => (e._2 * e._2).toDouble))
    val sxy = ds(tr.map(e => e._2.toDouble * e._3))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val rs = cal.map(e => math.abs(e._3 - (icept + slope * e._2))).sorted
    val nCal = rs.length.toLong
    val k = (9 * (nCal + 1) + 9) / 10
    val q90 = rs((k - 1).toInt)
    val nLeQ = rs.count(_ <= q90).toLong
    val got = run("q_conformal_interval").head()
    assert(got.getLong(0) == tr.length.toLong && got.getLong(1) == nCal)
    assert(got.getLong(2) == k, "conformal rank k = ceil(0.9 (n+1))")
    assert(got.getDouble(3) == d6(slope) && got.getDouble(4) == d6(icept),
      "fit replay")
    assert(got.getDouble(5) == d6(q90), "type-1 selected quantile replay")
    assert(got.getLong(6) == nLeQ * 1000000L / nCal)
    assert(got.getLong(6) >= 900000L,
      "conformal calibration coverage must hold by construction")
  }

  test("wave-r11 q_did_effect: four-cell estimator replay") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    def d6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def arm(u: Long) = ((u * 2654435761L) % 4294967296L) % 100 < 80
    val splitUs = java.time.Instant.parse("2024-01-16T00:00:00Z")
      .toEpochMilli * 1000L
    val psplitUs = java.time.Instant.parse("2024-01-08T00:00:00Z")
      .toEpochMilli * 1000L
    // per-user decimal-exact period sums (round each value to the
    // 1e-6 grid, sum exactly), as the engine's DECIMAL(30,6) cast does
    def per(pred: ((Long, Long, Double)) => Boolean): Map[Long, BigDecimal] =
      ev.groupBy(_._1).map { case (u, rows) =>
        u -> rows.filter(pred).map(r => BigDecimal(d6(r._3))).sum }
    val pre = per(_._2 < splitUs); val post = per(_._2 >= splitUs)
    val ppre = per(_._2 < psplitUs)
    val ppost = per(r => r._2 >= psplitUs && r._2 < splitUs)
    val users = ev.map(_._1).distinct
    def cells(m: Map[Long, BigDecimal], t: Boolean): (Double, Long) = {
      val us = users.filter(u => arm(u) == t)
      (us.map(u => m(u)).sum.toDouble, us.length.toLong)
    }
    def did(a: Map[Long, BigDecimal], b: Map[Long, BigDecimal]): Double = {
      val (sqT, nT) = cells(b, true); val (spT, _) = cells(a, true)
      val (sqC, nC) = cells(b, false); val (spC, _) = cells(a, false)
      d6((sqT / nT - spT / nT) - (sqC / nC - spC / nC))
    }
    val got = run("q_did_effect").head()
    assert(got.getLong(0) == users.count(arm) &&
      got.getLong(1) == users.count(u => !arm(u)))
    assert(got.getDouble(2) == did(pre, post), "DID replay")
    assert(got.getDouble(3) == did(ppre, ppost), "placebo DID replay")
  }

  test("wave-r11 q_survival_km: product-limit replay, risk-set algebra") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    def run(name: String) = SparkEntry.queries(name)(spark, sf)
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime))
    val gmax = ev.map(_._3).max
    def day(ms: Long): Long = Math.floorDiv(ms, 86400000L)
    val perUser = ev.groupBy(_._1).values.map { rows =>
      val fe = rows.map(_._3).min
      val fp = rows.filter(_._2 == "purchase").map(_._3)
        .minOption
      fp match {
        case Some(p) => (day(p) - day(fe), 1L)
        case None => (day(gmax) - day(fe), 0L)
      }
    }.toSeq
    val daily = perUser.groupBy(_._1).toSeq.map { case (t, us) =>
      (t, us.map(_._2).sum, us.size.toLong - us.map(_._2).sum)
    }.sortBy(_._1)
    val nAll = perUser.size.toLong
    var cum = 0L; var lnSum = 0L; var dead = false
    val expect = daily.map { case (t, d2, c2) =>
      val nRisk = nAll - cum
      cum += d2 + c2
      if (d2 >= nRisk) dead = true
      if (!dead && d2 < nRisk)
        lnSum += new java.math.BigDecimal(
          math.log((nRisk - d2).toDouble / nRisk) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      val kmLn: Option[Long] = if (dead) None else Some(lnSum)
      val surv = if (dead) 0L else new java.math.BigDecimal(
        math.exp(lnSum.toDouble / 1e6) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      (t, nRisk, d2, c2, kmLn, surv)
    }
    val got = run("q_survival_km").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))).toSeq
    assert(got == expect, s"KM replay diverged: $got != $expect")
    // structural: risk sets strictly decrease, subjects conserve,
    // survival is monotone non-increasing
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
    assert(got.map(r => r._3 + r._4).sum == nAll)
    val survs = got.map(_._6)
    assert(survs.zip(survs.tail).forall { case (a, b) => b <= a },
      "survival curve must be non-increasing")
  }

  test("wave-r11 q_fdr_bh: joint battery, integer step-up replay, " +
    "normal-p replay, BH conservatism") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val rows = SparkEntry.queries("q_fdr_bh")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val m = rows.length.toLong
    assert(rows.forall(_._4 == m), "m_tests column = battery size")
    // three families, schema-bounded widths
    val fam = rows.groupBy(_._1).view.mapValues(_.size).toMap
    assert(fam("perm_mean") == 10 && fam("mw_rank") == 10)
    val nSrc = graft.tables.Tables.documents(spark, sf)
      .select(col("source")).distinct().count().toInt
    assert(fam("ks_nchars") == nSrc * (nSrc - 1) / 2)
    // ranks are exactly 1..m and p is nondecreasing along them
    val byRank = rows.sortBy(_._5)
    assert(byRank.map(_._5).toSeq == (1L to m).toSeq)
    assert(byRank.sliding(2).forall(w => w(0)._3 <= w(1)._3))
    // step-up replay: k* = max{k : p_(k)·m ≤ k·α_ppm}
    def bhKstar(ps: Seq[Long], alphaPpm: Long): Long =
      ps.zipWithIndex.foldLeft(0L) { case (k, (p, i)) =>
        if (p * ps.length <= (i + 1) * alphaPpm) i + 1L else k }
    val kStar = bhKstar(byRank.map(_._3).toSeq, 50000L)
    assert(rows.forall(_._6 == kStar), "engine k_star replay")
    rows.foreach { r =>
      assert(r._7 == (if (r._3 <= 50000L) 1L else 0L), "reject_raw replay")
      assert(r._8 == (if (r._5 <= kStar) 1L else 0L), "reject_bh replay")
    }
    // BH at m tests is never more liberal than the per-test α cut
    assert(rows.forall(r => r._8 <= r._7), "reject_bh under reject_raw")
    // the permutation family's p floor is (0+1)/33 — resolution-bounded
    assert(rows.filter(_._1 == "perm_mean").forall(_._3 >= 1000000L / 33),
      "perm p floor")
    // textbook step-up fixtures — exercise the reject branch, which the
    // observed synthetic corpus does not reach (its battery yields
    // k* = 0 at every SF: the 5–18 marginal raw rejections are exactly
    // what BH exists to adjust away at m = 210)
    assert(bhKstar(Seq(1000L, 5000L, 40000L, 900000L), 50000L) == 2L)
    assert(bhKstar(Seq(60000L, 70000L, 80000L, 90000L), 50000L) == 0L)
    // Mann–Whitney normal-p replay: brute-force U + tie term in the
    // JVM, then the IDENTICAL A&S chain — must land on the same ppm
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val types = ev.map(_._1).distinct.sorted
    for (ta <- types; tb <- types if ta < tb) {
      val as = ev.filter(_._1 == ta).map(_._2)
      val bs = ev.filter(_._1 == tb).map(_._2)
      val u2a = as.map(x => 2L * bs.count(_ < x) + bs.count(_ == x)).sum
      val pooled = (as ++ bs).groupBy(identity).values.map(_.size.toLong)
      val tie = pooled.map(t => t * t * t - t).sum
      val n1 = as.length.toDouble; val n2 = bs.length.toDouble
      val nn = n1 + n2
      val az = math.abs((u2a - n1 * n2) /
        (2.0 * math.sqrt((n1 * n2 / 12.0) *
          ((nn + 1) - tie / (nn * (nn - 1))))))
      val tn = 1.0 / (1.0 + 0.2316419 * az)
      val p = math.min(1.0, 2.0 * (math.exp(-az * az / 2.0) *
        0.3989422804014327 *
        (tn * (0.319381530 + tn * (-0.356563782 + tn * (1.781477937 +
          tn * (-1.821255978 + tn * 1.330274429)))))))
      val ppm = math.round(p * 1000000)
      val got = rows.find(r => r._1 == "mw_rank" && r._2 == s"$ta|$tb")
        .get._3
      assert(math.abs(got - ppm) <= 1L, s"mw $ta|$tb: $got vs $ppm")
    }
  }

  test("r13 q_bradley_terry: full imperative MM replay (comparison " +
    "mining + 5 integer floor-div rounds) matches the declared query") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"),
        col("event_type"), round(col("value") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getString(2)), r.getLong(3)))
    val g = ev.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byUD = g.toSeq.map { case ((u, d, t), v) => ((u, d), (t, v)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    val pair = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    for ((_, ms) <- byUD; c <- ms.combinations(2)) {
      val Seq((ta, va), (tb, vb)) = c
      if (va != vb) {
        val (g0, w0) = pair.getOrElse((ta, tb), (0L, 0L))
        pair((ta, tb)) = (g0 + 1, w0 + (if (va > vb) 1L else 0L))
      }
    }
    val types = g.keys.map(_._3).toSeq.distinct.sorted
    val wins = types.map(t => t -> pair.collect {
      case ((a, b), (n, wa)) if a == t => wa
      case ((a, b), (n, wa)) if b == t => n - wa
    }.sum).toMap
    val nGames = types.map(t => t -> pair.collect {
      case ((a, b), (n, _)) if a == t || b == t => n }.sum).toMap
    var p = types.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val s = types.map { i => i -> types.filter(_ != i).map { j =>
        val key = if (i < j) (i, j) else (j, i)
        pair.get(key).map { case (n, _) =>
          n * 1000000000L / math.max(p(i) + p(j), 1L) }.getOrElse(0L)
      }.sum }.toMap
      p = types.map(i => i -> (if (s(i) == 0L) 1000000L
        else wins(i) * 1000000000L / s(i))).toMap
    }
    val expect = types.map(t => (t, nGames(t), wins(t), p(t)))
      .sortBy { case (t, _, _, st) => (-st, t) }
      .zipWithIndex.map { case ((t, n, w, st), k) =>
        (t, n, w, st, k + 1L) }
    val rows = SparkEntry.queries("q_bradley_terry")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows == expect, s"BT MM replay diverged:\n$rows\nvs\n$expect")
    // every decided game contributes exactly one win
    assert(rows.map(_._3).sum * 2 == rows.map(_._2).sum,
      "wins/games identity broken")
  }

  test("r13 q_mmd_embedding: imperative split-mean / MMD2 replay on " +
    "the shared Knuth split") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).map(f =>
        new java.math.BigDecimal(f.toDouble * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
        .toArray)
    def knuthTrain(id: Long) =
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 < 80
    val (tr, te) = vecs.partition(v => knuthTrain(v._1))
    def mean(vs: Array[(Long, Array[Long])], i: Int): Long =
      vs.map(_._2(i)).sum / vs.length // truncating, both engines
    val deltas = (0 until 8).map(i => mean(tr, i) - mean(te, i))
    val rows = SparkEntry.queries("q_mmd_embedding")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    (0 until 8).foreach { i =>
      val (nTr, nTe, mTr, mTe, d, d2) = rows(i.toLong)
      assert(nTr == tr.length && nTe == te.length, "split sizes")
      assert(mTr == mean(tr, i) && mTe == mean(te, i), s"means dim $i")
      assert(d == deltas(i) && d2 == deltas(i) * deltas(i), s"delta $i")
    }
    assert(rows(-1L)._6 == deltas.map(d => d * d).sum,
      "certificate row must carry the summed MMD2")
  }

  test("r13 q_perplexity_buckets: terciles partition the filter's " +
    "scored docs with ordered, non-overlapping nll ranges") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    val buckets = SparkEntry.queries("q_perplexity_buckets")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    val scoredPerLang = SparkEntry.queries("q_perplexity_filter")(spark, sf)
      .join(graft.tables.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    buckets.groupBy(_._1).foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(0L, 1L, 2L),
        s"$lang must have exactly buckets 0/1/2")
      assert(sorted.map(_._3).sum == scoredPerLang(lang),
        s"$lang buckets must partition the scored docs")
      // tercile sizes differ by at most 1 (the exact integer rule)
      assert(sorted.map(_._3).max - sorted.map(_._3).min <= 1L,
        s"$lang tercile sizes unbalanced: ${sorted.map(_._3).toSeq}")
      // head max <= middle min etc. (ranges ordered, non-overlapping)
      sorted.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo._5 <= hi._4,
          s"$lang bucket ${lo._2} max nll ${lo._5} > next min ${hi._4}")
      }
    }
  }
}


