package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the wave-2 curation operators
  * (graft.queries.Curation) — properties the DuckDB parity gate can't
  * express because they relate the output to the input, not to a
  * reference result. */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("mixture plan: epoch ceil covers the target; token totals conserved") {
    val plan = run("q_mixture_plan").cache()
    // n_epochs is the exact ceiling: (n_epochs-1)·lang < target ≤ n_epochs·lang
    val bad = plan.filter(
      col("n_epochs") * col("lang_tokens") < col("target_tokens") ||
      (col("n_epochs") - lit(1)) * col("lang_tokens") >= col("target_tokens"))
    assert(bad.count() == 0, "n_epochs must be the exact ceiling")
    val total = plan.agg(sum(col("lang_tokens"))).head().getLong(0)
    val truth = graft.tables.Tables.documents(spark, sf)
      .select(size(filter(split(col("text"), " "), t => t =!= ""))
        .cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == truth, s"plan tokens $total != corpus tokens $truth")
  }

  test("curriculum order is a permutation with monotone phases, full batches") {
    val cur = run("q_curriculum_order").cache()
    val n = cur.count()
    assert(cur.select(col("doc_id")).distinct().count() == n)
    assert(cur.agg(max(col("pos"))).head().getLong(0) == n
      && cur.select(col("pos")).distinct().count() == n,
      "pos must be a 1..n permutation")
    // phases never interleave: max pos of phase p < min pos of phase p+1
    val ranges = cur.groupBy(col("phase"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"),
        count(lit(1)).as("cnt"))
      .orderBy(col("phase")).collect()
    assert(ranges.length == 3, "all three phases must be non-empty")
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
        "curriculum phases must not interleave")
      case _ => ()
    }
    // every batch except the last holds exactly 32 docs
    val under = cur.groupBy(col("batch_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 32 && col("batch_id") =!= (n - 1) / 32).count()
    assert(under == 0, "only the final batch may be ragged")
  }

  test("curriculum order plan: every WindowExec is partitioned " +
    "(r13 directive 1 — no corpus-scale global sort)") {
    val plan = run("q_curriculum_order").queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "the sharded rank window must survive")
    val unpart = windows.filter(_.partitionSpec.isEmpty)
    assert(unpart.isEmpty,
      s"unpartitioned WindowExec in the curriculum plan: ${unpart.headOption}")
    // the sharded form is a real window over (phase, shard): 48 groups
    assert(windows.exists(_.partitionSpec.size == 2),
      "expected the (phase, shard)-partitioned rank window")
  }

  test("reservoir sample is exactly min(k, stratum) per lang and reproducible") {
    val a = run("q_sample_reservoir").cache()
    val sizes = graft.tables.Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val got = a.groupBy(col("lang")).agg(count(lit(1)).as("k"))
    val bad = sizes.join(got, Seq("lang"), "left")
      .filter(coalesce(col("k"), lit(0L)) =!= least(col("n"), lit(10L)))
    assert(bad.count() == 0, "per-stratum sample size must be min(k, |stratum|)")
    val b = run("q_sample_reservoir")
    assert(a.collect().toSeq == b.collect().toSeq, "sample must be deterministic")
  }

  test("near-dup decontamination flags exactly the cross-split 0.5-edges") {
    val leaks = run("q_decontam_neardup").cache()
    assert(leaks.filter(col("split_a") === col("split_b")).count() == 0)
    assert(leaks.filter(col("jaccard") < 0.5).count() == 0)
    // leak set == edge set minus same-split edges (independent recount)
    val docs = graft.tables.Tables.documents(spark, sf)
    val edges = graft.llm.TextDedup
      .jaccardEdgesShared(docs, "doc_id", "text", 0.5, sf)
    val expected = edges
      .withColumn("ba", pmod(col("id_a") * lit(2654435761L),
        lit(4294967296L)) % 100)
      .withColumn("bb", pmod(col("id_b") * lit(2654435761L),
        lit(4294967296L)) % 100)
      .filter(!(((col("ba") < 80) && (col("bb") < 80)) ||
        ((col("ba") >= 80) && (col("ba") < 90)
          && (col("bb") >= 80) && (col("bb") < 90)) ||
        ((col("ba") >= 90) && (col("bb") >= 90))))
      .count()
    assert(leaks.count() == expected,
      s"leak count ${leaks.count()} != recomputed $expected")
  }

  test("token packing conserves docs and tokens; bins are ordered runs") {
    val packed = run("q_token_packing").cache()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("lang"),
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("n")).as("toks"))
    val fromBins = packed.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("docs"), sum(col("bin_toks")).as("toks"))
    val mism = docs.join(fromBins, "lang")
      .filter(docs("docs") =!= fromBins("docs") || docs("toks") =!= fromBins("toks"))
    assert(mism.count() == 0, "per-lang doc/token totals must be conserved")
    // bins within a lang are consecutive from 0: a doc can span a
    // boundary, but every 256-token window of the concat stream is
    // covered, so no bin index is skipped
    val gaps = packed.groupBy(col("lang"))
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(gaps.count() == 0, "bins must be 0..n-1 per lang with no gaps")
  }

  test("gopher pass flag is exactly the conjunction of its rules") {
    val bad = run("q_gopher_rules").filter(
      col("pass") =!= (col("r_wc") === 1 && col("r_mwl") === 1 &&
        col("r_stop") === 1 && col("r_dom") === 1).cast("long"))
    assert(bad.count() == 0)
    // the battery must discriminate: some pass, some fail on this corpus
    val n = run("q_gopher_rules").agg(
      sum(col("pass")).as("p"), count(lit(1)).as("n")).head()
    assert(n.getLong(0) > 0 && n.getLong(0) < n.getLong(1),
      s"rule battery should split the corpus, got ${n.getLong(0)}/${n.getLong(1)}")
  }

  test("pii redaction leaves no email or long digit run behind") {
    val leaked = run("q_pii_redact").filter(
      col("redacted").rlike("[a-z0-9._]+@[a-z0-9.]+[a-z]") ||
        col("redacted").rlike("[0-9]{6,}"))
    assert(leaked.count() == 0)
    // and it actually redacted something
    val n = run("q_pii_redact")
      .agg(sum(col("n_email")).as("e"), sum(col("n_idrun")).as("i")).head()
    assert(n.getLong(0) > 0 && n.getLong(1) > 0)
  }

  test("domain mix weights invert the shard shares") {
    // weight_ppm * cnt * n_langs ≈ total * 1e6 (integer division truncates
    // once, so the product is within n_langs*cnt of the target)
    val rows = run("q_domain_mix").collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt"); val w = r.getAs[Long]("weight_ppm")
      val lhs = w * cnt * rows.length
      assert(lhs <= total * 1000000L && lhs > total * 1000000L - rows.length * cnt,
        s"weight ${r} not the truncated inverse share")
    }
  }

  test("dsir weights rank the target slice above the rest") {
    val docs = graft.tables.Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val llr = run("q_dsir_weights").join(docs, "doc_id")
      .groupBy((col("source") === "src0").as("is_target"))
      .agg(avg(col("llr_e4").cast("double") / col("n_toks")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(llr(true) > llr(false),
      s"target-slice mean per-token LLR ${llr(true)} must exceed rest ${llr(false)}")
  }

  test("scd2 intervals tile each user's timeline without overlap") {
    val iv = run("q_scd2_intervals")
    // within a user, every interval's valid_to equals the next
    // interval's valid_from (lead over the same ordering), and exactly
    // one interval per user is open (is_current)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("valid_from_us"))
    val broken = iv
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
    assert(broken.count() == 0, "intervals must abut exactly")
    val open = iv.groupBy(col("user_id"))
      .agg(sum(col("is_current")).as("n_open"))
      .filter(col("n_open") =!= 1)
    assert(open.count() == 0, "exactly one open interval per user")
  }

  test("gapfill emits a dense day range per user containing all observed days") {
    val gf = run("q_timeseries_gapfill")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val gaps = gf.withColumn("prev_day", lag(col("day"), 1).over(w))
      .filter(col("prev_day").isNotNull && col("day") =!= col("prev_day") + 1)
    assert(gaps.count() == 0, "day sequence must be dense per user")
    val observed = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / 86400000000L).cast("long").as("day"))
      .distinct()
    val missing = observed.join(gf.filter(col("n") > 0),
      Seq("user_id", "day"), "left_anti")
    assert(missing.count() == 0, "every observed day must appear with n>0")
  }

  test("attribution conserves purchases: attributed <= total, channels in 0..4") {
    val at = run("q_attribution_last_touch").collect()
    val attributed = at.map(_.getAs[Long]("n_purchases")).sum
    val total = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(attributed <= total,
      s"attributed $attributed must not exceed purchases $total")
    assert(at.forall { r =>
      val c = r.getAs[Long]("channel"); c >= 0 && c <= 4 })
  }

  test("oov rate: ppm consistent with counts and bounded") {
    val bad = run("q_oov_rate").filter(
      col("oov_ppm") =!= expr("n_oov * 1000000 div n_toks") ||
        col("n_oov") > col("n_toks") || col("oov_ppm") > 1000000L)
    assert(bad.count() == 0)
  }

  test("int8 quantization: zero error rows, every vector saturates its max") {
    val qz = run("q_embed_quantize").cache()
    assert(qz.filter(col("n_err") =!= 0L).count() == 0,
      "reconstruction error must stay within deq/2 by construction")
    assert(qz.filter(col("n_elems") =!= col("n_vecs") * 64).count() == 0)
    // the max-|x| element of each non-zero vector quantizes to exactly ±127
    assert(qz.filter(col("n_sat") < col("n_vecs")).count() == 0,
      "each vector contributes at least one saturated element")
    val total = qz.agg(sum(col("n_vecs"))).head().getLong(0)
    assert(total == graft.tables.Tables.embeddings(spark, sf).count())
  }

  test("vocab coverage curve is monotone with contiguous ranks") {
    val cv = run("q_vocab_coverage").collect()
    assert(cv.map(_.getAs[Int]("rank")).toSeq == (1 to cv.length))
    val cnts = cv.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      "counts must be nonincreasing in rank")
    val cov = cv.map(_.getAs[Long]("cov_ppm"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b } &&
      cov.last <= 1000000L, "coverage ppm must be nondecreasing and <= 1e6")
  }

  test("winnowing guarantee: docs sharing an 11+ char substring share a fingerprint") {
    import spark.implicits._
    // two synthetic docs sharing a 20-char run, plus noise docs
    val docs = Seq(
      (1L, "abcdefghijklmnopqrst shared run here xxxxxxx"),
      (2L, "yyyyyyy abcdefghijklmnopqrst different tail"),
      (3L, "completely unrelated content zzzzzz qqqqqq")
    ).toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), expr(
        "transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))").as("codes"))
      .select(col("doc_id"), expr(
        """transform(sequence(1, size(codes) - 7),
             i -> aggregate(slice(codes, i, 8), 0L,
                    (acc, c) -> pmod(acc * 31 + c, 1000000007L)))""").as("hs"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(1, size(hs) - 3),
             j -> array_min(slice(hs, j, 4)))"""))).as("fp"))
    val shared = fps.filter(col("doc_id") === 1).select(col("fp"))
      .intersect(fps.filter(col("doc_id") === 2).select(col("fp")))
    assert(shared.count() > 0, "winnowing must fingerprint the shared run")
  }

  test("bpe merge rounds replay the textbook greedy trainer exactly") {
    // independent driver-side oracle: plain-Scala BPE — count adjacent
    // pairs, pick (max count, lexicographic tie), merge LEFT-TO-RIGHT
    // NON-OVERLAPPING with an imperative scan. The relational runs+parity
    // formulation in q_bpe_merges must reproduce this trajectory bit for
    // bit, including the x=y run case the parity logic exists for.
    def mergeWord(w: Array[String], x: String, y: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == x && w(i + 1) == y) {
          b += (x + y); i += 2
        } else { b += w(i); i += 1 }
      }
      b.result()
    }
    var words: Array[Array[String]] = graft.tables.Tables
      .documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .map(_.map(_.toString).toArray)
    val expect = (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { w =>
        if (w.length >= 2) w.sliding(2).foreach { p =>
          val k = (p(0), p(1))
          counts.update(k, counts.getOrElse(k, 0L) + 1L)
        }
      }
      val ((x, y), n) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      words = words.map(w => mergeWord(w, x, y))
      (r.toLong, s"$x $y", n)
    }
    val got = run("q_bpe_merges").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expect, s"bpe trajectory diverged: $got != $expect")
    assert(got.size == 3 && got.map(_._3).forall(_ > 0))
    // the emitted vocabulary artifact must equal the replay's final
    // symbol counts under the same (count desc, symbol asc) top-30
    val vocabExpect = words.flatten
      .groupBy(identity).map { case (s2, v) => (s2, v.size.toLong) }.toSeq
      .sortBy { case (s2, n) => (-n, s2) }.take(30)
    val vocabGot = run("q_bpe_vocab").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(vocabGot == vocabExpect,
      s"bpe vocab diverged: $vocabGot != $vocabExpect")
    // at least one merged (multi-char) symbol must have survived into
    // the vocabulary — otherwise the trainer did nothing
    assert(vocabGot.exists(_._1.length > 1),
      "no merged symbol reached the vocabulary top-30")
  }

  test("bpe tokenize applies train-split merges to held-out docs exactly") {
    // independent driver-side oracle: imperative plain-Scala trainer on
    // the 80% Knuth-hash train bucket, then imperative APPLICATION of
    // the trained winners (in order) to the held-out 20%, aggregated
    // per lang — must equal q_bpe_tokenize bit for bit.
    def mergeWord(w: Array[String], x: String, y: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == x && w(i + 1) == y) {
          b += (x + y); i += 2
        } else { b += w(i); i += 1 }
      }
      b.result()
    }
    def inTrain(id: Long): Boolean =
      ((id * 2654435761L) % 4294967296L) % 100 < 80
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    var trainWords: Array[Array[String]] = docs
      .filter(d => inTrain(d._1))
      .flatMap(_._3.split(" ").filter(_.nonEmpty))
      .filter(_.length >= 2).map(_.map(_.toString).toArray)
    val winners = (1 to 3).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      trainWords.foreach { w =>
        if (w.length >= 2) w.sliding(2).foreach { p =>
          val k = (p(0), p(1))
          counts.update(k, counts.getOrElse(k, 0L) + 1L)
        }
      }
      val ((x, y), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      trainWords = trainWords.map(w => mergeWord(w, x, y))
      (x, y)
    }
    val expect = docs.filter(d => !inTrain(d._1))
      .map { case (_, lang, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val toks = ws.map { w =>
          if (w.length < 2) 1L
          else winners.foldLeft(w.map(_.toString).toArray) {
            case (st, (x, y)) => mergeWord(st, x, y)
          }.length.toLong
        }.sum
        (lang, (1L, ws.length.toLong, toks, ws.map(_.length.toLong).sum))
      }
      .groupBy(_._1).view.mapValues { g =>
        val vs = g.map(_._2)
        (vs.map(_._1).sum, vs.map(_._2).sum, vs.map(_._3).sum, vs.map(_._4).sum)
      }.toMap
      .map { case (lang, (d2, w2, t2, c2)) =>
        (lang, d2, w2, t2, c2, c2 * 10000 / t2)
      }.toSeq.sortBy(_._1)
    val got = run("q_bpe_tokenize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"bpe tokenize diverged: $got != $expect")
    // the tokenizer must actually compress something: at least one lang
    // packs more than one char per token on held-out data
    assert(got.exists(_._6 > 10000),
      "trained merges produced no compression on held-out docs")
  }

  test("wordpiece merge rounds replay the likelihood-gain trainer exactly") {
    // independent driver-side oracle: the BPE replay's merge scan with
    // the WordPiece winner — argmax of n_xy·1e12 / (n_x·n_y) under
    // exact BigInt division, ties (x, y)
    def mergeWord(w: Array[String], x: String, y: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == x && w(i + 1) == y) {
          b += (x + y); i += 2
        } else { b += w(i); i += 1 }
      }
      b.result()
    }
    var words: Array[Array[String]] = graft.tables.Tables
      .documents(spark, sf).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .map(_.map(_.toString).toArray)
    val expect = (1 to 3).map { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc2 = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { w =>
        w.foreach(s2 => sc2.update(s2, sc2.getOrElse(s2, 0L) + 1L))
        if (w.length >= 2) w.sliding(2).foreach { p =>
          val k = (p(0), p(1))
          pc.update(k, pc.getOrElse(k, 0L) + 1L)
        }
      }
      val scoredPairs = pc.toSeq.map { case ((x, y), n) =>
        val score = (BigInt(n) * BigInt(1000000000000L) /
          (BigInt(sc2(x)) * BigInt(sc2(y)))).toLong
        ((x, y), n, score)
      }
      val ((x, y), n, score) = scoredPairs
        .minBy { case ((a, b), _, sc3) => (-sc3, a, b) }
      words = words.map(w => mergeWord(w, x, y))
      (r.toLong, s"$x $y", n, score)
    }
    val got = run("q_wordpiece_merges").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"wordpiece trajectory diverged: $got != $expect")
    // the two families must actually DISAGREE on this corpus — the
    // likelihood winner is not the count winner (else the score CTE
    // proves nothing)
    val bpe = run("q_bpe_merges").collect().map(_.getString(1)).toSet
    assert(got.map(_._2).toSet != bpe,
      "wordpiece and bpe picked identical merges — scoring untested")
  }

  test("wordpiece tokenize applies train-split likelihood merges to " +
    "held-out docs exactly") {
    // independent driver-side oracle: imperative likelihood-gain
    // trainer on the 80% Knuth-hash bucket (the wordpiece winner rule
    // over the bpe merge scan), then imperative application of the
    // trained winners in order to the held-out 20%, per-lang rollup —
    // must equal q_wordpiece_tokenize bit for bit.
    def mergeWord(w: Array[String], x: String, y: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == x && w(i + 1) == y) {
          b += (x + y); i += 2
        } else { b += w(i); i += 1 }
      }
      b.result()
    }
    def inTrain(id: Long): Boolean =
      ((id * 2654435761L) % 4294967296L) % 100 < 80
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    var trainWords: Array[Array[String]] = docs
      .filter(d => inTrain(d._1))
      .flatMap(_._3.split(" ").filter(_.nonEmpty))
      .filter(_.length >= 2).map(_.map(_.toString).toArray)
    val winners = (1 to 3).map { _ =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val sc2 = scala.collection.mutable.Map.empty[String, Long]
      trainWords.foreach { w =>
        w.foreach(s2 => sc2.update(s2, sc2.getOrElse(s2, 0L) + 1L))
        if (w.length >= 2) w.sliding(2).foreach { p =>
          val k = (p(0), p(1))
          pc.update(k, pc.getOrElse(k, 0L) + 1L)
        }
      }
      val ((x, y), _) = pc.toSeq.map { case ((a, b), n) =>
        ((a, b), (BigInt(n) * BigInt(1000000000000L) /
          (BigInt(sc2(a)) * BigInt(sc2(b)))).toLong)
      }.minBy { case ((a, b), sc3) => (-sc3, a, b) }
      trainWords = trainWords.map(w => mergeWord(w, x, y))
      (x, y)
    }
    val expect = docs.filter(d => !inTrain(d._1))
      .map { case (_, lang, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val toks = ws.map { w =>
          if (w.length < 2) 1L
          else winners.foldLeft(w.map(_.toString).toArray) {
            case (st, (x, y)) => mergeWord(st, x, y)
          }.length.toLong
        }.sum
        (lang, (1L, ws.length.toLong, toks, ws.map(_.length.toLong).sum))
      }
      .groupBy(_._1).view.mapValues { g =>
        val vs = g.map(_._2)
        (vs.map(_._1).sum, vs.map(_._2).sum, vs.map(_._3).sum, vs.map(_._4).sum)
      }.toMap
      .map { case (lang, (d2, w2, t2, c2)) =>
        (lang, d2, w2, t2, c2, c2 * 10000 / t2)
      }.toSeq.sortBy(_._1)
    val got = run("q_wordpiece_tokenize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"wordpiece tokenize diverged: $got != $expect")
    assert(got.exists(_._6 > 10000),
      "trained wordpiece merges produced no compression on held-out docs")
  }

  test("unigram-lm hard-EM replays the imperative trainer exactly; " +
    "held-out apply matches") {
    // independent driver-side oracle: plain-Scala hard-EM with its own
    // composition enumeration, seed, scoring, and Viterbi — the
    // relational trainer must reproduce every count and score exactly
    def comps(n: Int): Seq[Seq[Int]] =
      if (n == 0) Seq(Seq.empty[Int])
      else (1 to math.min(4, n)).flatMap(p => comps(n - p).map(p +: _))
    val compTab: Map[Int, Seq[(Int, Seq[Int])]] =
      (1 to 8).map(n => n -> comps(n).sortBy(_.mkString).zipWithIndex
        .map { case (c, i) => (i, c) }).toMap
    def trainPred(id: Long): Boolean =
      ((id * 2654435761L) % 4294967296L) % 100 < 80
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val wc: Map[String, Long] = docs.filter(d => trainPred(d._1))
      .flatMap(_._3.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val seed = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, n) =>
      for (i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)) {
        val p = w.substring(i, i + l)
        seed.update(p, seed.getOrElse(p, 0L) + n)
      }
    }
    val top64 = seed.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(64)
    var vocab: Map[String, Long] =
      (seed.filter(_._1.length == 1).toSeq ++ top64).toMap
    def lpOf(v: Map[String, Long]): Map[String, Long] = {
      val tot = v.values.sum; val nv = v.size.toLong
      v.map { case (p, c) =>
        val x = math.log((c + 1).toDouble / (tot + nv)) * 1000000.0
        p -> new java.math.BigDecimal(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      }
    }
    def pieces(w: String, parts: Seq[Int]): Seq[String] = {
      var off = 0
      parts.map { l => val p = w.substring(off, off + l); off += l; p }
    }
    def best(w: String, lp: Map[String, Long]): Option[(Int, Int, Long)] = {
      val cands = compTab(w.length).flatMap { case (cid, parts) =>
        val ps = pieces(w, parts)
        if (ps.forall(lp.contains))
          Some((cid, parts.length, ps.map(lp).sum))
        else None
      }
      if (cands.isEmpty) None
      else Some(cands.minBy { case (cid, np, s) => (-s, np, cid) })
    }
    (1 to 3).foreach { _ =>
      val lp = lpOf(vocab)
      val usage = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, n) =>
        if (w.length <= 8) best(w, lp).foreach { case (cid, _, _) =>
          pieces(w, compTab(w.length).find(_._1 == cid).get._2)
            .foreach(p => usage.update(p, usage.getOrElse(p, 0L) + n))
        }
      }
      vocab = vocab.map { case (p, _) => p -> usage.getOrElse(p, 0L) }
    }
    val lpF = lpOf(vocab)
    val expect = vocab.toSeq
      .map { case (p, c) => (p, p.length.toLong, c, lpF(p)) }
      .sortBy { case (p, _, c, _) => (-c, p) }
    val got = run("q_unigram_lm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"unigram EM diverged: $got != $expect")
    assert(got.exists(t => t._2 > 1 && t._3 > 0),
      "no multi-char piece earned hard counts")
    // held-out apply replay through the SAME final scores
    val perLang = docs.filter(d => !trainPred(d._1))
      .flatMap { case (_, lang, text) =>
        text.split(" ").filter(_.nonEmpty).map(w => (lang, w)) }
      .groupBy(_._1).toSeq.map { case (lang, ws) =>
        var (nw, noov, np, nc) = (0L, 0L, 0L, 0L)
        ws.foreach { case (_, w) =>
          nw += 1
          (if (w.length <= 8) best(w, lpF) else None) match {
            case Some((_, k, _)) => np += k; nc += w.length
            case None => noov += 1
          }
        }
        (lang, nw, noov, np, nc, nc * 10000L / np)
      }.sortBy(_._1)
    val gotTok = run("q_unigram_tokenize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotTok == perLang,
      s"unigram held-out apply diverged: $gotTok != $perLang")
    assert(gotTok.forall(_._6 >= 10000),
      "unigram pieces can never average shorter than one char")
  }

  test("naive-bayes quality filter: full train + held-out confusion replay") {
    // imperative multinomial-NB replay of q_nb_quality: same Knuth 80/20
    // split, add-one smoothing, round(ln·1e6) integer scores, (score
    // desc, lang) argmax — the query must reproduce it cell for cell
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def isTrain(id: Long) =
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 < 80
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    def rnd6(x: Double) = new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val tr = docs.filter(d => isTrain(d._1))
    val ho = docs.filterNot(d => isTrain(d._1))
    assert(tr.nonEmpty && ho.nonEmpty, "both splits must be populated")
    val trTok = tr.flatMap(d => toks(d._3).map(t => (d._2, t)))
    val clt = trTok.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nl = trTok.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    val vocab = trTok.map(_._2).toSet
    val nv = vocab.size.toLong
    val langs = tr.map(_._2).distinct.sorted
    val lp = (for { l <- langs; t <- vocab } yield (l, t) ->
      rnd6(math.log((clt.getOrElse((l, t), 0L) + 1.0) / (nl(l) + nv)))).toMap
    val oov = langs.map(l => l -> rnd6(math.log(1.0 / (nl(l) + nv)))).toMap
    val dd = tr.length.toLong
    val pri = langs.map(l =>
      l -> rnd6(math.log(tr.count(_._2 == l).toDouble / dd))).toMap
    val preds = ho.flatMap { case (_, trueLang, text) =>
      val cnt = toks(text).groupBy(identity)
        .map { case (t, v) => t -> v.length.toLong }
      if (cnt.isEmpty) None else {
        val best = langs.map { l =>
          val s = pri(l) + cnt.map { case (t, c) =>
            if (vocab(t)) c * lp((l, t)) else c * oov(l) }.sum
          (-s, l)
        }.min._2
        Some((trueLang, best))
      }
    }
    val nho = preds.length.toLong
    val expect = preds.groupBy(identity).toSeq.map { case ((t, p), v) =>
      (t, p, v.length.toLong, v.length.toLong * 1000000L / nho)
    }.sorted
    val got = run("q_nb_quality").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    assert(got == expect, s"NB confusion replay diverged: $got != $expect")
    assert(got.map(_._3).sum == nho,
      "confusion cells must partition the scored held-out docs")
  }

  test("n-gram contamination: imperative 8-gram screen replay") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def isTrain(id: Long) =
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) % 100 < 80
    def grams(t: String): Seq[String] = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length < 8) Seq.empty
      else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" "))
    }
    val evalSet = docs.filterNot(d => isTrain(d._1))
      .flatMap(d => grams(d._2)).toSet
    val expect = docs.filter(d => isTrain(d._1)).flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None else {
        val hit = gs.count(evalSet)
        val ppm = hit.toLong * 1000000L / gs.length
        Some((id, gs.length.toLong, hit.toLong, ppm,
          if (ppm >= 700000L) "contaminated" else "clean"))
      }
    }.sortBy(_._1).toSeq
    val got = run("q_ngram_contamination").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == expect, s"contamination replay diverged")
    assert(got.forall(r => r._3 <= r._2), "hits cannot exceed grams")
  }

  test("temperature mixture: weight-chain replay; the rule provably " +
    "up-samples the smallest lang and down-samples the largest") {
    def rnd6(x: Double) = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val nl = graft.tables.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).sum }
    val w = nl.map { case (l, n) =>
      l -> rnd6(math.exp(0.3 * math.log(n.toDouble)) * 1e6) }
    val nAll = nl.values.sum
    val wAll = w.values.sum
    val expect = nl.keys.toSeq.sorted.map { l =>
      (l, nl(l), nl(l) * 1000000L / nAll, w(l), w(l) * 1000000L / wAll,
        (BigInt(w(l)) * 1000000 * nAll / (BigInt(wAll) * nl(l))).toLong)
    }
    val got = run("q_mixture_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"temperature replay diverged: $got != $expect")
    val byN = got.sortBy(_._2)
    assert(byN.head._6 > 1000000L,
      "smallest lang must be up-sampled (boost > 1e6 ppm)")
    assert(byN.last._6 < 1000000L,
      "largest lang must be down-sampled (boost < 1e6 ppm)")
    // rounded shares must still sum to ~1e6 (integer-truncation slack
    // bounded by the number of langs)
    assert(math.abs(got.map(_._5).sum - 1000000L) <= got.length,
      "temperature shares must partition ppm space")
  }

  test("tokenizer compare: word accounting agrees across all three " +
    "families; winner column follows the fertility totals") {
    val rows = run("q_tokenizer_compare").collect()
    assert(rows.nonEmpty, "comparison must cover the held-out langs")
    rows.foreach { r =>
      // the three pipelines count held-out words independently (token
      // explode ×2 vs word histogram) — they must agree exactly
      assert(r.getLong(4) == 1L,
        s"word accounting diverged for lang ${r.getString(0)}")
      val (b, w, u) = (r.getLong(9), r.getLong(10), r.getLong(11))
      val expect =
        if (b >= w && b >= u) "bpe" else if (u >= w) "unigram"
        else "wordpiece"
      assert(r.getString(12) == expect, "winner must follow the totals")
    }
    // the wordpiece column must come from the wordpiece apply, not a
    // copy of BPE's: on this corpus the two trainers pick different
    // merges (asserted in the trainer spec), so at least one lang's
    // token totals must differ
    assert(rows.exists(r => r.getLong(5) != r.getLong(6)),
      "wordpiece apply column identical to bpe everywhere — suspicious")
  }

  test("r13 q_ngram_contamination_bloom: bloom-gated screen is " +
    "byte-identical to the exact screen (residual join removes FPs)") {
    val exact = run("q_ngram_contamination").collect().toSeq
    val bloom = run("q_ngram_contamination_bloom").collect().toSeq
    assert(exact.nonEmpty, "screen must cover the train split")
    assert(bloom == exact,
      "bloom-gated output diverged from the exact screen")
  }

  test("r13 dataset cartography: imperative jackknife-ensemble margin " +
    "replay (5 NB models from one count pass)") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => d._3.split(" ").exists(_.nonEmpty))
    def foldOf(id: Long) =
      java.lang.Math.floorMod(id * 3266489917L, 4294967296L) % 5
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    def rnd6(x: Double) = new java.math.BigDecimal(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val langs = docs.map(_._2).distinct.sorted
    val byTok = docs.flatMap(d => toks(d._3).map(t => (d._2, foldOf(d._1), t)))
    val cAll = byTok.groupBy(x => (x._1, x._3))
      .map { case (k, v) => k -> v.length.toLong }
    val cF = byTok.groupBy(x => (x._2, x._1, x._3))
      .map { case (k, v) => k -> v.length.toLong }
    val nlAll = byTok.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    val nlF = byTok.groupBy(x => (x._2, x._1))
      .map { case (k, v) => k -> v.length.toLong }
    val vocab = byTok.map(_._3).toSet
    val nv = vocab.size.toLong
    val dd = docs.length.toLong
    val ddF = docs.groupBy(d => foldOf(d._1))
      .map { case (g, v) => g -> v.length.toLong }
    val dl = docs.groupBy(_._2).map { case (l, v) => l -> v.length.toLong }
    val dlF = docs.groupBy(d => (foldOf(d._1), d._2))
      .map { case (k, v) => k -> v.length.toLong }
    def lp(g: Long, l: String, t: String) = rnd6(math.log(
      (cAll.getOrElse((l, t), 0L) - cF.getOrElse((g, l, t), 0L) + 1.0) /
        (nlAll(l) - nlF.getOrElse((g, l), 0L) + nv)))
    // smoothed prior (r13 ADVICE): finite even when a fold holds every
    // doc of a language — matches the engine/oracle declaration
    def pri(g: Long, l: String) = rnd6(math.log(
      (dl(l) - dlF.getOrElse((g, l), 0L) + 1.0) /
        (dd - ddF(g) + langs.size)))
    val expect = docs.map { case (id, trueLang, text) =>
      val cnt = toks(text).groupBy(identity)
        .map { case (t, v) => t -> v.length.toLong }
      val margins = (0L to 4L).map { g =>
        def score(l: String) =
          pri(g, l) + cnt.map { case (t, c) => c * lp(g, l, t) }.sum
        score(trueLang) - langs.filter(_ != trueLang).map(score).max
      }
      val (mn, mx) = (margins.min, margins.max)
      val region = if (mn > 0) "easy" else if (mx < 0) "hard"
        else "ambiguous"
      (id, trueLang, 5L, margins.sum / 5L, mn, mx, region)
    }.sortBy(_._1).toSeq
    val got = run("q_dataset_cartography").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
    assert(got == expect, "cartography jackknife replay diverged")
    assert(got.map(_._7).toSet.subsetOf(Set("easy", "hard", "ambiguous")),
      "regions must come from the declared set")
  }

  test("r13 l-diversity: imperative class replay; records partition; " +
    "the audit composes with k-anonymity's QI") {
    val cust = graft.tables.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getString(2), r.getDouble(3)))
    val firstStatus = graft.tables.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (c, v) => c -> v.minBy(_._2)._3 }
    def band(b: Double) = new java.math.BigDecimal(b * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact() / 100000L
    val classes = cust.groupBy { case (ck, nat, seg, bal) =>
      (nat, seg, band(bal)) }.toSeq
      .map { case (_, ms) => (ms.map(m =>
        firstStatus.getOrElse(m._1, "NONE")).distinct.length.toLong,
        ms.length.toLong) }
    val expect = classes.groupBy(_._1).toSeq.map { case (l, cs) =>
      (l, cs.length.toLong, cs.map(_._2).sum,
        if (l < 2) 1L else 0L) }.sortBy(_._1)
    val got = run("q_l_diversity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"l-diversity replay diverged: $got vs $expect")
    assert(got.map(_._3).sum == cust.length.toLong,
      "classes must partition the customer records")
  }

  test("r13 DRO weights: exp tilt replays from the shared NB " +
    "confusion; weights rank with error; normalization is tight") {
    val conf = run("q_nb_quality").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val err = conf.groupBy(_._1).map { case (l, cs) =>
      val n = cs.map(_._3).sum
      val ok = cs.filter(c => c._2 == c._1).map(_._3).sum
      l -> ((n, (n - ok) * 1000000L / n))
    }
    def tilt(ppm: Long) = new java.math.BigDecimal(
      math.exp(ppm / 1000000.0) * 1000000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val st = err.values.map(v => tilt(v._2)).sum
    val got = run("q_dro_weights").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    got.foreach { case (l, n, e, t, w, _) =>
      assert((n, e) == err(l), s"error chain diverged for $l")
      assert(t == tilt(e) && w == t * 1000000L / st,
        s"tilt/weight chain diverged for $l")
    }
    // monotone: higher error never gets a lower weight
    got.sortBy(_._3).map(_._5).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1),
        "weights must be monotone in group error")
    }
    val ws = got.map(_._5).sum
    assert(ws <= 1000000L && ws > 1000000L - got.length,
      s"truncating normalization out of band: $ws")
  }

  test("r13 t-closeness: imperative TV-distance replay over the " +
    "explicit class x sensitive grid; skewness beats homogeneity") {
    val cust = graft.tables.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(),
        r.getString(2), r.getDouble(3)))
    val firstStatus = graft.tables.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (c, v) => c -> v.minBy(_._2)._3 }
    def band(b: Double) = new java.math.BigDecimal(b * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact() / 100000L
    val rows = cust.map { case (ck, nat, seg, bal) =>
      ((nat, seg, band(bal)), firstStatus.getOrElse(ck, "NONE")) }
    val bign = rows.length.toLong
    val gv = rows.groupBy(_._2).map { case (v, xs) => v -> xs.length.toLong }
    val expect = rows.groupBy(_._1).toSeq.map { case (k, xs) =>
      val n = xs.length.toLong
      val cv = xs.groupBy(_._2).map { case (v, ys) => v -> ys.length.toLong }
      val num = gv.map { case (v, g) =>
        math.abs(cv.getOrElse(v, 0L) * bign - g * n) }.sum
      val tv = num * 1000000L / (2L * n * bign)
      (k._1, k._2, k._3, n, tv, if (tv > 300000L) 1L else 0L)
    }.sortBy(t => (t._1, t._2, t._3))
    val got = run("q_t_closeness").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, "t-closeness TV replay diverged")
    // the audit must discriminate beyond l-diversity on this corpus:
    // distances vary across classes (a skew signal, not a constant)
    assert(got.map(_._5).distinct.length > 1,
      "TV distances degenerate — audit carries no signal")
  }

  test("r13 packing ablation: imperative split replay; pad-per-doc " +
    "dominates concat in windows and padding; both conserve tokens") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    val got = run("q_packing_ablation").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val sorted = ds.sortBy(_._1)
      val t = sorted.map(_._3).sum
      var cume = 0L; var splits = 0L; var pdw = 0L
      sorted.foreach { case (_, _, n) =>
        if (n > 0 && cume / 256 != (cume + n - 1) / 256) splits += 1
        pdw += (n + 255) / 256
        cume += n
      }
      val cw = (t + 255) / 256
      assert(got((lang, "concat_chunk")) ==
        ((cw, cw * 256 - t, (cw * 256 - t) * 1000000L / (cw * 256),
          splits)), s"concat row diverged for $lang")
      assert(got((lang, "pad_per_doc")) ==
        ((pdw, pdw * 256 - t, (pdw * 256 - t) * 1000000L / (pdw * 256),
          0L)), s"pad-per-doc row diverged for $lang")
      assert(pdw >= cw && pdw * 256 - t >= cw * 256 - t,
        s"pad-per-doc must dominate concat for $lang")
      assert(cw * 256 - t < 256, s"concat pad must be sub-window: $lang")
    }
  }
}
