package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property/replay specs for the round-15 wave-1/2 operators. */
class Wave15Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (us, event_id, user_id, event_type) for every event, imperatively. */
  private lazy val evs: Seq[(Long, Long, Long, String)] =
    graft.tables.Tables.events(spark, sf)
      .select(unix_micros(col("ts")), col("event_id"), col("user_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  private val GapUs = 3600000000L
  private val DayUs = 86400000000L

  /** 1-hour-gap sessions per user: (user, start_us, end_us, n_events) —
    * the q_sessionize_lag rule replayed imperatively. */
  private lazy val sessions: Seq[(Long, Long, Long, Long)] =
    evs.groupBy(_._3).toSeq.flatMap { case (u, rows) =>
      val ts = rows.sortBy(r => (r._1, r._2)).map(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var start = ts.head; var prev = ts.head; var n = 0L
      ts.foreach { t =>
        if (t - prev > GapUs) { out += ((u, start, prev, n)); start = t; n = 0L }
        n += 1; prev = t
      }
      out += ((u, start, prev, n))
      out.toSeq
    }

  test("session concurrency: imperative sweep-line replay matches exactly") {
    // boundaries ordered by (us, delta DESC): starts before ends at ties
    val bounds = sessions.flatMap(s => Seq((s._2, 1L), (s._3, -1L)))
      .sortBy { case (us, d) => (us, -d) }
    var cur = 0L
    val byDay = scala.collection.mutable.LinkedHashMap
      .empty[Long, (Long, Long, Long)] // day -> (starts, ends, peak)
    bounds.foreach { case (us, d) =>
      val day = us / DayUs
      val (st, en, pk) = byDay.getOrElseUpdate(day, (0L, 0L, cur))
      cur += d
      byDay(day) = (st + (if (d > 0) 1 else 0), en + (if (d < 0) 1 else 0),
        math.max(pk, cur))
    }
    val expect = byDay.toSeq.sortBy(_._1)
      .map { case (day, (st, en, pk)) => (day, st, en, pk) }
    val got = run("q_session_concurrency").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"sweep-line replay diverged:\n$got\nvs\n$expect")
    // conservation: total starts == total ends == session count
    assert(expect.map(_._2).sum == sessions.size.toLong &&
      expect.map(_._3).sum == sessions.size.toLong)
  }

  test("active users: imperative DAU/WAU/MAU replay matches exactly") {
    val dayUser = evs.map(e => (e._1 / DayUs, e._3)).distinct
    val days = dayUser.map(_._1).distinct.sorted
    val expect = days.map { d =>
      val dau = dayUser.count(_._1 == d).toLong
      val wau = dayUser.filter(p => p._1 >= d - 6 && p._1 <= d)
        .map(_._2).distinct.size.toLong
      val mau = dayUser.filter(p => p._1 >= d - 29 && p._1 <= d)
        .map(_._2).distinct.size.toLong
      (d, dau, wau, mau, dau * 10000 / math.max(mau, 1L))
    }
    val got = run("q_active_users").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, "DAU/WAU/MAU replay diverged")
    // monotone containment: dau <= wau <= mau, every day
    assert(expect.forall(x => x._2 <= x._3 && x._3 <= x._4))
  }

  test("interarrival: imperative digit-bucket replay matches exactly") {
    val gaps = evs.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      val ts = rows.sortBy(r => (r._1, r._2)).map(_._1)
      ts.zip(ts.drop(1)).map { case (a, b) => (b - a) / 1000000L }
    }
    val expect = gaps.groupBy(g => g.toString.length.toLong).toSeq
      .map { case (dig, gs) =>
        (dig, gs.size.toLong, gs.min, gs.max) }
      .sortBy(_._1)
    val got = run("q_user_interarrival").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, "interarrival replay diverged")
  }

  test("activity heatmap: imperative cell replay matches exactly") {
    val cells = evs.map(e =>
      ((e._1 / DayUs) % 7, e._1 % DayUs / 3600000000L, e._3))
    val total = cells.size.toLong
    val expect = cells.groupBy(c => (c._1, c._2)).toSeq
      .map { case ((dow, h), xs) =>
        (dow, h, xs.size.toLong, xs.map(_._3).distinct.size.toLong,
          xs.size.toLong * 10000 / total) }
      .sortBy(x => (x._1, x._2))
    val got = run("q_activity_heatmap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, "heatmap replay diverged")
    assert(expect.map(_._3).sum == total, "cells must partition the corpus")
  }

  test("session duration histogram: replay off the shared sessionizer") {
    val expect = sessions
      .map(s => ((s._3 - s._2) / 1000000L, s._4))
      .groupBy(x => x._1.toString.length.toLong).toSeq
      .map { case (dig, xs) => (dig, xs.size.toLong, xs.map(_._2).sum,
        xs.map(_._1).min, xs.map(_._1).max) }
      .sortBy(_._1)
    val got = run("q_session_duration_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect, "duration histogram replay diverged")
    // every event is in exactly one session
    assert(expect.map(_._3).sum == evs.size.toLong)
  }

  test("engagement gini: exact-rank replay matches the histogram identity") {
    val counts = evs.groupBy(_._3).toSeq
      .map { case (u, xs) => (u, xs.size.toLong) }
    val n = counts.size.toLong
    val tot = counts.map(_._2).sum
    // exact ranks under (c, user) ascending — the histogram identity's
    // ground truth (rank order within a count-group is irrelevant)
    val sRankC = counts.sortBy(c => (c._2, c._1)).zipWithIndex
      .map { case ((_, c), i) => BigInt(i + 1) * c }.sum
    val gini = (BigInt(2) * sRankC - BigInt(n + 1) * tot) * 1000000 /
      (BigInt(n) * tot)
    val u10 = n / 10
    val top10 = counts.map(_._2).sorted.reverse.take(u10.toInt).sum
    val got = run("q_engagement_gini").head()
    assert(got.getAs[Long]("n_users") == n &&
      got.getAs[Long]("total_events") == tot)
    assert(got.getAs[Long]("gini_e6") == gini.longValue,
      s"gini diverged: ${got.getAs[Long]("gini_e6")} vs $gini")
    assert(got.getAs[Long]("top10_share_bp") == top10 * 10000 / tot,
      "top-decile share diverged")
    assert(got.getAs[Long]("gini_e6") >= 0 &&
      got.getAs[Long]("gini_e6") < 1000000L)
  }

  test("readability: imperative per-doc recount matches every column") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vowel = "[aeiou]+".r
    val sent = "[.!?]".r
    val expect = docs.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val words = xs.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
      val sylls = xs.map(x => vowel.findAllIn(x._2).size.toLong).sum
      val sents = xs.map(x => sent.findAllIn(x._2).size.toLong + 1).sum
      (lang, xs.size.toLong, words, sylls,
        words * 1000 / math.max(sents, 1),
        sylls * 1000 / math.max(words, 1),
        206835L - 1015 * words / math.max(sents, 1)
          - 84600 * sylls / math.max(words, 1))
    }.sortBy(_._1)
    val got = run("q_readability").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect, s"readability replay diverged:\n$got\nvs\n$expect")
  }

  test("tokenizer fertility: rows equal the declared apply surfaces") {
    val fert = run("q_tokenizer_fertility").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val bpe = run("q_bpe_tokenize")
      .select(col("lang"), col("words"), col("tokens"),
        col("compression_bp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val fb = fert.filter(_._1 == "bpe")
      .map(x => (x._2, x._3, x._4, x._6)).toSeq
    assert(fb == bpe, "bpe fertility rows must equal q_bpe_tokenize's")
    // fertility >= 1 piece per word, by construction; and it is exactly
    // tokens/words on the bp grid
    assert(fert.forall(x => x._5 >= 10000L &&
      x._5 == x._4 * 10000 / math.max(x._3, 1)))
    assert(fert.count(_._1 == "bpe") == fert.count(_._1 == "wordpiece"))
  }

  test("partitioned roundtrip: discovery recovers rows AND pruning binds") {
    // the QDef's own run materializes the layout (LayoutCache.once)
    val total = run("q_format_partitioned_roundtrip")
      .agg(sum(col("n"))).head().getLong(0)
    val nDocs = graft.tables.Tables.table(spark, sf, "documents").count()
    assert(total == nDocs, "partitioned write must preserve every row")
    val dir = s"/tmp/graft_part_${graft.tables.LayoutCache.keyOf(sf)}"
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang filter must bind as a partition filter, not a data filter:\n$plan")
    val en = graft.tables.Tables.table(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(pruned.count() == en, "pruned read must equal the lang slice")
  }
}
