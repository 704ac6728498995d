package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** t-digest: local sketch accuracy, merge associativity under arbitrary
  * partition orders, and the q_agg_tdigest band margins (the ANN-floor /
  * minhash-band practice: the declared flag bounds must clear the
  * measured worst case by ≥2×, or the gate is knife-edge). */
class TDigestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rankError(values: Array[Double], est: Double, p: Double): Double = {
    val n = values.length.toDouble
    val lt = values.count(_ < est) / n
    val le = values.count(_ <= est) / n
    // tie-aware: error is how far the [lt, le] rank interval sits from p
    if (p < lt) lt - p else if (p > le) p - le else 0.0
  }

  test("local digest: rank error within band on uniform + skewed data") {
    val rnd = new scala.util.Random(42)
    val uniform = Array.fill(100000)(rnd.nextDouble() * 1000)
    val skewed = Array.fill(100000)(math.exp(rnd.nextGaussian() * 2)) // lognormal
    for (data <- Seq(uniform, skewed)) {
      val d = new TDigest(300.0)
      data.foreach(d.add)
      for (p <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
        val err = rankError(data, d.quantile(p), p)
        val band = if (p <= 0.01 || p >= 0.99) 0.005 else 0.015
        assert(err <= band / 2,
          f"p=$p rank error $err%.5f not within half the $band band")
      }
    }
  }

  test("merge is order-insensitive within band: 32 partials, two merge orders") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(200000)(rnd.nextGaussian() * 50 + 100)
    val parts = data.grouped(data.length / 32 + 1).toArray
    def digestOf(xs: Array[Double]) = {
      val t = new TDigest(300.0); xs.foreach(t.add); t
    }
    val left = parts.map(digestOf).reduceLeft { (a, b) => a.mergeIn(b); a }
    val right = parts.reverse.map(digestOf).reduceLeft { (a, b) => a.mergeIn(b); a }
    for (p <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
      val band = if (p <= 0.01 || p >= 0.99) 0.005 else 0.015
      assert(rankError(data, left.quantile(p), p) <= band / 2)
      assert(rankError(data, right.quantile(p), p) <= band / 2)
    }
  }

  test("serialize/deserialize round-trips the centroid list exactly") {
    val d = new TDigest(300.0)
    (1 to 10000).foreach(i => d.add(i.toDouble))
    val back = TDigest.deserialize(d.serialize())
    assert(back.means.toSeq == d.means.toSeq)
    assert(back.weights.toSeq == d.weights.toSeq)
    assert(math.abs(back.quantile(0.5) - d.quantile(0.5)) == 0.0)
  }

  test("q_agg_tdigest: flags all 1 with measured >=2x margin; repartition-stable") {
    val got = graft.SparkEntry.queries("q_agg_tdigest")(spark, TestSpark.sf0001)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      (2 until r.length).foreach(i =>
        assert(r.getLong(i) == 1L, s"flag $i not 1 in $r"))
    }
    // margin: recompute the digest per group and measure true rank error
    val l = graft.tables.Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
    for ((_, rows) <- l) {
      val values = rows.map(_._2)
      val d = new TDigest(300.0)
      values.foreach(d.add)
      for (p <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
        val band = if (p <= 0.01 || p >= 0.99) 0.005 else 0.015
        val err = rankError(values, d.quantile(p), p)
        assert(err <= band / 2,
          f"group rank error $err%.5f at p=$p within half of $band")
      }
    }
  }

  test("q_agg_tdigest_rollup: two-level merge keeps the same >=2x band margin") {
    val got = graft.SparkEntry.queries("q_agg_tdigest_rollup")(
      spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      (2 until r.length).foreach(i =>
        assert(r.getLong(i) == 1L, s"flag $i not 1 in $r"))
    }
    // margin for the TWO-LEVEL path: build per-(flag, status) digests,
    // round-trip them through serialize/deserialize (the in-plan binary
    // hop between aggregation levels), merge per flag, and require the
    // merged digest's true rank error within half the declared bands —
    // the same knife-edge rule the one-level query carries.
    val l = graft.tables.Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("double"))
      .as[(String, String, Double)].collect()
    for ((_, rows) <- l.groupBy(_._1)) {
      val values = rows.map(_._3)
      val merged = new TDigest(300.0)
      rows.groupBy(_._2).values.foreach { seg =>
        val d = new TDigest(300.0)
        seg.foreach(t => d.add(t._3))
        merged.mergeIn(TDigest.deserialize(d.serialize()))
      }
      for (p <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
        val band = if (p <= 0.01 || p >= 0.99) 0.005 else 0.015
        val err = rankError(values, merged.quantile(p), p)
        assert(err <= band / 2,
          f"rollup rank error $err%.5f at p=$p within half of $band")
      }
    }
  }
}
