package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{vec_cosine, vec_dot}

/** Approximate nearest-neighbor search over an embedding column via
  * random-hyperplane (sign) LSH — the scale path next to the brute-force
  * baseline: candidates come from an equi-join on bucket keys, so cost is
  * O(rows·tables + collisions), never O(n²).
  *
  * Hyperplanes are deterministic (seeded Gaussian), embedded as literal
  * arrays; the b sign bits of x·plane_j form the bucket id. For unit-ish
  * vectors, P(same bit) = 1 − θ/π per plane, so cosine-close vectors
  * collide with high probability; `tables` independent bucketings raise
  * recall exponentially.
  */
object VectorLsh {

  /** Deterministic Gaussian hyperplanes: tables × bits × dim. */
  private def planes(dim: Int, bits: Int, tables: Int, seed: Long): Seq[Seq[Array[Float]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  /** (id, table, bucket) rows: one bucket id per hash table. */
  def buckets(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int = 64, bits: Int = 12, tables: Int = 4, seed: Long = 42L): DataFrame = {
    val ps = planes(dim, bits, tables, seed)
    val bucketCols = ps.zipWithIndex.map { case (tablePlanes, t) =>
      val bucket = tablePlanes.zipWithIndex.map { case (p, j) =>
        val lp = lit(p) // literal array<float>
        when(vec_dot(col(vecCol), lp) >= 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
      struct(lit(t).as("t"), bucket.as("b")).as(s"bk$t")
    }
    vecs.select(col(idCol) +: bucketCols: _*)
      .select(col(idCol), explode(array(ps.indices.map(t => col(s"bk$t")): _*)).as("bk"))
  }

  /** Top-k approximate cosine neighbors per query vector. Exact cosine is
    * evaluated only on bucket-colliding candidate pairs — and only once
    * per unordered pair: candidates are generated with a < b (half the
    * rows through the dedup shuffle, half the vector fetches and cosine
    * evals), scored, then mirrored before the per-query top-k, which is
    * equivalent because cosine is symmetric.
    */
  /** Bucket-width rule from TUNING.md: 2^bits buckets per table should
    * roughly tile the corpus into `targetBucket`-sized buckets —
    * bits ≈ log₂(n / targetBucket). Too many bits over too few vectors
    * means empty buckets and recall collapse (measured 0.01 at 12 bits /
    * 500 vectors); too few means O(n²) collisions.
    */
  def bitsFor(n: Long, targetBucket: Int = 32): Int = {
    val b = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(2, b))
  }

  /** topkApprox with `bits` chosen from the corpus size per `bitsFor`,
    * and a higher table count for recall — the configuration a caller
    * who knows only the corpus (not the tuning table) should use.
    *
    * `n` is the (approximate — it only sets a log₂) corpus row count.
    * Pass it from table stats or the caller's own knowledge so query
    * CONSTRUCTION stays action-free and batchable; when absent, the
    * catalog row-count statistic is used if the optimized plan carries
    * one, and only as a last resort does this run a count() job.
    */
  def topkApproxAuto(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int = 64, tables: Int = 8, seed: Long = 42L,
      n: Option[Long] = None): DataFrame = {
    val rows = n
      .orElse(vecs.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong))
      .getOrElse(vecs.count())
    topkApprox(vecs, idCol, vecCol, k, dim, bits = bitsFor(rows), tables, seed)
  }

  def topkApprox(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int = 64, bits: Int = 12, tables: Int = 4, seed: Long = 42L): DataFrame = {
    // both sides of the candidate self-join read the bucket table —
    // materialize it once instead of evaluating tables×bits vec_dot
    // projections over the corpus twice
    val b = buckets(vecs, idCol, vecCol, dim, bits, tables, seed)
      .localCheckpoint(true)
    val pairs = b.as("a").join(b.as("b"),
        col("a.bk") === col("b.bk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("x_id"), col(s"b.$idCol").as("y_id"))
      .distinct() // dedup across the `tables` bucketings
    val v = vecs.select(col(idCol), col(vecCol))
    val scored = pairs
      .join(v.select(col(idCol).as("x_id"), col(vecCol).as("xv")), "x_id")
      .join(v.select(col(idCol).as("y_id"), col(vecCol).as("yv")), "y_id")
      .withColumn("sim", vec_cosine(col("xv"), col("yv")))
      .select(col("x_id"), col("y_id"), col("sim"))
    val mirrored = scored
      .select(col("x_id").as("q_id"), col("y_id").as("c_id"), col("sim"))
      .unionAll(scored.select(col("y_id").as("q_id"), col("x_id").as("c_id"), col("sim")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    mirrored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("c_id"), round(col("sim"), 6).as("sim_r"))
  }
}
