package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate cosine scoring — the
  * memory-side ANN scale path beside sign-LSH ([[VectorLsh]]) and IVF
  * ([[VectorIvf]]): the 64-dim embedding is split into `m` subvectors,
  * each quantized to one of `k` per-subspace centroids, so a vector
  * compresses to `m` small codes (8 bytes at m=8) and scoring a
  * candidate needs only `m` table lookups (asymmetric distance
  * computation, ADC) instead of a 64-dim dot product.
  *
  * Everything is relational: training is the same Lloyd's-as-aggregation
  * used by [[VectorIvf]] but run jointly over all `m` subspaces (one plan,
  * keyed by (sub, code)); encoding is a broadcast join + max_by argmin —
  * map-side partial aggregation, one corpus scan; query scoring
  * pre-computes each query's (sub, code) → partial-dot table against the
  * broadcast codebook and sums `m` equi-join lookups per candidate.
  *
  * This module scores ALL candidates per query (exhaustive ADC — exact
  * recall of the quantizer itself); at 100 TB compose it with
  * [[VectorIvf]] cell probing so ADC only touches probed cells (IVFADC).
  */
object VectorPq {

  private def sq(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x * x)
  // codegen'd expressions, not HOFs: nearest-centroid assignment evaluates
  // these tens of millions of times per encode pass (subvectors are double
  // arrays, so the double-accumulation order matches the HOF form exactly)
  private def dotH(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot_any(a, b)
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_sqdist(a, b)

  /** Seeded random orthogonal rotation (Gram-Schmidt over Gaussian rows),
    * flattened row-major — the OPQ preprocessing step (Ge et al., CVPR
    * 2013): rotating before the subspace split decorrelates dimensions so
    * each of the m sub-quantizers carries comparable variance. The full
    * OPQ alternates rotation and codebook optimization; a fixed random
    * rotation captures most of the benefit on isotropic-ish data (and the
    * repo's sweep measures exactly how much — see AnnSweep/TUNING.md). */
  def rotationMatrix(dim: Int = 64, seed: Long = 42L): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val rows = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) {
        var dot = 0.0
        var t = 0
        while (t < dim) { dot += rows(i)(t) * rows(j)(t); t += 1 }
        t = 0
        while (t < dim) { rows(i)(t) -= dot * rows(j)(t); t += 1 }
        j += 1
      }
      var n2 = 0.0
      var t = 0
      while (t < dim) { n2 += rows(i)(t) * rows(i)(t); t += 1 }
      val inv = 1.0 / math.sqrt(n2)
      t = 0
      while (t < dim) { rows(i)(t) *= inv; t += 1 }
      i += 1
    }
    rows.flatten.map(_.toFloat)
  }

  /** Replace `vecCol` with its rotation M·v (codegen'd MatVecProduct —
    * one fused d² multiply-add pass per row, matrix as a broadcast-free
    * literal). Orthogonality preserves all dot products and norms, so
    * downstream cosine semantics are unchanged; only the quantizer's
    * subspace split sees a different basis. */
  def rotate(vecs: DataFrame, vecCol: String, mat: Array[Float]): DataFrame =
    vecs.withColumn(vecCol,
      graft.functions.VectorFunctions.vec_rotate(lit(mat), col(vecCol)))

  /** (vid, sub, subvec) rows: the m d-dim double slices of each vector. */
  private def subvectors(v: DataFrame, m: Int, dim: Int): DataFrame = {
    val d = dim / m
    v.select(col("vid"), posexplode(array((0 until m).map(j =>
        transform(slice(col("vec"), j * d + 1, d), x => x.cast("double"))): _*)))
      .toDF("vid", "sub", "subvec")
  }

  /** Per-subspace codebook: (sub, code, centroid, cnorm2) after `iters`
    * joint Lloyd iterations. Codes that lose all members drop out
    * (standard k-means); seeds are the `k` lowest-id vectors. Train on a
    * sample (`trainFraction`) at scale — quality needs a representative
    * sample, not the corpus. */
  def train(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, dim: Int = 64, iters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val all = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val v = if (trainFraction >= 1.0) all
      else all.sample(withReplacement = false, trainFraction, seed = 42L)
    val subs = subvectors(v, m, dim)
    val seedIds = v.orderBy(col("vid")).limit(k)
      .withColumn("code", row_number().over(Window.orderBy(col("vid"))) - 1)
      .select(col("vid"), col("code"))
    var cents = subs.join(broadcast(seedIds), "vid")
      .select(col("sub"), col("code"), col("subvec").as("centroid"))
    (0 until iters).foreach { _ =>
      val assigned = subs.join(broadcast(cents), "sub")
        .withColumn("d2", sqDist(col("subvec"), col("centroid")))
        .groupBy(col("vid"), col("sub"))
        .agg(
          max_by(col("code"),
            struct((-col("d2")).as("nd"), (-col("code")).as("nc"))).as("code"),
          first(col("subvec")).as("subvec"))
      // one-shuffle centroid update via the vec_sum imperative aggregate
      // (see VectorIvf.train): no posexplode ×(dim/m) blow-up, no second
      // per-(sub,code) re-collect shuffle
      cents = assigned
        .groupBy(col("sub"), col("code"))
        .agg(graft.functions.VectorSumAgg.vec_sum(col("subvec")).as("vsum"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"),
          transform(col("vsum"), x => x / col("n")).as("centroid"))
    }
    cents.withColumn("cnorm2", sq(col("centroid")))
  }

  /** Encode the corpus: (vid, sub, code) — nearest centroid per subspace,
    * as a max_by aggregation (map-side partial, one scan). */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int = 8, dim: Int = 64): DataFrame = {
    val v = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    subvectors(v, m, dim)
      .join(broadcast(codebook.select(col("sub"), col("code"), col("centroid"))), "sub")
      .withColumn("d2", sqDist(col("subvec"), col("centroid")))
      .groupBy(col("vid"), col("sub"))
      .agg(max_by(col("code"),
        struct((-col("d2")).as("nd"), (-col("code")).as("nc"))).as("code"))
  }

  /** (q_id, q_norm): exact query-vector norms. */
  private def queryNorms(q: DataFrame): DataFrame =
    q.select(col("vid").as("q_id"),
      sqrt(sq(transform(col("vec"), x => x.cast("double")))).as("q_norm"))

  /** (q_id, sub, code, pdot): per-query ADC lookup table against the
    * broadcast codebook — m·k rows per query. */
  private def adcTable(q: DataFrame, cb: DataFrame, m: Int, dim: Int): DataFrame =
    subvectors(q, m, dim)
      .join(broadcast(cb.select(col("sub"), col("code"), col("centroid"))), "sub")
      .select(col("vid").as("q_id"), col("sub"), col("code"),
        dotH(col("subvec"), col("centroid")).as("pdot"))

  /** (c_id, c_norm): reconstructed-candidate norms from codes + codebook. */
  private def codeNorms(codes: DataFrame, cb: DataFrame): DataFrame =
    codes
      .join(broadcast(cb.select(col("sub"), col("code"), col("cnorm2"))), Seq("sub", "code"))
      .groupBy(col("vid").as("c_id")).agg(sqrt(sum(col("cnorm2"))).as("c_norm"))

  /** Top-`topk` approximate cosine neighbors per query via exhaustive ADC:
    * approx sim(q, c) = Σ_j dot(q_j, centroid[j, code_j(c)]) normalized by
    * |q|·|reconstructed c|. */
  def topkApprox(vecs: DataFrame, idCol: String, vecCol: String, topk: Int,
      m: Int = 8, k: Int = 16, dim: Int = 64, iters: Int = 2,
      queries: Option[DataFrame] = None,
      trainFraction: Double = 1.0): DataFrame = {
    // localCheckpoint (eager), not cache(): the unrolled Lloyd plan is
    // deep, so downstream plans should scan a materialized result — and
    // unlike CacheManager entries (which live until the session ends and
    // substitute into unrelated plans), checkpointed RDD storage is
    // reclaimed by the ContextCleaner once the DataFrame is unreferenced
    val cb = train(vecs, idCol, vecCol, m, k, dim, iters, trainFraction)
      .localCheckpoint(true)
    val codes = encode(vecs, idCol, vecCol, cb, m, dim)
      .localCheckpoint(true) // used twice below
    val cNorm = codeNorms(codes, cb)
    val q = queries.getOrElse(vecs)
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val qNorm = queryNorms(q)
    val qTable = adcTable(q, cb, m, dim)
    val scored = codes.select(col("vid").as("c_id"), col("sub"), col("code"))
      .join(qTable, Seq("sub", "code"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum(col("pdot")).as("adot"))
      .filter(col("q_id") =!= col("c_id"))
      .join(qNorm, "q_id")
      .join(cNorm, "c_id")
      .withColumn("sim", col("adot") / (col("q_norm") * col("c_norm")))
    // bounded top-k aggregate instead of a row_number window (r16 opt —
    // see VectorIvf.rerankTopK: identical (sim desc, c_id asc) order)
    VectorIvf.rerankTopK(scored, topk)
      .select(col("q_id"), col("rn"), col("c_id"), round(col("sim"), 6).as("sim_r"))
  }

  /** IVFADC: IVF coarse cells bound the candidate set (each query touches
    * only its `nprobe` cells' members), PQ codes make each candidate a
    * `m`-lookup score instead of a full dot product — the composition a
    * billion-vector corpus runs (Jégou et al.). Candidate volume:
    * Σ probed-cell sizes · m lookup rows, vs n·m for exhaustive
    * [[topkApprox]].
    *
    * `residual = true` (the paper's formulation) quantizes
    * `vec − coarse_centroid` instead of the raw vector — residuals are
    * smaller and better centered, so the same m·k codebook loses less.
    * The scorer then reconstructs ĉ = coarse[cid] + Σ_j pq[j, code_j]:
    *   dot(q, ĉ)  = dot(q, coarse[cid]) + Σ_j dot(q_j, pq[j, code_j])
    *   |ĉ|²       = |coarse[cid]|² + Σ_j (2·⟨coarse[cid]_j, pq[j,code_j]⟩
    *                                       + |pq[j, code_j]|²)
    * — all from three broadcastable tables (per-cell norm, per-(cell,sub,
    * code) cross dot, per-(sub,code) norm), still m lookups per candidate.
    */
  def topkIvfAdc(vecs: DataFrame, idCol: String, vecCol: String, topk: Int,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, k: Int = 16, dim: Int = 64, iters: Int = 2,
      queries: Option[DataFrame] = None,
      trainFraction: Double = 1.0,
      residual: Boolean = false,
      /** > 0: take topk·rerankFactor ADC candidates, then EXACT-rerank —
        * restores full precision on the survivors at the cost of
        * rerankFactor·topk true dot products per query (how production
        * IVFADC closes the quantizer's resolution gap) */
      rerankFactor: Int = 0): DataFrame = {
    val v = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val q = queries.getOrElse(vecs)
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val innerK = if (rerankFactor > 0) topk * rerankFactor else topk
    // ONE checkpointed training sample feeds BOTH quantizers: the coarse
    // k-means and the PQ codebooks each run Lloyd's over this small
    // materialized frame instead of independently re-sampling (and
    // re-scanning) the corpus — at 100 TB the corpus is touched once for
    // sampling, once for assignment/encoding, and training cost is
    // O(sample), full stop.
    val trainV = (if (trainFraction >= 1.0) v
      else v.sample(withReplacement = false, trainFraction, seed = 42L))
      .localCheckpoint(true)
    // eager localCheckpoint: downstream plans (assign, probes, residuals)
    // scan the materialized codebook; storage is GC-reclaimed (see above)
    val coarse = VectorIvf.train(trainV, "vid", "vec", nlist, iters)
      .localCheckpoint(true)
    val cellsFull = VectorIvf.assign(v, coarse) // (vid, vec, cid)
    val probes = VectorIvf.probeCells(q, coarse, nprobe)

    val adc = if (!residual) {
      val cells = cellsFull.select(col("vid"), col("cid"))
      val cb = train(trainV, "vid", "vec", m, k, dim, iters)
        .localCheckpoint(true)
      val codes = encode(vecs, idCol, vecCol, cb, m, dim)
        .localCheckpoint(true) // memberCodes + cNorm
      val memberCodes = cells.join(codes, "vid")
        .select(col("vid").as("c_id"), col("cid"), col("sub"), col("code"))
      val cNorm = codeNorms(codes, cb)
      val qNorm = queryNorms(q)
      val qTable = adcTable(q, cb, m, dim)
      val scored = probes.select(col("q_id"), col("cid"))
        .join(memberCodes, "cid") // only probed cells' members survive
        .join(qTable, Seq("q_id", "sub", "code"))
        .groupBy(col("q_id"), col("c_id"))
        .agg(sum(col("pdot")).as("adot"))
        .filter(col("q_id") =!= col("c_id"))
        .join(qNorm, "q_id")
        .join(cNorm, "c_id")
        .withColumn("sim", col("adot") / (col("q_norm") * col("c_norm")))
      VectorIvf.rerankTopK(scored, innerK)
        .select(col("q_id"), col("rn"), col("c_id"), round(col("sim"), 6).as("sim_r"))
    } else {
      val coarseD = coarse.select(col("cid"),
        transform(col("centroid"), x => x.cast("double")).as("ccent"))
      // residual corpus: r = vec − coarse[cid]
      // checkpointed: feeds PQ training, encoding, AND the member-code
      // table — recomputing would re-run the coarse assignment each time
      val resid = cellsFull.join(broadcast(coarseD), "cid")
        .select(col("vid"), col("cid"),
          zip_with(transform(col("vec"), x => x.cast("double")), col("ccent"),
            (x, y) => x - y).as("rvec"))
        .localCheckpoint(true)
      // PQ trains on the SAMPLE's residuals — derived from the already-
      // materialized training sample (one broadcast assign over a small
      // frame), never a second pass over the corpus residuals
      val sampleResid = VectorIvf.assign(trainV, coarse)
        .join(broadcast(coarseD), "cid")
        .select(col("vid"),
          zip_with(transform(col("vec"), x => x.cast("double")), col("ccent"),
            (x, y) => x - y).as("rvec"))
        .localCheckpoint(true)
      val cb = train(sampleResid, "vid", "rvec", m, k, dim, iters)
        .localCheckpoint(true)
      val codes = encode(resid, "vid", "rvec", cb, m, dim)
      val memberCodes = resid.select(col("vid"), col("cid")).join(codes, "vid")
        .select(col("vid").as("c_id"), col("cid"), col("sub"), col("code"))
      // broadcastable reconstruction tables
      val coarseNorm2 = coarseD.select(col("cid"), sq(col("ccent")).as("cn2"))
      val coarseSubs = subvectors(
        coarseD.select(col("cid").as("vid"), col("ccent").as("vec")), m, dim)
        .select(col("vid").as("cid"), col("sub"), col("subvec").as("csub"))
      val cross = coarseSubs
        .join(cb.select(col("sub"), col("code"), col("centroid"), col("cnorm2")), "sub")
        .select(col("cid"), col("sub"), col("code"),
          (dotH(col("csub"), col("centroid")) * 2.0 + col("cnorm2")).as("n2part"))
      val qNorm = queryNorms(q)
      val qTable = adcTable(q, cb, m, dim)
      val qcdot = probes.join(broadcast(coarseD), "cid")
        .select(col("q_id"), col("cid"),
          dotH(transform(col("qv"), x => x.cast("double")), col("ccent")).as("qcdot"))
      val scored = probes.select(col("q_id"), col("cid"))
        .join(memberCodes, "cid")
        .join(broadcast(cross), Seq("cid", "sub", "code"))
        .join(qTable, Seq("q_id", "sub", "code"))
        .groupBy(col("q_id"), col("cid"), col("c_id"))
        .agg(sum(col("pdot")).as("rdot"), sum(col("n2part")).as("rn2"))
        .filter(col("q_id") =!= col("c_id"))
        .join(qcdot, Seq("q_id", "cid"))
        .join(broadcast(coarseNorm2), "cid")
        .join(qNorm, "q_id")
        .withColumn("sim", (col("qcdot") + col("rdot")) /
          (col("q_norm") * sqrt(col("cn2") + col("rn2"))))
      VectorIvf.rerankTopK(scored, innerK)
        .select(col("q_id"), col("rn"), col("c_id"), round(col("sim"), 6).as("sim_r"))
    }
    if (rerankFactor > 0) exactRerank(adc, q, v, topk) else adc
  }

  /** Exact-rerank pass over an ADC candidate frame (q_id, c_id):
    * fetch both vectors and rank by true cosine. Type-flexible via
    * vec_dot_any (float or double inputs). */
  private def exactRerank(cands: DataFrame, q: DataFrame, v: DataFrame,
      topk: Int): DataFrame = {
    import graft.functions.VectorFunctions.vec_dot_any
    val scored = cands.select(col("q_id"), col("c_id"))
      .join(q.select(col("vid").as("q_id"), col("vec").as("qvv")), "q_id")
      .join(v.select(col("vid").as("c_id"), col("vec").as("cvv")), "c_id")
      .withColumn("ex", vec_dot_any(col("qvv"), col("cvv")) /
        (sqrt(vec_dot_any(col("qvv"), col("qvv"))) *
          sqrt(vec_dot_any(col("cvv"), col("cvv")))))
    VectorIvf.rerankTopK(scored, topk, simCol = "ex")
      .select(col("q_id"), col("rn"), col("c_id"), round(col("ex"), 6).as("sim_r"))
  }
}
