package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vec_cosine

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * clustering-based scale path beside sign-LSH ([[VectorLsh]]): a small
  * k-means codebook partitions the corpus into `nlist` cells; a query
  * probes only its `nprobe` nearest cells and exact-reranks the cell
  * members. Candidate generation is an equi-join on cell id — cost
  * O(n·nlist) assignment (broadcast codebook, codegen'd cosine) plus
  * O(collisions), never O(n²).
  *
  * Training is Lloyd's iterations expressed relationally: assign =
  * broadcast-join + window argmax; update = positional explode +
  * per-dimension mean. Deterministic: seeds are the lowest-id vectors,
  * ties break on cell id.
  */
object VectorIvf {

  /** (cid, centroid) codebook after `iters` Lloyd iterations.
    *
    * `trainFraction` < 1 trains on a deterministic sample — the 100 TB
    * path: k-means quality needs only a representative sample (thousands
    * of points per centroid), so training cost stays flat while the
    * assign-only pass streams the full corpus once. */
  def train(vecs: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 2, trainFraction: Double = 1.0): DataFrame = {
    val all = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val v = if (trainFraction >= 1.0) all
      else all.sample(withReplacement = false, trainFraction, seed = 42L)
    // seeds: the nlist lowest-id vectors (limit first — the global
    // row_number window then only orders nlist rows, not the corpus;
    // at real scale train on a sample here)
    var cents = v.orderBy(col("vid")).limit(nlist)
      .withColumn("cid", row_number().over(Window.orderBy(col("vid"))) - 1)
      .select(col("cid"),
        transform(col("vec"), x => x.cast("double")).as("centroid"))
    (0 until iters).foreach { _ =>
      val assigned = assign(v, cents)
      // centroid update in ONE aggregation: the vec_sum imperative
      // aggregate keeps rows intact (no posexplode ×dim blow-up) and one
      // shuffle per iteration where the per-(cid,pos) avg + re-collect
      // formulation needed two. Same arithmetic: per-dimension double
      // sum in row order, divided by the member count.
      cents = assigned
        .groupBy(col("cid"))
        .agg(graft.functions.VectorSumAgg.vec_sum(col("vec")).as("vsum"),
          count(lit(1)).as("n"))
        .select(col("cid"),
          transform(col("vsum"), x => x / col("n")).as("centroid"))
    }
    cents.select(col("cid"), transform(col("centroid"), x => x.cast("float")).as("centroid"))
  }

  /** Nearest-cell assignment: broadcast codebook, max_by argmax.
    *
    * A window argmax here would push all n·nlist scored rows through a
    * sort exchange; max_by gets map-side partial aggregation, so only ~n
    * pre-reduced rows shuffle. Ties break to the lowest cid via the
    * (sim, -cid) ordering struct (lexicographic max).
    */
  private[llm] def assign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents.select(col("cid"),
        transform(col("centroid"), x => x.cast("float")).as("centroid"))))
      .withColumn("sim", vec_cosine(col("vec"), col("centroid")))
      .groupBy(col("vid"))
      .agg(max_by(struct(col("cid"), col("vec")),
        struct(col("sim"), (-col("cid")).as("tie"))).as("m"))
      .select(col("vid"), col("m.vec").as("vec"), col("m.cid").as("cid"))

  /** (q_id, qv, cid): each query's `nprobe` nearest cells, as an
    * aggregate rather than a window, and a BOUNDED one: CollectTopK keeps
    * a priority queue of only nprobe entries per group (partial-merged
    * map-side), so per-query state is O(nprobe) where a collect_list +
    * sort + slice would buffer all nlist cell scores — the difference
    * between KBs and MBs per in-flight group at production nlist ≈ √n.
    * Desc by (sim, -cid) = sim desc then cid asc, as before. */
  private[llm] def probeCells(q: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
    def topN(e: org.apache.spark.sql.Column, n: Int) =
      toColumn(GraftAggBridge.collectTopK(toExpression(e), n))
    q.crossJoin(broadcast(cents))
      .withColumn("sim", vec_cosine(col("vec"),
        transform(col("centroid"), x => x.cast("float"))))
      .groupBy(col("vid"))
      .agg(first(col("vec")).as("qv"),
        topN(struct(col("sim"), (-col("cid")).as("ncid")), nprobe).as("top"))
      .select(col("vid").as("q_id"), col("qv"),
        explode(col("top")).as("p"))
      .select(col("q_id"), col("qv"), (-col("p.ncid")).as("cid"))
  }

  /** Exact rerank tail shared by the approx operators (r16 opt): per-
    * query top-k as the BOUNDED CollectTopK aggregate instead of a
    * row_number window — the candidate frame arrives partitioned by
    * cell id, so the window needed a full exchange + sort of EVERY
    * scored candidate, while the aggregate partial-merges a k-entry
    * priority queue map-side and shuffles only ~k rows per (query,
    * map partition). Ordering struct (sim, −c_id) descending ≡ the
    * window's (sim desc, c_id asc); the array comes back sorted
    * descending, so rn = position + 1 reproduces row_number exactly
    * (ties impossible: c_id is unique per query). */
  private[llm] def rerankTopK(scored: DataFrame, k: Int,
      simCol: String = "sim"): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
    def topN(e: org.apache.spark.sql.Column, n: Int) =
      toColumn(GraftAggBridge.collectTopK(toExpression(e), n))
    scored
      .groupBy(col("q_id"))
      .agg(topN(struct(col(simCol).as("s"), (-col("c_id")).as("nc")), k)
        .as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rn"),
        (-col("col.nc")).as("c_id"), col("col.s").as(simCol))
  }

  /** Top-`k` approximate cosine neighbors per query vector, probing the
    * `nprobe` nearest cells. `queries` defaults to the whole corpus;
    * restrict it for bounded workloads. */
  def topkApprox(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      queries: Option[DataFrame] = None,
      trainFraction: Double = 1.0): DataFrame = {
    val v = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val q = queries.getOrElse(vecs)
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
    // eager localCheckpoint: assign/probe plans scan the materialized
    // codebook instead of re-optimizing the unrolled Lloyd training tree;
    // storage is GC-reclaimed once the query's references drop (a cache()
    // would pin it in the CacheManager for the session)
    val cents = train(vecs, idCol, vecCol, nlist, iters, trainFraction)
      .localCheckpoint(true)
    val members = assign(v, cents) // (vid, vec, cid): the inverted lists
    val probes = probeCells(q, cents, nprobe)
    // exact rerank of probed-cell members (bounded top-k aggregate; each
    // (q_id, rn) emitted once, so no trailing distinct)
    val scored = probes.join(members
        .select(col("cid"), col("vid").as("c_id"), col("vec").as("cv")), "cid")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", vec_cosine(col("qv"), col("cv")))
    rerankTopK(scored, k)
      .select(col("q_id"), col("rn"), col("c_id"), round(col("sim"), 6).as("sim_r"))
  }

  /** Operating-point sweep support: ONE trained codebook + ONE
    * inverted-list assignment, probed at several nprobe values. The
    * per-point approx frames share the same partition of space, which
    * is what makes cross-point recall comparisons meaningful — and
    * makes recall PROVABLY monotone in nprobe: a larger probe set
    * yields a candidate SUPERSET, and the exact top-1 (globally
    * maximal (sim, −id)) can never be displaced from a top-k once a
    * candidate — whereas independently retrained codebooks (float-sum
    * row order moves centroids between jobs) could flip it. */
  def topkApproxSweep(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int, nprobes: Seq[Int], iters: Int = 2,
      queries: Option[DataFrame] = None,
      trainFraction: Double = 1.0): Seq[(Int, DataFrame)] = {
    val v = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val q = queries.getOrElse(vecs)
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val cents = train(vecs, idCol, vecCol, nlist, iters, trainFraction)
      .localCheckpoint(true)
    val members = assign(v, cents).localCheckpoint(true)
    nprobes.map { np =>
      val probes = probeCells(q, cents, np)
      val scored = probes.join(members
          .select(col("cid"), col("vid").as("c_id"), col("vec").as("cv")),
          "cid")
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("sim", vec_cosine(col("qv"), col("cv")))
      np -> rerankTopK(scored, k)
        .select(col("q_id"), col("rn"), col("c_id"),
          round(col("sim"), 6).as("sim_r"))
    }
  }

  /** Top-`k` approximate LABEL-DISJOINT neighbors (hard-negative mining
    * at scale): identical IVF cell probing, but the candidate scan keeps
    * each vector's label and drops same-label pairs BEFORE the exact
    * rerank — the label filter rides the inverted-list join, so the
    * probe cost is the filtered cell population, exactly how a
    * production contrastive-sampling pass pushes the class predicate
    * into the ANN bucket scan. Rerank ordering matches the exact
    * operator (round-6 cosine desc, c_id asc). */
  def topkApproxLabelDisjoint(vecs: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      queries: Option[DataFrame] = None,
      trainFraction: Double = 1.0): DataFrame = {
    val labels = vecs.select(col(idCol).as("vid"), col(labelCol).as("lbl"))
    val v = vecs.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val q = queries.getOrElse(vecs)
      .select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val cents = train(vecs, idCol, vecCol, nlist, iters, trainFraction)
      .localCheckpoint(true)
    val members = assign(v, cents).join(labels, "vid")
    val probes = probeCells(q, cents, nprobe).join(
      labels.select(col("vid").as("q_id"), col("lbl").as("q_label")), "q_id")
    // label columns ride through the bounded top-k aggregate inside the
    // ordering struct's payload — same (sim_r desc, c_id asc) order
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
    def topN(e: org.apache.spark.sql.Column, n: Int) =
      toColumn(GraftAggBridge.collectTopK(toExpression(e), n))
    probes.join(members
        .select(col("cid"), col("vid").as("c_id"), col("vec").as("cv"),
          col("lbl").as("c_label")), "cid")
      .filter(col("q_label") =!= col("c_label"))
      .withColumn("sim_r", round(vec_cosine(col("qv"), col("cv")), 6))
      .groupBy(col("q_id"))
      .agg(topN(struct(col("sim_r").as("s"), (-col("c_id")).as("nc"),
        col("q_label").as("ql"), col("c_label").as("cl")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rn"),
        (-col("col.nc")).as("c_id"),
        col("col.ql").as("q_label"), col("col.cl").as("c_label"),
        col("col.s").as("sim_r"))
  }
}
