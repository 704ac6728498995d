package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.VectorFunctions.vec_cosine

/** IVF ANN: codebook shape, recall vs brute force, candidate pruning. */
class VectorIvfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val e = graft.tables.Tables.embeddings(spark, TestSpark.sf0001)
    .filter(col("vec_id") < 200).cache()

  test("training produces nlist centroids of the right dimension") {
    val cents = VectorIvf.train(e, "vec_id", "embedding", nlist = 8)
    assert(cents.count() == 8)
    assert(cents.select(size(col("centroid"))).distinct().head().getInt(0) == 64)
  }

  test("IVF top-5 recall of true top-1 beats the no-probe floor") {
    val a = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val b = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    val truth = a.join(b, col("q_id") =!= col("c_id"))
      .withColumn("sim", vec_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("true_nn"))
    val approx = VectorIvf.topkApprox(e, "vec_id", "embedding", k = 5,
      nlist = 8, nprobe = 4)
    val hits = truth.join(approx,
      truth("q_id") === approx("q_id") && col("true_nn") === col("c_id"))
    val recall = hits.count().toDouble / truth.count()
    // unclustered corpus: probing half the cells must find most true NNs
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("probing fewer cells inspects fewer candidates than brute force") {
    val approx = VectorIvf.topkApprox(e, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2)
    assert(approx.count() > 0)
    // sanity: every query's results are its own (no cross-contamination)
    assert(approx.filter(col("q_id") === col("c_id")).count() == 0)
  }

  test("bounded probe equals the collect_list + sort + slice formulation") {
    import graft.functions.VectorFunctions.vec_cosine
    val cents = VectorIvf.train(e, "vec_id", "embedding", nlist = 8)
      .localCheckpoint(true)
    val q = e.select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val bounded = VectorIvf.probeCells(q, cents, nprobe = 3)
      .select(col("q_id"), col("cid"))
    // the unbounded reference formulation the bounded aggregate replaced
    val reference = q.crossJoin(broadcast(cents))
      .withColumn("sim", vec_cosine(col("vec"),
        transform(col("centroid"), x => x.cast("float"))))
      .groupBy(col("vid"))
      .agg(slice(sort_array(collect_list(struct(col("sim"), (-col("cid")).as("ncid"))),
        asc = false), 1, 3).as("top"))
      .select(col("vid").as("q_id"), explode(col("top")).as("p"))
      .select(col("q_id"), (-col("p.ncid")).as("cid"))
    assert(bounded.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(bounded).count() == 0)
  }

  test("knn-graph clustering: edge recall vs the exact mutual graph, " +
    "partition validity, determinism") {
    val sf = TestSpark.sf0001
    def run() = graft.SparkEntry.queries("q_knn_graph_clusters")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val r1 = run()
    assert(r1 == run(), "seeded pipeline must be bit-deterministic")
    val Seq(Seq(nNodes: Long, hasEdges: Long, partOk: Long, floorOk: Long)) = r1
    val full = graft.tables.Tables.embeddings(spark, sf)
    assert(nNodes == full.count())
    assert(hasEdges == 1L && partOk == 1L && floorOk == 1L)

    // exact mutual-kNN graph (brute force, k = 4) vs the approx mutual
    // graph rebuilt from the same engine path: the approx graph must be
    // nonempty and recover a healthy fraction of true mutual edges —
    // the graph-level recall the invariant row's per-list floor implies
    // same √n operating point as the declared query (constant nprobe)
    val nQ = full.count()
    val nlist = math.max(16, math.min(256,
      math.ceil(math.sqrt(nQ.toDouble)).toInt))
    val approx = VectorIvf.topkApprox(full, "vec_id", "embedding",
      k = 4, nlist = nlist, nprobe = 8, trainFraction = 0.2)
      .select(col("q_id"), col("c_id"))
    def mutualOf(knn: org.apache.spark.sql.DataFrame) = knn.as("f")
      .join(knn.as("r"), col("f.q_id") === col("r.c_id") &&
        col("f.c_id") === col("r.q_id"))
      .filter(col("f.q_id") < col("f.c_id"))
      .select(col("f.q_id").as("id_a"), col("f.c_id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = full.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val b = full.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    val exactKnn = a.join(b, col("q_id") =!= col("c_id"))
      .withColumn("sim", vec_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("q_id"), col("c_id"))
    val (exactM, approxM) = (mutualOf(exactKnn), mutualOf(approx))
    assert(exactM.nonEmpty && approxM.nonEmpty)
    val edgeRecall = (exactM & approxM).size.toDouble / exactM.size
    assert(edgeRecall >= 0.30,
      s"mutual-edge recall collapsed: $edgeRecall (|exact|=${exactM.size})")
    // every approx mutual edge is a genuine kNN agreement by
    // construction; the clusters must only ever merge along such edges
    // — verified via partition totality above plus nonempty edge set
  }
}
