package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.VectorFunctions.{vec_cosine, vec_dot}

/** PQ ANN: codebook shape, code compactness, ADC recall vs brute force. */
class VectorPqSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val e = graft.tables.Tables.embeddings(spark, TestSpark.sf0001)
    .filter(col("vec_id") < 200).cache()

  test("codebook: ≤ m·k centroids, each of dim/m dims; codes cover the corpus") {
    val cb = VectorPq.train(e, "vec_id", "embedding", m = 8, k = 16)
    assert(cb.count() <= 8 * 16)
    assert(cb.select(countDistinct(col("sub"))).head().getLong(0) == 8)
    assert(cb.select(size(col("centroid"))).distinct().head().getInt(0) == 8)
    val codes = VectorPq.encode(e, "vec_id", "embedding", cb)
    // every vector gets exactly one code per subspace
    assert(codes.groupBy("vid").count().filter(col("count") =!= 8).count() == 0)
    assert(codes.select(countDistinct(col("vid"))).head().getLong(0) == e.count())
  }

  test("ADC recall: true top-1 lands in PQ top-10 for most queries") {
    val a = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val b = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    val truth = a.join(b, col("q_id") =!= col("c_id"))
      .withColumn("sim", vec_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("true_nn"))
    val approx = VectorPq.topkApprox(e, "vec_id", "embedding", topk = 10,
      m = 8, k = 16)
    val hits = truth.join(approx,
      truth("q_id") === approx("q_id") && col("true_nn") === col("c_id"))
    val recall = hits.count().toDouble / truth.count()
    info(f"PQ recall@10 of true top-1: $recall%.2f")
    assert(recall >= 0.4, s"PQ recall $recall")
  }

  test("IVFADC: probed-cell candidates only, recall close to exhaustive ADC") {
    val exhaustive = VectorPq.topkApprox(e, "vec_id", "embedding", topk = 10,
      m = 8, k = 16)
    val ivfadc = VectorPq.topkIvfAdc(e, "vec_id", "embedding", topk = 10,
      nlist = 8, nprobe = 4, m = 8, k = 16)
    // same scoring model: where both rank a candidate, the sim agrees
    val joined = exhaustive.select(col("q_id"), col("c_id"), col("sim_r").as("s1"))
      .join(ivfadc.select(col("q_id"), col("c_id"), col("sim_r").as("s2")),
        Seq("q_id", "c_id"))
    assert(joined.filter(abs(col("s1") - col("s2")) > 1e-6).count() == 0)
    // probing half the cells keeps most of the exhaustive top-10
    val overlap = joined.count().toDouble / exhaustive.count()
    info(f"IVFADC overlap with exhaustive ADC top-10: $overlap%.2f")
    assert(overlap >= 0.4, s"IVFADC overlap $overlap")
    assert(ivfadc.filter(col("q_id") === col("c_id")).count() == 0)
  }

  test("residual IVFADC: quantization error shrinks, recall holds up") {
    val a = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val b = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    val truth = a.join(b, col("q_id") =!= col("c_id"))
      .withColumn("sim", vec_cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("true_nn"))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      truth.join(df, truth("q_id") === df("q_id") && col("true_nn") === col("c_id"))
        .count().toDouble / truth.count()
    val plain = recallOf(VectorPq.topkIvfAdc(e, "vec_id", "embedding",
      topk = 10, nlist = 8, nprobe = 4, residual = false))
    val resid = recallOf(VectorPq.topkIvfAdc(e, "vec_id", "embedding",
      topk = 10, nlist = 8, nprobe = 4, residual = true))
    val rerank = recallOf(VectorPq.topkIvfAdc(e, "vec_id", "embedding",
      topk = 10, nlist = 8, nprobe = 4, residual = true, rerankFactor = 4))
    info(f"IVFADC recall@10: plain $plain%.2f residual $resid%.2f rerank $rerank%.2f")
    assert(resid >= 0.3, s"residual recall $resid")
    assert(resid >= plain - 0.1,
      s"residual encoding should not lose recall: $resid vs $plain")
    // exact rerank can only promote true neighbors already in the
    // candidate set — recall must not drop, and usually jumps
    assert(rerank >= resid, s"exact rerank lost recall: $rerank vs $resid")
    // the declared q_cosine_ivfadc operating point (rerankFactor=4):
    // TUNING.md measures 0.65 at nprobe=8; hold a margin-adjusted floor
    // here at nprobe=4 so the config can't silently regress
    assert(rerank >= 0.5, s"rerank recall $rerank below declared floor")
  }

  test("OPQ rotation: orthogonal (geometry preserved), codegen'd, PQ recall holds") {
    val mat = VectorPq.rotationMatrix(64, seed = 7L)
    assert(mat.length == 64 * 64)
    // orthonormality: R·Rᵀ = I (spot-check rows through the expression)
    val rotated = VectorPq.rotate(e, "embedding", mat)
    val both = e.select(col("vec_id"), col("embedding").as("v"))
      .join(rotated.select(col("vec_id"), col("embedding").as("rv")), "vec_id")
    // norms preserved within float tolerance
    val normDrift = both.select(
        abs(sqrt(vec_dot(col("v"), col("v"))) - sqrt(vec_dot(col("rv"), col("rv"))))
          .as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(normDrift < 1e-3, s"rotation changed norms by $normDrift")
    // pairwise cosine preserved → same ground truth
    val a = both.limit(50).select(col("vec_id").as("ai"), col("v").as("av"), col("rv").as("ar"))
    val b = both.limit(50).select(col("vec_id").as("bi"), col("v").as("bv"), col("rv").as("br"))
    val simDrift = a.crossJoin(b).filter(col("ai") < col("bi"))
      .select(abs(vec_cosine(col("av"), col("bv")) - vec_cosine(col("ar"), col("br"))).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(simDrift < 1e-3, s"rotation changed cosine by $simDrift")
    // mismatched matrix size ⇒ NULL, not garbage
    val badRow = e.select(
      graft.functions.VectorFunctions.vec_rotate(lit(Array(1.0f, 2.0f)), col("embedding"))
        .as("r")).head()
    assert(badRow.isNullAt(0))
  }

  test("deterministic: two runs produce identical rankings") {
    val r1 = VectorPq.topkApprox(e, "vec_id", "embedding", topk = 3)
      .collect().map(_.toSeq).toSeq
    val r2 = VectorPq.topkApprox(e, "vec_id", "embedding", topk = 3)
      .collect().map(_.toSeq).toSeq
    assert(r1 == r2)
  }
}
