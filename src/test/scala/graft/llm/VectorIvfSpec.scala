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
}
