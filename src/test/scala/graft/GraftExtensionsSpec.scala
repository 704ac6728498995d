package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The library's install path: a user enables everything with
  * `spark.sql.extensions=graft.GraftExtensions` and gets the vector
  * expressions in SQL plus the native as-of join strategy — no
  * per-session registration calls. Nothing else exercised this wiring,
  * so a broken injectFunction/injectPlannerStrategy would only surface
  * in a user's cluster.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) registers functions + strategy") {
    val base = TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      // same JVM/SparkContext, fresh session built THROUGH the extensions
      // hook. (The `spark.sql.extensions=graft.GraftExtensions` conf form
      // runs the identical injection but is read from the SparkContext's
      // conf at session build — unreachable in a suite that shares one
      // context; withExtensions exercises the same GraftExtensions.apply.)
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "builder must create a fresh session, not reuse the test one")
      val row = s.sql(
        """SELECT vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |  vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
          |  vec_sqdist(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS s,
          |  vec_dot_any(array(1.0F, 1.0F), array(2.0D, 3.0D)) AS a,
          |  vec_rotate(array(0.0F, 1.0F, 1.0F, 0.0F), array(5.0F, 7.0F)) AS r
          |""".stripMargin).head()
      assert(row.getDouble(0) == 1.0)
      assert(row.getDouble(1) == 11.0)
      assert(row.getDouble(2) == 25.0)
      assert(row.getDouble(3) == 5.0)
      assert(row.getSeq[Float](4) == Seq(7.0f, 5.0f)) // [[0,1],[1,0]]·(5,7)
      assert(s.sessionState.planner.extraPlanningStrategies
        .contains(graft.plans.AsOfJoinStrategy),
        "as-of strategy not injected")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
