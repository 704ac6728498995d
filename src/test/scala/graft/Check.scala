package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Minimal scalatest↔scalacheck bridge (org.scalatestplus is not in the
  * offline artifact cache): run a Prop, fail the suite on falsification. */
object Check {
  def ok(p: Prop, minTests: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  /** forAll without shrinking — byte-array-list shrink trees explode. */
  def okNoShrink[A](g: Gen[A], minTests: Int = 60)(f: A => Boolean): Unit =
    ok(Prop.forAllNoShrink(g)(f), minTests)
}
