package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper (the scalatest/scalacheck
  * bridge artifact is not on the offline classpath, so we drive Gen
  * directly).
  */
trait PropHelper {
  def forAllGen[A](gen: Gen[A], trials: Int = 200)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < trials) {
      val a = gen.pureApply(Gen.Parameters.default, seed)
      check(a)
      seed = seed.next
      i += 1
    }
  }

  def forAllGen2[A, B](ga: Gen[A], gb: Gen[B], trials: Int = 200)(
      check: (A, B) => Unit): Unit =
    forAllGen(Gen.zip(ga, gb), trials) { case (a, b) => check(a, b) }
}
