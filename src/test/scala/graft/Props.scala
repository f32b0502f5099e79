package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check driver (the scalatestplus bridge is
  * not in the offline artifact cache, so we drive scalacheck Gens directly).
  */
object Props {
  def forAll[A](gen: Gen[A], n: Int = 100, seed0: Long = 42L)(f: A => Unit): Unit = {
    var seed = Seed(seed0)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try f(a)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed on iteration $i: $a", e)
          }
        case None =>
      }
      seed = seed.next
      i += 1
    }
  }

  def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    forAll(ga.flatMap(a => gb.map(b => (a, b))), n)(t => f(t._1, t._2))

  def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 100)(
      f: (A, B, C) => Unit): Unit =
    forAll(ga.flatMap(a => gb.flatMap(b => gc.map(c => (a, b, c)))), n)(t =>
      f(t._1, t._2, t._3))
}
