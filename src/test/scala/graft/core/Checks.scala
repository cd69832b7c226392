package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check driver over scalacheck Gen (the scalatestplus
  * bridge is not in the offline cache). Deterministic: fixed seeds. */
object Checks {
  def forAllSeeded[A](gen: Gen[A], n: Int = 200)(fn: A => Unit): Unit = {
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach { a =>
        try fn(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed for input: $a", e)
        }
      }
      i += 1
    }
  }
}
