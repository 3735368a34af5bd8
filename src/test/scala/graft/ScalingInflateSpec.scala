package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two text-inflation regimes of the Scaling harness
  * (VERDICT r11 item 1): the default FIXED-DENSITY mode must produce
  * pairwise-distinct letter permutations across every copy up to the
  * affine period — so text-dedup scaling rows measure plan behavior,
  * never F²-growing exact-twin output — while the LABELED dup-heavy
  * mode keeps the period-26 rotation whose wrap plants the exact
  * cross-copy twins the duplicate-laden-crawl rows exist to measure.
  * Pure string-level properties: the `translate` application is shared
  * plumbing already exercised by the harness itself. */
class ScalingInflateSpec extends AnyFunSuite {
  private val lower = "abcdefghijklmnopqrstuvwxyz"

  test("fixed-density copies 0..25 are the old Caesar rotations — " +
      "prior artifacts at factors <= 26 stay byte-comparable") {
    for (k <- 0 until 26)
      assert(Scaling.permAlphabet(lower, k, dupHeavy = false) ===
        lower.drop(k) + lower.take(k), s"copy $k")
  }

  test("fixed-density maps are pairwise-distinct bijections up to the " +
      "affine period") {
    val maps = (0 until Scaling.AffineTextPeriod)
      .map(k => Scaling.permAlphabet(lower, k, dupHeavy = false))
    assert(maps.distinct.size === Scaling.AffineTextPeriod)
    maps.zipWithIndex.foreach { case (m, k) =>
      assert(m.sorted.mkString === lower, s"copy $k is not a bijection")
    }
  }

  test("two distinct fixed-density maps agree on at most 2 letters — " +
      "docs with >= 3 distinct letters never collide across copies") {
    val maps = (0 until Scaling.AffineTextPeriod)
      .map(k => Scaling.permAlphabet(lower, k, dupHeavy = false))
    for (i <- maps.indices; j <- (i + 1) until maps.size) {
      val agree = (0 until 26).count(p => maps(i)(p) == maps(j)(p))
      assert(agree <= 2,
        s"copies $i and $j agree on $agree letters (gcd bound is 2)")
    }
  }

  test("dup-heavy maps wrap at period 26 (the planted-twin mechanism); " +
      "fixed-density maps at the same offsets do not") {
    assert(Scaling.permAlphabet(lower, 3, dupHeavy = true) ===
      Scaling.permAlphabet(lower, 29, dupHeavy = true))
    assert(Scaling.permAlphabet(lower, 3, dupHeavy = false) !==
      Scaling.permAlphabet(lower, 29, dupHeavy = false))
  }
}
