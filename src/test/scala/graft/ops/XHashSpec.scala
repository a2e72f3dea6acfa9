package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class XHashSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  val in62: Gen[Long] = Gen.chooseNum(0L, XHash.Mask62)

  test("mix62 stays in the 62-bit domain and is collision-free on samples") {
    check(Prop.forAll(in62) { z =>
      val m = XHash.mix62(z)
      m >= 0L && m <= XHash.Mask62
    })
    // injectivity spot-check over 100k distinct preimages (mix62 is a true
    // bijection: odd-constant mults mod 2^62 and 62-bit xorshifts invert)
    val seen = new java.util.HashSet[java.lang.Long](1 << 18)
    var i = 0L
    while (i < 50000) { assert(seen.add(XHash.mix62(i)), s"collision at $i"); i += 1 }
    var k = 0L
    while (k < 50000) {
      assert(seen.add(XHash.mix62((1L << 40) + k)), s"collision at high+$k")
      k += 1
    }
  }

  test("hashChars: domain containment, determinism, sensitivity") {
    assert(XHash.hashChars("") == XHash.mix62(XHash.FnvInit))
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val h = XHash.hashChars(s)
      h >= 0L && h <= XHash.Mask62 && h == XHash.hashChars(s)
    })
    assert(XHash.hashChars("ab") != XHash.hashChars("ba")) // order matters
    assert(XHash.hashChars("a") != XHash.hashChars("a "))
  }

  test("fold is order-sensitive and stays in domain") {
    val a = Array(1L, 2L, 3L)
    val b = Array(3L, 2L, 1L)
    assert(XHash.fold(a) != XHash.fold(b))
    assert(XHash.fold(a) <= XHash.Mask62 && XHash.fold(a) >= 0)
  }

  test("62-bit dedup primitives never exceed the cross-engine domain") {
    // the DuckDB twin computes in HUGEINT % 2^62 — any Scala value outside
    // [0, 2^62) would silently diverge; minhash sentinel is Mask62 itself
    assert(Dedup.minhashSalt(0) <= XHash.Mask62 && Dedup.minhashSalt(0) >= 0)
    assert(Dedup.minhashSalt(63) <= XHash.Mask62)
    check(Prop.forAll(in62, in62) { (s, salt) =>
      val h = XHash.mix62(s ^ salt)
      h >= 0L && h <= XHash.Mask62
    })
  }

  test("hashChars folds codepoints, not UTF-16 units (non-BMP oracle parity)") {
    // the DuckDB twin folds ascii() over per-character splits = codepoints;
    // an astral char must fold as ONE step with its codepoint value
    val astral = "a\uD83D\uDE00b" // 'a', U+1F600, 'b'
    var h = XHash.FnvInit
    Seq(97L, 0x1F600L, 98L).foreach(cp => h = XHash.fnvStep(h, cp))
    assert(XHash.hashChars(astral) == XHash.mix62(h))
    // and differs from the (wrong) surrogate-pair fold
    var hs = XHash.FnvInit
    astral.foreach(c => hs = XHash.fnvStep(hs, c.toLong))
    assert(XHash.hashChars(astral) != XHash.mix62(hs))
  }
}
