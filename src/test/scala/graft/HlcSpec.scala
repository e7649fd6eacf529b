package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Hlc

class HlcSpec extends AnyFunSuite {
  private def randHlcs(n: Int, seed: Long = 42L): Seq[Hlc] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { _ =>
      Hlc(r.nextLong(Long.MaxValue / 2), r.nextInt(Int.MaxValue / 2))
    }
  }

  test("format round-trips through parse (property)") {
    randHlcs(500).foreach { h => assert(Hlc.parse(h.format) == h) }
  }

  test("format matches the reference wire format %d.%010d") {
    assert(Hlc(1700000000000000123L, 42).format == "1700000000000000123.0000000042")
    assert(Hlc(1, 0).format == "1.0000000000")
  }

  test("parse is strict like the reference (hlc.go): one dot, 10-digit or zero logical, nanos >= 0") {
    // bare nanos: lenient entry point only
    intercept[NumberFormatException] { Hlc.parse("123") }
    assert(Hlc.tryParse("123").contains(Hlc(123, 0)))
    // multi-dot must not silently mis-parse ('5.3' parses where ref errors)
    intercept[NumberFormatException] { Hlc.parse("5.3.7") }
    intercept[NumberFormatException] { Hlc.parse("5.3") } // 1-digit nonzero logical
    assert(Hlc.parse("5.0") == Hlc(5, 0)) // zero-valued logical: any width
    intercept[NumberFormatException] { Hlc.parse("-5.0000000001") }
    assert(Hlc.parse("5.0000000003") == Hlc(5, 3))
  }

  test("ordering is lexicographic on (nanos, logical) (property)") {
    val hs = randHlcs(200)
    for (a <- hs.take(50); b <- hs.take(50)) {
      val expected =
        if (a.nanos != b.nanos) a.nanos < b.nanos else a.logical < b.logical
      assert((a < b) == expected, s"$a vs $b")
    }
    // string order of the wire format == HLC order for equal-width nanos
    val sorted = hs.sorted
    assert(sorted == hs.sortBy(h => (h.nanos, h.logical)))
  }

  test("tryParse rejects garbage") {
    assert(Hlc.tryParse("not-a-ts").isEmpty)
    assert(Hlc.tryParse("12.0000000007").contains(Hlc(12, 7)))
  }
}
