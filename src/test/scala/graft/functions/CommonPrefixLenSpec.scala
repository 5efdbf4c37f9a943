package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class CommonPrefixLenSpec extends AnyFunSuite {
  private def cpl(a: String, b: String): Int =
    CommonPrefixLen.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("ASCII prefixes, containment, disjoint, and empty cases") {
    assert(cpl("abcde", "abcxy") == 3)
    assert(cpl("abc", "abc") == 3)
    assert(cpl("abc", "abcdef") == 3)
    assert(cpl("x", "y") == 0)
    assert(cpl("", "anything") == 0)
  }

  test("multi-byte code points are never split: a partially-matching " +
    "2-byte char counts zero, a fully-matching one counts one") {
    // é = C3 A9, è = C3 A8 — share the lead byte only
    assert(cpl("é", "è") == 0)
    assert(cpl("éa", "éb") == 1)
    // 4-byte emoji (ONE code point) shared fully, then diverging ASCII
    assert(cpl("😀xy", "😀xz") == 2)
  }

  test("the prefix length is in code points, not bytes") {
    assert(cpl("ééé", "ééx") == 2)
  }
}
