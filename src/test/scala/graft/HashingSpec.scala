package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Test => SCTest}

import graft.functions.Hashing

class HashingSpec extends SparkSpec {

  test("fnv1a64 is deterministic and range-consistent") {
    val h1 = Hashing.fnv1a64("hello world")
    assert(h1 == Hashing.fnv1a64("hello world"))
    assert(Hashing.fnv1a64("xhello worldy", 1, 12) == h1)
    assert(Hashing.fnv1a64("hello") != Hashing.fnv1a64("hellp"))
  }

  test("splitmix64/fmix64 avalanche: sequential seeds decorrelate") {
    val vals = (0L until 1000L).map(Hashing.splitmix64)
    assert(vals.distinct.size == 1000)
    val bits = vals.map(java.lang.Long.bitCount).sum / 1000.0
    assert(bits > 28 && bits < 36) // ~32 set bits on average
  }

  test("property: fnv1a64 substring hash equals standalone hash") {
    val prop = forAll { (a: String, b: String, c: String) =>
      Hashing.fnv1a64(a + b + c, a.length, a.length + b.length) == Hashing.fnv1a64(b)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
