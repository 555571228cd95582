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

  test("property: word-gram kernels equal a naive reimplementation") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.graft.SimilarityKernels
    import org.scalacheck.Gen
    val wordGen = Gen.oneOf("fox", "dog", "the", "a", "jumps", "Über", "ноль")
    val sepGen = Gen.oneOf(" ", "  ", "\t", " \n ")
    val prop = forAll(Gen.listOf(wordGen), sepGen, Gen.choose(1, 4)) { (ws, sep, n) =>
      val text = ws.mkString(sep)
      // naive: n-word windows joined with ONE space; < n words -> one
      // gram of everything (empty text -> the empty gram)
      val grams =
        if (ws.length <= n) Seq(ws.mkString(" "))
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      val gramHashes = grams.map(g => Hashing.fnv1a64(g))
      val expectSet = gramHashes.distinct.sorted
      val gotSet = SimilarityKernels
        .wordShingleSet(UTF8String.fromString(text), n).toLongArray.toSeq
      val perms = SimilarityKernels.perms(7L, 8)
      val expectSig = Array.tabulate(8)(i =>
        gramHashes.map(h => Hashing.fmix64(h ^ perms(i))).min)
      val gotSig = SimilarityKernels
        .minhashWords(UTF8String.fromString(text), n, 8, 7L).toLongArray
      gotSet == expectSet && gotSig.sameElements(expectSig)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("property: char-shingle kernels equal a naive reimplementation") {
    // pins the r13 kernel optimization (shingle hashes deduplicated
    // BEFORE the numHashes loop): min over the distinct set must equal
    // the naive per-occurrence min over the multiset, and the shingle
    // set must stay sorted-distinct — on repetitive text especially
    // (the dedup's own hot case)
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.graft.SimilarityKernels
    import org.scalacheck.Gen
    val pieceGen = Gen.oneOf("abcab", "the the ", "xyz", "ababab", "Über!", "д")
    val prop = forAll(Gen.listOf(pieceGen), Gen.choose(1, 7)) { (ps, k) =>
      val text = ps.mkString
      val len = text.length
      val nShingles = math.max(1, len - k + 1)
      val hs = (0 until nShingles).map(j =>
        Hashing.fnv1a64(text, j, math.min(len, j + k)))
      val expectSet = hs.distinct.sorted
      val gotSet = SimilarityKernels
        .shingleSet(UTF8String.fromString(text), k).toLongArray.toSeq
      val perms = SimilarityKernels.perms(42L, 8)
      val expectSig = Array.tabulate(8)(i =>
        hs.map(h => Hashing.fmix64(h ^ perms(i))).min)
      val gotSig = SimilarityKernels
        .minhash(UTF8String.fromString(text), k, 8, 42L).toLongArray
      gotSet == expectSet && gotSig.sameElements(expectSig)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
