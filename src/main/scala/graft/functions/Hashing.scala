package graft.functions

/** Deterministic 64-bit hashing primitives shared by the dedup /
  * similarity expressions. Pure, allocation-free, stable across JVMs —
  * these values feed hash-partitioned shuffles and test oracles, so they
  * must never depend on JVM identity hashing or Scala library versions.
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  /** FNV-1a over UTF-8 bytes of a char range. */
  def fnv1a64(s: CharSequence, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      // hash UTF-16 code units directly (deterministic; inputs are text)
      h ^= (c & 0xff); h *= FnvPrime
      h ^= ((c >> 8) & 0xff); h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a64(s: CharSequence): Long = fnv1a64(s, 0, s.length)

  /** splitmix64 — used to derive per-permutation minhash parameters and
    * pseudo-random hyperplanes from a seed.
    */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Finalizer (murmur3 fmix64) for combining already-hashed values. */
  def fmix64(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
    v ^ (v >>> 33)
  }
}
