package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Hashing
import org.apache.spark.sql.graft.SimilarityKernels

/** Driver-side microbench of the r13 minhash-kernel optimization
  * (shingle-hash dedup before the numHashes loop): interleaved
  * old-shape vs shipped kernel over the real bench texts, so box-level
  * CPU steal hits both alternatives equally. Also reports the measured
  * duplicate-shingle rate, which is the whole basis of the win.
  */
object KernelBench {
  // the pre-r13 kernel, verbatim (per-occurrence inner loop)
  private def minhashOld(text: UTF8String, k: Int, numHashes: Int, seed: Long): Array[Long] = {
    val s = text.toString
    val len = s.length
    val nShingles = math.max(1, len - k + 1)
    val p = SimilarityKernels.perms(seed, numHashes)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < nShingles) {
      val h = Hashing.fnv1a64(s, j, math.min(len, j + k))
      var i = 0
      while (i < numHashes) {
        val v = Hashing.fmix64(h ^ p(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    println(s"[kbench] ${texts.length} docs")

    // duplicate-shingle rate at k=5 chars
    var tot = 0L; var dist = 0L
    texts.foreach { t =>
      val s = t.toString
      val n = math.max(1, s.length - 5 + 1)
      val hs = (0 until n).map(j => Hashing.fnv1a64(s, j, math.min(s.length, j + 5)))
      tot += n; dist += hs.distinct.size
    }
    println(f"[kbench] char-5 shingles: total=$tot distinct=$dist (${100.0 * dist / tot}%.1f%% distinct)")

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val dt = (System.nanoTime() - t0) / 1e9
      println(f"[kbench] $name%-14s $dt%7.3f s"); dt
    }
    var sink = 0L
    for (round <- 1 to 3) {
      time(s"old r$round") { texts.foreach(t => sink += minhashOld(t, 5, 64, 42L)(0)) }
      time(s"new r$round") { texts.foreach(t =>
        sink += SimilarityKernels.minhash(t, 5, 64, 42L).getLong(0)) }
    }
    println(s"[kbench] sink=$sink")
    spark.stop()
  }
}
