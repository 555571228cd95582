package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the graft native expressions: makes
  * `cosine_similarity`, `dot_product`, `minhash_signature`, `simhash64`,
  * `rolling_hash64`, `shingle_set`, `word_shingle_set`, `minhash_words`
  * callable from `spark.sql(...)`.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    at session build time (the standard plugin mechanism);
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => BandedIntervalJoinRule)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (args => CosineSimilarity(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "simhash64" -> (args => SimHash64(args(0))),
    "rolling_hash64" -> (args => RollingHash64(args(0))),
    "fnv64" -> (args => Fnv64(args(0))),
    "fnv_mix64" -> (args => FnvMix64(args(0))),
    "fmix64" -> (args => Fmix64(args(0))),
    "jump_hash" -> (args => JumpHash(args(0), intArg(args(1), "shards"))),
    "shingle_set" -> (args =>
      ShingleSet(args(0), if (args.length > 1) intArg(args(1), "k") else 5)),
    "minhash_signature" -> (args => MinHashSignature(args(0),
      if (args.length > 1) intArg(args(1), "k") else 5,
      if (args.length > 2) intArg(args(2), "numHashes") else 64,
      if (args.length > 3) longArg(args(3), "seed") else 42L)),
    "word_shingle_set" -> (args =>
      WordShingleSet(args(0), if (args.length > 1) intArg(args(1), "n") else 3)),
    "minhash_words" -> (args => MinHashWordSignature(args(0),
      if (args.length > 1) intArg(args(1), "n") else 3,
      if (args.length > 2) intArg(args(2), "numHashes") else 64,
      if (args.length > 3) longArg(args(3), "seed") else 42L)),
    "interleave_bits" -> (args => InterleaveBits(args(0), args(1))),
    "hilbert_key" -> (args => HilbertKey(args(0), args(1))),
    "nfc_normalize" -> (args => NfcNormalize(args(0))),
    "char_entropy_stats" -> (args => CharEntropyStats(args(0))),
    "random_project" -> (args => RandomProject(args(0),
      if (args.length > 1) intArg(args(1), "k") else 8))
  )

  /** Register the functions and the banded-interval-join rewrite on an
    * already-built session (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(BandedIntervalJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandedIntervalJoinRule
  }
}
