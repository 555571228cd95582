package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import org.apache.spark.sql.graft.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop of the
  * (small) query set against the corpus, ranked per query. Exact, one
  * pass over the corpus, no shuffle of the corpus itself; this is the
  * right plan even at 100 TB when the query set broadcasts.
  *
  * Scale path: sign-LSH (random-hyperplane) bucketing — `tables`
  * independent hash tables of `planes` sign bits each. Corpus and
  * queries bucket identically; candidates come from bucket equi-joins
  * (shuffle keyed by bucket, linear in corpus size), then exact cosine
  * re-ranks. Recall grows with `tables`; cost stays corpus-linear.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim) — derived from splitmix64, uniform in [-1, 1).
    */
  private def planeComponent(table: Int, plane: Int, dim: Int): Float = {
    val h = Hashing.splitmix64(table.toLong * 1000003L + plane.toLong * 8191L + dim)
    (h.toDouble / Long.MaxValue.toDouble).toFloat
  }

  /** Adds (table, bucket) rows per input row: bucket = sign bits of the
    * embedding against `planes` hyperplanes, one row per hash table.
    *
    * `dim` is the embedding dimensionality; pass it explicitly (callers
    * know their embedding width) — the default -1 falls back to probing
    * the first row, which costs a driver-side Spark job per call.
    */
  def withSignBuckets(emb: DataFrame, embedCol: String, planes: Int, tables: Int,
                      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else emb.select(size(col(embedCol))).head().getInt(0)
    def bucketFor(t: Int): Column = {
      val bits: Seq[Column] = (0 until planes).map { p =>
        val hp = array((0 until d).map(i => lit(planeComponent(t, p, i))): _*)
        when(dot_product(col(embedCol), hp) >= 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
    }
    emb.select((emb.columns.map(col) :+
      posexplode(array((0 until tables).map(bucketFor): _*)).as(Seq("table", "bucket"))): _*)
  }

  /** Exact brute-force top-k by cosine. `queries` must be small enough
    * to broadcast (driver enforces nothing; Spark's AQE would demote if
    * not). Returns (query_id, vec_id, cos, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact all-pairs cosine similarity above `threshold` — the O(n²)
    * exactness baseline that the LSH path ([[Dedup.embeddingNearDups]])
    * approximates. Broadcast self-join: only valid for corpora (or
    * deterministic samples of corpora) small enough to broadcast one
    * side; at 100 TB use the sign-LSH path and reserve this for
    * recall audits over samples.
    */
  def allPairsExact(emb: DataFrame, threshold: Double,
                    maxRows: Long = 200000L): DataFrame = {
    // guardrail: this is O(n^2) by declaration — refuse to run over an
    // input too large to be an audit sample, so the exactness baseline
    // can never silently become a production path on a full corpus
    val n = emb.count()
    require(n <= maxRows,
      s"allPairsExact is an O(n^2) audit baseline: got $n rows (cap $maxRows). " +
      "Deterministically sample the corpus first (Sampling.deterministicSample) " +
      "or use the sign-LSH path (Dedup.embeddingNearDups).")
    val right = emb.select(col("vec_id").as("vec_id_b"), col("embedding").as("emb_b"))
    emb.select(col("vec_id").as("vec_id_a"), col("embedding").as("emb_a"))
      .join(broadcast(right), col("vec_id_a") < col("vec_id_b"))
      .select(col("vec_id_a"), col("vec_id_b"),
        cosine_similarity(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed approximate top-k: candidates from shared sign-LSH
    * buckets across `tables` tables, exact cosine re-rank.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 10, tables: Int = 6, dim: Int = -1): DataFrame = {
    // resolve the dim once for both bucketing passes (one probe job at
    // most, zero when the caller passes it)
    val d = if (dim > 0) dim
            else corpus.select(size(col("embedding"))).head().getInt(0)
    val cb = withSignBuckets(corpus, "embedding", planes, tables, d)
      .select(col("table"), col("bucket"), col("vec_id"), col("embedding"))
    val qb = withSignBuckets(queries, "embedding", planes, tables, d)
      .select(col("table"), col("bucket"),
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("q_emb"))
      .dropDuplicates("query_id", "vec_id")
    val scored = cands.select(col("query_id"), col("vec_id"),
      cosine_similarity(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
