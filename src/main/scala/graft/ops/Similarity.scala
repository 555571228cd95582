package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Adds (table, bucket) rows per input row: bucket = sign bits of the
    * embedding against `planes` hyperplanes, one row per hash table.
    *
    * Bucketing runs in one codegen expression ([[SignBuckets]]) that
    * derives each hyperplane component on the fly from splitmix64
    * (cached per executor), so the plan carries only (planes, tables) —
    * independent of embedding dimensionality. The former construction
    * inlined planes x tables x dim float literals into the plan, which
    * at a production 768-dim / 12-plane / 8-table shape would push ~74k
    * literals through codegen.
    *
    * `dim` is retained for API stability but unused: the kernel reads
    * the dimensionality from each row, so no probe job ever runs.
    *
    * Rows with a null embedding are excluded (explicitly, not as a
    * side effect of posexplode over a null array): a null vector has
    * no direction, so it cannot be a near-duplicate candidate —
    * bucketing all nulls together would only manufacture an all-pairs
    * hot bucket of unscorable rows.
    */
  def withSignBuckets(emb: DataFrame, embedCol: String, planes: Int, tables: Int,
                      dim: Int = -1): DataFrame =
    emb.where(col(embedCol).isNotNull)
      .select((emb.columns.toIndexedSeq.map(col) :+
        posexplode(sign_buckets(col(embedCol), planes, tables)).as(Seq("table", "bucket"))): _*)

  /** The ONE guarded brute-force scoring kernel shared by
    * [[bruteForceTopK]], [[hardNegatives]] and [[quantizedTopK]]'s
    * exact re-rank: broadcast the (guard-capped) query side, scan the
    * corpus once, emit (query_id, vec_id, cos). The cap is the
    * [[allPairsExact]] guardrail convention — the query side rides a
    * broadcast AND every corpus row is scored against every query, so
    * an oversized query set is an O(n·q) scan nobody declared; refuse
    * rather than degrade.
    */
  private def bruteScores(corpus: DataFrame, queries: DataFrame,
                          maxQueries: Long, op: String): DataFrame = {
    val nq = queries.count()
    require(nq <= maxQueries,
      s"$op broadcasts and cross-scores the query side: got $nq " +
      s"queries (cap $maxQueries). Sample the queries or use the ANN path " +
      "(Ivf.probe / Dedup.embeddingNearDups) for large query sets.")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("q_emb")).as("cos"))
  }

  /** Per-query (cos DESC, vec_id) top-k over a (query_id, vec_id, cos)
    * relation — the rank-filter sits directly on row_number so
    * WindowGroupLimit prunes per map task.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact brute-force top-k by cosine. `queries` must be small enough
    * to broadcast ([[bruteScores]] refuses above `maxQueries`); a real
    * large-query workload is an ANN problem ([[Ivf]], sign-LSH).
    * Returns (query_id, vec_id, cos, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     maxQueries: Long = 10000L): DataFrame =
    rankTopK(bruteScores(corpus, queries, maxQueries, "bruteForceTopK"), k)

  /** Hard-negative mining for contrastive retrieval training (the
    * DPR / bi-encoder data-prep pass, Karpukhin et al. 2020): for
    * each query vector, the top-k most-similar corpus vectors
    * EXCLUDING the query itself and its declared positives — exactly
    * the near-miss negatives that make a contrastive batch
    * informative. `positives` is a (query_id, pos_id) relation;
    * query and positive sets are training-pair-sized, so both ride
    * broadcasts and the corpus is scanned once. Ranks are
    * re-numbered AFTER the exclusions (rank 1..k contiguous per
    * query). Scoring is the same guarded brute-force scan as
    * [[bruteForceTopK]] — swap in the IVF probe for the shortlist at
    * full scale, the downstream shape is identical. Returns
    * (query_id, vec_id, cos, rank).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    positives: DataFrame, k: Int,
                    maxQueries: Long = 10000L): DataFrame =
    rankTopK(bruteScores(corpus, queries, maxQueries, "hardNegatives")
      .join(broadcast(positives.select(col("query_id"),
        col("pos_id").as("vec_id"))), Seq("query_id", "vec_id"), "left_anti"), k)

  /** Greedy maximal-marginal-relevance selection (Carbonell &
    * Goldstein 1998): pick `k` corpus vectors for query `queryId`,
    * each step taking argmax of
    * `λ·cos(d, q) − (1−λ)·max over selected s of cos(d, s)` —
    * relevance tempered by redundancy, the standard diversity-aware
    * pass for retrieval results and for picking training examples
    * that aren't near-copies of each other. Ties break to the lowest
    * vec_id. Returns (rank, vec_id, simq, score).
    *
    * Execution shape: greedy MMR is inherently sequential in k, so
    * this runs k DRIVER-STEPPED jobs — each one broadcast-scored
    * corpus scan (query-sim column persisted once; the per-step
    * penalty is a `greatest` over cosines against at most k-1
    * LITERAL vectors, a codegen expression, never a join) ending in
    * a distributed top-1. k is a user-facing handful; the corpus
    * scan per step is the unavoidable cost of exact greedy MMR —
    * [[mmrSelectShortlist]] is the scale composition that bounds each
    * step's scan by an upstream ANN shortlist instead.
    *
    * Cross-engine replay caveat (the n138 oracle): the score is IEEE
    * double arithmetic, so pick a λ whose complement 1−λ is exact in
    * binary (0.5, 0.25, 0.75 — NOT 0.7, whose complement is
    * 0.30000000000000004) or the engines' literals diverge.
    */
  def mmrSelect(emb: DataFrame, queryId: Long, k: Int,
                lambda: Double): DataFrame =
    mmrGreedy(emb, emb, queryId, k, lambda)

  /** [[mmrSelect]] with the per-step scan bounded by an ANN shortlist —
    * the scale composition the exact kernel's scaladoc promises: run
    * the SAME greedy λ-tempered loop, but only over the candidate ids
    * in `shortlist` (a (vec_id, ...) relation from an upstream
    * retriever — [[Ivf.probe]], [[lshTopK]], [[bruteForceTopK]]), so
    * each of the k steps scans |shortlist| rows instead of the corpus.
    * The shortlist is retrieval-sized by construction and rides a
    * broadcast semi-join against the corpus — the full embedding
    * relation is scanned exactly once to project the candidates.
    *
    * Exactness law (proved in the spec): if the shortlist contains
    * every id the full-corpus [[mmrSelect]] would pick, the results
    * are IDENTICAL — each step's full-corpus argmax is in the
    * candidate set, beats everything in it (it beat the whole corpus),
    * and wins the same lowest-vec_id tie-break, so restriction
    * preserves the argmax step by step.
    */
  def mmrSelectShortlist(emb: DataFrame, shortlist: DataFrame, queryId: Long,
                         k: Int, lambda: Double): DataFrame = {
    val cand = emb.join(
      broadcast(shortlist.select(col("vec_id")).distinct()), Seq("vec_id"))
    mmrGreedy(cand, emb, queryId, k, lambda)
  }

  /** Shared greedy loop for [[mmrSelect]] / [[mmrSelectShortlist]]:
    * candidates come from `candidates`, the query vector from `emb`
    * (a shortlist need not contain the query row). If the candidate
    * pool runs dry before k picks (queryId absent, or k exceeding the
    * pool), the selection so far is returned instead of throwing
    * mid-loop; the cached scan is released in a finally either way.
    */
  private def mmrGreedy(candidates: DataFrame, emb: DataFrame, queryId: Long,
                        k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && k <= 100, s"k in [1,100]: greedy MMR is O(k) scans, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val scored = candidates.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("vec_id"), col("embedding"),
        cosine_similarity(col("embedding"), col("q_emb")).as("simq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var selected = Vector.empty[(Long, Array[Float], Double, Double)]
    try {
      var exhausted = false
      while (!exhausted && selected.size < k) {
        val remaining =
          if (selected.isEmpty) scored
          else scored.filter(!col("vec_id").isin(selected.map(_._1): _*))
        val penalty =
          if (selected.isEmpty) lit(0.0)
          else if (selected.size == 1)
            cosine_similarity(col("embedding"), lit(selected.head._2))
          else greatest(selected.map(s =>
            cosine_similarity(col("embedding"), lit(s._2))): _*)
        remaining
          .withColumn("score",
            lit(lambda) * col("simq") - lit(1.0 - lambda) * penalty)
          .orderBy(col("score").desc, col("vec_id"))
          .limit(1)
          .select(col("vec_id"), col("embedding"), col("simq"), col("score"))
          .collect().headOption match {
          case Some(top) => selected :+= ((top.getLong(0),
            top.getSeq[Float](1).toArray, top.getDouble(2), top.getDouble(3)))
          case None => exhausted = true
        }
      }
    } finally scored.unpersist()
    selected.zipWithIndex
      .map { case ((id, _, simq, score), i) => (i + 1L, id, simq, score) }
      .toDF("rank", "vec_id", "simq", "score")
  }

  /** Margin-based cross-corpus pair mining (Artetxe & Schwenk 2019 —
    * the standard bitext-mining scorer behind CCMatrix/LASER-style
    * translation-pair harvesting): for each vector x in side A, its
    * forward top-k candidates y from side B, scored by the RATIO
    * margin `2k·cos(x,y) / (Σ top-k cos(x,·→B) + Σ top-k cos(y,·→A))`
    * — absolute cosine is miscalibrated across languages/hubs, so the
    * score normalizes by BOTH endpoints' neighborhood density and
    * hub vectors stop winning every pairing. Returns
    * (src_id, dst_id, cos, margin, mrank) with mrank the per-src
    * (margin DESC, dst_id) rank.
    *
    * Exact-replay detail: the two neighborhood sums fold in RANK
    * order (collect → sort by rank → sequential fold), so an oracle
    * replays them bit-for-bit where a plain float SUM would be
    * partition-order-dependent; the margin itself is one pinned
    * expression `(2k·cos) / (sumx + sumy)`.
    *
    * Scale shape: side A rides a broadcast under the [[bruteScores]]
    * guard convention (`require(|A| <= maxSide)`) and side B is
    * scanned once; both rank windows shuffle (src, dst, cos) rows
    * only — embeddings never ride a shuffle. At 100 TB both
    * neighborhoods come from ANN retrievers ([[Ivf.probe]], sign-LSH)
    * and the margin arithmetic downstream is IDENTICAL — this kernel
    * is the exactness baseline those shortlists degrade gracefully
    * from (the mmrSelectShortlist convention).
    */
  def marginMine(a: DataFrame, b: DataFrame, k: Int,
                 maxSide: Long = 10000L): DataFrame = {
    require(k >= 1)
    val na = a.count()
    require(na <= maxSide,
      s"marginMine broadcasts and cross-scores side A: got $na rows " +
      s"(cap $maxSide). Mine from ANN shortlists (Ivf.probe / lshTopK / " +
      "marginMineShortlist) for corpus-scale sides.")
    // self-pairs are excluded (the bruteScores convention): when the
    // sides share ids — a corpus mined against itself, overlapping
    // shards — a vector's self-pair scores cos = 1.0, occupies a
    // forward top-k slot and inflates BOTH neighborhood sums, silently
    // distorting every margin; on id-disjoint sides the predicate
    // matches nothing and the result is unchanged
    val qa = a.select(col("vec_id").as("src_id"), col("embedding").as("a_emb"))
    val scored = b.select(col("vec_id").as("dst_id"), col("embedding").as("b_emb"))
      .join(broadcast(qa), col("src_id") =!= col("dst_id"))
      .select(col("src_id"), col("dst_id"),
        cosine_similarity(col("a_emb"), col("b_emb")).as("cos"))
    marginArithmetic(scored, k)
  }

  /** [[marginMine]] with both neighborhoods bounded by a caller-provided
    * CANDIDATE relation — the scale composition the exact kernel's
    * scaladoc promises (the [[mmrSelectShortlist]] convention):
    * `candidates` is a (src_id, dst_id) relation from an upstream ANN
    * retriever (sign-LSH bucket co-occurrence, [[Ivf.probe]] pairs,
    * [[lshTopK]] output), and ONLY those pairs are scored, ranked, and
    * summed — no broadcast cross-scoring, no side-size guard needed,
    * because the quadratic object is never built. The margin
    * arithmetic downstream is the SAME code path as [[marginMine]]
    * ([[marginArithmetic]]), so the two cannot drift.
    *
    * Degradation law (spec-pinned): if `candidates` contains every
    * pair the full cross-scoring would put in a forward (per-src) or
    * backward (per-dst) top-k, the output is IDENTICAL to
    * [[marginMine]] — ranking a superset of the true top-k restricted
    * to candidates preserves the top-k, both neighborhood sums, and
    * every margin; shortlists below that bar degrade gracefully
    * (missing candidates can only remove pairs from neighborhoods).
    * A src with no candidate pairs emits nothing (there is no
    * neighborhood to normalize by — the retriever owes it candidates).
    *
    * 100 TB shape: candidates are retrieval-sized by construction;
    * embeddings are fetched back through two id-keyed joins
    * (candidate-bounded, the [[Dedup.embeddingNearDups]] fetch-back
    * convention) and never enter the rank windows, which shuffle
    * (src, dst, cos) rows only.
    */
  def marginMineShortlist(a: DataFrame, b: DataFrame, candidates: DataFrame,
                          k: Int): DataFrame = {
    require(k >= 1)
    val cand = candidates.select(col("src_id"), col("dst_id"))
      .filter(col("src_id") =!= col("dst_id")) // the marginMine convention
      .distinct()
    val scored = cand
      .join(a.select(col("vec_id").as("src_id"), col("embedding").as("a_emb")),
        Seq("src_id"))
      .join(b.select(col("vec_id").as("dst_id"), col("embedding").as("b_emb")),
        Seq("dst_id"))
      .select(col("src_id"), col("dst_id"),
        cosine_similarity(col("a_emb"), col("b_emb")).as("cos"))
    marginArithmetic(scored, k)
  }

  /** The Artetxe-Schwenk margin arithmetic shared verbatim by
    * [[marginMine]] (exact cross-scoring) and [[marginMineShortlist]]
    * (ANN candidates): double rank over a (src_id, dst_id, cos)
    * relation, rank-pinned neighborhood sums, one pinned margin
    * expression, per-src margin rank.
    */
  private def marginArithmetic(scored: DataFrame, k: Int): DataFrame = {
    val wx = Window.partitionBy(col("src_id")).orderBy(col("cos").desc, col("dst_id"))
    val wy = Window.partitionBy(col("dst_id")).orderBy(col("cos").desc, col("src_id"))
    // three consumers (both neighborhood aggs + the candidate filter)
    // read the doubly-ranked relation, and no exchange is reused
    // across them — the scored scan recomputes three times. Kept
    // UNPERSISTED deliberately: an in-operator persist A/B'd ~55%
    // SLOWER at bench scale (cache materialization beats three fused
    // codegen scans only when the pair relation is expensive), and at
    // corpus scale the right call depends on |A|·|B| vs memory — so
    // the cache decision is the CALLER's (persist the inputs or this
    // result under the repo's caller-owned-cache convention).
    val ranked = scored.withColumn("rkx", row_number().over(wx))
      .withColumn("rky", row_number().over(wy))
    def pinnedSum(rankCol: String) = aggregate(
      transform(array_sort(collect_list(struct(col(rankCol), col("cos")))),
        t => t.getField("cos")),
      lit(0.0), (acc, x) => acc + x)
    val sx = ranked.filter(col("rkx") <= k).groupBy("src_id")
      .agg(pinnedSum("rkx").as("sumx"))
    val sy = ranked.filter(col("rky") <= k).groupBy("dst_id")
      .agg(pinnedSum("rky").as("sumy"))
    val wm = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc, col("dst_id"))
    ranked.filter(col("rkx") <= k)
      .join(sx, "src_id").join(sy, "dst_id")
      .select(col("src_id"), col("dst_id"), col("cos"),
        (lit(2.0 * k) * col("cos") / (col("sumx") + col("sumy"))).as("margin"))
      .withColumn("mrank", row_number().over(wm))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * merge a lexical (BM25) and a vector (ANN) ranking into one hybrid
    * result: `rrf = Σ_systems 1/(rrfK + rank)`, documents missing from
    * a system contribute 0. Inputs are two (query_id, doc_id, rank)
    * relations (rank = long, 1-based).
    *
    * 100 TB shape: both inputs are already top-k lists — queries × k
    * rows, metadata-sized — so the full-outer merge and the re-ranking
    * window are bounded by 2k rows per query regardless of corpus
    * size; the heavy lifting stayed in the upstream retrievers. Fusion
    * arithmetic replays exactly: ranks are integers, each term is ONE
    * double division, and the two-term sum has a fixed order — no
    * rounding convention needed before the final display rounding.
    * Rank ties across systems (1/(K+r) equal for equal r) break to the
    * lowest doc_id, deterministically.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10,
              rrfK: Long = 60L): DataFrame = {
    require(k >= 1 && rrfK >= 1L)
    val an = a.select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank_a"))
    val bn = b.select(col("query_id"), col("doc_id"), col("rank").cast("long").as("rank_b"))
    val fused = an.join(bn, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("rank_a")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(rrfK) + col("rank_b")), lit(0.0))).as("rrf"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
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

  /** Semantic (embedding-level) train/eval contamination: every corpus
    * vector whose cosine to ANY eval vector reaches `threshold` — the
    * embedding-space twin of the n-gram decontamination check
    * ([[TextAnalysis.ngramContamination]]), which paraphrased or
    * reformatted benchmark leakage slips past. Eval sets are
    * benchmark-sized, so they broadcast and the corpus is scanned once
    * with zero shuffle — the right plan at any corpus scale. (An eval
    * set too large to broadcast is a near-dup problem, not a
    * contamination scan: use [[Dedup.embeddingNearDups]] on the union.)
    * Returns (eval_id, vec_id, cos).
    */
  def semanticContamination(corpus: DataFrame, eval: DataFrame,
                            threshold: Double): DataFrame = {
    val q = eval.select(col("vec_id").as("eval_id"), col("embedding").as("eval_emb"))
    corpus.join(broadcast(q))
      .select(col("eval_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("eval_emb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Int8 scalar quantization of the embedding column — the storage
    * path for a 100 TB embedding lake: symmetric per-vector codes
    * `round(v * 127 / max|v|)` shrink float32 vectors 4x (and the scan
    * with them), while COSINE between dequantized vectors equals cosine
    * between the integer code vectors (the per-vector scales cancel),
    * so quantized scoring is integer dot products plus one sqrt —
    * engine-exact, no float accumulation order to disagree on.
    * Rounding is explicit floor(x + 0.5) (round-half-up), because
    * "round" half-tie behavior differs between engines and the codes
    * must replay bit-for-bit. Zero vectors get all-zero codes and
    * scale 0. One scan, pure column expressions.
    *
    * Codes are emitted as `array<int>` for relational transparency (and
    * the oracle); a production sink would pack them into a 1-byte-per-
    * dim binary column at write time — the values are identical.
    */
  def scalarQuantize(emb: DataFrame): DataFrame =
    // scale materializes as its own column first, so (a) array_max runs
    // once per row, not once per element, and (b) code = floor(x/scale
    // + 0.5) is ONE float formula the oracle replays verbatim (x/scale
    // and x*127/maxAbs are different doubles)
    emb.withColumn("scale",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))) / lit(127.0))
      .withColumn("codes",
        when(col("scale") === lit(0.0),
          transform(col("embedding"), _ => lit(0)))
        .otherwise(transform(col("embedding"),
          x => floor(x.cast("double") / col("scale") + lit(0.5)).cast("int"))))

  /** "All-but-the-top" phase 1 (Mu & Viswanath 2018): the dominant
    * principal direction of the quantized embedding cloud and every
    * vector's integer projection onto it — the post-processing that
    * removes the common-direction bias before cosine retrieval.
    * Returns (vec_id, proj).
    *
    * ENTIRELY integer after the [[scalarQuantize]] codes (whose float
    * formula is already oracle-proven): the scaled centered covariance
    * is C = n·M − S·Sᵀ over code column-sums S and second moments M
    * (scaling by n preserves the eigenvector and avoids a division),
    * rescaled to ±1e6 by a sign-split truncating division, then
    * `iters` power-iteration rounds v ← C·v renormalized to ±`scale`
    * by max-|component| — all in BigInt/HUGEINT, so an oracle unrolls
    * the rounds exactly where float PCA could never hash-match.
    *
    * 100 TB shape: M and S accumulate per-partition inside ONE
    * mapPartitions pass (a dim² long array per partition — no n×dim²
    * explode, no shuffle), collected under the metadata-size
    * convention (partitions × dim² longs) and reduced on the driver;
    * the d×d power iteration is driver arithmetic on a
    * metadata-sized matrix, exactly like the n86 range walk. The
    * projection pass is one more scan with the direction as a
    * literal array.
    */
  def principalProjection(emb: DataFrame, dim: Int, iters: Int = 3,
                          scale: Long = 100000L): DataFrame = {
    require(iters >= 1 && iters <= 6, "iters outside [1,6]: unroll bound")
    val spark = emb.sparkSession
    import spark.implicits._
    val codes = scalarQuantize(emb).select(col("vec_id"), col("codes"))
    val partials = codes.select(col("codes")).as[Seq[Int]].mapPartitions { it =>
      val m = new Array[Long](dim * dim)
      val s = new Array[Long](dim)
      var n = 0L
      it.foreach { c =>
        require(c.length == dim, s"embedding dim ${c.length} != $dim")
        var j = 0
        while (j < dim) {
          val cj = c(j).toLong
          s(j) += cj
          var k = 0
          while (k < dim) { m(j * dim + k) += cj * c(k).toLong; k += 1 }
          j += 1
        }
        n += 1
      }
      Iterator.single((m.toSeq, s.toSeq, n))
    }.collect()
    val mTot = Array.fill(dim * dim)(BigInt(0))
    val sTot = Array.fill(dim)(BigInt(0))
    var n = BigInt(0)
    partials.foreach { case (m, s, c) =>
      var i = 0; while (i < dim * dim) { mTot(i) += m(i); i += 1 }
      var j = 0; while (j < dim) { sTot(j) += s(j); j += 1 }
      n += c
    }
    // truncating division via sign-split: BigInt / and SQL // agree on
    // nonnegatives; they DISAGREE on negatives (truncate vs floor)
    def tdiv(x: BigInt, y: BigInt): BigInt = (x.abs / y) * x.signum
    val cov = Array.tabulate(dim * dim) { i =>
      n * mTot(i) - sTot(i / dim) * sTot(i % dim)
    }
    val covMax = cov.map(_.abs).max
    val cR = if (covMax == 0) cov else cov.map(x => tdiv(x * 1000000L, covMax))
    var v = Array.fill(dim)(BigInt(scale))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { j =>
        var acc = BigInt(0); var k = 0
        while (k < dim) { acc += cR(j * dim + k) * v(k); k += 1 }
        acc
      }
      val mx = w.map(_.abs).max
      if (mx != 0) v = w.map(x => tdiv(x * scale, mx))
    }
    val vLit = array(v.map(x => lit(x.toLong)): _*)
    codes.select(col("vec_id"),
      aggregate(zip_with(col("codes"), vLit, (a, b) => a.cast("long") * b),
        lit(0L), (acc, x) => acc + x).as("proj"))
  }

  /** Quantized cosine scoring of the corpus against one query vector,
    * with the exact cosine joined alongside as the audit: integer code
    * dot products (order-independent, exact) over [[scalarQuantize]]
    * output — the compute half of the int8 storage path. Returns
    * (vec_id, qcos, exact_cos, abs_err).
    *
    * Zero-norm vectors: the explicit division here yields NaN for an
    * all-zero vector where the codegen cosine kernel returns 0.0 —
    * callers replaying this in another engine must either guard the
    * division (CASE WHEN either norm = 0 THEN 0.0) or guarantee a
    * zero-free corpus, as [[quantizedTopK]]'s n46 oracle now does.
    */
  def quantizedCosineAudit(emb: DataFrame, queryId: Long): DataFrame = {
    val sq = scalarQuantize(emb)
    val q = sq.filter(col("vec_id") === queryId)
      .select(col("codes").as("q_codes"), col("embedding").as("q_emb"))
    def idot(a: Column, b: Column) = aggregate(
      zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), (acc, x) => acc + x)
    sq.filter(col("vec_id") =!= queryId).crossJoin(broadcast(q))
      .select(col("vec_id"),
        (idot(col("codes"), col("q_codes")).cast("double") /
          (sqrt(idot(col("codes"), col("codes")).cast("double")) *
           sqrt(idot(col("q_codes"), col("q_codes")).cast("double")))).as("qcos"),
        cosine_similarity(col("embedding"), col("q_emb")).as("exact_cos"))
      .withColumn("abs_err", abs(col("qcos") - col("exact_cos")))
  }

  /** Quantized top-k — the search half of the int8 storage path
    * ([[scalarQuantize]]): shortlist `k * shortlist` candidates per
    * query by integer-code cosine (one pass over the 4x-smaller codes
    * relation; scales cancel, so no dequantization), then exact float
    * re-rank of the shortlist only. The same shortlist-then-rerank
    * shape as IVF-PQ's ADC search, without the codebook.
    *
    * Scale shape: the shortlist window ranks (query_id, vec_id, qcos)
    * rows only — embeddings do NOT ride that shuffle, and the
    * rank-filter sits directly on row_number so WindowGroupLimit
    * prunes per map task. Float embeddings are joined back for the
    * shortlist alone (broadcast — it is queries x k x shortlist rows
    * by construction), so the full-precision column is read exactly
    * once and never shuffled.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    shortlist: Int = 4): DataFrame = {
    require(k >= 1 && shortlist >= 1)
    // int8 codes are exact in float (|c| <= 127) and every partial sum
    // of the cosine kernel stays an exact integer (dot and norms are
    // <= 64 * 127^2 ~ 1e6, far below 2^53 double / 2^24 float), so the
    // codegen cosine kernel over float-cast codes produces the SAME
    // doubles as explicit integer dots — but per pair it is one fused
    // whole-stage-codegen kernel call instead of three interpreted
    // higher-order-function folds, and the norms are folded into the
    // kernel rather than recomputed per pair. The cast materializes
    // once per row, not per pair.
    val sq = scalarQuantize(corpus).select(col("vec_id"),
      transform(col("codes"), _.cast("float")).as("codes_f"))
    val qsq = scalarQuantize(queries).select(col("vec_id").as("query_id"),
      transform(col("codes"), _.cast("float")).as("q_codes_f"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("vec_id"))
    val short = sq.join(broadcast(qsq), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("codes_f"), col("q_codes_f")).as("qcos"))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * shortlist)
      .select("query_id", "vec_id")
    val qEmb = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    rankTopK(corpus.join(broadcast(short), Seq("vec_id"))
      .join(broadcast(qEmb), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("q_emb")).as("cos")), k)
  }

  /** Matryoshka prefix-dimension retrieval audit: rank the corpus for
    * each query by integer code dot product over the FULL dimension and
    * over only the first `prefixDim` components (the MRL deployment
    * question: how much retrieval quality does a truncated embedding
    * keep?), and report top-k overlap and top-1 agreement per query.
    * Rankings are ENTIRELY integer (code dots with vec_id tie-break),
    * so the audit replays exactly — no float rank boundaries.
    *
    * Scale shape: code dots compute map-side on the 4x-compressed
    * codes; both rank windows shuffle (query_id, vec_id, two longs)
    * only — embeddings never ride a shuffle — and the rank filters sit
    * directly on row_number (WindowGroupLimit prunes per task).
    */
  def prefixDimAudit(emb: DataFrame, prefixDim: Int, k: Int = 10,
                     nQueries: Int = 5): DataFrame = {
    require(prefixDim >= 1 && k >= 1 && nQueries >= 1)
    val sq = scalarQuantize(emb).select(col("vec_id"), col("codes"))
    val q = sq.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("codes").as("q_codes"))
    def idot(a: Column, b: Column) = aggregate(
      zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), (acc, x) => acc + x)
    val pairs = sq.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        idot(col("codes"), col("q_codes")).as("dot_full"),
        idot(slice(col("codes"), 1, prefixDim),
          slice(col("q_codes"), 1, prefixDim)).as("dot_prefix"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("dot_full").desc, col("vec_id"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("dot_prefix").desc, col("vec_id"))
    val ranked = pairs.select(col("query_id"), col("vec_id"),
      row_number().over(wf).as("rf"), row_number().over(wp).as("rp"))
    val overlap = ranked.filter(col("rf") <= k)
      .join(ranked.filter(col("rp") <= k).select("query_id", "vec_id"),
        Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    val tops = ranked.filter(col("rf") === 1 || col("rp") === 1)
      .groupBy("query_id")
      .agg(max(when(col("rf") === 1, col("vec_id"))).as("full_top1"),
           max(when(col("rp") === 1, col("vec_id"))).as("prefix_top1"))
    overlap.join(tops, "query_id")
      .withColumn("top1_same", (col("full_top1") === col("prefix_top1")).cast("long"))
  }

  /** Pure int8 retrieval ranking — top-k by quantized-code cosine with
    * NO exact re-rank: the ranking a code-only deployment serves, and
    * the one [[retrievalMetrics]] audits against exact search. Integer
    * code dots are exact in the codegen cosine kernel (every partial
    * sum <= 64 * 127^2, far under 2^24 float), so the ranking replays
    * cross-engine with the (score DESC, vec_id) tie-break.
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val sq = scalarQuantize(corpus).select(col("vec_id"),
      transform(col("codes"), _.cast("float")).as("codes_f"))
    val qsq = scalarQuantize(queries).select(col("vec_id").as("query_id"),
      transform(col("codes"), _.cast("float")).as("q_codes_f"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("vec_id"))
    sq.join(broadcast(qsq), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("codes_f"), col("q_codes_f")).as("qcos"))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("rank"))
  }

  /** Ranked-retrieval quality audit — recall@k and MRR of a candidate
    * ranking against a truth ranking, per query, in integer fixed
    * point: `recall_x1e4 = n_hits * 10000 div k`, `mrr_x1e6 = 1e6 div
    * (candidate rank of the first truth item)` (0 when the candidate
    * list misses the truth set entirely). "Relevant" = membership in
    * the truth top-k, the standard ANN-benchmark convention
    * (Aumüller et al., ann-benchmarks).
    *
    * Inputs are (query_id, vec_id, rank) relations, rank 1-based.
    * 100 TB shape: both inputs are ALREADY top-k lists (queries x k
    * rows, metadata-sized) — the corpus-scale work stayed in the
    * upstream retrievers; this join never touches an embedding.
    */
  def retrievalMetrics(truth: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val tr = truth.filter(col("rank") <= k).select("query_id", "vec_id")
    val cd = cand.filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("crank"))
    tr.join(cd, Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(col("crank")).as("n_hits"), min(col("crank")).as("first_hit"))
      .select(col("query_id"), col("n_hits"),
        expr(s"n_hits * 10000 div $k").as("recall_x1e4"),
        coalesce(expr("1000000 div first_hit"), lit(0L)).as("mrr_x1e6"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    * top-k rankings, per query — the ranking-similarity audit
    * [[retrievalMetrics]] does not cover: recall@k treats the top-k as
    * a SET, while RBO weights agreement by depth (geometric decay p),
    * so two retrievers that agree on the head score high even when
    * their tails scramble — the right lens for "is the cheap retriever
    * serving the same experience", not just "does it find the truth
    * set". Both inputs are (query_id, vec_id, rank) relations, rank
    * 1-based (the [[retrievalMetrics]] convention).
    *
    * Per query with overlap counts c_d = |A_d ∩ B_d| at depth d:
    * `rbo_base = (1-p) · Σ_{d=1..k} p^(d-1) · c_d/d` (prefix-truncated
    * base) and `rbo_ext = rbo_base + p^k · c_k/k` (the paper's §4.5
    * extrapolation of the final agreement to unseen depths). Both in
    * [0, 1]; a query present in either input but with NO overlapping
    * items scores 0.
    *
    * Cross-engine float exactness without trusting any libm pow: the
    * weights p^(d-1) are PARAMETERS, not data — computed once on the
    * driver by sequential multiplication and embedded as literals (the
    * oracle interpolates the same shortest-round-trip doubles), and
    * the per-query sum folds over d ASCENDING via `aggregate(sequence)`
    * (the repo's ordered-fold convention; c_d is an integer count, so
    * the inner sum commutes). 100 TB shape: inputs are already top-k
    * lists (queries × k rows, metadata-sized) — one equi-join, one
    * (query, m)-sized agg, then a k-bounded in-row fold; the corpus
    * stayed in the upstream retrievers.
    */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, k: Int,
                        p: Double = 0.9): DataFrame = {
    require(k >= 1 && k <= 64, "k outside [1, 64]: the in-row fold is k-bounded")
    require(p > 0.0 && p < 1.0, "p must lie strictly in (0, 1)")
    val w = Array.iterate(1.0, k + 1)(_ * p) // w(i) = p^i, i = 0..k
    val wlit = array(w.map(lit).toIndexedSeq: _*)
    val ar = a.filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("ra"))
    val br = b.filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("rb"))
    val qids = ar.select("query_id").unionAll(br.select("query_id")).distinct()
    val ms = ar.join(br, Seq("query_id", "vec_id"))
      .select(col("query_id"), greatest(col("ra"), col("rb")).as("m"))
      .groupBy("query_id", "m").agg(count(lit(1)).as("cnt"))
      .groupBy("query_id")
      .agg(collect_list(struct(col("m"), col("cnt"))).as("ms"))
    def cd(d: Column, msCol: Column): Column =
      aggregate(msCol, lit(0L),
        (acc, x) => acc + when(x("m") <= d, x("cnt")).otherwise(lit(0L)))
    val withMs = qids.join(ms, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("ms"),
          array().cast("array<struct<m:bigint,cnt:bigint>>")).as("ms"))
    withMs.select(col("query_id"),
        cd(lit(k.toLong), col("ms")).as("n_overlap_k"),
        (lit(1.0 - p) * aggregate(sequence(lit(1), lit(k)), lit(0.0),
          (acc, d) => acc + element_at(wlit, d) *
            (cd(d.cast("long"), col("ms")).cast("double") / d.cast("double"))))
          .as("rbo_base"))
      .withColumn("rbo_ext",
        col("rbo_base") + lit(w(k)) *
          (col("n_overlap_k").cast("double") / lit(k.toDouble)))
  }

  /** LSH-bucketed approximate top-k: candidates from shared sign-LSH
    * buckets across `tables` tables, exact cosine re-rank.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 10, tables: Int = 6, dim: Int = -1): DataFrame = {
    val cb = withSignBuckets(corpus, "embedding", planes, tables)
      .select(col("table"), col("bucket"), col("vec_id"), col("embedding"))
    val qb = withSignBuckets(queries, "embedding", planes, tables)
      .select(col("table"), col("bucket"),
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cands = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding"), col("q_emb"))
      .dropDuplicates("query_id", "vec_id")
    rankTopK(cands.select(col("query_id"), col("vec_id"),
      cosine_similarity(col("embedding"), col("q_emb")).as("cos")), k)
  }

  /** Intra-group embedding diversity — the curation signal behind
    * diversity-aware data selection (how semantically concentrated is
    * each source/cluster?): the average pairwise cosine of a group,
    * WITHOUT materializing a single pair. The identity
    * `Σᵢⱼ<xᵢ,xⱼ> = ‖Σxᵢ‖²` turns the quadratic pair sum into two
    * integer aggregates over unit-sphere int8 codes (normalize, then
    * quantize at 127 steps): `avg_pair = (‖S‖² − Σ‖xᵢ‖²) / (n(n−1))`,
    * reported in cosine units via /127². All sums are LONG — exact
    * and partition-order-independent — so the oracle replays them;
    * the two float steps (the norm fold and the final division) are
    * pinned-order expressions. Zero vectors quantize to zero codes
    * and groups below 2 rows drop (no pairs to average).
    *
    * 100 TB shape: ONE corpus scan → per-(group, dim) integer sums
    * (`groups × dim`-bounded shuffle, map-side combinable) + a
    * per-group count/self-dot agg. No pair relation, no window, no
    * cross join — the quadratic object never exists. Overflow bound:
    * (127·n)² < 2^63 → n ≤ ~7e8 rows per group; shard larger groups
    * (documented, the n70 convention).
    */
  def embeddingDiversity(emb: DataFrame, groupCol: String = "label"): DataFrame = {
    val x = col("embedding")
    val norm = sqrt(aggregate(x, lit(0.0),
      (a, v) => a + v.cast("double") * v.cast("double")))
    val codes = when(norm === lit(0.0), transform(x, _ => lit(0)))
      .otherwise(transform(x,
        v => floor(v.cast("double") / norm * lit(127.0) + lit(0.5)).cast("int")))
    val selfDot = aggregate(
      zip_with(col("codes"), col("codes"), (a, b) => (a * b).cast("long")),
      lit(0L), (a, v) => a + v)
    // null embeddings are excluded up front (the withSignBuckets
    // convention) so n counts exactly the vectors that contribute;
    // the group column keeps its own type (casting string groups to
    // long would collapse them all into one NULL group)
    val coded = emb.filter(col("embedding").isNotNull)
      .select(col(groupCol), codes.as("codes"))
      .withColumn("self_dot", selfDot)
    val dimSums = coded
      .select(col(groupCol), posexplode(col("codes")).as(Seq("pos", "c")))
      .groupBy(groupCol, "pos").agg(sum(col("c").cast("long")).as("s"))
      .groupBy(groupCol).agg(sum(col("s") * col("s")).as("s2"))
    coded.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("self_dot")).as("sum_self"))
      .join(dimSums, groupCol :: Nil)
      .filter(col("n") >= 2)
      .select(col(groupCol), col("n"), col("sum_self"), col("s2"),
        round(((col("s2") - col("sum_self")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")) / lit(16129.0), 6)
          .as("avg_pair_cos"))
  }
}
