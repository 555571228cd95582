package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.GraftFunctions._

/** IVF (inverted-file) approximate nearest neighbour — the coarse-
  * quantizer scale path alongside sign-LSH (Similarity.lshTopK), after
  * Jegou et al. (2011), "Product quantization for nearest neighbor
  * search" (the IVF stage, without the PQ residual codes).
  *
  * Index build: k-means over a sample of the corpus learns `nLists`
  * centroids; every corpus vector is assigned to its nearest centroid
  * (one scan, centroids broadcast inside the transform). Search: each
  * query probes its `nProbe` nearest centroids and re-ranks exactly
  * within those lists only — a bucket equi-join, so the cost per query
  * is corpus/nLists * nProbe instead of the full corpus. At 100 TB the
  * assignment scan parallelizes per partition and the probe join
  * shuffles only the probed lists.
  */
object Ivf {

  final case class Index(assigned: DataFrame, centroids: Array[(Int, Array[Float])])

  /** Build the index: `assigned` = corpus + `list_id` column.
    *
    * K-means is fit on a deterministic hash-sample capped at
    * `trainRows` (centroid quality only shifts the recall/probe
    * tradeoff, never correctness), so the multi-iteration clustering
    * never rescans the full corpus — at 100 TB the fit touches a
    * driver-sized sample and only the single assignment transform
    * reads every vector.
    *
    * Pass `nRows` when the corpus row count is already known (or cheap
    * to know once — a bare parquet scan counts from footers): the
    * default -1 triggers one `count()` action here, and a caller that
    * also builds PQ codes and sizes a rerank window would otherwise pay
    * that action three times over the same corpus.
    */
  def build(corpus: DataFrame, embedCol: String = "embedding",
            nLists: Int = 16, seed: Long = 42L, maxIter: Int = 8,
            idCol: String = "vec_id", trainRows: Long = 100000L,
            nRows: Long = -1L): Index = {
    val withVec = corpus.withColumn("__vec", array_to_vector(col(embedCol)))
    val n = math.max(if (nRows >= 0L) nRows else corpus.count(), 1L)
    val fraction = math.min(1.0, trainRows.toDouble / n)
    val train =
      if (fraction >= 1.0) withVec
      else withVec.filter(Sampling.hashFilter(col(idCol), fraction))
    // few iterations suffice: centroid quality only shifts the
    // recall/probe tradeoff, never correctness (full probe is exhaustive)
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__vec").setPredictionCol("list_id")
      .fit(train)
    val assigned = model.transform(withVec).drop("__vec")
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    Index(assigned, cents)
  }

  /** Assignment of vectors to FROZEN centroids — the maintenance half
    * of [[build]]'s fit+transform, factored out so the index can GROW
    * without retraining. Per row: argmin of squared Euclidean distance
    * over the PUBLISHED centroid table (ties to the lowest list id),
    * all-double arithmetic in component order after one widening cast.
    *
    * Agreement with the builder: [[build]] publishes centroids rounded
    * to float while `KMeansModel.transform` predicted with its
    * unrounded double centers (plus MLlib's norm-accelerated
    * distance), so for a vector within float-rounding distance of a
    * Voronoi boundary the two argmins can in principle differ — the
    * spec pins `assignFrozen(corpus, index.centroids) == index.assigned`
    * on the driver corpus (deterministic there; real embedding data
    * puts nothing on a boundary at float precision), NOT as a
    * universal identity. Nothing correctness-bearing rides on the
    * agreement: the published float centroids are the index's source
    * of truth from the first append on, and full-probe search is
    * exhaustive under ANY deterministic single-assignment.
    *
    * 100 TB shape: the centroids ride INSIDE the expression as
    * literals (nLists x dim floats — kilobytes), so assignment is one
    * narrow codegen'd map over the vectors: no join, no shuffle, no
    * broadcast exchange. That is what makes weekly index maintenance
    * a pure append ([[append]]).
    */
  def assignFrozen(vecs: DataFrame, centroids: Array[(Int, Array[Float])],
                   embedCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "no centroids to assign to")
    val scored = centroids.sortBy(_._1).map { case (i, c) =>
      val cl = typedLit(c.map(_.toDouble))
      struct(
        aggregate(
          zip_with(col(embedCol).cast("array<double>"), cl,
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"),
        lit(i).as("list_id"))
    }
    vecs.withColumn("list_id",
      array_min(array(scored: _*)).getField("list_id"))
  }

  /** Incremental IVF maintenance — the ANN column's member of the
    * incremental ladder (exact digests / minhash text / sign-LSH
    * embeddings / this): assign `newVecs` to the index's FROZEN
    * centroids and append, never re-training and never re-reading the
    * existing corpus. The spec laws mirror the dedup indexes':
    * append-equals-rebuild-with-same-centroids (assignment is per-row
    * deterministic, so the union assignment IS the row union), and the
    * full-probe search over an appended index still equals brute force
    * over the union (the n156 oracle — every vector lands in exactly
    * one list, so exhaustive probing is exhaustive search). Centroid
    * QUALITY for the new vectors is the one thing freezing gives up:
    * a distribution shift crowds new vectors into few ill-fitting
    * lists and partial-probe recall decays — [[recallAudit]] is the
    * scheduled check that tells the pipeline when a retrain is due.
    */
  def append(index: Index, newVecs: DataFrame,
             embedCol: String = "embedding"): Index =
    Index(index.assigned.unionByName(assignFrozen(newVecs, index.centroids,
      embedCol)), index.centroids)

  /** ANN index RETRACTION — the lifecycle third ([[build]] / [[append]]
    * / this) that completes the purge story for the embedding column
    * (the dedup indexes retract via [[Dedup.retractFromIndex]]; before
    * this, a taken-down document's EMBEDDING stayed searchable after
    * every other index family forgot it — for a PII purge that means
    * the purge did not happen). Drops every assigned row belonging to
    * `removedIds`; centroids are untouched — they are statistics of
    * the historical distribution, not per-document state, exactly as
    * frozen-centroid [[append]] treats them.
    *
    * Laws (OpsSpec): per-row assignment makes deletion as local as the
    * append, so retract ≡ rebuild-against-frozen-centroids on
    * corpus∖removed ([[assignFrozen]] over the survivors); search at
    * ANY nProbe never returns a removed id; and retract-then-append ≡
    * rebuild from survivors ∪ appended (the n154 chaining law, ANN
    * edition). The n160 oracle drives the full-probe search over a
    * retracted index through brute force over the survivors.
    *
    * 100 TB shape: `removedIds` is metadata-sized (a takedown list), so
    * this is [[Dedup.retractFromIndex]]'s broadcast anti-join verbatim
    * — zero shuffle, and an assigned relation laid out by `list_id`
    * keeps its partition pruning through the rewrite. CORPUS-SIDE
    * CONTRACT (the retractFromIndex one): the caller must also drop the
    * removed rows from the corpus relation it passes to [[search]]Pq's
    * rerank fetch-back — the purge is not done until the payload
    * (here, the float vectors) is gone too.
    */
  def retract(index: Index, removedIds: DataFrame,
              idCol: String = "vec_id"): Index =
    Index(Dedup.retractFromIndex(index.assigned, removedIds, idCol),
      index.centroids)

  /** [[retract]] for the PQ-encoded flavor: drops the removed vectors'
    * code rows; coarse centroids AND codebooks stay frozen (both are
    * distribution statistics, the [[appendPq]] stance). Same laws, same
    * broadcast anti-join, proved by the n161 oracle (exhaustive-intent
    * search over the retracted index ≡ brute force over survivors).
    */
  def retractPq(pq: PqIndex, removedIds: DataFrame,
                idCol: String = "vec_id"): PqIndex =
    PqIndex(Dedup.retractFromIndex(pq.encoded, removedIds, idCol),
      pq.centroids, pq.codebooks)

  /** Partial-probe recall of the index against exhaustive truth on a
    * query sample — the retrain-due audit for [[append]]-maintained
    * indexes, reusing the n84 recall kernel ([[Dedup.pairRecall]])
    * over (query, retrieved) pairs. Healthy indexes hold recall near
    * 1 at the operating nProbe; a drifted corpus (new vectors far
    * from every frozen centroid) shows up as recall decay on queries
    * from the drifted region, and the pipeline retrains when the
    * number drops below its SLO. The truth side is the guarded
    * brute-force scan over the assigned relation — audit-priced, run
    * on a sample, never the serving path.
    */
  def recallAudit(index: Index, queries: DataFrame, k: Int = 10,
                  nProbe: Int = 2): DataFrame = {
    val got = search(index, queries, k, nProbe)
      .select(col("query_id").as("doc_id_a"), col("vec_id").as("doc_id_b"))
    val truth = search(index, queries, k, nProbe = index.centroids.length)
      .select(col("query_id").as("doc_id_a"), col("vec_id").as("doc_id_b"))
    Dedup.pairRecall(got, truth)
  }

  /** IVF-PQ index (Jegou et al. 2011 §IV): on top of the coarse lists,
    * each vector's residual (vector − list centroid) is product-quantized
    * into `m` sub-codes from per-subspace codebooks. The encoded relation
    * stores only (vec_id, list_id, codes, approx norm) — at 100 TB the
    * candidate scan reads m bytes per vector instead of the full float
    * array; exact re-ranking touches real embeddings only for the
    * `rerank` best candidates per query.
    */
  final case class PqIndex(encoded: DataFrame,
      centroids: Array[(Int, Array[Float])],
      codebooks: Array[Array[Array[Float]]]) // [subspace][code][dsub]

  /** Driver-side Lloyd k-means for the tiny per-subspace codebooks
    * (k*dsub floats each; the training set is a deterministic sample
    * that fits on the driver, same policy as `build`'s capped fit).
    * Deterministic: seeded distinct-point init, fixed iteration count,
    * empty clusters reseeded round-robin from the data.
    */
  private[graft] def lloyd(data: Array[Array[Float]], k: Int, iters: Int,
                         seed: Long): Array[Array[Float]] = {
    require(data.nonEmpty)
    val d = data.head.length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(data.indices.toVector).take(k)
    val centers = Array.tabulate(math.min(k, data.length))(i => data(init(i)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centers.length, d)(0.0)
      val counts = new Array[Long](centers.length)
      data.foreach { v =>
        val c = nearestCenter(v, centers)
        counts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += v(j); j += 1 }
      }
      var c = 0
      while (c < centers.length) {
        if (counts(c) == 0L) centers(c) = data(rnd.nextInt(data.length)).clone()
        else {
          var j = 0
          while (j < d) { centers(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  private def nearestCenter(v: Array[Float], centers: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      var dist = 0.0; var j = 0
      val ctr = centers(c)
      while (j < v.length) { val t = v(j) - ctr(j); dist += t * t; j += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  /** Train codebooks on a deterministic sample of residuals and encode
    * the whole corpus in one pass (codebooks broadcast; per-partition
    * argmin per subspace — the one imperative hot loop, like a native
    * quantizer kernel would be).
    */
  def buildPq(index: Index, m: Int = 8, codebookSize: Int = 16,
              seed: Long = 42L, trainRows: Long = 4096L,
              idCol: String = "vec_id", embedCol: String = "embedding",
              nRows: Long = -1L): PqIndex = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val centDf = index.centroids.toSeq.toDF("list_id", "centroid")
    val residuals = index.assigned
      .join(broadcast(centDf), Seq("list_id"))
      .select(col(idCol), col("list_id"),
        zip_with(col(embedCol), col("centroid"), (a, b) => a - b).as("residual"))
    // counting `index.assigned` would re-run the k-means transform over
    // the corpus — prefer the threaded count
    val n = math.max(if (nRows >= 0L) nRows else index.assigned.count(), 1L)
    val fraction = math.min(1.0, trainRows.toDouble / n)
    val trainDf =
      if (fraction >= 1.0) residuals
      else residuals.filter(Sampling.hashFilter(col(idCol), fraction))
    // sorted so the collected training order (and thus the seeded k-means
    // trajectory) is independent of partitioning
    val train = trainDf.orderBy(idCol).select("residual").as[Array[Float]].collect()
    require(train.nonEmpty, "PQ training sample is empty")
    val dim = train.head.length
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = Array.tabulate(m) { mi =>
      val sub = train.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      lloyd(sub, codebookSize, iters = 10, seed = seed + mi)
    }
    PqIndex(encodeResiduals(residuals, books, index.centroids, idCol),
      index.centroids, books)
  }

  /** PQ-encode a (id, list_id, residual) relation against FIXED
    * codebooks — the one imperative hot loop, shared verbatim by
    * [[buildPq]] and [[appendPq]] so a maintained encoded relation can
    * never drift from a rebuild's.
    */
  private def encodeResiduals(residuals: DataFrame,
      books: Array[Array[Array[Float]]],
      centroids: Array[(Int, Array[Float])],
      idCol: String): DataFrame = {
    val spark = residuals.sparkSession
    import spark.implicits._
    val dsub = centroids.head._2.length / books.length
    val bcBooks = spark.sparkContext.broadcast(books)
    val bcCents = spark.sparkContext.broadcast(centroids.toMap)
    residuals.as[(Long, Int, Array[Float])]
      .mapPartitions { it =>
        val bk = bcBooks.value; val cents = bcCents.value
        it.map { case (id, list, res) =>
          val codes = new Array[Int](bk.length)
          var mi = 0
          while (mi < bk.length) {
            val sub = java.util.Arrays.copyOfRange(res, mi * dsub, (mi + 1) * dsub)
            codes(mi) = nearestCenter(sub, bk(mi))
            mi += 1
          }
          // norm of the reconstruction centroid + concat(codebook picks)
          val ctr = cents(list)
          var norm = 0.0
          var j = 0
          while (j < ctr.length) {
            val vhat = ctr(j) + bk(j / dsub)(codes(j / dsub))(j % dsub)
            norm += vhat * vhat
            j += 1
          }
          (id, list, codes, math.sqrt(norm))
        }
      }
      .toDF(idCol, "list_id", "codes", "vnorm")
  }

  /** Incremental IVF-PQ maintenance — [[append]] for the PQ-encoded
    * flavor: assign `newVecs` to the FROZEN coarse centroids, encode
    * their residuals against the FROZEN codebooks (the exact
    * [[buildPq]] kernel, shared via [[encodeResiduals]]), and append
    * the m-byte codes. Nothing retrains and the old corpus is never
    * re-read or re-encoded; the spec law is the dedup indexes':
    * append ≡ rebuild-with-same-centroids-and-codebooks. Quantization
    * QUALITY for shifted data is what freezing gives up — codebooks
    * trained on the old residual distribution quantize a drifted
    * slice coarsely — and the same [[recallAudit]] decision applies
    * (searchPq recall vs exhaustive truth on a sample).
    */
  def appendPq(pq: PqIndex, newVecs: DataFrame,
               embedCol: String = "embedding",
               idCol: String = "vec_id"): PqIndex = {
    val spark = newVecs.sparkSession
    import spark.implicits._
    val centDf = pq.centroids.toSeq.toDF("list_id", "centroid")
    val residuals = assignFrozen(newVecs, pq.centroids, embedCol)
      .join(broadcast(centDf), Seq("list_id"))
      .select(col(idCol), col("list_id"),
        zip_with(col(embedCol), col("centroid"), (a, b) => a - b).as("residual"))
    PqIndex(pq.encoded.unionByName(
      encodeResiduals(residuals, pq.codebooks, pq.centroids, idCol)),
      pq.centroids, pq.codebooks)
  }

  /** [[recallAudit]] for the PQ flavor — the retrain gauge [[appendPq]]
    * shipped without (VERDICT r11 #4): partial-probe, operating-window
    * [[searchPq]] recall against exhaustive truth on a query sample.
    * The PQ path is where drift hurts TWICE — ill-fitting frozen coarse
    * lists (the [[recallAudit]] failure mode) AND residual codebooks
    * trained on the old distribution quantizing a shifted slice
    * coarsely — so the audited search is the served one (`nProbe`,
    * `rerank` at their operating values), and the truth side is
    * [[searchPq]] at full probe with the [[rerankFor]]-guarded window,
    * which reproduces brute force (the n21/n158 law). Healthy appends
    * hold recall near 1; a drifted slice decays it and the pipeline
    * retrains below its SLO (the [[recallAudit]] decision, spec-pinned
    * on the same planted boundary-straddling fixture). Pass `nRows`
    * when the corpus size is already known — the default counts the
    * encoded relation (m-byte rows, the cheap one), never the corpus.
    * Audit-priced: run on a sample, never the serving path.
    */
  def recallAuditPq(pq: PqIndex, corpus: DataFrame, queries: DataFrame,
                    k: Int = 10, nProbe: Int = 2, rerank: Int = 100,
                    nRows: Long = -1L): DataFrame = {
    val got = searchPq(pq, corpus, queries, k, nProbe, rerank)
      .select(col("query_id").as("doc_id_a"), col("vec_id").as("doc_id_b"))
    val n = if (nRows >= 0L) nRows else pq.encoded.count()
    val truth = searchPq(pq, corpus, queries, k,
        nProbe = pq.centroids.length, rerank = math.max(rerank, rerankFor(n)))
      .select(col("query_id").as("doc_id_a"), col("vec_id").as("doc_id_b"))
    Dedup.pairRecall(got, truth)
  }

  /** Rerank window for an exhaustive-intent search over an n-vector
    * corpus: PQ recall at a FIXED shortlist degrades as the corpus
    * grows (quantization noise stays constant while the candidate
    * density under it rises), so the window scales with n. Shared by
    * n21 and its OpsSpec containment guard.
    */
  def rerankFor(n: Long): Int = math.max(150L, n / 10).toInt

  /** IVF-PQ search: probe `nProbe` lists, score candidates from their
    * m-byte codes via per-query ADC lookup tables (built once per query
    * per partition), keep the `rerank` best, then re-rank those exactly
    * against the real embeddings. With full probing and `rerank` large
    * enough to contain the true top-k, the result equals brute force.
    */
  def searchPq(pq: PqIndex, corpus: DataFrame, queries: DataFrame, k: Int,
               nProbe: Int = 4, rerank: Int = 100): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = pq.centroids.toSeq.toDF("list_id", "centroid")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("c_cos", cosine_similarity(col("q_emb"), col("centroid")))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("c_cos").desc, col("list_id"))))
      .filter(col("c_rank") <= nProbe)
      .select("query_id", "q_emb", "list_id")
    val bcBooks = spark.sparkContext.broadcast(pq.codebooks)
    val bcCents = spark.sparkContext.broadcast(pq.centroids.toMap)
    val cands = pq.encoded.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("vec_id"), col("list_id"),
        col("codes"), col("vnorm"))
      .as[(Long, Array[Float], Long, Int, Array[Int], Double)]
      .mapPartitions { it =>
        val bk = bcBooks.value; val cents = bcCents.value
        val m = bk.length
        // per-partition ADC cache: query -> (qnorm, ip tables, centroid ips)
        val tables = scala.collection.mutable.Map.empty[Long, (Double, Array[Array[Double]])]
        val centIp = scala.collection.mutable.Map.empty[(Long, Int), Double]
        it.map { case (qid, qe, vid, list, codes, vnorm) =>
          val dsub = qe.length / m
          val (qnorm, tab) = tables.getOrElseUpdate(qid, {
            var nq = 0.0; var j = 0
            while (j < qe.length) { nq += qe(j).toDouble * qe(j); j += 1 }
            val t = Array.tabulate(m) { mi =>
              bk(mi).map { code =>
                var s = 0.0; var jj = 0
                while (jj < dsub) { s += qe(mi * dsub + jj).toDouble * code(jj); jj += 1 }
                s
              }
            }
            (math.sqrt(nq), t)
          })
          val cIp = centIp.getOrElseUpdate((qid, list), {
            val ctr = cents(list)
            var s = 0.0; var j = 0
            while (j < ctr.length) { s += qe(j).toDouble * ctr(j); j += 1 }
            s
          })
          var ip = cIp
          var mi = 0
          while (mi < m) { ip += tab(mi)(codes(mi)); mi += 1 }
          (qid, vid, ip / (qnorm * vnorm))
        }
      }
      .toDF("query_id", "vec_id", "approx_cos")
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id"))
    val shortlist = cands
      .withColumn("a_rank", row_number().over(wApprox))
      .filter(col("a_rank") <= rerank)
      .select("query_id", "vec_id")
    // exact re-rank: fetch real embeddings for the shortlist only
    val emb = corpus.select(col("vec_id"), col("embedding"))
    val qe = q.withColumnRenamed("q_emb", "q_embedding")
    val exact = shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(qe), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("q_embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Top-k by cosine among the `nProbe` nearest lists per query. */
  def search(index: Index, queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = index.centroids.toSeq.toDF("list_id", "centroid")
    // probe lists per query: rank centroids by cosine to the query
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("c_cos", cosine_similarity(col("q_emb"), col("centroid")))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("c_cos").desc, col("list_id"))))
      .filter(col("c_rank") <= nProbe)
      .select("query_id", "q_emb", "list_id")
    // exact re-rank within probed lists only
    val cands = index.assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), col("q_emb")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // -------------------------------------------------------------------
  // Retrain-and-republish orchestration (VERDICT r12 "Next round #5"):
  // the gauges exist (recallAudit / recallAuditPq) and the manifest
  // versions centroids and codebooks beside the relations — this closes
  // the loop: audit, retrain only when the gain clears a declared bar,
  // republish index + sidecars as ONE atomic version.
  // -------------------------------------------------------------------

  /** Serialize per-subspace PQ codebooks as a byte sidecar (m
    * subspaces x codebookSize codes x dsub floats — kilobytes), the
    * [[graft.sources.Manifest]] blob format: a codebook that outlives
    * the codes it decodes is exactly the skew the manifest prevents.
    */
  def codebooksToBytes(books: Array[Array[Array[Float]]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(books.length)
    books.foreach { sub =>
      out.writeInt(sub.length)
      out.writeInt(if (sub.isEmpty) 0 else sub.head.length)
      sub.foreach(_.foreach(out.writeFloat))
    }
    out.flush()
    bos.toByteArray
  }

  /** Inverse of [[codebooksToBytes]] — bit-exact round trip (floats
    * serialize as raw IEEE bits).
    */
  def codebooksFromBytes(bytes: Array[Byte]): Array[Array[Array[Float]]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    Array.fill(in.readInt()) {
      val k = in.readInt(); val d = in.readInt()
      Array.fill(k)(Array.fill(d)(in.readFloat()))
    }
  }

  /** Publish the ANN serving family as ONE manifest version: the
    * assigned relation laid out by list (the partition-pruning
    * layout), the centroid table, the PQ code relation, and the
    * codebooks as a blob sidecar. Atomicity comes from the manifest's
    * pointer swap — a concurrent reader resolves either the old
    * centroids WITH the old codes or the new WITH the new, never a
    * mix (mixed centroids/codes decode garbage distances silently,
    * which is why the whole family republishes together or not at
    * all). Unrelated families at `root` carry forward untouched (the
    * delta-publish contract).
    */
  def publishAnn(root: String, index: Index, pq: PqIndex): Long = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    import graft.sources.Manifest
    val centDf = index.centroids.toSeq.toDF("list_id", "centroid").coalesce(1)
    Manifest.publish(root, Map(
      "ivf_assigned" -> Manifest.Family(index.assigned,
        partitionBy = Seq("list_id")),
      "ivf_centroids" -> Manifest.Family(centDf),
      "pq_encoded" -> Manifest.Family(pq.encoded)),
      blobs = Map("pq_codebooks" -> codebooksToBytes(pq.codebooks)))
  }

  /** Read the published ANN family back at the pointer's current
    * version — the serving state [[publishAnn]] wrote, self-sufficient
    * for search, append, retract, and the next audit.
    */
  def readAnn(spark: org.apache.spark.sql.SparkSession,
              root: String): (Index, PqIndex) = {
    import graft.sources.Manifest
    val cents = Manifest.read(spark, root, "ivf_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val idx = Index(Manifest.read(spark, root, "ivf_assigned"), cents)
    val pq = PqIndex(Manifest.read(spark, root, "pq_encoded"), cents,
      codebooksFromBytes(Manifest.readBlob(root, "pq_codebooks")))
    (idx, pq)
  }

  /** One [[retrainAndRepublish]] decision: the audited recalls, the
    * gain a retrain offered, and the version published iff it cleared
    * the bar.
    */
  final case class AnnMaintenance(retrained: Boolean, gain: Double,
      recallFrozen: Double, recallRetrained: Double, version: Option[Long])

  /** The scheduled ANN maintenance step — the closed loop over the
    * gauges: audit the PUBLISHED index's partial-probe recall on a
    * query sample, fit a RETRAIN CANDIDATE (k-means on a capped
    * sample — cheap; its assigned relation stays lazy), audit the
    * candidate on the same queries, and republish through
    * [[publishAnn]] ONLY when the retrain gain exceeds `bar`. A
    * healthy corpus (appends drawn from the old distribution) audits
    * a small gain and pays nothing beyond the two sampled audits; a
    * drifted corpus (the planted boundary-straddling fixture of the
    * n156/n158 specs) trips the bar and pays the one full re-encode +
    * atomic republish a retrain costs anyway. `corpus` is the CURRENT
    * full embedding relation (survivors + appended slices — the
    * caller's corpus of record, which the assigned relation must
    * mirror).
    *
    * 100 TB shape: the decision path touches a driver-sized training
    * sample and two audit searches over `auditQueries` (each probes
    * nProbe lists per query — audit-priced, never a corpus scan); the
    * corpus-sized work (re-assign + PQ re-encode + write) happens only
    * on a tripped bar, and lands behind the manifest pointer so
    * readers never see mixed centroids/codes.
    */
  def retrainAndRepublish(root: String, corpus: DataFrame,
      auditQueries: DataFrame, bar: Double, nLists: Int = 16,
      m: Int = 8, codebookSize: Int = 16, k: Int = 10, nProbe: Int = 2,
      seed: Long = 42L, nRows: Long = -1L): AnnMaintenance = {
    val spark = corpus.sparkSession
    val (cur, _) = readAnn(spark, root)
    val n = math.max(if (nRows >= 0L) nRows else corpus.count(), 1L)
    def recallOf(ix: Index): Double =
      recallAudit(ix, auditQueries, k, nProbe).head().getAs[Double]("recall")
    val rFrozen = recallOf(cur)
    val cand = build(corpus, nLists = nLists, seed = seed, nRows = n)
    val rCand = recallOf(cand)
    val gain = rCand - rFrozen
    if (gain > bar) {
      val pq = buildPq(cand, m = m, codebookSize = codebookSize,
        seed = seed, nRows = n)
      AnnMaintenance(retrained = true, gain, rFrozen, rCand,
        Some(publishAnn(root, cand, pq)))
    } else AnnMaintenance(retrained = false, gain, rFrozen, rCand, None)
  }
}
