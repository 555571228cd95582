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
    * reads every vector. The row count comes from parquet footers,
    * not a data scan.
    */
  def build(corpus: DataFrame, embedCol: String = "embedding",
            nLists: Int = 16, seed: Long = 42L, maxIter: Int = 8,
            idCol: String = "vec_id", trainRows: Long = 100000L): Index = {
    val withVec = corpus.withColumn("__vec", array_to_vector(col(embedCol)))
    val n = math.max(corpus.count(), 1L)
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
}
