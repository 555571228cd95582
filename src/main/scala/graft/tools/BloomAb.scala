package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** A/B of the band index's bloom sidecar (VERDICT r10 #4) at bench
  * scale: the n150 fixture (slice ~95% of the corpus — the WORST case
  * for the bloom, nearly every slice key is present) and a
  * production-shaped fixture (slice ≪ corpus, most slice keys absent —
  * the case the sidecar exists for), each run unpruned vs bloom-pruned,
  * twice, min-of-two (the Bench convention). Also prints the key-probe
  * shrink the bloom buys on each shape. Results land in PLANS.md
  * "bloom sidecar A/B".
  */
object BloomAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()

    val base = graft.sources.Tables(spark, sfDir, "documents")

    def time(name: String)(mk: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      val d = math.min(once(), once())
      println(f"[bloom-ab] $name%-28s ${d}%8.2f s")
      d
    }

    def shape(label: String, existing: DataFrame, incoming: DataFrame): Unit = {
      val index = Dedup.minhashBandIndex(existing, k = 5, numHashes = 64,
        bands = 16)
      val bloom = Dedup.indexBloom(index)
      // the probe shrink: slice keys the sidecar rejects never reach
      // the (band, bucket) semi-join
      val sliceKeys = Dedup.minhashBandIndex(incoming, k = 5, numHashes = 64,
        bands = 16).select(col("band"), col("bucket")).distinct()
      val total = sliceKeys.count()
      val admitted = sliceKeys.filter(
        org.apache.spark.sql.graft.GraftFunctions.might_contain(lit(bloom),
          xxhash64(col("band"), col("bucket")))).count()
      println(f"[bloom-ab] $label: keys $total%d -> admitted $admitted%d " +
        f"(${100.0 * admitted / math.max(total, 1L)}%.1f%%)")
      time(s"$label unpruned") {
        Dedup.incrementalMinhashDedup(index, existing, incoming,
          k = 5, numHashes = 64, bands = 16, threshold = 0.5)
      }
      time(s"$label bloom-pruned") {
        Dedup.incrementalMinhashDedup(index, existing, incoming,
          k = 5, numHashes = 64, bands = 16, threshold = 0.5,
          bloom = Some(bloom))
      }
    }

    // the n150 bench shape: corpus = ids < 250, slice = everything else
    // (slice keys mostly NEW but the slice is huge)
    shape("n150-shape",
      base.filter(col("doc_id") < 250),
      base.filter(col("doc_id") >= 250)
        .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
          .withColumn("doc_id", col("doc_id") + 3000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit")))))
    // the production shape: corpus = the whole table, slice = 5% of its
    // size and mostly GENUINELY NEW (reversed text — natural length
    // distribution, disjoint shingles) plus a sliver of planted
    // near-dups; most slice keys are absent from the index, which is
    // exactly what the sidecar prunes
    shape("prod-shape",
      base,
      base.filter(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + 5000000L)
        .withColumn("text", reverse(col("text")))
        .unionAll(base.filter(col("doc_id") < 20)
          .withColumn("doc_id", col("doc_id") + 6000000L)
          .withColumn("text", concat(col("text"), lit(" tail bit")))))
    spark.stop()
  }
}
