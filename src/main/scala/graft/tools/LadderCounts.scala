package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the incremental-ladder fixture: cardinality
  * and bucket-size distribution of the n150 candidate stage, so pair
  * explosion (dense buckets) is distinguishable from per-task
  * overhead. Not part of any query path.
  */
object LadderCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.sources.Tables(spark, sfDir, "documents")
    val existing = base.filter(col("doc_id") < 250)
    val incoming = base.filter(col("doc_id") >= 250)
      .unionAll(base.filter(col("doc_id").isin(0L, 2L, 4L))
        .withColumn("doc_id", col("doc_id") + 3000000L)
        .withColumn("text", concat(col("text"), lit(" tail bit"))))
      .unionAll(base.filter(col("doc_id") === 251L)
        .withColumn("doc_id", col("doc_id") + 2999756L)
        .withColumn("text", concat(col("text"), lit(" x"))))
    val index = graft.ops.Dedup.minhashBandIndex(existing, k = 5,
      numHashes = 64, bands = 16)
    val nb = graft.ops.Dedup.minhashBandIndex(incoming, k = 5,
      numHashes = 64, bands = 16)
    println("index rows: " + index.count())
    println("slice band rows: " + nb.count())
    val keys = nb.select(col("band"), col("bucket")).distinct()
    println("slice distinct keys: " + keys.count())
    val oldRelevant = index.join(keys, Seq("band", "bucket"), "left_semi")
    println("old relevant rows: " + oldRelevant.count())
    val tagged = nb.withColumn("is_new", lit(true))
      .unionByName(oldRelevant.select(col("doc_id"), col("band"), col("bucket"))
        .withColumn("is_new", lit(false)))
    val buckets = tagged.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    println("bucket size histogram (n -> buckets):")
    buckets.groupBy(col("n")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("n")).collect()
      .foreach(r => println(s"  size=${r.get(0)} buckets=${r.get(1)}"))
    val kept = buckets.filter(col("n").between(2, 1000))
    val pairsUpper = kept.agg(sum(col("n") * (col("n") - 1) / 2)).head()
    println("sum pairs over kept buckets (pre-dedup, incl old-old): " + pairsUpper)
    spark.stop()
  }
}
