package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table parquet layout — the shuffle-elimination half of the
  * storage story ([[Zorder]] is the scan-pruning half). Writing two
  * fact tables bucketed by their join key into the SAME bucket count
  * pre-materializes the exchange that every equi-join on that key
  * would otherwise pay: Spark's bucketing spec makes both scans report
  * `HashPartitioning(key, n)`, so the SortMergeJoin (and any
  * aggregation on the same key) plans with NO Exchange under it. At
  * 100 TB this converts the dominant recurring cost of a fact-fact
  * join — reshuffling both sides on every query — into a one-time
  * layout decision at ingest, exactly the Hive/Iceberg bucketed-table
  * pattern; BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed external parquet table.
    *
    * One file per bucket: the pre-write `repartition(buckets, key)`
    * aligns task boundaries with bucket boundaries, which both avoids
    * the tasks×buckets small-file explosion and is what lets Spark
    * trust the per-bucket `sortBy` order at read time (multi-file
    * buckets force a defensive re-sort under the join). At real scale
    * the same call holds — `buckets` just grows with the table so a
    * single bucket stays executor-sized.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
