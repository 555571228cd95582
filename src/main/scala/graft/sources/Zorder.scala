package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.GraftFunctions._

/** Z-order-clustered parquet layout for grid tables — the storage-side
  * lever for bbox-query locality at 100 TB. A row-major (time, y, x)
  * layout gives each file a tight min/max envelope only on the OUTER
  * sort axis: an x-stripe predicate intersects every file. Clustering
  * by the Morton key interleaves both cell indices, so every file is a
  * compact spatial tile with tight parquet min/max stats on y AND x
  * simultaneously, and a bbox filter prunes row groups on both axes at
  * once (the lakehouse OPTIMIZE ZORDER pattern, expressed with plain
  * Spark range repartitioning — no table-format dependency).
  */
object Zorder {

  /** Morton key column over two cell-index columns (low 32 bits each). */
  def withZKey(df: DataFrame, y: Column, x: Column): DataFrame =
    df.withColumn("zkey", interleave_bits(y.cast("long"), x.cast("long")))

  /** Write clustered on the Morton key: range-repartition into
    * `numFiles` contiguous z-ranges and sort within each, so each
    * output file covers one spatial tile. The key column is retained
    * in the file (one long per row) so readers can also range-prune on
    * it directly.
    */
  def writeZordered(df: DataFrame, y: Column, x: Column, path: String,
                    numFiles: Int = 200): Unit =
    withZKey(df, y, x)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)

  /** Hilbert-curve key column — consecutive key values are always
    * grid-adjacent (Morton jumps at quadrant seams), so range
    * partitions are tiles with strictly better worst-case locality.
    */
  def withHilbertKey(df: DataFrame, y: Column, x: Column): DataFrame =
    df.withColumn("hkey", hilbert_key(y.cast("long"), x.cast("long")))

  /** Hilbert twin of [[writeZordered]]. */
  def writeHilbertClustered(df: DataFrame, y: Column, x: Column, path: String,
                            numFiles: Int = 200): Unit =
    withHilbertKey(df, y, x)
      .repartitionByRange(numFiles, col("hkey"))
      .sortWithinPartitions("hkey")
      .write.mode("overwrite").parquet(path)
}
