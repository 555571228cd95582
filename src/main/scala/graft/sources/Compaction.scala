package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance pass every incrementally-
  * written lake table needs: streaming sinks and per-slice snapshot
  * appends produce thousands of KB-sized parquet files, and at 100 TB
  * the resulting task-per-file scheduling and footer-read overhead
  * dominate scan cost long before the data does.
  *
  * Two pieces, deliberately separable:
  *  - [[plan]] is pure metadata arithmetic: first-fit-decreasing over
  *    the file listing (sizes come from the filesystem, no data read)
  *    into bins of at most `targetBytes` — FFD is the classic 11/9·OPT
  *    bin-packing heuristic and, run over metadata, costs nothing at
  *    any scale. A table service would schedule one rewrite task per
  *    bin.
  *  - [[compact]] executes the simple whole-table form: one
  *    column-preserving read, `repartition(bins)` (a round-robin
  *    exchange — the only way to get even output files from skewed
  *    inputs), one write. Content equality, not layout equality, is
  *    the contract; layouts that carry meaning (Z-order, buckets) have
  *    their own writers and should be re-written through those.
  */
object Compaction {

  final case class PlanEntry(bin: Int, path: String, bytes: Long)

  /** First-fit-decreasing packing of the directory's parquet data
    * files into bins of at most `targetBytes` (files larger than the
    * target get a bin of their own). Deterministic: files sort by
    * (size desc, path) and bins are scanned in creation order.
    */
  def plan(spark: SparkSession, dir: String, targetBytes: Long): Seq[PlanEntry] =
    plan(spark, Seq(dir), targetBytes)

  /** The multi-directory form — one FFD packing over the combined file
    * listing, so small files from SEPARATE delta segments (the
    * [[Manifest.compactFamily]] case: one dir per published delta)
    * pack into shared bins instead of per-dir remainders.
    */
  def plan(spark: SparkSession, dirs: Seq[String],
           targetBytes: Long): Seq[PlanEntry] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = dirs.flatMap { dir =>
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.toString, s.getLen))
    }.sortBy { case (p, len) => (-len, p) }
    val binLoads = scala.collection.mutable.ArrayBuffer.empty[Long]
    files.map { case (path, len) =>
      val fit = binLoads.indexWhere(_ + len <= targetBytes)
      val bin = if (fit >= 0) { binLoads(fit) += len; fit }
        else { binLoads += len; binLoads.length - 1 }
      PlanEntry(bin, path, len)
    }.toSeq
  }

  /** Rewrites `dir` into `outDir` with one file per planned bin.
    * Returns (filesBefore, filesAfter). Content-preserving (the spec
    * asserts row-set equality); file count drops to the FFD bin
    * count.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long): (Int, Int) = {
    val p = plan(spark, dir, targetBytes)
    val bins = if (p.isEmpty) 1 else p.map(_.bin).max + 1
    spark.read.parquet(dir).repartition(bins)
      .write.mode("overwrite").parquet(outDir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (p.size, after)
  }
}
