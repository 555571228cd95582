package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (proximity) range join: pairs of left/right rows within
  * `maxGapSeconds` of each other on their time columns, sharing `by`
  * keys.
  *
  * Spark plans a raw `|lt - rt| <= gap` condition as a broadcast
  * nested loop (quadratic per key). Instead both sides are bucketed to
  * `gap`-sized time bins, the left side expands to its bin and the two
  * adjacent bins (3 rows, map-side), and the join is a plain hash
  * equi-join on (key, bin) — every qualifying pair shares one of the
  * three bins, and the residual band filter removes false candidates.
  * Cost: 3x left expansion + one hash shuffle, linear in input, and
  * the band condition never reaches a nested loop.
  */
object RangeJoin {

  def within(left: DataFrame, right: DataFrame, leftOn: String,
             rightOn: String, by: Seq[String], maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds > 0)
    require(leftOn != rightOn,
      "leftOn and rightOn must have distinct names (both survive the join)")
    val lt = col(leftOn).cast("double")
    val rt = col(rightOn).cast("double")
    val gap = lit(maxGapSeconds.toDouble)
    val lBin = floor(lt / gap).cast("long")
    val rBin = floor(rt / gap).cast("long")
    val l = left.withColumn("__bin",
      explode(array(lBin - 1, lBin, lBin + 1)))
    val r = right.withColumn("__bin", rBin)
    l.join(r, by :+ "__bin")
      .filter(abs(lt - rt) <= gap)
      .drop("__bin")
  }
}
