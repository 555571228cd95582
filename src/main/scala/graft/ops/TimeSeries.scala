package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential per-key time-series folds over event streams.
  *
  * The EWMA recurrence s_i = s_{i-1} + (v_i - s_{i-1}) / alphaDen is
  * inherently sequential — it cannot be a window aggregate — so the
  * scalable shape is the classic SECONDARY SORT: hash-partition by
  * key, sort (key, ts, tie) within partitions, then a single
  * mapPartitions pass that folds consecutive runs with O(1) state per
  * key. No collect_list (per-key memory stays constant regardless of
  * how many events one key has), no global order, one shuffle.
  *
  * All arithmetic is integer: values are scaled by 2^scaleBits via
  * floor (double multiply by a power of two is exact, floor is
  * engine-agreed), and the recurrence divides by `alphaDen` with FLOOR
  * division (Math.floorDiv == a remainder-adjusted `//` in DuckDB), so
  * every intermediate state replays exactly.
  */
object TimeSeries {

  /** Per-event EWMA with alpha = 1/alphaDen over `value`, scaled to
    * 2^scaleBits fixed point. Emits one row per event carrying the
    * scaled input and the scaled smoothed state.
    */
  def ewmaScaled(df: DataFrame, key: String, ts: String, tie: String,
      value: Column, scaleBits: Int = 10, alphaDen: Int = 4): DataFrame = {
    require(scaleBits >= 0 && scaleBits < 30, s"bad scaleBits $scaleBits")
    require(alphaDen >= 2, s"alphaDen must be >= 2, got $alphaDen")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(key).cast("long").as("k"), col(ts).as("t"),
        col(tie).cast("long").as("e"),
        floor(value * (1L << scaleBits)).cast("long").as("v"))
      .repartition(col("k"))
      .sortWithinPartitions("k", "t", "e")
      .as[(Long, java.sql.Timestamp, Long, Long)]
    prepared.mapPartitions { it =>
      var curKey = 0L
      var hasKey = false
      var state = 0L
      it.map { case (k, t, e, v) =>
        if (!hasKey || k != curKey) { curKey = k; hasKey = true; state = v }
        else state += Math.floorDiv(v - state, alphaDen.toLong)
        (k, t, e, v, state)
      }
    }.toDF(key, ts, tie, "v_scaled", "ewma_scaled")
  }
}
