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

  /** Sample autocorrelation of an INTEGER-valued series at lags
    * 1..maxLag — the periodicity detector (a diurnal field shows a
    * peak at lag 24; white noise stays near 0). Pearson r over the
    * lag-L pair set (x_t, x_{t+L}):
    *
    *   r_L = (m·Σxy − Sx·Sy) / sqrt((m·Σxx − Sx²) · (m·Σyy − Sy²))
    *
    * Every moment is an exact LONG (caller guarantees |value| small
    * enough that m·Σxy < 2^63 — true for x1024-scaled grid sums);
    * the final formula is five pinned IEEE ops on deterministically-
    * rounded long→double casts, so the result replays bit-exactly.
    * NULL r for degenerate lags (constant series / too few pairs).
    *
    * Shape: the series is ALREADY aggregated (timesteps-sized, not
    * corpus-sized) — the index window and the lag self-join run on
    * that metadata-sized relation; maxLag bounds the join fan-out.
    */
  def integerAcf(series: DataFrame, tsCol: String, valueCol: String,
                 maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    import org.apache.spark.sql.expressions.Window
    val s = series.select(col(tsCol).as("t"), col(valueCol).cast("long").as("v"))
      .withColumn("rn", row_number().over(Window.orderBy(col("t"))))
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("long").as("lag"))
    val a = s.select(col("rn"), col("v").as("x")).crossJoin(lags)
    val b = s.select(col("rn").as("rnb"), col("v").as("y"))
    val pairs = a.join(b, a("rn") + a("lag") === b("rnb"))
    pairs
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lag"), col("n_pairs"),
        (((col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double")) /
          (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")).cast("double")) *
           sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("r"))
  }
}
