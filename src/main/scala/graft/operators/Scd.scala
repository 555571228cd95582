package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) build from an event log: collapse
  * each entity's consecutive runs of an attribute value into version
  * rows with half-open validity intervals `[valid_from, valid_to)` —
  * the standard dimension-table derivation (Kimball SCD2) that turns
  * an append-only event stream into point-in-time joinable state.
  *
  * Change detection is the lag-compare / running-sum islands pattern:
  * a version starts where the attribute differs from the previous
  * event's value (or at the entity's first event); `valid_to` is the
  * next version's `valid_from`, NULL for the current version.
  *
  * Scale shape: every window partitions by the entity key, so the work
  * is one hash shuffle on `key` and per-entity sorted scans — no
  * global order anywhere (the ORDER BY in the final query surface is
  * presentation only). The version aggregation is map-side combinable
  * after the islands pass. Ties on `ts` are broken by `tieBreaker` so
  * the derivation is deterministic under any partitioning.
  */
object Scd {

  def scd2(df: DataFrame, key: String, ts: String, attr: String,
      tieBreaker: String): DataFrame = {
    val byEvent = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreaker))
    val chg = when(
      lag(col(attr), 1).over(byEvent).isNull ||
        lag(col(attr), 1).over(byEvent) =!= col(attr), 1L).otherwise(0L)
    val versions = df
      .withColumn("_scd_chg", chg)
      .withColumn("version",
        sum(col("_scd_chg")).over(byEvent.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("version"))
      .agg(first(col(attr)).as(attr), min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy(col(key)).orderBy(col("version"))
    versions.withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col(key), col("version"), col(attr),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** Point-in-time lookup against an SCD2 dimension: the version row
    * whose `[valid_from, valid_to)` interval contains `at`. NULL
    * `valid_to` (current version) is an open upper bound.
    */
  def asOf(dim: DataFrame, key: String, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
