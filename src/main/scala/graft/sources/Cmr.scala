package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CMR (NASA Common Metadata Repository) granule-response parsing
  * (SURVEY.md S3; reference `nasa_from_LPDAAC.py:302-352`).
  *
  * The reference walks the JSON driver-side per entry; here the parse is
  * a distributed projection over a column of granule-entry JSON, so a
  * million-granule catalog search is a scan, not a driver loop. Two bbox
  * encodings, mirrored from the reference exactly:
  *
  *  - `boxes`: `"south west north east"` space-separated
  *    (`nasa_from_LPDAAC.py:322-324`);
  *  - `polygons`: `"lat lon lat lon ..."` ring; the bbox is
  *    `[min lat, min lon, max lat, max lon]` over alternating positions
  *    (`:327-342` — lats at even 0-based indices, lons at odd).
  */
object Cmr {

  private val entrySchema =
    "producer_granule_id STRING, dataset_id STRING, data_center STRING, " +
    "boxes ARRAY<STRING>, polygons ARRAY<ARRAY<STRING>>, " +
    "time_start STRING, time_end STRING"

  private def nums(s: Column): Column =
    transform(split(s, " "), x => x.cast("double"))

  /** One row per granule entry: id, west/south/east/north, start/end.
    * Pure column expressions — whole-stage codegen, no UDF.
    */
  def granuleBBoxes(entries: DataFrame, jsonCol: String): DataFrame = {
    val g = from_json(col(jsonCol), entrySchema, Map.empty[String, String])
    // [S, W, N, E] either read directly or reduced from the polygon ring
    val boxNums = nums(element_at(g.getField("boxes"), 1))
    val ring = nums(element_at(element_at(g.getField("polygons"), 1), 1))
    val lats = filter(ring, (_, i) => i % 2 === 0)
    val lons = filter(ring, (_, i) => i % 2 === 1)
    val bbox = when(g.getField("boxes").isNotNull, boxNums)
      .otherwise(array(array_min(lats), array_min(lons),
                       array_max(lats), array_max(lons)))
    val ts = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
    entries.select(
      g.getField("producer_granule_id").as("granule_id"),
      element_at(bbox, 2).as("west"),
      element_at(bbox, 1).as("south"),
      element_at(bbox, 4).as("east"),
      element_at(bbox, 3).as("north"),
      to_timestamp(g.getField("time_start"), ts).as("start_date"),
      to_timestamp(g.getField("time_end"), ts).as("end_date"))
  }
}
