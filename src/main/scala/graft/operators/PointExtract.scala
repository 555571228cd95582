package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.GridDataset

/** Point time-series extraction — the reference's signature "query"
  * (SURVEY.md §2.9 R1; reference: to_tables.py:24-130).
  *
  * Pipeline: snap each sample point to its nearest grid cell (J2), then
  * pivot to a wide table: one row per timestamp, one column per point id.
  *
  * Plan shape (the deliberate improvement over the reference, which
  * pivots ALL cells x time and then selects ~3 columns): the point list
  * is tiny, so snapping happens driver-side (exactly like the reference's
  * NumPy argmin) and the grid is filtered to the matched cells BEFORE the
  * pivot — predicate pushdown to the scan, then a single shuffle for the
  * groupBy-pivot whose width (#points) is known up front, so Spark skips
  * the extra distinct-values job.
  */
object PointExtract {

  /** (pointId, lon, lat) -> nearest cell (x, y), computed from axis
    * metadata (closed form) or tiny distinct-axis jobs.
    */
  def snapPoints(g: GridDataset, points: Seq[(String, Double, Double)]): Seq[(String, Double, Double)] =
    points.map { case (id, lon, lat) =>
      val sx = g.meta.xAxis.map(_.nearestValue(lon))
        .getOrElse(Crop.nearestAxisValue(g.df, g.meta.xDim, lon))
      val sy = g.meta.yAxis.map(_.nearestValue(lat))
        .getOrElse(Crop.nearestAxisValue(g.df, g.meta.yDim, lat))
      (id, sx, sy)
    }

  /** Wide table: time x point-id for one variable, ordered by time.
    * Ties (two points snapping to the same cell) are fine — each point id
    * is its own output column.
    */
  def pointsToTable(g: GridDataset, points: Seq[(String, Double, Double)],
                    variable: String): DataFrame = {
    val snapped = snapPoints(g, points)
    val ids = snapped.map(_._1)
    // point_id assignment as a literal CASE over the snapped cells —
    // no join needed for a handful of points; the filter prunes the scan.
    // Two points may snap to the same cell, so the CASE maps a cell to
    // the ARRAY of its point ids and explodes (one output column each).
    val cellFilter = snapped.map { case (_, sx, sy) =>
      g.x === sx && g.y === sy
    }.reduce(_ || _)
    val byCell = snapped.groupBy(p => (p._2, p._3)).toSeq
    val idArray = byCell.foldLeft(lit(null).cast("array<string>")) {
      case (acc, ((sx, sy), ps)) =>
        when(g.x === sx && g.y === sy, array(ps.map(p => lit(p._1)): _*)).otherwise(acc)
    }
    g.df.filter(cellFilter)
      .select(g.time, explode(idArray).as("point_id"), col(variable))
      .groupBy(g.time)
      .pivot("point_id", ids)
      .agg(first(col(variable)))
      .orderBy(g.time)
  }
}
