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

  /** Bilinear interpolation of a variable at scattered points, per
    * timestep — the xarray `ds.interp(x=..., y=..., method="linear")`
    * surface (J2's nearest-cell match is the method="nearest" analog).
    *
    * For each point: enclosing-cell lower indices i0/j0 (clamped to
    * keep the 2x2 stencil in-grid), fractional offsets fx/fy, and the
    * four corner weights (1−fx)(1−fy), fx(1−fy), (1−fx)fy, fx·fy —
    * all computed DRIVER-SIDE in plain IEEE doubles from the axis
    * metadata (closed form, no axis scan), then applied as literal
    * coefficients in ONE conditional-aggregation pass over the grid
    * rows of the (points × 4) stencil cells: the scan is pruned to
    * stencil cells by a pushed filter, each corner value lands in its
    * own agg slot, and the weighted sum is a FIXED-ORDER expression —
    * no group-order float hazard anywhere. One shuffle keyed by time,
    * rows bounded by timesteps × points.
    */
  def bilinearPoints(g: GridDataset, points: Seq[(String, Double, Double)],
                     variable: String): DataFrame = {
    require(points.nonEmpty, "need at least one point")
    val xa = g.meta.xAxis.getOrElse(throw new IllegalArgumentException(
      "bilinear interp needs xAxis metadata"))
    val ya = g.meta.yAxis.getOrElse(throw new IllegalArgumentException(
      "bilinear interp needs yAxis metadata"))
    require(xa.n >= 2 && ya.n >= 2,
      "bilinear interp needs at least a 2x2 grid")
    // no silent extrapolation: the index clamp alone would leave fx/fy
    // unbounded and produce weights far outside [0,1] for out-of-domain
    // points (xarray interp yields NaN there; this engine fails fast)
    points.foreach { case (id, lon, lat) =>
      require(lon >= xa.origin && lon <= xa.last &&
        lat >= ya.origin && lat <= ya.last,
        s"point $id ($lon, $lat) is outside the grid domain " +
          s"[${xa.origin}, ${xa.last}] x [${ya.origin}, ${ya.last}]")
    }
    final case class Stencil(id: String, xs: Array[Double], ys: Array[Double],
                             w: Array[Double])
    val stencils = points.map { case (id, lon, lat) =>
      def locate(v: Double, ax: graft.model.AxisSpec): (Int, Double) = {
        val raw = math.floor((v - ax.origin) / ax.step).toInt
        val i0 = math.max(0, math.min(ax.n - 2, raw))
        (i0, (v - ax.valueAt(i0)) / ax.step)
      }
      val (i0, fx) = locate(lon, xa)
      val (j0, fy) = locate(lat, ya)
      Stencil(id,
        Array(xa.valueAt(i0), xa.valueAt(i0 + 1)),
        Array(ya.valueAt(j0), ya.valueAt(j0 + 1)),
        Array((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy))
    }
    val cellFilter = stencils.flatMap(st =>
      for (cx <- st.xs.toSeq; cy <- st.ys.toSeq)
        yield g.x === cx && g.y === cy)
      .reduce(_ || _)
    // one agg slot per (point, corner): sum(when(cell)) isolates the
    // corner value; corners are distinct cells so each slot sees one row
    val slots = stencils.flatMap { st =>
      for ((cx, ci) <- st.xs.toSeq.zipWithIndex; (cy, cj) <- st.ys.toSeq.zipWithIndex)
        yield sum(when(g.x === cx && g.y === cy, col(variable)))
          .as(s"_${st.id}_${ci}_$cj")
    }
    val agg = g.df.filter(cellFilter).groupBy(g.time)
      .agg(slots.head, slots.tail: _*)
    // all points read off ONE select over the aggregate — an array of
    // (point_id, value) structs exploded to rows. A per-point select
    // union would make Catalyst duplicate the aggregate subtree per
    // branch and re-run the scan+agg once per point.
    val entries = stencils.map { st =>
      val v = col(s"_${st.id}_0_0") * st.w(0) + col(s"_${st.id}_1_0") * st.w(1) +
        col(s"_${st.id}_0_1") * st.w(2) + col(s"_${st.id}_1_1") * st.w(3)
      struct(lit(st.id).as("point_id"), v.as("v"))
    }
    agg.select(g.time.as(g.meta.timeDim), explode(array(entries: _*)).as("e"))
      .select(col(g.meta.timeDim), col("e.point_id").as("point_id"),
        col("e.v").as(variable))
  }
}
