package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{AxisSpec, GridDataset, GridMeta}

/** Spatial resample / regrid (SURVEY.md §2.11 X1).
  *
  * Reference: `rio.reproject` to `(int(height*fy), int(width*fx))` with a
  * resampling kernel (reference: core_functions.py:258-347; target shape
  * at :317-318; default bilinear at :293-299). Re-expressed relationally:
  *
  *  1. generate the target grid from `spark.range` (GDAL-style geometry:
  *     source cells are centers on a regular axis; the raster extent is
  *     [origin - step/2, last + step/2]; target cells are `n' = int(n*f)`
  *     equal subdivisions of the same extent, labeled at centers);
  *  2. map each target center into fractional source-index space;
  *  3. `nearest`: the containing source cell (floor), one equi-join;
  *     `bilinear`: the 4 bracketing cells via a corner explode, one
  *     equi-join + weighted-sum groupBy.
  *
  * The target-cell mapping is metadata-sized (n'x * n'y rows) and
  * broadcasts; the only shuffle is the bilinear groupBy, keyed by output
  * cell — linear in output size, so the plan survives 100x scale-up.
  */
object SpatialResample {

  /** Target axis for a resample factor (GDAL geometry; public so the
    * oracle SQL in SparkEntry can be built from the same constants).
    */
  def targetAxis(src: AxisSpec, factor: Double): AxisSpec = {
    val n2 = (src.n * factor).toInt
    val extent = src.step * src.n
    val step2 = extent / n2
    val west = src.origin - src.step / 2.0
    AxisSpec(west + step2 / 2.0, step2, n2)
  }

  /** Target-cell mapping: one row per output cell with the source index
    * bracket and interpolation weights along each axis.
    */
  private def mapping(spark: SparkSession, xa: AxisSpec, ya: AxisSpec,
                      fx: Double, fy: Double): (DataFrame, AxisSpec, AxisSpec) = {
    val xt = targetAxis(xa, fx); val yt = targetAxis(ya, fy)
    val m = spark.range(xt.n.toLong * yt.n)
      .select(expr(s"id div ${xt.n}").as("jy2"), expr(s"id % ${xt.n}").as("jx2"))
      .withColumn("x2", lit(xt.origin) + col("jx2") * lit(xt.step))
      .withColumn("y2", lit(yt.origin) + col("jy2") * lit(yt.step))
      // fractional position in source-center index space
      .withColumn("gx", (col("x2") - lit(xa.origin)) / lit(xa.step))
      .withColumn("gy", (col("y2") - lit(ya.origin)) / lit(ya.step))
    (m, xt, yt)
  }

  private def clampIdx(c: org.apache.spark.sql.Column, n: Int) =
    greatest(lit(0L), least(lit(n - 1L), c))

  /** Nearest-neighbor regrid: target center -> containing source cell
    * (GDAL nearest semantics: floor in pixel space, clamped at edges).
    * Requires integer index columns `jy`/`jx` on the grid (present on
    * lake/synthetic grids; derivable from axis metadata otherwise).
    */
  def nearest(g: GridDataset, fy: Double, fx: Double): GridDataset = {
    val (xa, ya) = axes(g)
    val (m, xt, yt) = mapping(g.df.sparkSession, xa, ya, fx, fy)
    val tgt = m.select(col("jy2"), col("jx2"), col("x2"), col("y2"),
      clampIdx(floor(col("gx") + 0.5).cast("long"), xa.n).as("jx"),
      clampIdx(floor(col("gy") + 0.5).cast("long"), ya.n).as("jy"))
    val src = withIndexes(g, xa, ya)
    val vars = g.variables
    val out = src
      .join(broadcast(tgt), Seq("jy", "jx"))
      .select((Seq(col(g.meta.timeDim), col("y2").as(g.meta.yDim),
                   col("x2").as(g.meta.xDim)) ++ vars.map(col)): _*)
    g.copy(df = out, meta = g.meta.copy(xAxis = Some(xt), yAxis = Some(yt)))
  }

  /** Bilinear regrid: weighted average of the 4 bracketing source cells
    * (edge-clamped, so border cells replicate — GDAL edge padding).
    */
  def bilinear(g: GridDataset, fy: Double, fx: Double): GridDataset = {
    val (xa, ya) = axes(g)
    val (m, xt, yt) = mapping(g.df.sparkSession, xa, ya, fx, fy)
    val withBracket = m
      .withColumn("jx0", clampIdx(floor(col("gx")).cast("long"), xa.n))
      .withColumn("jx1", clampIdx(floor(col("gx")).cast("long") + 1, xa.n))
      .withColumn("jy0", clampIdx(floor(col("gy")).cast("long"), ya.n))
      .withColumn("jy1", clampIdx(floor(col("gy")).cast("long") + 1, ya.n))
      .withColumn("wx1", col("gx") - floor(col("gx")))
      .withColumn("wy1", col("gy") - floor(col("gy")))
    // 4 corners exploded: (jy, jx, weight) per target cell
    val corners = withBracket.select(col("jy2"), col("jx2"), col("x2"), col("y2"),
      explode(array(
        struct(col("jy0").as("jy"), col("jx0").as("jx"),
               ((lit(1.0) - col("wy1")) * (lit(1.0) - col("wx1"))).as("w")),
        struct(col("jy0").as("jy"), col("jx1").as("jx"),
               ((lit(1.0) - col("wy1")) * col("wx1")).as("w")),
        struct(col("jy1").as("jy"), col("jx0").as("jx"),
               (col("wy1") * (lit(1.0) - col("wx1"))).as("w")),
        struct(col("jy1").as("jy"), col("jx1").as("jx"),
               (col("wy1") * col("wx1")).as("w")))).as("c"))
      .select(col("jy2"), col("jx2"), col("x2"), col("y2"),
              col("c.jy").as("jy"), col("c.jx").as("jx"), col("c.w").as("w"))
      .filter(col("w") =!= 0.0)
    val src = withIndexes(g, xa, ya)
    val vars = g.variables
    val aggs = vars.map(v => sum(col(v) * col("w")).as(v))
    val out = src
      .join(broadcast(corners), Seq("jy", "jx"))
      .groupBy(col(g.meta.timeDim), col("y2"), col("x2"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnsRenamed(Map("y2" -> g.meta.yDim, "x2" -> g.meta.xDim))
    g.copy(df = out, meta = g.meta.copy(xAxis = Some(xt), yAxis = Some(yt)))
  }

  /** Keys cubic-convolution kernel, a = -0.5 (the rasterio/GDAL
    * `cubic` resampling kernel; Keys 1981). Reproduces linear ramps
    * exactly and weights always sum to 1 per axis.
    */
  private def keysKernel(d: org.apache.spark.sql.Column) = {
    val ad = abs(d)
    when(ad <= 1.0, (lit(1.5) * ad - lit(2.5)) * ad * ad + lit(1.0))
      .when(ad < 2.0, ((lit(-0.5) * ad + lit(2.5)) * ad - lit(4.0)) * ad + lit(2.0))
      .otherwise(lit(0.0))
  }

  /** Bicubic regrid: 4x4 tap window per target cell (16-corner explode,
    * same join-aggregate shape as bilinear). Tap weights use the
    * unclamped tap distance; tap indices clamp at edges (replicate),
    * keeping the per-axis weight sum at 1 everywhere.
    */
  def cubic(g: GridDataset, fy: Double, fx: Double): GridDataset = {
    val (xa, ya) = axes(g)
    val (m, xt, yt) = mapping(g.df.sparkSession, xa, ya, fx, fy)
    val taps = for (ky <- -1 to 2; kx <- -1 to 2) yield (ky, kx)
    // evaluate the kernel once per axis offset (8 columns) instead of
    // inlining the CASE tree into all 16 tap weights — keeps the
    // generated code small enough for fast whole-stage compilation
    val withK = (-1 to 2).foldLeft(
      m.withColumn("fx", col("gx") - floor(col("gx")))
       .withColumn("fy", col("gy") - floor(col("gy")))) { (d, k) =>
      d.withColumn(s"wx_$k", keysKernel(col("fx") - k))
       .withColumn(s"wy_$k", keysKernel(col("fy") - k))
    }
    val tapStructs = taps.map { case (ky, kx) =>
      struct(
        clampIdx((floor(col("gy")) + ky).cast("long"), ya.n).as("jy"),
        clampIdx((floor(col("gx")) + kx).cast("long"), xa.n).as("jx"),
        (col(s"wx_$kx") * col(s"wy_$ky")).as("w"))
    }
    val corners = withK.select(col("x2"), col("y2"),
        explode(array(tapStructs: _*)).as("c"))
      .select(col("x2"), col("y2"), col("c.jy").as("jy"),
        col("c.jx").as("jx"), col("c.w").as("w"))
      .filter(col("w") =!= 0.0)
      // clamped taps can coincide at edges: merge duplicate (cell, tap)
      .groupBy("y2", "x2", "jy", "jx").agg(sum("w").as("w"))
    val src = withIndexes(g, xa, ya)
    val vars = g.variables
    val aggs = vars.map(v => sum(col(v) * col("w")).as(v))
    val out = src
      .join(broadcast(corners), Seq("jy", "jx"))
      .groupBy(col(g.meta.timeDim), col("y2"), col("x2"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnsRenamed(Map("y2" -> g.meta.yDim, "x2" -> g.meta.xDim))
    g.copy(df = out, meta = g.meta.copy(xAxis = Some(xt), yAxis = Some(yt)))
  }

  private def axes(g: GridDataset): (AxisSpec, AxisSpec) = (
    g.meta.xAxis.getOrElse(throw new IllegalArgumentException(
      "spatial resample needs xAxis metadata")),
    g.meta.yAxis.getOrElse(throw new IllegalArgumentException(
      "spatial resample needs yAxis metadata")))

  /** Integer axis-index columns jy/jx, ALWAYS recomputed from the
    * current axis metadata (closed form from the uniform axis —
    * constant-folded arithmetic, no extra scan). Pre-existing jx/jy are
    * dropped first: after Crop.bbox rebases the axis origin, indices a
    * source (e.g. SyntheticGrid) attached against the global axis are
    * stale, and trusting them shifts every joined value.
    */
  private[operators] def withIndexes(g: GridDataset, xa: AxisSpec, ya: AxisSpec): DataFrame =
    g.df.drop("jx", "jy")
      .withColumn("jx", floor((g.x - lit(xa.origin)) / lit(xa.step) + 0.5).cast("long"))
      .withColumn("jy", floor((g.y - lit(ya.origin)) / lit(ya.step) + 0.5).cast("long"))
}
