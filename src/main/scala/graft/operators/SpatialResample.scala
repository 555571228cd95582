package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Cubic B-spline kernel B3 (rasterio/GDAL `cubic_spline`): the
    * smoothing (non-interpolating) 4-tap companion of Keys cubic, a
    * partition of unity so per-axis weights sum to 1 without
    * normalization.
    */
  private def bsplineKernel(d: org.apache.spark.sql.Column) = {
    val ad = abs(d)
    when(ad <= 1.0,
        (lit(4.0) - lit(6.0) * ad * ad + lit(3.0) * ad * ad * ad) / 6.0)
      .when(ad < 2.0,
        (lit(2.0) - ad) * (lit(2.0) - ad) * (lit(2.0) - ad) / 6.0)
      .otherwise(lit(0.0))
  }

  /** Bicubic regrid: 4x4 tap window per target cell (16-corner explode,
    * same join-aggregate shape as bilinear). Tap weights use the
    * unclamped tap distance; tap indices clamp at edges (replicate),
    * keeping the per-axis weight sum at 1 everywhere.
    */
  def cubic(g: GridDataset, fy: Double, fx: Double): GridDataset =
    tap4Regrid(g, fy, fx, keysKernel)

  /** GDAL `cubic_spline` regrid: the same 4x4 tap plan with B3 weights. */
  def cubicSpline(g: GridDataset, fy: Double, fx: Double): GridDataset =
    tap4Regrid(g, fy, fx, bsplineKernel)

  private def tap4Regrid(g: GridDataset, fy: Double, fx: Double,
      kernel: org.apache.spark.sql.Column => org.apache.spark.sql.Column): GridDataset = {
    val (xa, ya) = axes(g)
    val (m, xt, yt) = mapping(g.df.sparkSession, xa, ya, fx, fy)
    val taps = for (ky <- -1 to 2; kx <- -1 to 2) yield (ky, kx)
    // evaluate the kernel once per axis offset (8 columns) instead of
    // inlining the CASE tree into all 16 tap weights — keeps the
    // generated code small enough for fast whole-stage compilation
    val withK = (-1 to 2).foldLeft(
      m.withColumn("fx", col("gx") - floor(col("gx")))
       .withColumn("fy", col("gy") - floor(col("gy")))) { (d, k) =>
      d.withColumn(s"wx_$k", kernel(col("fx") - k))
       .withColumn(s"wy_$k", kernel(col("fy") - k))
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

  /** Lanczos-3 kernel: sinc(d)*sinc(d/3) = 3*sin(pi*d)*sin(pi*d/3)/(pi*d)^2
    * for |d| < 3 (rasterio/GDAL `lanczos`; the reference's test loops
    * over every `rasterio.enums.Resampling` method —
    * testing/test_3_era5_manipulations.py:83-99, dispatch
    * core_functions.py:292-299). Written exactly like this in the
    * DuckDB oracle so both engines evaluate the same expression tree.
    */
  private def lanczosKernel(d: org.apache.spark.sql.Column) = {
    val pi = lit(math.Pi)
    when(abs(d) < 1e-12, lit(1.0))
      .when(abs(d) < 3.0,
        lit(3.0) * sin(pi * d) * sin(pi * d / 3.0) / (pi * pi * d * d))
      .otherwise(lit(0.0))
  }

  /** Lanczos-3 regrid: 6x6 tap window per target cell, per-axis weight
    * normalization (GDAL normalizes the accumulated kernel weight; for a
    * separable kernel the 2D sum factors into the per-axis sums). Same
    * join-aggregate shape as cubic: the tap mapping is metadata-sized and
    * broadcast, the only shuffle is keyed by output cell.
    */
  def lanczos(g: GridDataset, fy: Double, fx: Double): GridDataset = {
    val (xa, ya) = axes(g)
    val (m, xt, yt) = mapping(g.df.sparkSession, xa, ya, fx, fy)
    val taps = for (ky <- -2 to 3; kx <- -2 to 3) yield (ky, kx)
    val withK = (-2 to 3).foldLeft(
      m.withColumn("fx", col("gx") - floor(col("gx")))
       .withColumn("fy", col("gy") - floor(col("gy")))) { (d, k) =>
      d.withColumn(s"wx_$k", lanczosKernel(col("fx") - k))
       .withColumn(s"wy_$k", lanczosKernel(col("fy") - k))
    }
      .withColumn("swx", (-2 to 3).map(k => col(s"wx_$k")).reduce(_ + _))
      .withColumn("swy", (-2 to 3).map(k => col(s"wy_$k")).reduce(_ + _))
    val tapStructs = taps.map { case (ky, kx) =>
      struct(
        clampIdx((floor(col("gy")) + ky).cast("long"), ya.n).as("jy"),
        clampIdx((floor(col("gx")) + kx).cast("long"), xa.n).as("jx"),
        (col(s"wx_$kx") / col("swx") * (col(s"wy_$ky") / col("swy"))).as("w"))
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

  /** Map a coordinate column onto the downsample target-cell index:
    * floor((coord - west_edge) / target_step), edge-clamped. The GDAL
    * block membership rule — a source pixel belongs to the target pixel
    * its center falls in.
    */
  private def blockIdx(coord: org.apache.spark.sql.Column, src: AxisSpec,
                       tgt: AxisSpec) = {
    val west = src.origin - src.step / 2.0
    clampIdx(floor((coord - lit(west)) / lit(tgt.step)).cast("long"), tgt.n)
  }

  /** Aggregating downsample — the reduction half of the
    * `rasterio.enums.Resampling` family (average, sum, min, max, rms,
    * med, q1, q3; reference dispatch core_functions.py:292-299). Each
    * target cell reduces the source cells whose centers fall inside it.
    *
    * No join: the target index is closed-form from the source coordinate,
    * so the plan is one partial-aggregated shuffle keyed by output cell —
    * the minimum possible data movement at 100 TB.
    */
  def blockAgg(g: GridDataset, fy: Double, fx: Double,
               methods: Seq[String]): GridDataset = {
    val (xa, ya) = axes(g)
    val xt = targetAxis(xa, fx); val yt = targetAxis(ya, fy)
    val vars = g.variables
    def aggFor(m: String, v: String) = (m match {
      case "average" => avg(col(v))
      case "sum"     => sum(col(v))
      case "min"     => min(col(v))
      case "max"     => max(col(v))
      // values are k/2^10 with k < 2^17: v*v and its sums stay exact in
      // IEEE754, and sqrt is correctly rounded — exact across engines
      case "rms"     => sqrt(avg(col(v) * col(v)))
      case "med"     => expr(s"percentile($v, 0.5)")
      case "q1"      => expr(s"percentile($v, 0.25)")
      case "q3"      => expr(s"percentile($v, 0.75)")
      case m         => throw new IllegalArgumentException(s"unknown block agg: $m")
    }).as(s"${m}_$v")
    val aggs = for (v <- vars; m <- methods) yield aggFor(m, v)
    val out = g.df
      .withColumn("jx2", blockIdx(g.x, xa, xt))
      .withColumn("jy2", blockIdx(g.y, ya, yt))
      .groupBy(col(g.meta.timeDim),
        (lit(yt.origin) + col("jy2") * lit(yt.step)).as(g.meta.yDim),
        (lit(xt.origin) + col("jx2") * lit(xt.step)).as(g.meta.xDim))
      .agg(aggs.head, aggs.tail: _*)
    g.copy(df = out, meta = g.meta.copy(xAxis = Some(xt), yAxis = Some(yt)))
  }

  /** Mode downsample (rasterio `mode`): most frequent value per target
    * block, ties broken deterministically by the smallest value (GDAL
    * leaves tie order unspecified; a documented total order makes the
    * operator reproducible and oracle-able). Two shuffles, both keyed by
    * output cell (+ value), both partial-aggregated.
    */
  def blockMode(g: GridDataset, fy: Double, fx: Double): GridDataset = {
    val (xa, ya) = axes(g)
    val xt = targetAxis(xa, fx); val yt = targetAxis(ya, fy)
    val vars = g.variables
    require(vars.size == 1, "blockMode reduces one variable at a time")
    val v = vars.head
    val counted = g.df
      .withColumn("jx2", blockIdx(g.x, xa, xt))
      .withColumn("jy2", blockIdx(g.y, ya, yt))
      .groupBy(col(g.meta.timeDim).as("t2"), col("jy2"), col("jx2"), col(v))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("t2", "jy2", "jx2")
      .orderBy(col("cnt").desc, col(v).asc)
    val out = counted
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("t2").as(g.meta.timeDim),
        (lit(yt.origin) + col("jy2") * lit(yt.step)).as(g.meta.yDim),
        (lit(xt.origin) + col("jx2") * lit(xt.step)).as(g.meta.xDim),
        col(v))
    g.copy(df = out, meta = g.meta.copy(xAxis = Some(xt), yAxis = Some(yt)))
  }

  /** Gaussian-weighted downsample (rasterio `gauss`): block membership as
    * in blockAgg, weights exp(-(dx^2+dy^2)/(2*sigma^2)) by the distance
    * (in source-pixel units) from the source center to the target center,
    * normalized per target cell; sigma = ratio/2 per axis. Still joinless:
    * weight is closed-form per source row, one shuffle keyed by output cell.
    */
  def blockGauss(g: GridDataset, fy: Double, fx: Double): GridDataset = {
    val (xa, ya) = axes(g)
    val xt = targetAxis(xa, fx); val yt = targetAxis(ya, fy)
    val vars = g.variables
    val sx2 = { val s = (1.0 / fx) / 2.0; 2.0 * s * s }
    val sy2 = { val s = (1.0 / fy) / 2.0; 2.0 * s * s }
    val base = g.df
      .withColumn("jx2", blockIdx(g.x, xa, xt))
      .withColumn("jy2", blockIdx(g.y, ya, yt))
      // distances in source-pixel units between source and target centers
      .withColumn("dx", (g.x - (lit(xt.origin) + col("jx2") * lit(xt.step))) / lit(xa.step))
      .withColumn("dy", (g.y - (lit(yt.origin) + col("jy2") * lit(yt.step))) / lit(ya.step))
      .withColumn("w", exp(-(col("dx") * col("dx") / lit(sx2) +
                             col("dy") * col("dy") / lit(sy2))))
    val aggs = vars.map(v => (sum(col(v) * col("w")) / sum(col("w"))).as(v))
    val out = base
      .groupBy(col(g.meta.timeDim),
        (lit(yt.origin) + col("jy2") * lit(yt.step)).as(g.meta.yDim),
        (lit(xt.origin) + col("jx2") * lit(xt.step)).as(g.meta.xDim))
      .agg(aggs.head, aggs.tail: _*)
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

  /** Latitude-weighted spatial mean per timestep — the xarray
    * `ds.weighted(np.cos(np.deg2rad(ds.lat))).mean(("y","x"))` surface:
    * on a regular lat/lon grid, cell area shrinks with cos(lat), so an
    * unweighted spatial mean over-counts high latitudes (the classic
    * climate-statistics bug). One map-side-combinable aggregation per
    * timestep; the weight is a per-row column expression, never a
    * separate relation.
    */
  def weightedSpatialMean(g: GridDataset): DataFrame = {
    val w = cos(radians(g.y))
    val aggs = g.variables.flatMap { v =>
      Seq(round(sum(col(v) * w) / sum(w), 6).as(s"wmean_$v"),
          round(avg(col(v)), 6).as(s"mean_$v"))
    }
    g.df.groupBy(g.time.as(g.meta.timeDim)).agg(aggs.head, aggs.tail: _*)
  }

  /** Spatial gradient per timestep — the spatial analog of xarray
    * `ds.differentiate("x")` / `("y")`: central differences at
    * interior cells, one-sided at the grid edges, in value-units per
    * coordinate-unit (degrees here, matching the time derivative's
    * value-per-second convention), plus the gradient magnitude
    * `sqrt(ddx² + ddy²)` (one correctly-rounded IEEE sqrt —
    * deterministic). Two windows — x-ordered within (time, y) and
    * y-ordered within (time, x) — the same two partitionings as
    * [[focalMean]]; no join.
    */
  def spatialGradient(g: GridDataset, variable: String): DataFrame = {
    val wx = Window.partitionBy(g.time, g.y).orderBy(g.x)
    val wy = Window.partitionBy(g.time, g.x).orderBy(g.y)
    def deriv(v: Column, c: Column, w: org.apache.spark.sql.expressions.WindowSpec) = {
      val (vp, vn) = (lag(v, 1).over(w), lead(v, 1).over(w))
      val (cp, cn) = (lag(c, 1).over(w), lead(c, 1).over(w))
      when(cp.isNull && cn.isNull, lit(null))
        .when(cp.isNull, (vn - v) / (cn - c))
        .when(cn.isNull, (v - vp) / (c - cp))
        .otherwise((vn - vp) / (cn - cp))
    }
    g.df.select(g.time.as(g.meta.timeDim), g.y.as(g.meta.yDim),
        g.x.as(g.meta.xDim),
        deriv(col(variable), g.x, wx).as("ddx"),
        deriv(col(variable), g.y, wy).as("ddy"))
      .withColumn("grad_mag",
        sqrt(col("ddx") * col("ddx") + col("ddy") * col("ddy")))
  }

  /** Focal (neighborhood) mean per timestep — raster "focal statistics"
    * / the 2-D centered rolling mean (xarray
    * `ds.rolling(y=2r+1, x=2r+1, center=True, min_periods=1).mean()`):
    * each cell becomes the mean of the values in the (2r+1)^2 box
    * around it, edge boxes shrinking to the cells that exist.
    *
    * Computed SEPARABLY: the box SUM is a sum over x-neighbors of sums
    * over y-neighbors (and likewise the box COUNT), so two 1-D RANGE
    * windows replace the O(r^2) neighbor self-join — per-row cost O(1)
    * via sliding frames, two cell-key shuffles total, no join anywhere.
    * Tracking sum and count separately (not mean-of-means) keeps edge
    * boxes exact. Frames never cross the (time, row)-partition, so at
    * scale each executor slides over its own rows.
    */
  def focalMean(g: GridDataset, radius: Int): GridDataset = {
    require(radius >= 1, s"focal radius must be >= 1, got $radius")
    val (xa, ya) = axes(g)
    val d0 = withIndexes(g, xa, ya)
    val wx = Window.partitionBy(g.time, col("jy")).orderBy(col("jx"))
      .rangeBetween(-radius, radius)
    val pass1 = g.variables.foldLeft(d0) { (d, v) =>
      d.withColumn(s"_sx_$v", sum(col(v)).over(wx))
        .withColumn(s"_cx_$v", count(col(v)).over(wx))
    }
    val wy = Window.partitionBy(g.time, col("jx")).orderBy(col("jy"))
      .rangeBetween(-radius, radius)
    val out = g.variables.foldLeft(pass1) { (d, v) =>
      d.withColumn(v,
        sum(col(s"_sx_$v")).over(wy) / sum(col(s"_cx_$v")).over(wy))
    }
    g.copy(df = out.select(
      (Seq(g.meta.timeDim, g.meta.yDim, g.meta.xDim) ++ g.variables)
        .map(col): _*))
  }
}
