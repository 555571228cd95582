package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialResample
import graft.sources.SyntheticGrid

class SpatialResampleSpec extends SparkSpec {

  private def grid = SyntheticGrid.grid(spark).selectVariables(Seq("t2m"))

  test("factor 2 regrid: 19x7 -> 38x14 output shape (X1, reference test)") {
    val r = SpatialResample.nearest(grid, fy = 2.0, fx = 2.0)
    assert(r.meta.xAxis.get.n == 38 && r.meta.yAxis.get.n == 14)
    assert(r.df.select("x").distinct().count() == 38)
    assert(r.df.select("y").distinct().count() == 14)
    assert(r.df.count() == 73L * 38 * 14)
  }

  test("asymmetric factors (1, 3): 19x7 -> 57x7 (x-major factor)") {
    val r = SpatialResample.bilinear(grid, fy = 1.0, fx = 3.0)
    assert(r.meta.xAxis.get.n == 57 && r.meta.yAxis.get.n == 7)
    assert(r.df.count() == 73L * 57 * 7)
  }

  test("bilinear on a constant field stays constant; nearest preserves values") {
    val const = grid.copy(df = grid.df.withColumn("t2m", lit(5.0)))
    val b = SpatialResample.bilinear(const, 2.0, 2.0)
    val mm = b.df.agg(min("t2m"), max("t2m")).collect()(0)
    assert(mm.getDouble(0) == 5.0 && mm.getDouble(1) == 5.0)
    val n = SpatialResample.nearest(grid, 2.0, 2.0)
    // every nearest-resampled value exists in the source value set
    val src = grid.df.select("t2m").distinct()
    assert(n.df.select("t2m").distinct().except(src).count() == 0)
  }

  test("cubic (Keys) regrid: constant stays constant, linear ramp exact in interior") {
    val const = grid.copy(df = grid.df.withColumn("t2m", lit(5.0)))
    val c = SpatialResample.cubic(const, 2.0, 2.0)
    val mm = c.df.agg(min("t2m"), max("t2m")).collect()(0)
    assert(math.abs(mm.getDouble(0) - 5.0) < 1e-9 && math.abs(mm.getDouble(1) - 5.0) < 1e-9)
    assert(c.df.count() == 73L * 38 * 14)
    val lin = grid.copy(df = grid.df.withColumn("t2m", col("x")))
    val b = SpatialResample.cubic(lin, 1.0, 2.0)
    val bad = b.df.filter(
      col("x") > -83.0 && col("x") < -79.5 && // >= 2 cells from the edges
      abs(col("t2m") - col("x")) > lit(1e-9)).count()
    assert(bad == 0)
  }

  test("crop-then-resample ignores stale global jx/jy carried by the source") {
    // SyntheticGrid.grid keeps global jx/jy; Crop.bbox rebases the axis
    // origin, so those indices are stale relative to the cropped axes.
    // withIndexes must recompute, giving the same answer as a grid that
    // never carried index columns.
    import graft.model.BBox
    val box = BBox(west = -82.5, east = -80.5, south = 41.75, north = 42.75)
    val cropped = operators.Crop.bbox(SyntheticGrid.grid(spark), box)
    val stale = cropped.copy(df = cropped.df.select("time", "y", "x", "jy", "jx", "t2m"))
    val clean = cropped.copy(df = cropped.df.select("time", "y", "x", "t2m"))
    val a = SpatialResample.nearest(stale, 2.0, 2.0).df.select("time", "y", "x", "t2m")
    val b = SpatialResample.nearest(clean, 2.0, 2.0).df.select("time", "y", "x", "t2m")
    assert(b.count() == 73L * 18 * 10)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("cubic_spline (B3) regrid: partition of unity preserves constants; smooths") {
    val const = grid.copy(df = grid.df.withColumn("t2m", lit(2.25)))
    val c = SpatialResample.cubicSpline(const, 2.0, 2.0)
    val mm = c.df.agg(min("t2m"), max("t2m")).collect()(0)
    assert(math.abs(mm.getDouble(0) - 2.25) < 1e-9 && math.abs(mm.getDouble(1) - 2.25) < 1e-9)
    assert(c.df.count() == 73L * 38 * 14)
    // B3 weights are nonnegative -> output bounded by the source range
    // (unlike Keys cubic, which can overshoot)
    val src = grid.df.agg(min("t2m"), max("t2m")).collect()(0)
    val out = SpatialResample.cubicSpline(grid, 2.0, 2.0).df
      .agg(min("t2m"), max("t2m")).collect()(0)
    assert(out.getDouble(0) >= src.getDouble(0) - 1e-9)
    assert(out.getDouble(1) <= src.getDouble(1) + 1e-9)
  }

  test("lanczos regrid: constant stays constant (normalized weights), shape law") {
    val const = grid.copy(df = grid.df.withColumn("t2m", lit(5.0)))
    val l = SpatialResample.lanczos(const, 2.0, 2.0)
    val mm = l.df.agg(min("t2m"), max("t2m")).collect()(0)
    assert(math.abs(mm.getDouble(0) - 5.0) < 1e-9 && math.abs(mm.getDouble(1) - 5.0) < 1e-9)
    assert(l.df.count() == 73L * 38 * 14)
    // normalized kernel with small negative lobes: output stays within a
    // loose envelope of the source range
    val src = grid.df.agg(min("t2m"), max("t2m")).collect()(0)
    val out = SpatialResample.lanczos(grid, 2.0, 2.0).df
      .agg(min("t2m"), max("t2m")).collect()(0)
    val range = src.getDouble(1) - src.getDouble(0)
    assert(out.getDouble(0) > src.getDouble(0) - 0.5 * range)
    assert(out.getDouble(1) < src.getDouble(1) + 0.5 * range)
  }

  test("block downsample: shape, conservation, and per-block reductions agree") {
    val r = SpatialResample.blockAgg(grid, 0.5, 0.5,
      Seq("average", "sum", "min", "max", "rms", "med", "q1", "q3"))
    assert(r.meta.xAxis.get.n == 9 && r.meta.yAxis.get.n == 3)
    assert(r.df.count() == 73L * 9 * 3)
    // sum is conservative: block sums add up to the global sum
    val blockTotal = r.df.agg(sum("sum_t2m")).collect()(0).getDouble(0)
    val srcTotal = grid.df.agg(sum("t2m")).collect()(0).getDouble(0)
    assert(math.abs(blockTotal - srcTotal) < 1e-6)
    // per-block invariants: min <= q1 <= med <= q3 <= max, min <= avg <= max
    val bad = r.df.filter(
      col("min_t2m") > col("q1_t2m") || col("q1_t2m") > col("med_t2m") ||
      col("med_t2m") > col("q3_t2m") || col("q3_t2m") > col("max_t2m") ||
      col("average_t2m") < col("min_t2m") || col("average_t2m") > col("max_t2m") ||
      col("rms_t2m") < col("average_t2m") - lit(1e-9)).count() // RMS >= mean for v >= 0
    assert(bad == 0)
  }

  test("block mode: constant field -> the constant; ties break to smallest value") {
    val const = grid.copy(df = grid.df.withColumn("t2m", lit(7.0)))
    val m = SpatialResample.blockMode(const, 0.5, 0.5)
    assert(m.df.filter(col("t2m") =!= 7.0).count() == 0)
    // all-distinct values in a block -> every count ties at 1 -> smallest wins
    val distinct = grid.copy(df = grid.df.withColumn("t2m", col("t2m")))
    val md = SpatialResample.blockMode(distinct, 0.5, 0.5).df
      .withColumnRenamed("t2m", "mode_t2m")
    val mn = SpatialResample.blockAgg(grid, 0.5, 0.5, Seq("min")).df
    val joined = md.join(mn, Seq("time", "y", "x"))
    // synthetic t2m values are effectively all-distinct per block
    assert(joined.filter(col("mode_t2m") =!= col("min_t2m")).count() == 0)
  }

  test("gaussian block downsample: constant stays constant, stays in block range") {
    val const = grid.copy(df = grid.df.withColumn("t2m", lit(3.5)))
    val gk = SpatialResample.blockGauss(const, 0.5, 0.5)
    val mm = gk.df.agg(min("t2m"), max("t2m")).collect()(0)
    assert(math.abs(mm.getDouble(0) - 3.5) < 1e-12 && math.abs(mm.getDouble(1) - 3.5) < 1e-12)
    // convex weights: result bounded by per-block min/max
    val gw = SpatialResample.blockGauss(grid, 0.5, 0.5).df
      .withColumnRenamed("t2m", "gauss_t2m")
    val mn = SpatialResample.blockAgg(grid, 0.5, 0.5, Seq("min", "max")).df
    val bad = gw.join(mn, Seq("time", "y", "x"))
      .filter(col("gauss_t2m") < col("min_t2m") - lit(1e-9) ||
              col("gauss_t2m") > col("max_t2m") + lit(1e-9)).count()
    assert(bad == 0)
  }

  test("block downsample is partition-invariant (same result after repartition)") {
    val a = SpatialResample.blockAgg(grid, 0.5, 0.5, Seq("average", "med")).df
    val shuffled = grid.copy(df = grid.df.repartition(13))
    val b = SpatialResample.blockAgg(shuffled, 0.5, 0.5, Seq("average", "med")).df
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("bilinear interpolates linearly between cell centers") {
    // linear-in-x field: t2m = x  ->  any bilinear resample must reproduce x
    val lin = grid.copy(df = grid.df.withColumn("t2m", col("x")))
    val b = SpatialResample.bilinear(lin, 1.0, 2.0)
    val bad = b.df.filter(
      // interior cells only (edge-clamped border replicates)
      col("x") > -83.5 && col("x") < -79.0 &&
      abs(col("t2m") - col("x")) > lit(1e-9)).count()
    assert(bad == 0)
  }
}
