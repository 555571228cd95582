package graft

import graft.model.{AxisSpec, BBox}

class GridModelSpec extends SparkSpec {

  test("AxisSpec.nearestIndex matches NumPy argmin first-occurrence semantics") {
    val ax = AxisSpec(-83.5, 0.25, 19)
    assert(ax.nearestIndex(-83.5) == 0)
    assert(ax.nearestIndex(-100.0) == 0)  // clamps low
    assert(ax.nearestIndex(0.0) == 18)    // clamps high
    assert(ax.nearestIndex(-83.40) == 0)  // nearer to -83.5
    assert(ax.nearestIndex(-83.30) == 1)  // nearer to -83.25
    // exact midpoint -83.375: argmin takes the FIRST (lower) index
    assert(ax.nearestIndex(-83.375) == 0)
    assert(ax.nearestValue(-82.9) == -83.0)
  }

  test("BBox validates, unions, and expands degenerate boxes") {
    assertThrows[IllegalArgumentException](BBox(1.0, 0.0, 0.0, 1.0))
    val u = BBox(0, 0, 1, 1).union(BBox(-1, 0.5, 0.5, 2))
    assert(u == BBox(-1, 0, 1, 2))
    val p = BBox(5.0, 6.0, 5.0, 6.0).expandIfDegenerate()
    assert(p == BBox(4.95, 5.95, 5.05, 6.05))
    assert(BBox(0, 0, 2, 2).contains(1.0, 2.0))   // inclusive edges
    assert(!BBox(0, 0, 2, 2).contains(2.1, 1.0))
  }

  test("BBox.fromCoords takes (lat, lon) pairs and pads degenerate axes") {
    val b = BBox.fromCoords(Seq((41.0, -83.0), (42.0, -80.0)))
    assert(b == BBox(-83.0, 41.0, -80.0, 42.0))
  }

  test("GridDataset.selectVariables is lenient about missing variables") {
    val g = sources.SyntheticGrid.grid(spark)
    val sel = g.selectVariables(Seq("t2m", "nope"))
    assert(sel.variables == Seq("t2m"))
    assertThrows[IllegalArgumentException](g.selectVariables(Seq("nope")))
  }

  test("whereMask/clip/fillna: masking trio laws") {
    import org.apache.spark.sql.functions._
    val g = graft.sources.SyntheticGrid.grid(spark).selectVariables(Seq("t2m"))
    val n = g.df.count()
    // where keeps every row, nulls exactly the failing values
    val masked = g.whereMask(col("t2m") >= 50.0)
    assert(masked.df.count() == n)
    assert(masked.df.filter(col("t2m").isNull).count() ==
      g.df.filter(col("t2m") < 50.0).count())
    assert(masked.df.filter(col("t2m").isNotNull && col("t2m") < 50.0).count() == 0)
    // fillna restores row-completeness with the sentinel
    val filled = masked.fillna(0.0)
    assert(filled.df.filter(col("t2m").isNull).count() == 0)
    assert(filled.df.filter(col("t2m") === 0.0).count() ==
      g.df.filter(col("t2m") < 50.0).count())
    // clip: bounds respected, interior values untouched
    val clipped = g.clip(20.0, 80.0)
    assert(clipped.df.filter(col("t2m") < 20.0 || col("t2m") > 80.0).count() == 0)
    val interiorBefore = g.df.filter(col("t2m") >= 20.0 && col("t2m") <= 80.0).count()
    assert(clipped.df.join(g.df.withColumnRenamed("t2m", "orig"),
      Seq("time", "y", "x")).filter(col("t2m") === col("orig")).count() == interiorBefore)
    intercept[IllegalArgumentException](g.clip(5.0, 1.0))
  }

  test("shiftTime/diffTime/cumsumTime: hand folds per cell, row retention, guards") {
    import org.apache.spark.sql.functions._
    val g = sources.SyntheticGrid.grid(spark).selectVariables(Seq("t2m"))
    val n = g.df.count()
    val cell = g.df.filter(col("y") === 41.25 && col("x") === -83.5)
      .orderBy("time").select("t2m").collect().map(_.getDouble(0))
    def cellOf(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("y") === 41.25 && col("x") === -83.5)
        .orderBy("time").select("t2m").collect()
    // shift(2): first two NULL, then the series two steps back
    val sh = g.shiftTime(2)
    assert(sh.df.count() == n)
    val shc = cellOf(sh.df)
    assert(shc(0).isNullAt(0) && shc(1).isNullAt(0))
    for (i <- 2 until cell.length) assert(shc(i).getDouble(0) == cell(i - 2))
    // diff: first NULL, then consecutive differences
    val di = cellOf(g.diffTime().df)
    assert(di(0).isNullAt(0))
    for (i <- 1 until cell.length) assert(di(i).getDouble(0) == cell(i) - cell(i - 1))
    // cumsum: running prefix sums (exact rationals — == not approx)
    val cs = cellOf(g.cumsumTime.df)
    for (i <- cell.indices) assert(cs(i).getDouble(0) == cell.take(i + 1).sum)
    // diff(n=2) is the ITERATED (second-order) difference, xarray's
    // semantics — not the span difference v_t - v_{t-2}
    val d2 = cellOf(g.diffTime(2).df)
    assert(d2(0).isNullAt(0) && d2(1).isNullAt(0))
    for (i <- 2 until cell.length)
      assert(d2(i).getDouble(0) == (cell(i) - cell(i - 1)) - (cell(i - 1) - cell(i - 2)))
    intercept[IllegalArgumentException](g.shiftTime(0))
    intercept[IllegalArgumentException](g.diffTime(0))
  }
}
