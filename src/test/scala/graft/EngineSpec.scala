package graft

import graft.model.BBox

class EngineSpec extends SparkSpec {

  test("fluent pipeline reproduces the reference flagship: 73 x 3 table") {
    val pts = Seq(("p0", -82.98, 41.63), ("p1", -79.43, 42.88), ("p2", -83.23, 41.85))
    val table = Engine(spark)
      .accessor("SyntheticEra5")
      .dataset("synthetic-era5-single-levels")
      .variables("t2m")
      .bbox(BBox(-83.5, 41.25, -79.0, 42.75))
      .timeRange("2019-01-30 00:00:00", "2019-02-02 00:00:00")
      .load()
      .pointsToTable(pts, "t2m")
    assert(table.columns.toSeq == Seq("time", "p0", "p1", "p2"))
    assert(table.count() == 73)
  }

  test("fluent transforms compose: crop -> resample -> upsample") {
    val g = Engine(spark).dataset("synthetic-era5-single-levels")
      .variables("t2m").load()
      .crop(BBox(-83.5, 41.25, -83.25, 41.5))
      .temporalResample("6 hours", "mean")
      .upsample(3600 * 3, "linear")
    // 73 hourly -> 13 six-hour buckets -> 3-hourly spans 72h +1 = 25 steps
    assert(g.df.select("time").distinct().count() == 25)
    assert(Engine(spark).dataset("synthetic-era5-single-levels")
      .variables("t2m").load()
      .spatialResample(2.0, 2.0, "nearest").df
      .select("x").distinct().count() == 38)
    assertThrows[IllegalArgumentException](Engine(spark).load())
  }

  test("spatialResample dispatches every rasterio.Resampling name") {
    def base = Engine(spark).dataset("synthetic-era5-single-levels")
      .variables("t2m").load()
    val up = Seq("nearest", "bilinear", "cubic", "cubic_spline", "lanczos")
    for (m <- up) {
      val out = base.spatialResample(2.0, 2.0, m)
      assert(out.df.columns.contains("t2m"), m)
      assert(out.df.count() == 73L * 38 * 14, m)
    }
    val down = Seq("average", "sum", "min", "max", "rms", "med", "q1", "q3",
      "mode", "gauss")
    for (m <- down) {
      val out = base.spatialResample(0.5, 0.5, m)
      assert(out.df.columns.contains("t2m"), m)
      assert(out.df.count() == 73L * 9 * 3, m)
    }
    assertThrows[IllegalArgumentException](base.spatialResample(2.0, 2.0, "q2"))
  }

  test("docs/OPERATORS.md is current (regenerate with runMain graft.OperatorIndex)") {
    // the generated operator index must track SparkEntry exactly —
    // a drifted file means a query was added/renamed without rerunning
    // the generator (the CI-check half of the VERDICT r7 ask)
    val onDisk = java.nio.file.Files.readString(OperatorIndex.docsPath)
    assert(onDisk == OperatorIndex.generate(),
      "docs/OPERATORS.md drifted from SparkEntry — run " +
        "`sbt \"runMain graft.OperatorIndex\"` and commit the result")
  }
}
