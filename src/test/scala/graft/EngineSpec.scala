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

  test("Bench.suspectQueries: pair divergence x probe drift on the r9 driver data shape") {
    // fixture modeled on BENCH_r09's contaminated driver sweep: probes
    // every 16 positions in two families (pos = compute, io = parquet
    // scan), a sick stretch where io drifts to 7.21 s against a 0.15 s
    // family median (the real r9 io256 value) with wildly divergent
    // run pairs beside it, and clean queries everywhere else
    val calib = Seq(
      "pos0" -> 0.50, "io0" -> 0.15,
      "pos16" -> 0.55, "io16" -> 0.14,
      "pos32" -> 0.52, "io32" -> 7.21, // drifted: 7.21 > 3 x 0.15
      "pos48" -> 6.49, "io48" -> 0.16, // drifted: 6.49 > 3 x 0.52
      "pos64" -> 0.51, "io64" -> -1.0) // failed probe: excluded, not drift
    def flat(i: Int) = s"q$i" -> (0.5, 0.55)
    val runPairs: Seq[(String, (Double, Double))] =
      (0 until 20).map(flat) ++
      Seq("n34_line_dedup" -> (37.0, 64.0)) ++   // idx 20, next probe io32 sick
      (21 until 33).map(flat) ++
      Seq("n68_perplexity" -> (6.0, 42.0)) ++    // idx 33, prev io32 + next pos48
      (34 until 40).map(flat) ++
      Seq("n38_rag_chunks" -> (17.0, 45.0)) ++   // idx 40: both neighbors (32, 48) sick
      (41 until 50).map(flat) ++
      Seq("n99_divergent_near_sick" -> (1.0, 11.0)) ++ // idx 50: prev 48 sick
      (51 until 64).map(flat)
    val flagged = graft.Bench.suspectQueries(runPairs, calib)
    assert(flagged.contains("n34_line_dedup"))
    assert(flagged.contains("n68_perplexity"))
    assert(flagged.contains("n38_rag_chunks"))
    // queries with flat pairs never flag, even beside a sick probe
    assert(!flagged.exists(_.startsWith("q")),
      s"flat run pairs must never flag, got $flagged")
    // negative control: the SAME divergent pairs against a flat
    // calibration profile flag nothing — divergence alone is not
    // contamination evidence (a first-run JIT pair like n06's 1.6/0.2
    // is normal; min-of-two absorbs it)
    val flatCalib = calib.map { case (k, v) =>
      k -> (if (v > 1.0) (if (k.startsWith("io")) 0.15 else 0.52) else v) }
    assert(graft.Bench.suspectQueries(runPairs, flatCalib).isEmpty)
    // -1 failed probes neither drift nor poison the family median:
    // with ONLY failed io probes, io evidence vanishes entirely
    val failedIo = calib.map { case (k, v) =>
      if (k.startsWith("io")) k -> -1.0 else k -> v }
    val f2 = graft.Bench.suspectQueries(runPairs, failedIo)
    // pos48 still drifts, so queries bracketed by it still flag
    assert(f2.contains("n68_perplexity") && f2.contains("n38_rag_chunks") &&
      f2.contains("n99_divergent_near_sick"))
    assert(!f2.contains("n34_line_dedup"),
      "io32 was n34's only sick neighbor; with io probes failed it must unflag")
  }
}
