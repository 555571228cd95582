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
}
