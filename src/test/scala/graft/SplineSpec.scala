package graft

import org.apache.spark.sql.functions._

import graft.functions.Spline
import graft.model.BBox
import graft.operators.{Crop, TemporalResample}
import graft.sources.SyntheticGrid

class SplineSpec extends SparkSpec {

  test("not-a-knot spline reproduces a global cubic polynomial exactly") {
    def f(x: Double) = 2.0 * x * x * x - 3.0 * x * x + x - 5.0
    val ts = Array(0.0, 1.0, 2.5, 3.0, 4.5, 6.0)
    val ys = ts.map(f)
    val qs = Array(0.25, 0.9, 1.7, 2.9, 3.1, 5.5)
    val out = Spline.cubic(ts, ys, qs)
    qs.zip(out).foreach { case (q, v) =>
      assert(math.abs(v - f(q)) < 1e-9, s"at $q: $v vs ${f(q)}")
    }
  }

  test("spline passes through every knot; small-n fallbacks are exact") {
    val ts = Array(0.0, 1.0, 3.0, 4.0, 7.0)
    val ys = Array(1.0, -2.0, 0.5, 4.0, 3.0)
    val out = Spline.cubic(ts, ys, ts)
    ts.indices.foreach(i => assert(math.abs(out(i) - ys(i)) < 1e-10))
    // n=2 -> linear, n=3 -> parabola
    assert(Spline.cubic(Array(0.0, 2.0), Array(1.0, 5.0), Array(1.0))(0) == 3.0)
    val p3 = Spline.cubic(Array(0.0, 1.0, 2.0), Array(0.0, 1.0, 4.0), Array(1.5))(0)
    assert(math.abs(p3 - 2.25) < 1e-12) // through x^2
  }

  test("quadratic spline reproduces a global degree-2 polynomial exactly") {
    def f(x: Double) = 1.5 * x * x - 2.0 * x + 3.0
    val ts = Array(0.0, 1.0, 2.5, 3.0, 4.5, 6.0, 7.25) // non-uniform
    val ys = ts.map(f)
    val qs = Array(0.25, 0.9, 1.7, 2.9, 3.1, 5.5, 7.0)
    val out = Spline.quadratic(ts, ys, qs)
    qs.zip(out).foreach { case (q, v) =>
      assert(math.abs(v - f(q)) < 1e-9, s"at $q: $v vs ${f(q)}")
    }
  }

  test("quadratic spline interpolates every knot; differs from cubic on cubic data") {
    val ts = Array(0.0, 1.0, 3.0, 4.0, 7.0, 9.0)
    val ys = Array(1.0, -2.0, 0.5, 4.0, 3.0, -1.0)
    val out = Spline.quadratic(ts, ys, ts)
    ts.indices.foreach(i => assert(math.abs(out(i) - ys(i)) < 1e-9))
    // small-n fallbacks
    assert(Spline.quadratic(Array(5.0), Array(2.0), Array(5.0))(0) == 2.0)
    assert(Spline.quadratic(Array(0.0, 2.0), Array(1.0, 5.0), Array(1.0))(0) == 3.0)
    val p3 = Spline.quadratic(Array(0.0, 1.0, 2.0), Array(0.0, 1.0, 4.0), Array(1.5))(0)
    assert(math.abs(p3 - 2.25) < 1e-12)
    // a true order-2 solve is NOT the cubic spline: on data from a cubic
    // polynomial the two must disagree off-knot (the old code routed
    // quadratic to the cubic solver, which this catches)
    def c(x: Double) = x * x * x
    val cts = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
    // off-midpoint: at uniform midpoints the two coincide by symmetry
    val at = Array(2.25)
    val dq = Spline.quadratic(cts, cts.map(c), at)(0)
    val dc = Spline.cubic(cts, cts.map(c), at)(0)
    assert(math.abs(dq - dc) > 1e-6, s"quadratic ($dq) must differ from cubic ($dc)")
    // C1 continuity at every interior knot (the midpoints): one-sided
    // difference quotients straddling the knot agree to O(eps)
    val mids = (1 until cts.length - 2).map(i => 0.5 * (cts(i) + cts(i + 1)))
    val eps = 1e-7
    mids.foreach { m =>
      val Array(l2, l1, r1, r2) =
        Spline.quadratic(cts, cts.map(c), Array(m - 2 * eps, m - eps, m + eps, m + 2 * eps))
      val dl = (l1 - l2) / eps; val dr = (r2 - r1) / eps
      assert(math.abs(dl - dr) < 1e-4, s"C1 break at $m: $dl vs $dr")
    }
  }

  test("distributed cubic upsample: row-count law and knot fidelity (W3)") {
    val g = Crop.bbox(SyntheticGrid.grid(spark).selectVariables(Seq("t2m", "u100")),
      BBox(-83.5, 41.25, -83.25, 41.5))
    val up = TemporalResample.upsample(g, 1800, "cubic")
    assert(up.df.count() == 4L * 145) // 4 cells x ((73-1)*2+1) half-hours
    assert(up.df.columns.toSeq == Seq("time", "y", "x", "t2m", "u100"))
    // knot timestamps keep their original values, for every variable
    val joined = up.df.join(g.df
        .withColumnsRenamed(Map("t2m" -> "o1", "u100" -> "o2")),
      Seq("time", "y", "x"))
    val mismatch = joined.filter(
      abs(col("t2m") - col("o1")) > 1e-9 || abs(col("u100") - col("o2")) > 1e-9).count()
    assert(mismatch == 0)
  }
}
