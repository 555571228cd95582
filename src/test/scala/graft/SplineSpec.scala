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
