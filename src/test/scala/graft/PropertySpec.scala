package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.model.{AxisSpec, BBox}
import graft.operators.{Crop, TemporalResample}
import graft.sources.SyntheticGrid

/** Property tests the reference lacks (SURVEY.md §5): laws that hold for
  * every parameter choice, checked over generated inputs.
  */
class PropertySpec extends SparkSpec {

  private def passes(p: Prop): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p).passed

  test("axis snapping law: nearestValue is idempotent and within step/2 of any in-range point") {
    val ax = AxisSpec(-83.5, 0.25, 19)
    val inRange = Gen.choose(ax.origin, ax.last)
    assert(passes(Prop.forAll(inRange) { v =>
      val s = ax.nearestValue(v)
      ax.nearestValue(s) == s && math.abs(s - v) <= ax.step / 2 + 1e-12
    }))
    // out-of-range points clamp to the axis ends
    assert(passes(Prop.forAll(Gen.choose(-200.0, 200.0)) { v =>
      val s = ax.nearestValue(v)
      s >= ax.origin && s <= ax.last
    }))
  }

  test("upsample row-count law: steps = floor(span/step) + 1 per cell") {
    val g = SyntheticGrid.grid(spark).selectVariables(Seq("t2m"))
    val one = g.copy(df = g.df.filter(col("x") === -83.5 && col("y") === 41.25))
    val spanSeconds = 72L * 3600
    Seq(900L, 1800L, 3600L, 7200L, 10800L).foreach { step =>
      val n = TemporalResample.upsample(one, step, "linear").df.count()
      assert(n == spanSeconds / step + 1, s"step=$step gave $n")
    }
  }

  test("crop containment law: every surviving cell is within snapped bounds") {
    val lons = Gen.choose(-84.0, -79.0)
    val lats = Gen.choose(41.0, 43.0)
    val boxes = for {
      a <- lons; b <- lons; c <- lats; d <- lats
    } yield BBox(math.min(a, b), math.min(c, d), math.max(a, b), math.max(c, d))
    val g = SyntheticGrid.grid(spark).selectVariables(Seq("t2m"))
    val xa = SyntheticGrid.meta.xAxis.get; val ya = SyntheticGrid.meta.yAxis.get
    assert(passes(Prop.forAll(boxes) { b =>
      val box = b.expandIfDegenerate()
      val (xLo, xHi) = (xa.nearestValue(box.west), xa.nearestValue(box.east))
      val (yLo, yHi) = (ya.nearestValue(box.south), ya.nearestValue(box.north))
      val c = Crop.bbox(g, b)
      val outside = c.df.filter(
        col("x") < math.min(xLo, xHi) || col("x") > math.max(xLo, xHi) ||
        col("y") < math.min(yLo, yHi) || col("y") > math.max(yLo, yHi)).count()
      val expected = (math.abs(xa.nearestIndex(box.east) - xa.nearestIndex(box.west)) + 1).toLong *
        (math.abs(ya.nearestIndex(box.north) - ya.nearestIndex(box.south)) + 1) * 73
      outside == 0 && c.df.count() == expected
    }))
  }

  test("downsample conservation law: sum is preserved for any bucket width") {
    val g = SyntheticGrid.grid(spark).selectVariables(Seq("t2m"))
    val total = g.df.agg(sum("t2m")).collect()(0).getDouble(0)
    Seq("2 hours", "7 hours", "1 day", "3 days").foreach { freq =>
      val s = TemporalResample.downsample(g, freq, "sum")
        .df.agg(sum("t2m")).collect()(0).getDouble(0)
      assert(math.abs(s - total) < 1e-6, s"freq=$freq")
    }
  }

  test("image header law: build->parse round-trips for all dims; tails never disturb") {
    import graft.ops.Multimodal
    val dims = Gen.choose(1, 1 << 20) // PNG/BMP take the full i32-positive range
    val gifDims = Gen.choose(1, 65535)
    val tail = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    assert(passes(Prop.forAll(dims, dims, tail) { (w, h, t) =>
      Multimodal.headerDims(Multimodal.pngHeader(w, h) ++ t) == Some((w, h)) &&
      Multimodal.headerDims(Multimodal.bmpHeader(w, h) ++ t) == Some((w, h))
    }))
    assert(passes(Prop.forAll(gifDims, gifDims, tail) { (w, h, t) =>
      Multimodal.headerDims(Multimodal.gifHeader(w, h) ++ t) == Some((w, h))
    }))
    // a payload that is not one of the three formats never parses: any
    // prefix shorter than the shortest magic, or a corrupted magic byte
    assert(passes(Prop.forAll(dims, dims, Gen.choose(0, 9)) { (w, h, cut) =>
      Multimodal.headerDims(Multimodal.pngHeader(w, h).take(cut)).isEmpty
    }))
  }
}
