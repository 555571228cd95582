package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{BBox, GridDataset}
import graft.operators.{Crop, PointExtract, SpatialResample, TemporalResample}
import graft.sources.SourceRegistry

/** Fluent user API mirroring the reference's flagship call shape
  * (SURVEY.md §3.1):
  *
  * {{{
  * val table = Engine(spark)
  *   .accessor("SyntheticEra5")
  *   .dataset("synthetic-era5-single-levels")
  *   .variables("t2m")
  *   .bbox(BBox(-83.5, 41.25, -79.0, 42.75))
  *   .timeRange("2019-01-30 00:00:00", "2019-02-02 00:00:00")
  *   .load()                                       // GridDataset
  *   .pointsToTable(points, "t2m")                 // wide time-series
  * }}}
  *
  * Everything is lazy until an action; the builder only accumulates the
  * request, and `load()` resolves it through the accessor registry into
  * a pruned scan.
  */
final case class Engine(spark: SparkSession,
    accessorName: String = "SyntheticEra5",
    datasetName: Option[String] = None,
    vars: Seq[String] = Seq.empty,
    aoi: Option[BBox] = None,
    range: Option[(String, String)] = None) {

  def accessor(name: String): Engine = copy(accessorName = name)
  def dataset(name: String): Engine = copy(datasetName = Some(name))
  def variables(vs: String*): Engine = copy(vars = vs)
  def bbox(b: BBox): Engine = copy(aoi = Some(b))
  def timeRange(start: String, end: String): Engine = copy(range = Some((start, end)))

  def load(): RichGrid = {
    val ds = datasetName.getOrElse(
      throw new IllegalArgumentException("dataset(...) is required"))
    RichGrid(SourceRegistry.get(accessorName)
      .load(spark, ds, vars, aoi, range))
  }
}

/** Operator sugar over GridDataset for the fluent path. */
final case class RichGrid(g: GridDataset) {
  def df: DataFrame = g.df
  def selectVariables(vs: String*): RichGrid = RichGrid(g.selectVariables(vs))
  def crop(b: BBox): RichGrid = RichGrid(Crop.bbox(g, b))
  def cropTime(start: String, end: String): RichGrid = RichGrid(Crop.time(g, start, end))
  def temporalResample(freq: String, method: String): RichGrid =
    RichGrid(TemporalResample.downsample(g, freq, method))
  def upsample(stepSeconds: Long, method: String): RichGrid =
    RichGrid(TemporalResample.upsample(g, stepSeconds, method))
  /** Every `rasterio.enums.Resampling` method, dispatched by its
    * rasterio name (reference: core_functions.py:292-299). Aggregating
    * kernels keep the original variable column names.
    */
  def spatialResample(fy: Double, fx: Double, method: String = "bilinear"): RichGrid =
    RichGrid(method match {
      case "nearest"      => SpatialResample.nearest(g, fy, fx)
      case "bilinear"     => SpatialResample.bilinear(g, fy, fx)
      case "cubic"        => SpatialResample.cubic(g, fy, fx)
      case "cubic_spline" => SpatialResample.cubicSpline(g, fy, fx)
      case "lanczos"      => SpatialResample.lanczos(g, fy, fx)
      case "gauss"        => SpatialResample.blockGauss(g, fy, fx)
      case "mode"         => SpatialResample.blockMode(g, fy, fx)
      case m @ ("average" | "sum" | "min" | "max" | "rms" | "med" | "q1" | "q3") =>
        val out = SpatialResample.blockAgg(g, fy, fx, Seq(m))
        out.copy(df = g.variables.foldLeft(out.df) { (d, v) =>
          d.withColumnRenamed(s"${m}_$v", v)
        })
      case other => throw new IllegalArgumentException(
        s"spatial resample method '$other' is not a rasterio.Resampling name")
    })
  def pointsToTable(points: Seq[(String, Double, Double)], variable: String): DataFrame =
    PointExtract.pointsToTable(g, points, variable)
}
