package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine
import graft.model.{BBox, GridDataset}
import graft.operators.Gssha
import graft.sources.SourceRegistry

/** End-to-end GSSHA preparation demo — the engine's twin of the
  * reference's `examples/gssha_demo.ipynb`, cell for cell:
  *
  *   cells 4–6   list accessors / datasets / variables
  *   cells 10–12 watershed AOI from a shapefile (WGS84 bounds)
  *   cell 15     fetch the precipitation grid for the AOI + window
  *   cell 18     unit conversion (m → mm)
  *   cell 19     `make_gssha_precipitation_input` → gage file
  *   cells 25–38 fetch HMET variables + unit calculus (°F, kts)
  *   cells 42–43 `make_gssha_hmet_wes` → WES file
  *   cell 45     `make_gssha_grass_ascii` → per-timestep .asc files
  *   (plus the reference's signature points→wide table, as CSV)
  *
  * The notebook's CDS/AWS HTTP fetch is replaced by the offline
  * SyntheticEra5 adapter (BASELINE.md sanctions the lake-read seam;
  * the request-planning halves are oracled by g28) — every other
  * stage is the real operator the driver gate hash-matches (g15, g16,
  * g17, g05).
  *
  * Run:  sbt "runMain graft.examples.GsshaDemo /tmp/gssha_demo"
  */
object GsshaDemo {

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/gssha_demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = run(spark, outDir)
    println(s"\nGSSHA inputs written under $outDir:")
    files.foreach(f => println(s"  $f"))
    spark.stop()
  }

  /** The notebook, as one function (spec-driven too). Returns the
    * paths written.
    */
  def run(spark: SparkSession, outDir: String): Seq[String] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    // ---- cells 4–6: explore the installed accessors ----------------
    println(s"accessors: ${SourceRegistry.dataAccessorNames.mkString(", ")}")
    val accessor = "SyntheticEra5"
    val dataset = SourceRegistry.supportedDatasets(accessor).head
    println(s"datasets($accessor): $dataset")
    println(s"variables: ${SourceRegistry.supportedVariables(accessor, dataset).mkString(", ")}")

    // ---- cells 10–12: watershed AOI ---------------------------------
    // the notebook reads inflitration_export_poly.shp with geopandas;
    // Crs.wgs84Bounds parses the same .shp header when present (the
    // CrsSpec golden), with the parsed Lake Erie bounds as the offline
    // fallback so a fresh checkout runs without the reference tree
    val shp = "/root/reference/examples/example_data/inflitration_export_poly.shp"
    val watershed =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(shp)))
        Some(graft.functions.ShapefileBounds.wgs84Bounds(shp))
      else None
    watershed.foreach(b => println(s"watershed bounds (UTM 15N .prj → WGS84): $b"))
    // the notebook's watershed sits near St. Louis — outside the
    // synthetic fixture's Lake Erie domain — so when they are disjoint
    // the demo falls back to the reference's own Lake Erie AOI
    // (LEEM_boundary.shp, the CrsSpec golden) to keep the grid
    // value-bearing; the pipeline below is identical either way
    val domain = BBox(-83.5, 41.25, -79.0, 42.75)
    val aoi = watershed
      .filter(b => b.west <= domain.east && b.east >= domain.west &&
        b.south <= domain.north && b.north >= domain.south)
      .getOrElse {
        val leem = "/root/reference/testing/test_data/LEEM_boundary.shp"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(leem)))
          graft.functions.ShapefileBounds.wgs84Bounds(leem)
        else domain
      }
    println(s"AOI: $aoi")

    // ---- cell 15: fetch the precipitation grid ----------------------
    // (t2m stands in for total_precipitation: the synthetic fixture
    // carries two variables; the pipeline is identical)
    val precip = Engine(spark)
      .accessor(accessor).dataset(dataset)
      .variables("t2m")
      .bbox(aoi)
      .timeRange("2019-01-30 00:00:00", "2019-01-31 23:00:00")
      .load()

    // ---- cell 18: unit conversion, m → mm ---------------------------
    val precipMm = GridDataset(
      precip.g.df.withColumn("t2m", col("t2m") * 1000.0), precip.g.meta)

    // ---- cell 19: make_gssha_precipitation_input --------------------
    // header (EVENT/NRPDS/NRGAG/COORD, cell centroids as gages,
    // projected to the notebook's EPSG:26915) + per-timestep ACCUM rows
    val events = Seq(("march_event", "2019-01-30 00:00:00", "2019-01-31 23:00:00"))
    val nGages = events.length
    val gagePath = s"$outDir/march_precipitation.gag"
    val header = Gssha.gageHeader(precipMm, "t2m", "march_event", nGages,
      outputEpsg = Some(26915))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(gagePath), header.mkString("", "\n", "\n"))
    Gssha.writeLines(Gssha.gageRows(precipMm, "t2m", "ACCUM", events),
      "line", gagePath, hotStart = true)

    // ---- cells 25–38: HMET variables + unit calculus ----------------
    // the notebook converts K→°F and m/s→kts with metpy; here the same
    // arithmetic as column expressions over the fetched grid
    val hmetRaw = Engine(spark)
      .accessor(accessor).dataset(dataset)
      .variables("t2m", "u100")
      .bbox(aoi)
      .timeRange("2019-01-30 00:00:00", "2019-01-31 23:00:00")
      .load()
    val hmet = GridDataset(hmetRaw.g.df
      .withColumn("t2m", lit(1.8) * (col("t2m") - 273.15) + 32.0) // cell 36, K→°F
      .withColumn("u100", col("u100") * 1.943844),                // cell 32, m/s→kts
      hmetRaw.g.meta)

    // ---- cells 42–43: make_gssha_hmet_wes ---------------------------
    val crosswalk = Map("t2m" -> "Dry Bulb Temperature", "u100" -> "Wind Speed")
    val wesPath = s"$outDir/ERA5_HMET_inputs.wes"
    Gssha.writeLines(Gssha.wesRows(hmet, crosswalk, roundTo = Some(6)),
      "line", wesPath)

    // ---- cell 45: make_gssha_grass_ascii (shortened range) ----------
    val shortRange = GridDataset(
      hmet.df.filter(col("time") <= lit("2019-01-30 03:00:00").cast("timestamp")),
      hmet.meta)
    val grassFiles = Gssha.writeGrassFiles(
      Gssha.grassAscii(shortRange, "t2m", Some("Dry Bulb Temperature")),
      s"$outDir/grass")

    // ---- bonus: the reference's signature points→wide table ---------
    // stations clamped to the LOADED grid (the watershed AOI may
    // overlap the synthetic domain in as little as one cell): any
    // candidate inside the cropped axes, else the grid origin itself
    val (xa, ya) = (precip.g.meta.xAxis.get, precip.g.meta.yAxis.get)
    val candidates = Seq(("p0", -82.98, 41.63), ("p1", -79.43, 42.88),
      ("p2", -83.23, 41.85)).filter { case (_, lon, lat) =>
        lon >= xa.origin && lon <= xa.last && lat >= ya.origin && lat <= ya.last }
    val stations =
      if (candidates.nonEmpty) candidates
      else Seq(("p0", xa.origin, ya.origin))
    val csvPath = s"$outDir/stations_t2m.csv"
    val table = graft.operators.PointExtract.pointsToTable(
      precipMm, stations, "t2m") // the mm-converted grid, like the gage file
    val csv = (table.columns.mkString(",") +:
      table.collect().map(_.toSeq.mkString(",")).toSeq).mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csvPath), csv)

    Seq(gagePath, wesPath, csvPath) ++ grassFiles
  }
}
