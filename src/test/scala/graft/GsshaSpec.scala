package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.BBox
import graft.operators.{Crop, Gssha}
import graft.sources.SyntheticGrid

class GsshaSpec extends SparkSpec {

  private def smallGrid = Crop.time(
    Crop.bbox(SyntheticGrid.grid(spark).selectVariables(Seq("t2m")),
      BBox(-83.5, 41.25, -83.0, 41.5)),
    "2019-01-30 00:00:00", "2019-01-30 01:00:00")

  test("gage rows: one line per (event, timestep), x-major cell order (G-a)") {
    val rows = Gssha.gageRows(smallGrid, "t2m", "GAGES",
      Seq(("e1", "2019-01-30 00:00:00", "2019-01-30 01:00:00"))).collect()
    assert(rows.length == 2)
    val line = rows(0).getString(2)
    assert(line.startsWith("GAGES 2019 01 30 00 00 "))
    assert(line.split(" ").length == 6 + 6) // type + 5 ts fields + 6 cells
  }

  test("grass ascii: one payload per timestep with header and file name (G-b)") {
    val out = Gssha.grassAscii(smallGrid, "t2m", hmet = Some("Dry Bulb Temperature")).collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "2019013000_Temp.asc")
    val content = out(0).getString(2)
    assert(content.startsWith("north: 41.5\nsouth: 41.25\neast: -83.0\nwest: -83.5\nrows: 2\ncols: 3\n"))
    assert(content.split("\n").length == 6 + 2) // 6 header lines + 2 grid rows
  }

  test("wes rows: fixed wes_index order, nodata for unmapped variables (G-c)") {
    val rows = Gssha.wesRows(smallGrid, Map("t2m" -> "Dry Bulb Temperature")).collect()
    assert(rows.length == 2)
    val parts = rows(0).getString(1).split(" ")
    // 5 timestamp fields + 7 HMET slots
    assert(parts.length == 12)
    assert(parts(5) == "99.999")  // Pres unmapped -> nodata
    assert(parts(9) != "999.0")   // Temp mapped -> real aggregate
  }

  test("gage header transforms cell coords to the output EPSG (to_gssha:116-155)") {
    val header = Gssha.gageHeader(smallGrid, "t2m", "e1", nGages = 2,
      outputEpsg = Some(26915))
    assert(header.take(3) == Seq("EVENT e1", "NRPDS 2", "NRGAG 6"))
    // projected eastings for ~-83.x lon in UTM 15N are ~1.3M meters
    val coord = header(3).split(" ")
    assert(coord(0) == "COORD" && coord(1).toDouble > 800000.0)
    // without EPSG: raw lon/lat
    val raw = Gssha.gageHeader(smallGrid, "t2m", "e1", 2, None)
    assert(raw(3).split(" ")(1).toDouble == -83.5)
  }

  test("nodata fill uses HMET registry sentinels (F5)") {
    val withNulls = smallGrid.copy(df = smallGrid.df.withColumn("t2m",
      when(col("x") === -83.5, lit(null).cast("double")).otherwise(col("t2m"))))
    val filled = Gssha.fillNodata(withNulls, "t2m", Some("Relative Humidity"))
    assert(filled.df.filter(col("t2m").isNull).count() == 0)
    assert(filled.df.filter(col("t2m") === 999.0).count() > 0)
  }

  test("writeGrassFiles: one .asc file per timestep (test_5 parity)") {
    val out = java.nio.file.Files.createTempDirectory("grass").toString
    val rendered = Gssha.grassAscii(smallGrid, "t2m", Some("Dry Bulb Temperature"))
    val files = Gssha.writeGrassFiles(rendered, out)
    assert(files.length == 2)
    assert(files.forall(_.endsWith(".asc")))
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(files.head))
    assert(content.startsWith("north: "))
  }

  test("writeLines hot_start appends instead of overwriting") {
    val rows = Gssha.gageRows(smallGrid, "t2m", "GAGES",
      Seq(("e1", "2019-01-30 00:00:00", "2019-01-30 01:00:00")))
    val f = Files.createTempFile("gage", ".gag").toString
    Gssha.writeLines(rows, "line", f)
    val n1 = Files.readAllLines(java.nio.file.Paths.get(f)).size
    Gssha.writeLines(rows, "line", f, hotStart = true)
    val n2 = Files.readAllLines(java.nio.file.Paths.get(f)).size
    assert(n2 == 2 * n1)
    Gssha.writeLines(rows, "line", f) // overwrite resets
    assert(Files.readAllLines(java.nio.file.Paths.get(f)).size == n1)
    Files.deleteIfExists(java.nio.file.Paths.get(f))
  }
}
