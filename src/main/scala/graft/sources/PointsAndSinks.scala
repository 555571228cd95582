package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV-of-coordinates source (SURVEY.md §2.1 S5; reference:
  * utility_functions.py:312-362): a small table of sample points for the
  * extraction pipeline. Points are few (they broadcast into the snap
  * join), so a driver-side collect is the intended use.
  */
object PointSource {

  /** Read `(lon, lat)` points; `idCol=None` assigns a range index as the
    * reference does (utility_functions.py:337-341).
    */
  def fromCsv(spark: SparkSession, path: String, lonCol: String = "lon",
              latCol: String = "lat", idCol: Option[String] = None): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    val withId = idCol match {
      case Some(c) => raw.select(col(c).cast("string").as("point_id"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
      case None => raw.select(
        (monotonically_increasing_id()).cast("string").as("point_id"),
        col(lonCol).cast("double").as("lon"), col(latCol).cast("double").as("lat"))
    }
    withId
  }

  /** Collect to the driver-side form the snap join uses. */
  def collectPoints(points: DataFrame): Seq[(String, Double, Double)] =
    points.select("point_id", "lon", "lat").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
}

/** Suffix-dispatched table sink (SURVEY.md §2.1 S7; reference:
  * utility_functions.py:477-522). XLSX goes through a minimal built-in
  * OOXML writer (`Xlsx`) — these per-variable tables are small
  * (timesteps × points, reference writes them driver-side via pandas
  * too), so a driver-side collect matches the reference's cost shape.
  */
object TableSink {
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit = {
    val mode = if (overwrite) "overwrite" else "error"
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) df.write.mode(mode).parquet(path)
    else if (lower.endsWith(".orc")) df.write.mode(mode).orc(path)
    else if (lower.endsWith(".csv"))
      df.write.mode(mode).option("header", "true").csv(path)
    else if (lower.endsWith(".json")) df.write.mode(mode).json(path)
    else if (lower.endsWith(".xlsx")) Xlsx.write(df, path, overwrite)
    else throw new IllegalArgumentException(s"unrecognized table suffix: $path")
  }
}

/** JSONL document ingest — the format web-scale text corpora actually
  * arrive in (one JSON object per line, frequently with malformed
  * lines from truncated uploads or encoding damage). Reads with an
  * explicit schema — NO schema inference pass, which at 100 TB is a
  * full extra scan — in PERMISSIVE mode, so a corrupt line becomes a
  * row with nulls and its raw text captured in the corrupt-record
  * column instead of killing the job. Ingest is splittable (JSONL is
  * line-delimited, so executors read byte ranges independently) and
  * the audit is a plain count, not a driver-side scan.
  */
object JsonlDocs {

  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL corpus: (docs with a null `_corrupt_record`,
    * corrupt-line count). Rows that parse but miss fields keep nulls —
    * schema drift is visible, not fatal.
    */
  def read(spark: SparkSession, path: String): (DataFrame, Long) = {
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // corrupt-record column demands caching the parsed rows
    val corrupt = raw.filter(col("_corrupt_record").isNotNull).count()
    (raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"), corrupt)
  }

  /** Write a DataFrame as JSONL (Spark's json sink IS line-delimited). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

/** Dependency-free minimal XLSX writer: an .xlsx file is a ZIP of five
  * small XML parts; `java.util.zip` + inline strings (no sharedStrings
  * table) produce a spec-valid single-sheet workbook. Numeric columns
  * become number cells, everything else inline-string cells.
  */
object Xlsx {
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def colRef(i: Int): String = { // 0 -> A, 25 -> Z, 26 -> AA
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (!overwrite && java.nio.file.Files.exists(p))
      throw new IllegalArgumentException(s"$path exists and overwrite=false")
    val schema = df.schema
    val numeric = schema.fields.map(_.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    })
    val rows = df.collect() // small per-variable tables; reference also materializes
    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(ref: String, v: Any, num: Boolean): String =
      if (v == null) ""
      else if (num) s"""<c r="$ref"><v>$v</v></c>"""
      else s"""<c r="$ref" t="inlineStr"><is><t>${esc(v.toString)}</t></is></c>"""
    sheet.append("<row r=\"1\">")
    schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
      sheet.append(cell(s"${colRef(i)}1", f, num = false))
    }
    sheet.append("</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet.append(s"""<row r="${ri + 2}">""")
      schema.indices.foreach { ci =>
        sheet.append(cell(s"${colRef(ci)}${ri + 2}", r.get(ci), numeric(ci)))
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet.toString)
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(p))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }
}
