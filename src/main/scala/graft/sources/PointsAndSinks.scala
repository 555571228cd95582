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
  * utility_functions.py:477-522). XLSX is an intentional deviation:
  * there is no Spark xlsx writer, callers get CSV with a clear error.
  */
object TableSink {
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit = {
    val mode = if (overwrite) "overwrite" else "error"
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) df.write.mode(mode).parquet(path)
    else if (lower.endsWith(".csv"))
      df.write.mode(mode).option("header", "true").csv(path)
    else if (lower.endsWith(".json")) df.write.mode(mode).json(path)
    else if (lower.endsWith(".xlsx"))
      throw new IllegalArgumentException(
        "xlsx is not supported by Spark writers; use .csv (documented deviation)")
    else throw new IllegalArgumentException(s"unrecognized table suffix: $path")
  }
}
