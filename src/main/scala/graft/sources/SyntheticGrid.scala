package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{AxisSpec, GridDataset, GridMeta}

/** Deterministic in-engine replica of the reference's golden fixture
  * `testing/test_data/cds_era5_dataset.nc` (73 hourly steps x 7 lat x
  * 19 lon, two float variables — see FIXTURES.md §1), in long format.
  *
  * Built from `spark.range` so the identical relation is expressible as
  * ANSI SQL for the DuckDB oracle (`sqlCte`). Cross-engine exactness
  * rules (hash-match safe):
  *   - coordinates are exact multiples of 0.25 (binary-exact doubles);
  *   - variable values are integers divided by 1024.0 (binary-exact),
  *     so sums/averages over them are order-independent in IEEE754;
  *   - all derivation is int64 arithmetic then one exact division.
  */
object SyntheticGrid {
  val NT = 73  // hourly steps 2019-01-30T00 .. 2019-02-02T00, inclusive
  val NY = 7   // latitude  41.25 .. 42.75 step 0.25
  val NX = 19  // longitude -83.5 .. -79.0 step 0.25
  val T0 = "2019-01-30 00:00:00"

  val meta: GridMeta = GridMeta(
    datasetName = "synthetic-era5-single-levels",
    institution = "graft",
    xDim = "x", yDim = "y", timeDim = "time",
    epsg = 4326, timeStep = "hourly", timeZone = "UTC",
    xAxis = Some(AxisSpec(-83.5, 0.25, NX)),
    yAxis = Some(AxisSpec(41.25, 0.25, NY)))

  /** Long-format grid: (time, y, x, it, jy, jx, t2m, u100). */
  def df(spark: SparkSession): DataFrame = {
    spark.range(NT.toLong * NY * NX)
      .select(
        expr(s"id div ${NY * NX}").as("it"),
        expr(s"(id div $NX) % $NY").as("jy"),
        expr(s"id % $NX").as("jx"))
      .select(
        expr(s"timestamp'$T0' + make_interval(0,0,0,0,it,0,0)").as("time"),
        (lit(41.25) + col("jy") * lit(0.25)).as("y"),
        (lit(-83.5) + col("jx") * lit(0.25)).as("x"),
        col("it"), col("jy"), col("jx"),
        (((col("it") * 7 + col("jy") * 13 + col("jx") * 29 + 1) * lit(2654435761L) % 104729) / lit(1024.0)).as("t2m"),
        (((col("it") * 11 + col("jy") * 17 + col("jx") * 23 + 7) * lit(2654435761L) % 104729) / lit(1024.0)).as("u100"))
  }

  def grid(spark: SparkSession): GridDataset = GridDataset(df(spark), meta)

  /** The same relation as a DuckDB CTE body (the oracle side). */
  val sqlCte: String =
    s"""grid AS (
       |  SELECT
       |    TIMESTAMP '$T0' + (id // ${NY * NX}) * INTERVAL 1 HOUR AS time,
       |    CAST(41.25 AS DOUBLE) + ((id // $NX) % $NY) * CAST(0.25 AS DOUBLE) AS y,
       |    CAST(-83.5 AS DOUBLE) + (id % $NX) * CAST(0.25 AS DOUBLE) AS x,
       |    (id // ${NY * NX}) AS it,
       |    ((id // $NX) % $NY) AS jy,
       |    (id % $NX) AS jx,
       |    CAST((((id // ${NY * NX})*7 + ((id // $NX) % $NY)*13 + (id % $NX)*29 + 1) * 2654435761 % 104729) AS DOUBLE) / CAST(1024.0 AS DOUBLE) AS t2m,
       |    CAST((((id // ${NY * NX})*11 + ((id // $NX) % $NY)*17 + (id % $NX)*23 + 7) * 2654435761 % 104729) AS DOUBLE) / CAST(1024.0 AS DOUBLE) AS u100
       |  FROM range(${NT.toLong * NY * NX}) t(id)
       |)""".stripMargin
}
