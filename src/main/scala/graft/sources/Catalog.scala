package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{BBox, GridDataset, GridMeta}

/** Source-adapter registry — the Spark analog of the reference's
  * `DataAccessorFactory` plugin surface (reference: factory.py:8-59,
  * auto-registration data_accessors/__init__.py:9-11). Adapters resolve
  * a (dataset, variables, bbox, time range) request to a pruned scan of
  * a Parquet lake; remote-protocol concerns (auth, throttling, name
  * crosswalks) belong here, never in the query layer.
  */
trait SourceAdapter {
  def name: String
  def supportedDatasets: Seq[String]
  def supportedVariables(dataset: String): Seq[String]
  def load(spark: SparkSession, dataset: String, variables: Seq[String],
           bbox: Option[BBox], timeRange: Option[(String, String)]): GridDataset
}

object SourceRegistry {
  private var adapters: Map[String, SourceAdapter] = Map.empty

  def register(a: SourceAdapter): Unit = synchronized { adapters += a.name -> a }
  def dataAccessorNames: Seq[String] = adapters.keys.toSeq.sorted
  def supportedDatasets(accessor: String): Seq[String] = get(accessor).supportedDatasets
  def supportedVariables(accessor: String, dataset: String): Seq[String] =
    get(accessor).supportedVariables(dataset)
  def get(name: String): SourceAdapter = adapters.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown accessor '$name'; registered: ${dataAccessorNames.mkString(", ")}"))

  register(SyntheticEra5Adapter)
  register(LakeAdapter)
}

/** In-engine deterministic replica of the reference's ERA5 fixture. */
object SyntheticEra5Adapter extends SourceAdapter {
  val name = "SyntheticEra5"
  val supportedDatasets = Seq("synthetic-era5-single-levels")
  def supportedVariables(dataset: String): Seq[String] = Seq("t2m", "u100")
  def load(spark: SparkSession, dataset: String, variables: Seq[String],
           bbox: Option[BBox], timeRange: Option[(String, String)]): GridDataset = {
    var g = SyntheticGrid.grid(spark).selectVariables(variables)
    bbox.foreach(b => g = graft.operators.Crop.bbox(g, b))
    timeRange.foreach { case (s, e) => g = graft.operators.Crop.time(g, s, e) }
    g
  }
}

/** Parquet-lake adapter: datasets are directories of long-format grid
  * Parquet (partitioned by year/month for pruning at scale — SURVEY.md
  * §4). Variables project; bbox/time filters push down to the scan.
  */
object LakeAdapter extends SourceAdapter {
  val name = "ParquetLake"
  @volatile var root: String = sys.env.getOrElse("GRAFT_LAKE_ROOT", "/tmp/graft_lake")
  def supportedDatasets: Seq[String] = {
    val d = new java.io.File(root)
    if (d.isDirectory) d.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
    else Seq.empty
  }
  def supportedVariables(dataset: String): Seq[String] = Seq.empty // schema-on-read
  def load(spark: SparkSession, dataset: String, variables: Seq[String],
           bbox: Option[BBox], timeRange: Option[(String, String)]): GridDataset = {
    val df = spark.read.parquet(s"$root/$dataset")
    var g = GridDataset(df, GridMeta(datasetName = dataset))
    if (variables.nonEmpty) g = g.selectVariables(variables)
    bbox.foreach(b => g = graft.operators.Crop.bbox(g, b))
    timeRange.foreach { case (s, e) => g = graft.operators.Crop.time(g, s, e) }
    g
  }
}

/** TPC-H-ish driver-fixture tables (TESTDATA.md). */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalized to session-zoned TIMESTAMP whatever the
    * fixture's physical layout: TIMESTAMP(NANOS) (early driver
    * generations — Spark's reader rejects it, so read raw INT64 nanos
    * and floor-divide to micros in integer space; a double intermediate
    * would lose precision above 2^53 ns), TIMESTAMP(MICROS) without
    * isAdjustedToUTC (current generation — Spark infers TIMESTAMP_NTZ;
    * the repo convention of UTC sessions makes the NTZ→TZ cast the
    * identity on wall-clock values, matching DuckDB's naive read), or
    * an already-zoned TIMESTAMP. DuckDB sees the same wall-clock
    * values in every case, so oracles agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, col}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalArgumentException(
        s"unsupported events.ts physical type: $other")
    }
  }
}
