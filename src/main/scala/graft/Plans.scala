package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of selected queries so
  * scan pushdown / broadcast / shuffle structure can be reviewed.
  * Usage: runMain graft.Plans [queryName ...] (default: a survey set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_revenue_by_nation", "g01_crop",
               "g05_points_table", "n08_knn_bruteforce", "q16_asof_click_before_purchase")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
