package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions._

/** Microbench: the exact-Jaccard verify kernel. Compares Spark's
  * generic `size(array_intersect(a, b))` against a sorted-merge
  * intersection count over the (sorted, distinct) shingle-set arrays
  * the r13 kernels produce — interleaved rounds so box noise hits both
  * equally. Uses the real n150-ish pair shape: ~50k pairs of ~300-long
  * sorted long arrays.
  */
object IntersectBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), shingle_set(col("text"), 5).as("sh"))
    // pair every doc with its neighbors: ~5 pairs per doc = 25k pairs
    val ids = docs.select(col("doc_id"))
    val pairs = ids.select(col("doc_id").as("a"))
      .crossJoin(spark.range(1, 6).select(col("id").as("d")))
      .select(col("a"), (col("a") + col("d")).as("b"))
    val joined = pairs
      .join(docs.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(docs.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .persist()
    println("pairs: " + joined.count())
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ibench] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    for (r <- 1 to 3) {
      time(s"array_intersect r$r") {
        joined.select(sum(size(array_intersect(col("sh_a"), col("sh_b")))))
          .collect()
      }
      time(s"sorted_merge    r$r") {
        joined.select(sum(sorted_intersect_count(col("sh_a"), col("sh_b"))))
          .collect()
      }
    }
    spark.stop()
  }
}
