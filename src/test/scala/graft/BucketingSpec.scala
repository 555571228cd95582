package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing co-locates join keys at write time so repeated joins on the
  * bucket key need no exchange — the lake-layout lever for the hot join
  * paths at 100 TB (SURVEY.md §4). Uses its own session because
  * bucketed tables need a warehouse-backed catalog.
  */
class BucketingSpec extends AnyFunSuite {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val wh = Files.createTempDirectory("warehouse").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      spark.read.parquet(s"$sf/orders.parquet")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      spark.read.parquet(s"$sf/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n${plan.take(2000)}")
      // and it is still correct
      val expect = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
