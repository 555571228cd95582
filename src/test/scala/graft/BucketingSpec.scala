package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** The point of the bucketed layout is the PLAN: a fact-fact equi-join
  * on the bucket key must run with no Exchange anywhere — the shuffle
  * was paid once at write time. q26 oracles the values; this spec
  * pins the plan shape that makes the layout worth it at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join and same-key agg plan with zero Exchange") {
    val tmp = Files.createTempDirectory("graft-bucketing-spec").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "spec_orders_b", s"$tmp/o", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "spec_lineitem_b", s"$tmp/l", "l_orderkey", 4)

    // hint("merge"): at spec scale Spark would broadcast the tiny side
    // (a BroadcastExchange); force the sort-merge path — the one a
    // fact-fact join takes at real scale — which bucketing makes
    // exchange-free end to end
    val joined = spark.table("spec_orders_b").hint("merge")
      .join(spark.table("spec_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join+agg must be exchange-free, got:\n$plan")

    // one file per bucket (the repartition-by-bucket-key contract):
    // multi-file buckets would force a defensive sort under the join
    val files = new java.io.File(s"$tmp/o").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 4, s"expected 1 file per bucket (4), got $files")

    // the layout never changes the answer
    val direct = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
    assert(joined.orderBy("o_orderkey").collect().toSeq ==
           direct.orderBy("o_orderkey").collect().toSeq)

    spark.sql("DROP TABLE IF EXISTS spec_orders_b")
    spark.sql("DROP TABLE IF EXISTS spec_lineitem_b")
  }

  test("hive-partitioned layout: partition-column predicate prunes at the file level") {
    val tmp = Files.createTempDirectory("graft-partition-spec").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val pruned = spark.read.parquet(tmp).filter(col("lang") === "en")
    // the predicate must land in PartitionFilters (pruned before any
    // file is opened), not as a post-scan Filter over all partitions
    val scan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[(.*?)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pf.contains("= en"), s"predicate not in PartitionFilters:\n$scan")
    // answer parity with the unpartitioned read
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(pruned.count() == direct && direct > 0)
  }
}
