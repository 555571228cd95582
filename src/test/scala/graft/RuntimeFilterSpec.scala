package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — Spark's InjectRuntimeFilter
  * builds a bloom filter from the selective (already-filtered) side of
  * a shuffle join and pushes a might_contain probe into the big side's
  * scan, so rows that cannot match die before the exchange. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~join-selectivity fraction of it. Default thresholds
  * target real clusters (10 GB application side), so the spec lowers
  * them to prove the mechanism fires and the answer is unchanged.
  * Broadcast is disabled because InjectRuntimeFilter only fires for
  * shuffle joins (a merge HINT is not enough — the rule checks
  * broadcastability by size): exactly the regime where the filtered
  * dim outgrew the broadcast threshold but its join-key bloom still
  * fits in one.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join injects a bloom probe into the big side, same answer") {
    val conf = spark.conf
    val kApp = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val kEnabled = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val kBcast = "spark.sql.autoBroadcastJoinThreshold"
    val oldApp = conf.get(kApp)
    val oldEnabled = conf.get(kEnabled)
    val oldBcast = conf.get(kBcast)
    conf.set(kApp, "0")
    conf.set(kEnabled, "true")
    conf.set(kBcast, "-1")
    try {
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_totalprice") > 400000.0)
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val joined = li.hint("merge")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n$plan")
      // the probe is pruning, never filtering the answer
      val expected = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet")
            .filter(col("o_totalprice") > 400000.0),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderkey").collect().toSeq ==
             expected.orderBy("o_orderkey").collect().toSeq)
    } finally {
      conf.set(kApp, oldApp)
      conf.set(kEnabled, oldEnabled)
      conf.set(kBcast, oldBcast)
    }
  }
}
