package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Executed-plan metric dump: runs a query (noop sink, twice — the
  * second run rides hot codegen) and prints the FINAL adaptive plan
  * tree with each node's reported metrics (rows, duration-ish ones),
  * recursing into AQE query stages and cached-relation inner plans —
  * the SQL-tab view the headless bench cannot show (guide §7.1/§7.2).
  */
object MetricsProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("sum(length(text))").collect()

    def dump(p: SparkPlan, depth: Int, seen: java.util.IdentityHashMap[AnyRef, AnyRef]): Unit = {
      val interesting = p.metrics.filter { case (_, m) =>
        m.value > 0 && (m.metricType == "timing" || m.metricType == "nsTiming" ||
          m.name.exists(n => n.contains("time") || n.contains("rows") ||
            n.contains("duration")))
      }
      val ms = interesting.map { case (k, m) =>
        val v = if (m.metricType == "nsTiming") s"${m.value / 1000000} ms"
          else if (m.metricType == "timing") s"${m.value} ms"
          else m.value.toString
        s"$k=$v"
      }.mkString(", ")
      println("  " * depth + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => dump(a.executedPlan, depth + 1, seen)
        case q: QueryStageExec => dump(q.plan, depth + 1, seen)
        case im: InMemoryTableScanExec =>
          val rel = im.relation.cacheBuilder.cachedPlan
          if (rel != null && !seen.containsKey(rel)) {
            seen.put(rel, rel)
            println("  " * (depth + 1) + "~~cached plan~~")
            dump(rel, depth + 2, seen)
          }
        case _ => p.children.foreach(c => dump(c, depth + 1, seen))
      }
    }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"===== $name  (hot wall ${(System.nanoTime() - t0) / 1e9}%.3f s)")
      dump(df.queryExecution.executedPlan, 0, new java.util.IdentityHashMap)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
