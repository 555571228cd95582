package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Generic per-query profiler for the optimization rounds: runs the
  * named queries (args, or SPARK_GRAFT_ONLY) under the Bench
  * methodology (noop sink, two back-to-back runs, cache cleared
  * between) with a SparkListener counting jobs / stages / tasks and
  * summing task time, so orchestration overhead (many tiny jobs,
  * checkpoint round-trips) is separable from genuine compute. Prints
  * one line per run.
  */
object ProfileQuery {
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

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    spark.sparkContext.addSparkListener(listener)

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else sys.env.get("SPARK_GRAFT_ONLY").toSeq.flatMap(_.split(",").toSeq)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (run <- 1 to 2) {
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain the async listener bus before reading counters
        spark.catalog.clearCache()
        println(f"[profile] $name%-34s run=$run wall=$wall%7.3f jobs=$jobs%4d " +
          f"stages=$stages%4d tasks=$tasks%5d taskTime=${taskMs / 1000.0}%8.2f s")
      }
    }
    spark.stop()
  }
}
