package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-STAGE profiler for the optimization rounds: runs the named
  * queries (args) under the Bench methodology (noop sink, repeated
  * runs, cache cleared between) and prints, for the LAST run, every
  * stage's task count, summed task time, task-binary size and name —
  * so a query whose wall is per-task overhead (big task binaries,
  * tiny partitions) is distinguishable from one doing real data work,
  * stage by stage. Repeat a name N times on the command line to get N
  * hot runs (JIT ramp rides the earlier ones).
  */
object StageProfile {
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

    case class Acc(var taskMs: Long = 0L, var deserMs: Long = 0L,
                   var runMs: Long = 0L, var gcMs: Long = 0L,
                   var resSerMs: Long = 0L)
    case class St(name: String, tasks: Int, acc: Acc, details: String)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    @volatile var byStage = Map.empty[Int, Acc]
    @volatile var jobWallMs = 0L
    @volatile var jobStarts = Map.empty[Int, Long]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobStarts += j.jobId -> j.time }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        synchronized {
          jobWallMs += j.time - jobStarts.getOrElse(j.jobId, j.time)
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) synchronized {
          val a = byStage.getOrElse(t.stageId, { val n = Acc(); byStage += t.stageId -> n; n })
          a.taskMs += t.taskInfo.duration
          if (t.taskMetrics != null) {
            a.deserMs += t.taskMetrics.executorDeserializeTime
            a.runMs += t.taskMetrics.executorRunTime
            a.gcMs += t.taskMetrics.jvmGCTime
            a.resSerMs += t.taskMetrics.resultSerializationTime
          }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += St(s.stageInfo.name, s.stageInfo.numTasks,
            byStage.getOrElse(s.stageInfo.stageId, Acc()), s.stageInfo.details)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.zipWithIndex.foreach { case (name, i) =>
      val fn = graft.SparkEntry.queries(name)
      stages.clear(); byStage = Map.empty[Int, Acc]; jobWallMs = 0L
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      spark.catalog.clearCache()
      val last = i == args.length - 1 || args(i + 1) != name
      println(f"[stageprof] $name run=${i + 1} wall=$wall%7.3f " +
        f"stages=${stages.size} tasks=${stages.map(_.tasks).sum} " +
        f"taskTime=${stages.map(_.acc.taskMs).sum / 1000.0}%8.2f s " +
        f"deser=${stages.map(_.acc.deserMs).sum / 1000.0}%7.2f s " +
        f"run=${stages.map(_.acc.runMs).sum / 1000.0}%7.2f s " +
        f"gc=${stages.map(_.acc.gcMs).sum / 1000.0}%6.2f s " +
        f"jobWall=${jobWallMs / 1000.0}%7.2f s")
      if (last) {
        stages.sortBy(-_.acc.taskMs).take(20).foreach { s =>
          val site = s.details.linesIterator.toSeq.headOption.getOrElse("")
          println(f"  ${s.acc.taskMs / 1000.0}%8.2f s (deser=${s.acc.deserMs / 1000.0}%6.2f run=${s.acc.runMs / 1000.0}%7.2f gc=${s.acc.gcMs / 1000.0}%5.2f) tasks=${s.tasks}%4d  ${s.name.take(60)}  @ ${site.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
