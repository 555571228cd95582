package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.streaming.operators.stateful.{EventTimeWatermarkExec, StateStoreWriter}
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Executed-plan introspection for STREAMING queries — the lint gate's
  * window into what a micro-batch actually ran (PlanLintSpec walks
  * every batch query's pre-AQE plan; the streaming surfaces need the
  * incremental execution captured after a batch, which lives behind
  * `private[sql]` wrappers — hence this helper in the repo's existing
  * spark-internal package, beside the custom expressions).
  */
object StreamingIntrospect {

  /** The physical plan of the LAST micro-batch the query executed. */
  def lastExecutedPlan(q: StreamingQuery): SparkPlan =
    q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution.executedPlan

  /** The plan plus every adaptively-executed sub-plan rooted inside it:
    * stateless micro-batch segments run under AQE, whose final plans
    * hang off AdaptiveSparkPlanExec / QueryStageExec leaves a plain
    * collect() never descends into — a lint walking only the outer
    * tree would pass vacuously on exactly the join it exists to check.
    */
  def allPlanTrees(plan: SparkPlan): Seq[SparkPlan] = {
    val nested = plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allPlanTrees(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allPlanTrees(s.plan)
    }.flatten
    plan +: nested
  }

  /** Simple class names of every STATE-WRITING operator in the plan —
    * the stores a streaming query will grow at 100 TB; the lint
    * demands these equal each operator's declared set exactly.
    */
  def statefulStoreNames(plan: SparkPlan): Seq[String] =
    allPlanTrees(plan).flatMap(_.collect {
      case s: StateStoreWriter => s.getClass.getSimpleName
    })

  /** Whether the executed plan carries an event-time watermark node —
    * the bound that reaps watermarked stores' state.
    */
  def hasWatermarkNode(plan: SparkPlan): Boolean =
    allPlanTrees(plan).exists(_.collectFirst {
      case w: EventTimeWatermarkExec => w
    }.isDefined)
}
