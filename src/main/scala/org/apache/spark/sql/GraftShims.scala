package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversion (Spark 4.x
  * wraps Column around ColumnNode; classic.ExpressionUtils does the
  * conversion but is sql-private). Lives in this package purely to widen
  * access for graft's custom Catalyst expressions.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint()`ed
    * Dataset (its logical plan is a LogicalRDD wrapping the persisted
    * RDD — `Dataset.unpersist` does NOT reach it because local
    * checkpoints bypass the cache manager). No-op for non-checkpoint
    * plans. Callers must only free checkpoints whose data is no longer
    * reachable from any live result: local checkpoints are
    * non-recomputable by construction.
    */
  def unpersistLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.logical match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Non-blocking read of an Observation's metrics (empty until the
    * observed action's listener fires) — `getOrEmpty` is
    * private[sql]; the public `get` blocks with no timeout.
    */
  def observedMetrics(obs: Observation): Map[String, Any] =
    obs.getOrEmpty

  /** The executed physical plan of a streaming query's LAST micro-batch
    * (`StreamExecution.lastExecution` is sql-private). This is how the
    * stream-static join specs assert the static side carries no
    * per-batch Exchange — the plan a production micro-batch actually
    * re-runs, not the pre-start logical plan.
    */
  def lastExecutedPlan(
      q: org.apache.spark.sql.streaming.StreamingQuery)
      : execution.SparkPlan = q match {
    case w: execution.streaming.runtime.StreamingQueryWrapper =>
      w.streamingQuery.lastExecution.executedPlan
    case e: execution.streaming.runtime.StreamExecution =>
      e.lastExecution.executedPlan
    case other =>
      sys.error(s"unsupported StreamingQuery impl: ${other.getClass}")
  }
}
