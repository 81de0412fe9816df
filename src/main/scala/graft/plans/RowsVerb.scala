package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, StringType}

/** [[WriteVerbPlan]]'s sibling for procedure-style verbs whose RESULT
  * matters: the mutation thunk returns the receipt ROWS instead of Unit,
  * and the exec node surfaces them as the statement's output.
  *
  * Why it exists (r14 advice): the maintenance TVFs (`graft_ivf_maintain`
  * …) wrapped [[graft.operators.StoreMaintenance]] in [[WriteVerbPlan]],
  * whose Unit body discarded the decision receipt — a scheduled SQL job
  * could fire maintenance but never observe WHICH action ran (none /
  * compact / vacuum) or the health signals it was decided from, despite
  * the receipt being the policy's whole dashboard surface. This node
  * keeps the execution-time discipline (EXPLAIN side-effect-free, one
  * mutation per execution, memoized across actions on the same
  * DataFrame) while handing the receipt rows through.
  */
case class RowsVerbPlan(verb: String, store: String,
                        @transient thunk: () => Seq[InternalRow],
                        // constructor field, LocalRelation-style: plan
                        // copies made during optimization must keep the
                        // SAME exprIds or parent references dangle
                        override val output: Seq[Attribute])
    extends LeafNode {
  override def computeStats(): Statistics = Statistics(sizeInBytes = 256)
}

object RowsVerbPlan {
  /** The maintenance receipt's fixed shape — mirrors
    * [[graft.operators.StoreMaintenance]]'s `(store, action,
    * n_tombstones, n_live_legs)` DataFrame.
    */
  def maintainSchema: Seq[Attribute] = Seq(
    AttributeReference("store", StringType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("n_tombstones", LongType, nullable = false)(),
    AttributeReference("n_live_legs", LongType, nullable = false)())

  /** The CDC-sync receipt's fixed shape — mirrors
    * [[graft.operators.IndexSync]]'s one-row DataFrame.
    */
  def syncSchema: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("store", StringType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("old_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)(),
    AttributeReference("n_added", LongType, nullable = false)(),
    AttributeReference("n_changed", LongType, nullable = false)(),
    AttributeReference("n_removed", LongType, nullable = false)(),
    AttributeReference("compacted",
      org.apache.spark.sql.types.BooleanType, nullable = false)())

  /** The delta-export receipt's fixed shape — mirrors
    * [[graft.sinks.Sinks.exportDelta]]'s one-row DataFrame.
    */
  def deltaExportSchema: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("store", StringType, nullable = false)(),
    AttributeReference("old_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)(),
    AttributeReference("n_adds", LongType, nullable = false)(),
    AttributeReference("n_removes", LongType, nullable = false)())

  /** [[deltaExportSchema]] + the applied copy's row count — the
    * consumer-side apply receipt ([[graft.sinks.Sinks.applyDelta]]). */
  def deltaApplySchema: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("store", StringType, nullable = false)(),
    AttributeReference("old_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)(),
    AttributeReference("n_adds", LongType, nullable = false)(),
    AttributeReference("n_removes", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)())
}

/** Physical node: the verb fires on the driver at first action, once,
  * and its receipt rows are the result — same memoization contract as
  * [[WriteVerbExec]].
  */
case class RowsVerbExec(verb: String, store: String,
                        override val output: Seq[Attribute],
                        @transient thunk: () => Seq[InternalRow])
    extends LeafExecNode {
  @transient private lazy val receiptRows: Array[InternalRow] =
    thunk().toArray
  override def executeCollect(): Array[InternalRow] =
    receiptRows.map(_.copy())
  override protected def doExecute(): RDD[InternalRow] = {
    // downstream stages require UnsafeRow (getByteArrayRdd casts)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(output.map(_.dataType).toArray)
    val rows: Seq[InternalRow] = receiptRows.map(r => proj(r).copy()).toSeq
    sparkContext.parallelize(rows, 1)
  }
}

/** Planner rule for [[RowsVerbPlan]] — injected alongside
  * [[WriteVerbStrategy]] by the TVF registration.
  */
object RowsVerbStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // the exec node must carry the LOGICAL plan's attribute ids — fresh
    // AttributeReferences here would orphan every parent's references
    case RowsVerbPlan(v, s, t, out) => RowsVerbExec(v, s, out, t) :: Nil
    case _ => Nil
  }

  def ensureInjected(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        this +: spark.experimental.extraStrategies
  }
}
