package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EXECUTION-time store mutation for the procedure-style SQL write verbs
  * (`graft_text_index_build`, `graft_snapshot_prune`, …).
  *
  * The r13 shape ran the side effect inside the TableFunctionRegistry
  * builder — i.e. at ANALYSIS time — which meant `EXPLAIN SELECT * FROM
  * graft_snapshot_prune(...)` deleted data without running anything, and
  * any re-analysis of a plan containing an append (a temp view reference,
  * a cached-plan re-resolution) silently re-ran the write. This node is
  * the fix, the same discipline Spark's own v2 commands follow
  * (`V2CommandExec.run()` fires when the statement EXECUTES): the builder
  * now returns a [[WriteVerbPlan]] carrying the mutation as a thunk, and
  * [[WriteVerbExec]] runs it exactly once per execution, on the first
  * action — EXPLAIN and analysis are free of side effects.
  *
  * Semantics a SQL user gets (documented at the registry): each EXECUTION
  * of a statement containing a write verb performs the write once —
  * re-collecting the same DataFrame does not repeat it (the exec node
  * memoizes), but re-ISSUING the statement (or executing a query over a
  * temp view that wraps one) runs the procedure again, exactly like
  * re-running an INSERT. Wrap write verbs in standalone statements, not
  * views.
  */
case class WriteVerbPlan(verb: String, store: String,
                         @transient thunk: () => Unit,
                         // constructor field, LocalRelation-style: plan
                         // copies made during optimization must keep the
                         // SAME exprIds or parent references dangle
                         override val output: Seq[Attribute] =
                           WriteVerbPlan.receiptSchema) extends LeafNode {
  // a 1-row receipt; without this override LeafNode.computeStats throws
  override def computeStats(): Statistics = Statistics(sizeInBytes = 64)
}

object WriteVerbPlan {
  def receiptSchema: Seq[Attribute] = Seq(
    AttributeReference("verb", StringType, nullable = false)(),
    AttributeReference("store", StringType, nullable = false)(),
    AttributeReference("ok", BooleanType, nullable = false)())
}

/** Physical receipt node: the mutation fires on the driver at first
  * action (the verbs are themselves Spark pipelines — launching their
  * jobs from the driver here is exactly what AQE / broadcast build /
  * V2CommandExec do), then the 1-row receipt is the result.
  */
case class WriteVerbExec(verb: String, store: String,
                         override val output: Seq[Attribute],
                         @transient thunk: () => Unit) extends LeafExecNode {
  // memoized: collect-then-show on the same DataFrame writes ONCE
  @transient private lazy val receiptRows: Array[InternalRow] = {
    thunk()
    Array(new GenericInternalRow(Array[Any](
      UTF8String.fromString(verb), UTF8String.fromString(store), true)))
  }
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

/** Planner rule mapping the logical receipt to the physical one —
  * injected per-session via `spark.experimental.extraStrategies` by
  * [[graft.functions.GraftTableFunctions.ensureRegistered]] (the same
  * idempotent-registration contract as the TVFs themselves).
  */
object WriteVerbStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // the exec node must carry the LOGICAL plan's attribute ids — fresh
    // AttributeReferences here would orphan every parent's references
    case p @ WriteVerbPlan(v, s, t, out) =>
      WriteVerbExec(v, s, out, t) :: Nil
    case _ => Nil
  }

  def ensureInjected(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        this +: spark.experimental.extraStrategies
  }
}
