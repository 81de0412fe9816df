package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join — for each left row, the most recent right
  * row of the same key with `rightTime <= leftTime`. The operator a market
  * / telemetry / attribution pipeline reaches for first, and one Spark has
  * no native form of.
  *
  * Plan: MERGE-style union-tag, not a join. Both sides are tagged and
  * unioned, then ONE window per key ordered by (time, side) carries each
  * right payload forward with `last(_, ignoreNulls)` — right rows sort
  * before left rows at equal times, so `<=` semantics fall out of the sort
  * key. A single shuffle on the key (the union shuffles once for the
  * window); no inequality-join explosion, no per-left-row probe. At 100 TB
  * the cost is one sort of |L|+|R| rows per key — the same shape as the
  * sort-merge join Spark would pick for an equi-join, and AQE handles hot
  * keys. (A range/bucket pre-join would only help when one side is tiny —
  * compose `broadcast` + the same window in that case.)
  *
  * PRECONDITION: at most one right row per (key, rightTime) — pre-aggregate
  * the right side otherwise (which row "the" match is would be undefined
  * anyway). A NULL payload value on a right row is treated as absent (the
  * window carries the previous non-null forward).
  */
object AsOf {

  /** Left frame enriched with `payloadCols` from the as-of-matched right
    * row (NULL when no right row precedes). Every left column passes
    * through unchanged.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftPass = left.columns.filterNot(_ == keyCol).toSeq
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val l = left.select(
      (col(keyCol) +: col(leftTimeCol).as("__t") +: lit(1).as("__is_left") +:
        leftPass.map(col)) ++
        payloadCols.map(c => lit(null).cast(rightTypes(c)).as(c)): _*)
    val r = right.select(
      (col(keyCol) +: col(rightTimeCol).as("__t") +: lit(0).as("__is_left") +:
        leftPass.map(c => lit(null).cast(leftTypes(c)).as(c))) ++
        payloadCols.map(col): _*)

    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1)
      .select((col(keyCol) +: leftPass.map(col)) ++ payloadCols.map(col): _*)
  }
}
