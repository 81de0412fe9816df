package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * window); no inequality-join explosion, no per-left-row probe.
  *
  * HOT-KEY BOUND ([[joinAsOf]]): a window partition is ONE task — AQE's
  * skew handling splits skewed JOIN partitions, not window partitions, so
  * a key holding a large share of |L|+|R| serializes that share into a
  * single sort+scan. Fine when keys are plentiful and balanced (the
  * common case: users, instruments); for skewed keys use
  * [[joinAsOfBucketed]], which windows within (key, coarse time bucket) —
  * spreading a hot key over its time range — and then carries payloads
  * across bucket edges with one cheap per-(key, bucket) boundary pass.
  * When one side is tiny, a third shape wins: `broadcast` the small side
  * and compose the same window — zero shuffle of the big side.
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
    val (u, leftPass) =
      tagged(left, right, keyCol, leftTimeCol, rightTimeCol, payloadCols)
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1)
      .select((col(keyCol) +: leftPass.map(col)) ++ payloadCols.map(col): _*)
  }

  /** [[joinAsOf]] for SKEWED keys — same output, bounded task size. Times
    * must be numeric (epoch seconds/millis); `bucketSpan` is the coarse
    * time-bucket width in those units.
    *
    * Two passes replace the one per-key window:
    *  1. carry-forward window WITHIN each (key, time-bucket) partition — a
    *     hot key's rows spread over its time range instead of one task;
    *     per-task size is bounded by the key's densest bucket, which
    *     `bucketSpan` controls directly;
    *  2. boundary pass: per (key, bucket), the bucket's FINAL carried
    *     payload (one aggregated row per non-empty bucket), carried across
    *     buckets by a per-key window over AT MOST time-range/bucketSpan
    *     rows — independent of row count — then coalesced into rows whose
    *     within-bucket carry found nothing.
    *
    * The final join back is an equi-join on (key, bucket) against the
    * tiny boundary frame — skew-free by construction (pass 1 already
    * hash-partitioned the big side on those exact keys).
    */
  def joinAsOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTimeCol: String, rightTimeCol: String,
                       payloadCols: Seq[String], bucketSpan: Long): DataFrame = {
    require(bucketSpan > 0, "bucketSpan must be positive")
    val (u0, leftPass) =
      tagged(left, right, keyCol, leftTimeCol, rightTimeCol, payloadCols)
    val u = u0.withColumn("__bk", floor(col("__t") / bucketSpan))
    // pass 1: carry forward within (key, bucket)
    val w = Window.partitionBy(col(keyCol), col("__bk"))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    // pass 2a: each bucket's final carried value = the carried value of its
    // LAST row in window order (null if the bucket saw no right payload)
    val ord = struct(col("__t"), col("__is_left"))
    val aggs = payloadCols.map(c => max_by(col(c), ord).as(c))
    val bucketEnd = carried.groupBy(col(keyCol), col("__bk"))
      .agg(aggs.head, aggs.tail: _*)
    // pass 2b: value ENTERING each bucket = last non-null final value of
    // any strictly-earlier bucket of the same key. The window partitions by
    // key, but over bucket summaries — one row per non-empty bucket, so a
    // hot key contributes at most time-range/bucketSpan rows here.
    val wb = Window.partitionBy(keyCol).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val entering = payloadCols.foldLeft(bucketEnd) { (df, c) =>
      df.withColumn(s"__in_$c", last(col(c), ignoreNulls = true).over(wb))
    }.select(col(keyCol) +: col("__bk") +:
      payloadCols.map(c => col(s"__in_$c")): _*)
    carried.join(entering, Seq(keyCol, "__bk"), "left")
      .filter(col("__is_left") === 1)
      .select((col(keyCol) +: leftPass.map(col)) ++
        payloadCols.map(c => coalesce(col(c), col(s"__in_$c")).as(c)): _*)
  }

  /** Shared union-tag: left rows as (key, __t, __is_left=1, left cols,
    * null payloads), right rows as (key, __t, __is_left=0, null left cols,
    * payloads). Returns the union and the pass-through left columns.
    */
  private def tagged(left: DataFrame, right: DataFrame, keyCol: String,
                     leftTimeCol: String, rightTimeCol: String,
                     payloadCols: Seq[String]): (DataFrame, Seq[String]) = {
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
    (l.unionByName(r), leftPass)
  }
}
