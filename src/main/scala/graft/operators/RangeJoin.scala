package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (interval-containment) join — match each point `t` to every
  * interval `[start, end)` containing it. Spark plans a bare
  * `t >= start AND t < end` join as a nested loop (cross product ×
  * filter): quadratic, dead at scale. This operator makes it an EQUI-join:
  * quantize time into fixed buckets, explode each interval to the buckets
  * it overlaps, join point-bucket to interval-bucket, then apply the exact
  * range predicate. A point lives in exactly one bucket, so no pair is
  * ever produced twice — no dedup pass.
  *
  * Cost model: shuffle ∝ |points| + Σ ceil(len/bucket) per interval, work
  * per bucket ∝ points×intervals IN THAT BUCKET — the classic
  * spatial-grid trade. Pick `bucketSeconds` near the median interval
  * length: too small explodes the interval side, too large degrades
  * toward the cross product within a bucket. Skewed buckets (one hot
  * hour) are AQE's skew-join case.
  */
object RangeJoin {

  /** Each point row joined to every containing interval; all columns from
    * both sides pass through. `tCol`, `startCol`, `endCol` are epoch
    * seconds (longs); intervals are half-open `[start, end)`.
    */
  def pointsInIntervals(points: DataFrame, tCol: String,
                        intervals: DataFrame, startCol: String, endCol: String,
                        bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val b = lit(bucketSeconds)
    val p = points.withColumn("__pb", floor(col(tCol) / b))
    // Empty/inverted intervals ([start,end) with end <= start) contain no
    // point BY DEFINITION — drop them before exploding: Spark's `sequence`
    // auto-steps -1 for stop < start, so a badly negative-length interval
    // would otherwise fan out into a huge DESCENDING bucket list (correct
    // output, since the exact predicate filters everything, but
    // unbounded work).
    val i = intervals.filter(col(endCol) > col(startCol)).withColumn("__pb",
      explode(sequence(floor(col(startCol) / b), floor((col(endCol) - 1) / b))))
    p.join(i.hint("SHUFFLE_HASH"),
        p("__pb") === i("__pb") &&
          col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop(p("__pb")).drop(i("__pb"))
  }
}
