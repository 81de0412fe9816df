package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (the last §2.6-adjacent streaming surface): two
  * unbounded inputs joined on a key plus an EVENT-TIME interval — "every
  * view matched to the purchases it produced within N hours". The batch
  * form of the same predicate is one inequality join; the streaming form
  * must additionally bound how long each side's rows are BUFFERED, which
  * is exactly what the watermark + time-range condition below give the
  * engine: a left row can stop waiting once the right watermark passes
  * `leftTs + within`, a right row once the left watermark passes its
  * event time, so state is (rate × horizon)-bounded, never
  * corpus-bounded.
  *
  * Inner joins emit each match as soon as both rows have arrived (no
  * watermark wait on the OUTPUT path — only state eviction uses it), so
  * draining a bounded source with `Trigger.AvailableNow` yields exactly
  * the batch join's rows; q51 puts that equivalence under the oracle
  * hash, and StreamJoinSpec proves it across multi-batch arrival orders.
  *
  * Scale shape: one shuffle of each stream on the join key per
  * micro-batch, state store holds only the watermark-live window of both
  * sides. A hot key concentrates its state in one partition — same bound
  * as any keyed stream operator; pre-split hot keys upstream
  * (salt + re-merge) if one user can produce millions of live rows per
  * horizon.
  */
object StreamJoin {

  /** Key + interval stream-stream INNER join: rows of `right` whose
    * `rightTsCol` falls in `[leftTs, leftTs + within)` for a matching
    * key. The key columns must be named differently on the two sides
    * (`leftKey`/`rightKey`) so the join output is unambiguous; both ts
    * columns must be TimestampType (watermarks require event-time
    * columns).
    *
    * `watermarkDelay` is the allowed out-of-orderness: rows arriving
    * later than the watermark are dropped from the join (the documented
    * late-data contract), and smaller delays evict buffered state
    * sooner.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTsCol: String, rightTsCol: String,
                   within: String,
                   watermarkDelay: String = "0 seconds"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey)
        && col(rightTsCol) >= col(leftTsCol)
        && col(rightTsCol) < col(leftTsCol) + expr(s"INTERVAL $within"))
  }
}
