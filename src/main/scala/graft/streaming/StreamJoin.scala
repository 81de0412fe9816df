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
  * as any keyed stream operator; [[StreamJoin.saltedIntervalJoin]] is the
  * library form of the fix (salt + replicate + re-merge) for when one
  * user can produce millions of live rows per horizon.
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
    * later than the watermark are DROPPED from the join (the documented
    * late-data contract), and smaller delays evict buffered state
    * sooner. It is a required parameter precisely because the tempting
    * value — zero — silently discards every out-of-order arrival across
    * micro-batches; accidental data loss should take an explicit
    * `"0 seconds"`, not a missing argument.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTsCol: String, rightTsCol: String,
                   within: String,
                   watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey)
        && col(rightTsCol) >= col(leftTsCol)
        && col(rightTsCol) < col(leftTsCol) + expr(s"INTERVAL $within"))
  }

  /** [[intervalJoin]] for a SKEWED hot side: the hot stream's state is
    * split across `salt` sub-keys so no single state partition ever holds
    * a hot key's full live row set.
    *
    * Mechanics: each hot-side row gets a deterministic salt in
    * `[0, salt)` (a hash of the whole row — any spread works, it only
    * distributes rows); the other side is REPLICATED once per salt value
    * (a stateless `explode` before its shuffle). The join key becomes
    * `(key, salt)`, so every (hot, other) pair meets in exactly one
    * sub-key — the hot row's — and the re-merged output is row-identical
    * to the unsalted join, at the cost of `salt`× the other side's state
    * and shuffle volume. That trade is the point: use it when one side is
    * orders of magnitude hotter than the other (views vs purchases for
    * one viral user), with `salt` sized so (hot rate × horizon) / salt
    * fits a state partition.
    *
    * Output columns and late-data semantics are identical to
    * [[intervalJoin]]; watermarks are applied AFTER the salt projection,
    * on the same event-time columns.
    */
  def saltedIntervalJoin(hot: DataFrame, other: DataFrame,
                         hotKey: String, otherKey: String,
                         hotTsCol: String, otherTsCol: String,
                         within: String,
                         watermarkDelay: String,
                         salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1: $salt")
    val l = hot
      .withColumn("__graft_salt_l",
        pmod(xxhash64(hot.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)).cast("int"))
      .withWatermark(hotTsCol, watermarkDelay)
    val r = other
      .withColumn("__graft_salt_r", explode(sequence(lit(0), lit(salt - 1))))
      .withWatermark(otherTsCol, watermarkDelay)
    l.join(r,
        col(hotKey) === col(otherKey)
          && col("__graft_salt_l") === col("__graft_salt_r")
          && col(otherTsCol) >= col(hotTsCol)
          && col(otherTsCol) < col(hotTsCol) + expr(s"INTERVAL $within"))
      .drop("__graft_salt_l", "__graft_salt_r")
  }
}
