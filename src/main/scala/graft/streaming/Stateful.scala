package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state (SURVEY §2.10's stateful-bolt contract,
  * streaming form): the reference's terminal bolt keeps a mutex-guarded
  * in-memory map updated per tuple (`bolt/bolt.go:566-583`); the Spark-native
  * equivalent is `mapGroupsWithState` — per-key state in the checkpointed
  * state store, merged per micro-batch, surviving restart.
  *
  * [[runningCounts]] is the reference's wordcount merge as explicit state:
  * each batch's per-key additions fold into a running total, and the
  * up-to-date total is emitted every batch (update mode). Where the built-in
  * `groupBy.count` should always be preferred, this shape is for logic the
  * declarative aggs can't express (session windows, custom eviction,
  * cross-batch sequences).
  */
object Stateful {

  /** Per-key running count over a stream of (key, delta) pairs. */
  def runningCounts[K: Encoder](ds: Dataset[(K, Long)])(
      implicit e: Encoder[(K, Long)]): Dataset[(K, Long)] = {
    implicit val longEnc: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    ds.groupByKey(_._1)
      .mapGroupsWithState[Long, (K, Long)](GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          (key, total)
      }
  }

  /** Output mode required by [[runningCounts]] when streamed. */
  val RunningCountsMode: OutputMode = OutputMode.Update()
}
