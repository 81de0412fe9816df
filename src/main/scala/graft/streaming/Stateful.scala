package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** [[runningCounts]] on Spark 4's `transformWithState` — the API a new
    * engine should standardize on: explicit named state variables with
    * per-variable encoders and optional TTL, event/processing-time timers,
    * and (unlike `mapGroupsWithState`) the freedom to emit any number of
    * rows per key per batch. Requires the RocksDB state store provider
    * ([[TransformWithStateConf]]) — the same store a 100 TB deployment
    * would run, where per-executor state exceeds heap.
    *
    * The `mapGroupsWithState` form above is kept as the compatibility
    * surface: it runs on the default HDFS-backed store and on batch frames
    * (`transformWithState` is streaming-only by design).
    */
  def runningCountsTWS[K](ds: Dataset[(K, Long)])(
      implicit ke: Encoder[K], e: Encoder[(K, Long)]): Dataset[(K, Long)] =
    ds.groupByKey(_._1)
      .transformWithState(new RunningCountProcessor[K], TimeMode.None(),
        OutputMode.Update())

  /** Session conf required before starting a [[runningCountsTWS]] query:
    * `transformWithState` only runs on the RocksDB state store.
    */
  val TransformWithStateConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
}

/** Per-key running total as an explicit [[StatefulProcessor]]: one named
  * `ValueState[Long]` ("total", no TTL — a wordcount total never expires),
  * folded over each batch's rows, latest total emitted per batch (update
  * mode). The state variable lives in the checkpointed RocksDB store keyed
  * by the group key, exactly like the `GroupState` it replaces.
  */
class RunningCountProcessor[K](implicit outEnc: Encoder[(K, Long)])
    extends StatefulProcessor[K, (K, Long), (K, Long)] {
  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Long)],
                               timerValues: TimerValues): Iterator[(K, Long)] = {
    val t = (if (total.exists()) total.get() else 0L) + rows.map(_._2).sum
    total.update(t)
    Iterator.single((key, t))
  }
}
