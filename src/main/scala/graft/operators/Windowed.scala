package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking (SURVEY §2.7/§2.8).
  *
  * The reference has NO event time — its only "window" is the whole bounded
  * stream, and the one extracted timestamp field is discarded
  * (`spout/spout.go:194`). Structured Streaming's windowed aggregation +
  * watermark is the capability a real deployment of this engine needs:
  * per-window state is dropped once the watermark passes the window end, so
  * state stays bounded no matter how long the stream runs — the property the
  * reference's unbounded in-memory maps (`bolt/bolt.go:28-34`) lack.
  *
  * Works identically on batch frames (window() is an ordinary grouping
  * expression there; the watermark is a streaming-only no-op), which is what
  * the streaming≡batch equivalence tests exploit.
  */
object Windowed {

  /** Generic event-time tumbling-window aggregation: any agg columns over
    * (window, key), watermarked when streaming. The window struct stays in
    * the output as `w` (start/end) for the caller to project.
    */
  def tumblingAgg(df: DataFrame, tsCol: String, keyCol: String,
                  width: String, delay: String, aggs: Seq[Column]): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    src.groupBy(window(col(tsCol), width).as("w"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Tumbling-window count per key: one row per (window, key) with bounded
    * streaming state (watermark `delay` behind max observed event time).
    */
  def tumblingCount(df: DataFrame, tsCol: String, keyCol: String,
                    width: String, delay: String): DataFrame =
    tumblingAgg(df, tsCol, keyCol, width, delay, Seq(count(lit(1)).as("cnt")))
      .select(col("w.start").as("w_start"), col(keyCol), col("cnt"))

  /** GAP-BASED SESSION WINDOWS: events for one key merge into a session
    * while each arrives within `gap` of the previous one — INCLUSIVELY: an
    * event landing exactly `gap` after the previous still extends the
    * session (Spark merges windows whose bounds touch). The session closes
    * `gap` after its last event (so `w.end = last event + gap`). Built on
    * `session_window`, Spark's native dynamic-gap window: in streaming,
    * state for a session is dropped once the watermark passes its end —
    * bounded state for a forever-running behavioral stream, where the
    * per-key map the reference keeps (`bolt/bolt.go:28-34`) would grow
    * without bound. On a batch frame the same expression is an ordinary
    * grouping (the oracle twin is lag + cumulative gap-count).
    */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String, delay: String, aggs: Seq[Column]): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    src.groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Sliding-window sum of a numeric column per key. */
  def slidingSum(df: DataFrame, tsCol: String, keyCol: String, valCol: String,
                 width: String, slide: String, delay: String): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    src.groupBy(window(col(tsCol), width, slide).as("w"), col(keyCol))
      .agg(sum(col(valCol)).as("total"))
      .select(col("w.start").as("w_start"), col(keyCol), col("total"))
  }
}
