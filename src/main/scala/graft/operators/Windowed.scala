package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Tumbling-window count per key: one row per (window, key) with bounded
    * streaming state (watermark `delay` behind max observed event time).
    */
  def tumblingCount(df: DataFrame, tsCol: String, keyCol: String,
                    width: String, delay: String): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, delay) else df
    src.groupBy(window(col(tsCol), width).as("w"), col(keyCol))
      .count()
      .select(col("w.start").as("w_start"), col(keyCol), col("count").as("cnt"))
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
