package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup

/** Streaming exact dedup: first occurrence wins across micro-batches,
  * duplicate-tracking state bounded by the watermark.
  */
class StreamingDedupSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 12:$minute%02d:00")

  test("duplicates are dropped across micro-batches; first occurrence survives") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val deduped = Dedup.streamingExact(
      mem.toDF().toDF("ts", "doc_key", "payload"),
      eventTimeCol = "ts", delay = "10 minutes", keyCols = Seq("doc_key"))
    val q = deduped.writeStream.format("memory").queryName("sd")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sd-ckpt").toString)
      .start()

    mem.addData((ts(0), "A", "first-A"), (ts(1), "B", "first-B"), (ts(1), "A", "dup-A"))
    q.processAllAvailable()
    // duplicate arrives in a LATER batch, within the watermark horizon
    mem.addData((ts(2), "A", "late-dup-A"), (ts(3), "C", "first-C"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sd").as[(Timestamp, String, String)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(out == Map("A" -> "first-A", "B" -> "first-B", "C" -> "first-C"))
  }
}
