package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{Relational, Windowed}
import graft.streaming.BoundedStream

/** Event-time windows + watermark (§2.7) and the streaming admission-control
  * / redistribution operators (S6/S7).
  */
class WindowedSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val events = Seq(
    (ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(2), "b", 3.0),
    (ts(11), "a", 4.0), (ts(12), "b", 5.0),
    (ts(21), "b", 6.0),
  )

  test("tumbling window counts on a batch frame") {
    val out = Windowed.tumblingCount(events.toDF("ts", "k", "v"), "ts", "k",
      width = "10 minutes", delay = "5 minutes")
      .orderBy("w_start", "k")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2026-01-01 10:00:00.0", "a", 2L), ("2026-01-01 10:00:00.0", "b", 1L),
      ("2026-01-01 10:10:00.0", "a", 1L), ("2026-01-01 10:10:00.0", "b", 1L),
      ("2026-01-01 10:20:00.0", "b", 1L)))
  }

  test("streaming windowed aggregation with watermark equals batch result") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = Windowed.tumblingCount(
      mem.toDF().toDF("ts", "k", "v"), "ts", "k", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_eq")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("win-ckpt").toString)
      .start()
    mem.addData(events.take(3))
    q.processAllAvailable()
    mem.addData(events.drop(3))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_eq").orderBy("w_start", "k")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    val batch = Windowed.tumblingCount(events.toDF("ts", "k", "v"), "ts", "k",
      "10 minutes", "5 minutes").orderBy("w_start", "k")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq && batch.nonEmpty)
  }

  test("sliding window sums overlap correctly on a batch frame") {
    val out = Windowed.slidingSum(events.toDF("ts", "k", "v"), "ts", "k", "v",
      width = "20 minutes", slide = "10 minutes", delay = "5 minutes")
      .filter(col("k") === "a").orderBy("w_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(2)))
    // a-events at 10:00,10:01 (3.0) and 10:11 (4.0); 20-min windows sliding 10:
    // [09:50,10:10)=3, [10:00,10:20)=7, [10:10,10:30)=4
    assert(out.toSeq == Seq(
      ("2026-01-01 09:50:00.0", 3.0),
      ("2026-01-01 10:00:00.0", 7.0),
      ("2026-01-01 10:10:00.0", 4.0)))
  }

  test("session windows merge within the gap, close gap after the last event") {
    // gap 5 min: a = {10:00,10:01} then {10:11}; b = {10:02},{10:12},{10:21}
    val out = Windowed.sessionize(events.toDF("ts", "k", "v"), "ts", "k",
      gap = "5 minutes", delay = "5 minutes",
      Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .select(col("w.start"), col("w.end"), col("k"), col("n"), col("sv"))
      .orderBy("k", "w.start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      ("2026-01-01 10:00:00.0", "2026-01-01 10:06:00.0", "a", 2L, 3.0),
      ("2026-01-01 10:11:00.0", "2026-01-01 10:16:00.0", "a", 1L, 4.0),
      ("2026-01-01 10:02:00.0", "2026-01-01 10:07:00.0", "b", 1L, 3.0),
      ("2026-01-01 10:12:00.0", "2026-01-01 10:17:00.0", "b", 1L, 5.0),
      ("2026-01-01 10:21:00.0", "2026-01-01 10:26:00.0", "b", 1L, 6.0)))
  }

  test("streaming sessionization equals the batch result once the watermark passes") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    // sentinel far in the future pushes the watermark past every real
    // session so append mode finalizes them all
    val sentinel = (Timestamp.valueOf("2026-01-01 23:00:00"), "zzz", 0.0)
    val agg = Windowed.sessionize(
      mem.toDF().toDF("ts", "k", "v"), "ts", "k", "5 minutes", "1 minute",
      Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .select(col("w.start").as("w_start"), col("k"), col("n"), col("sv"))
    val q = agg.writeStream.format("memory").queryName("sess_eq")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sess-ckpt").toString)
      .start()
    mem.addData(events.take(3))
    q.processAllAvailable()
    mem.addData(events.drop(3) :+ sentinel)
    q.processAllAvailable()
    // one more empty-ish commit so the watermark from the sentinel batch evicts
    mem.addData(Seq.empty[(Timestamp, String, Double)])
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_eq").filter(col("k") =!= "zzz")
      .orderBy("k", "w_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Windowed.sessionize(events.toDF("ts", "k", "v"), "ts", "k",
      "5 minutes", "1 minute", Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .select(col("w.start").as("w_start"), col("k"), col("n"), col("sv"))
      .orderBy("k", "w_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq == batch.toSeq && batch.nonEmpty)
  }

  test("S6: maxFilesPerTrigger bounds each micro-batch; all input still drains") {
    val in = Files.createTempDirectory("rate-in").toString
    (0 until 4).foreach { i =>
      Files.write(java.nio.file.Paths.get(in, s"f$i.txt"), s"w$i".getBytes("UTF-8"))
    }
    var batches = 0
    var rows = 0L
    val src = BoundedStream.textStream(spark, in, maxFilesPerTrigger = Some(1))
    val q = src.writeStream
      .foreachBatch { (df: DataFrame, _: Long) => batches += 1; rows += df.count() }
      .option("checkpointLocation", Files.createTempDirectory("rate-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rows == 4 && batches == 4)   // one file per batch, nothing dropped
  }

  test("S7: roundRobin redistributes to exactly n partitions") {
    val df = spark.range(1000).toDF("id")
    val out = Relational.roundRobin(df, 7)
    assert(out.rdd.getNumPartitions == 7)
    assert(out.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"))
    assert(out.count() == 1000)
  }
}
