package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S8 — the DSv2 pluggable source, batch and micro-batch paths. */
class RangeSourceSpec extends SparkTestBase {

  private val fmt = "graft.sources.RangeSource"

  test("batch read produces the full deterministic range across shards") {
    val df = spark.read.format(fmt)
      .option("start", 10).option("end", 110).option("shards", 8).load()
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 100)
    val rows = df.orderBy("id").collect()
    assert(rows.head.getLong(0) == 10 && rows.head.getString(1) == "v10")
    assert(rows.last.getLong(0) == 109 && rows.last.getString(1) == "v109")
  }

  test("column pruning reaches the scan like any built-in source") {
    val df = spark.read.format(fmt).option("end", 50).load().select("id")
    assert(df.schema.fieldNames.toSeq == Seq("id"))
    assert(df.agg(sum("id")).head.getLong(0) == (0L until 50).sum)
  }

  test("micro-batch stream drains in batchSize steps under AvailableNow") {
    var batches = 0
    var rows = 0L
    val q = spark.readStream.format(fmt)
      .option("start", 0).option("end", 350).option("batchSize", 100)
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) => batches += 1; rows += df.count() }
      .option("checkpointLocation", Files.createTempDirectory("rs-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rows == 350, "admission control must not drop the capped remainder")
    assert(batches == 4)   // 100+100+100+50
  }

  test("streaming aggregation over the source equals batch aggregation") {
    val ckpt = Files.createTempDirectory("rs-agg-ckpt").toString
    val agg: DataFrame => DataFrame =
      df => df.groupBy(col("id") % 7).agg(count(lit(1)).as("cnt"))
    val streamed = graft.streaming.BoundedStream.runAvailableNow(
      spark,
      spark.readStream.format(fmt).option("end", 500).option("batchSize", 64).load(),
      agg, ckpt, "rs_agg")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = agg(spark.read.format(fmt).option("end", 500).load())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch && batch.nonEmpty)
  }
}
