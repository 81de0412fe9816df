package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}
import graft.streaming.BoundedStream

/** Continuous corpus ingestion end-to-end: documents arrive as files, the
  * quality gate + deterministic split run as a stream, and the curated
  * corpus lands in a hive-partitioned parquet export (split=... dirs) via
  * foreachBatch — with checkpoint resume, so a second drain after new
  * files arrive appends ONLY the new documents. The streamed export must
  * equal running the same curation in batch over everything that arrived.
  */
class StreamingCurationSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog again today"

  private def docs(ids: Range): Seq[(Long, String)] =
    ids.map(i => (i.toLong,
      if (i % 5 == 4) "too short" else s"$good unique marker number$i"))

  private def curateStage(df: DataFrame): DataFrame = {
    val flags = TextAnalysis.qualityRules(df, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"), col("n_tokens"))
    Sampling.hashSplit(df.join(flags, "doc_id"), "doc_id")
  }

  test("streamed curation export equals batch curation, resumes incrementally") {
    val in = Files.createTempDirectory("cur-in").toString
    val out = Files.createTempDirectory("cur-out").toString
    val ckpt = Files.createTempDirectory("cur-ckpt").toString
    val schema = docs(0 until 1).toDF("doc_id", "text").schema

    def drain(): Unit =
      BoundedStream.runForeachBatch(
        spark.readStream.schema(schema).parquet(s"$in/*.parquet"),
        curateStage, ckpt, outputMode = "append") { (batch, _) =>
        batch.write.partitionBy("split").mode("append").parquet(out)
      }

    docs(0 until 10).toDF("doc_id", "text")
      .write.parquet(s"$in/a.parquet")
    drain()
    val afterA = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(afterA == Set(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L)) // 4 and 9 fail quality

    docs(10 until 20).toDF("doc_id", "text")
      .write.parquet(s"$in/b.parquet")
    drain()

    val streamed = spark.read.parquet(out)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = curateStage(docs(0 until 20).toDF("doc_id", "text"))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
    // incremental: batch A's docs were NOT reprocessed (exactly one copy each)
    val counts = spark.read.parquet(out).groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(counts == 0, "checkpoint resume must not duplicate prior batches")
    // the export is physically partitioned by split
    val files = spark.read.parquet(out).select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.forall(_.contains("split=")), files.mkString(","))
  }
}
