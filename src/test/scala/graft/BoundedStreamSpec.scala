package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.streaming.BoundedStream

/** Streaming parity (SURVEY §2.8): the reference's bounded-stream semantics
  * — read to EOF, END marker, finalize — must produce results identical to
  * batch execution of the same pipeline, and a checkpointed job given new
  * input must fold it into existing state rather than recompute from zero.
  */
class BoundedStreamSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))

  private val wordcount: DataFrame => DataFrame =
    df => Relational.wordCount(df, "line")

  test("streaming wordcount over AvailableNow equals batch wordcount") {
    val in = tmpDir("graft-stream-in")
    writeLines(in, "a.txt", Seq("to be or not", "to be"))
    writeLines(in, "b.txt", Seq("be be", "or not or"))

    val batch = wordcount(spark.read.text(in).withColumnRenamed("value", "line"))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))

    val streamed = BoundedStream.runAvailableNow(
      spark, BoundedStream.textStream(spark, in), wordcount,
      tmpDir("graft-ckpt"), "wc_eq")
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))

    assert(streamed.toSeq == batch.toSeq && batch.nonEmpty)
  }

  test("streaming top-K equals batch top-K (rank-over-stream, complete mode)") {
    val in = tmpDir("graft-topk-in")
    writeLines(in, "a.txt", Seq("u1", "u2", "u1", "u3", "u1", "u2"))
    val topk: DataFrame => DataFrame =
      df => Relational.countPerKey(df, "line")
    // rank at the sink (complete-mode output re-ranked per drain), the
    // streaming-top-K pattern from SURVEY §7.5
    val streamed = Relational.topK(
      BoundedStream.runAvailableNow(
        spark, BoundedStream.textStream(spark, in), topk,
        tmpDir("graft-ckpt"), "topk_eq"),
      2, desc = "cnt", tieBreak = "line")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(streamed.toSeq == Seq(("u1", 3L), ("u2", 2L)))
  }

  test("checkpoint restart: new files fold into prior state, not recomputed from zero") {
    val in = tmpDir("graft-restart-in")
    val ckpt = tmpDir("graft-restart-ckpt")
    writeLines(in, "a.txt", Seq("x y", "x"))

    val first = BoundedStream.runAvailableNow(
      spark, BoundedStream.textStream(spark, in), wordcount, ckpt, "wc_r1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(first == Map("x" -> 2L, "y" -> 1L))

    // "kill" = query terminated above; new data arrives; restart on the SAME
    // checkpoint — offsets say a.txt is done, so only b.txt is read, and the
    // state store carries the old counts forward.
    writeLines(in, "b.txt", Seq("y z"))
    val second = BoundedStream.runAvailableNow(
      spark, BoundedStream.textStream(spark, in), wordcount, ckpt, "wc_r2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(second == Map("x" -> 2L, "y" -> 2L, "z" -> 1L))

    // equivalence with a from-scratch batch over everything (END semantics)
    val batch = wordcount(spark.read.text(in).withColumnRenamed("value", "line"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(second == batch)
  }

  test("parquet-sink drain equals the memory-sink form and batch (scale path)") {
    val in = tmpDir("graft-pq-in")
    writeLines(in, "a.txt", Seq("to be or not", "to be"))
    writeLines(in, "b.txt", Seq("be be", "or not or"))
    val batch = wordcount(spark.read.text(in).withColumnRenamed("value", "line"))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    val viaParquet = BoundedStream.runAvailableNowToParquet(
      spark, BoundedStream.textStream(spark, in), wordcount,
      tmpDir("graft-pq-ckpt"), tmpDir("graft-pq-out"))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaParquet.toSeq == batch.toSeq && batch.nonEmpty)
  }

  test("foreachBatch adapts a batch sink to the bounded stream") {
    val in = tmpDir("graft-feb-in")
    writeLines(in, "a.txt", Seq("k k j"))
    var seen: Map[String, Long] = Map.empty
    BoundedStream.runForeachBatch(
      BoundedStream.textStream(spark, in), wordcount,
      tmpDir("graft-feb-ckpt"), "complete") { (df, _) =>
      seen = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    assert(seen == Map("k" -> 2L, "j" -> 1L))
  }

  test("append-mode parquet drain: multi-batch union, batch partitions, replay-idempotent layout") {
    import org.apache.spark.sql.DataFrame
    val in = tmpDir("graft-ap-in")
    writeLines(in, "a.txt", Seq("x", "y"))
    writeLines(in, "b.txt", Seq("z"))
    val out = tmpDir("graft-ap-out")
    val ckpt = tmpDir("graft-ap-ckpt")
    val ident = (df: DataFrame) => df.select(col("line"))
    // one file per trigger -> two micro-batches, each landing in its own
    // graft_batch_id=<id> partition (the idempotent-replay unit)
    val drained = BoundedStream.runAvailableNowToParquet(spark,
      BoundedStream.textStream(spark, in, maxFilesPerTrigger = Some(1)),
      ident, ckpt, out, outputMode = "append")
    assert(drained.collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y", "z"))
    assert(!drained.columns.contains("graft_batch_id")) // key column dropped
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("graft_batch_id=")).map(_.getName).sorted
    assert(parts.length == 2, parts.toSeq)
    // draining AGAIN on the same checkpoint (a completed-run restart —
    // every batch already committed) must not duplicate any row
    val again = BoundedStream.runAvailableNowToParquet(spark,
      BoundedStream.textStream(spark, in, maxFilesPerTrigger = Some(1)),
      ident, ckpt, out, outputMode = "append")
    assert(again.collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y", "z"))
  }
}
