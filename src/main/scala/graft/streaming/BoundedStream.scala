package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Bounded-stream execution (SURVEY §2.8): the reference's core model is a
  * file replayed tuple-at-a-time until EOF, then an `END` marker that tells
  * the terminal operator to finalize (`spout/spout.go:205-210`,
  * `bolt/bolt.go:268-294`). The Spark-native equivalent is Structured
  * Streaming with `Trigger.AvailableNow`: drain everything available, commit
  * the final state, terminate — same "run to EOF then finish" semantics, but
  * with checkpointed offsets/state, so a killed job resumes where it stopped
  * instead of the reference's restart-from-zero failure story
  * (`Nimbus.go:280-297`).
  *
  * Any batch `DataFrame => DataFrame` pipeline built from the operator
  * library runs here unchanged — the streaming≡batch equivalence the
  * reference asserts informally ("results always correct after restart") is
  * a tested property (BoundedStreamSpec).
  */
object BoundedStream {

  /** Unbounded text-line source over a directory (S1 as a stream).
    *
    * `maxFilesPerTrigger` is the admission-control knob (S6): the reference
    * rate-limits by sleeping 100µs per tuple (`spout/spout.go:294`); the
    * Spark-native form caps how much input each micro-batch admits, which
    * bounds batch latency and state-growth rate instead of throughput.
    */
  def textStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.text(dir).withColumnRenamed("value", "line")
  }

  /** Run `transform` over a streaming frame to completion of all currently
    * available input (the END-marker analog), collecting results in an
    * in-memory table. Aggregating pipelines use "complete" mode — the
    * terminal-bolt semantics (final state emitted once, at END).
    *
    * GATE/TEST HARNESS ONLY: a complete-mode MEMORY sink materializes the
    * full result table on the driver EVERY micro-batch — fine for the
    * correctness gate's bounded vocabulary, wrong for production. The
    * scale path is [[runAvailableNowToParquet]] (or [[runForeachBatch]]
    * with a real sink): results land distributed, the driver holds
    * nothing.
    *
    * The checkpoint carries source offsets + operator state: re-invoking
    * with the same checkpoint after new files arrive processes ONLY the new
    * files and folds them into the existing state — the fault-tolerance
    * upgrade over the reference's drop-and-restart.
    */
  def runAvailableNow(spark: SparkSession, source: DataFrame,
                      transform: DataFrame => DataFrame,
                      checkpoint: String, queryName: String,
                      outputMode: String = "complete"): DataFrame = {
    val q = transform(source).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** The SCALE form of [[runAvailableNow]]: drain to EOF with the result
    * written to parquet — each batch's rows land distributed across
    * executors, and the returned frame re-reads the files, so the driver
    * never materializes the result. Complete-mode aggregates OVERWRITE
    * the directory (each batch is the whole state; the last overwrite is
    * the final answer). Append-mode streams write each delta into its own
    * `batch=<id>` partition, OVERWRITING it — foreachBatch is
    * at-least-once, so a replayed batchId must land idempotently (a plain
    * directory append would double its rows on replay); the returned
    * frame drops the partition key. Same checkpoint-resume semantics as
    * the memory-sink form; a resumed append run must keep its outDir.
    */
  def runAvailableNowToParquet(spark: SparkSession, source: DataFrame,
                               transform: DataFrame => DataFrame,
                               checkpoint: String, outDir: String,
                               outputMode: String = "complete"): DataFrame = {
    if (outputMode == "append") {
      // foreachBatch is AT-LEAST-once: a crash after the write but before
      // the checkpoint commit replays the batchId on restart. A plain
      // append would then double its rows — so each batch OVERWRITES its
      // own batchId-keyed partition directory (idempotent replay: the
      // rewrite is byte-identical), and the read drops the key column.
      // The partition key is a reserved graft-prefixed name so it cannot
      // collide with a transform output column (a plain `batch=` key would
      // silently shadow-and-drop a real `batch` column on the read-back).
      // NOT underscore-prefixed: Spark's file index treats leading-`_`
      // paths as hidden, so a `__x=<id>` partition dir would be invisible
      // to the read. The require is belt-and-braces for the prefixed name.
      runForeachBatch(source, transform, checkpoint, outputMode) { (batch, id) =>
        require(!batch.columns.contains("graft_batch_id"),
          "transform output must not contain the reserved graft_batch_id column")
        batch.write.mode("overwrite").parquet(s"$outDir/graft_batch_id=$id")
      }
      spark.read.parquet(outDir).drop("graft_batch_id")
    } else {
      // complete mode: each batch is the whole state; the final overwrite
      // is the answer, and replaying it rewrites the same state.
      runForeachBatch(source, transform, checkpoint, outputMode) { (batch, _) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      spark.read.parquet(outDir)
    }
  }

  /** Same drain-to-EOF execution, but delivering each micro-batch to a
    * caller-supplied sink function (`foreachBatch`) — the hook that adapts
    * any batch sink (graft.sinks.*) to streaming without a custom
    * StreamingWrite implementation.
    */
  def runForeachBatch(source: DataFrame, transform: DataFrame => DataFrame,
                      checkpoint: String, outputMode: String)
                     (sink: (DataFrame, Long) => Unit): Unit = {
    val q = transform(source).writeStream
      .foreachBatch(sink)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
