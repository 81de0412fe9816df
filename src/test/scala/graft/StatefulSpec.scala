package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Stateful

/** mapGroupsWithState: per-key state folds across micro-batches and
  * survives in the checkpointed store — the reference's terminal-bolt merge
  * (`bolt/bolt.go:566-583`) without the mutex or the data loss.
  */
class StatefulSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  test("running counts fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Stateful.runningCounts(mem.toDS())
      .writeStream.format("memory").queryName("rc")
      .outputMode(Stateful.RunningCountsMode)
      .option("checkpointLocation", Files.createTempDirectory("rc-ckpt").toString)
      .start()

    mem.addData(("a", 2L), ("b", 1L))
    q.processAllAvailable()
    val after1 = spark.table("rc").as[(String, Long)].collect().toMap
    assert(after1 == Map("a" -> 2L, "b" -> 1L))

    // second batch folds into existing state, not recomputed from zero
    mem.addData(("a", 3L), ("c", 5L))
    q.processAllAvailable()
    q.stop()
    // update mode appends one row per updated key per batch; the LAST row
    // per key is its latest running total
    val rows = spark.table("rc").as[(String, Long)].collect()
    val latest = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
    assert(latest == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
  }

  test("transformWithState running counts fold across micro-batches (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(Stateful.TransformWithStateConf._1)
    spark.conf.set(Stateful.TransformWithStateConf._1, Stateful.TransformWithStateConf._2)
    try {
      val mem = MemoryStream[(String, Long)]
      val q = Stateful.runningCountsTWS(mem.toDS())
        .writeStream.format("memory").queryName("rc_tws")
        .outputMode(Stateful.RunningCountsMode)
        .option("checkpointLocation", Files.createTempDirectory("rctws-ckpt").toString)
        .start()
      mem.addData(("a", 2L), ("b", 1L))
      q.processAllAvailable()
      assert(spark.table("rc_tws").as[(String, Long)].collect().toMap ==
        Map("a" -> 2L, "b" -> 1L))
      mem.addData(("a", 3L), ("c", 5L))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("rc_tws").as[(String, Long)].collect()
      val latest = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
      assert(latest == Map("a" -> 5L, "b" -> 1L, "c" -> 5L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Stateful.TransformWithStateConf._1, v)
        case None => spark.conf.unset(Stateful.TransformWithStateConf._1)
      }
    }
  }

  test("running counts work on a batch Dataset too (single fold)") {
    val out = Stateful.runningCounts(
      Seq(("x", 1L), ("x", 4L), ("y", 2L)).toDS())
      .collect().toMap
    assert(out == Map("x" -> 5L, "y" -> 2L))
  }
}
