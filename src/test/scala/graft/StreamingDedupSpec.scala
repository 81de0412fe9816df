package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Dedup, Multimodal}
import graft.streaming.{Stateful, StreamingMinHash, StreamingPHash}

/** Streaming exact dedup: first occurrence wins across micro-batches,
  * duplicate-tracking state bounded by the watermark. Streaming FUZZY
  * (MinHash) dedup: pair stream across micro-batches equals the batch
  * pipeline on the union of the batches.
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

  test("streaming perceptual pairs across micro-batches equal batch perceptualDups") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(Stateful.TransformWithStateConf._1)
    spark.conf.set(Stateful.TransformWithStateConf._1, Stateful.TransformWithStateConf._2)
    try {
      import org.apache.spark.sql.functions.col
      // seeded image hashes (real decode) with engineered dup clusters,
      // streamed in three micro-batches
      val ids = spark.range(0, 150).select(col("id").as("doc_id"))
      val hashes = Multimodal.imagePHash(
          Multimodal.syntheticImagesSeeded(spark, ids, seedMod = 47)).toDF()
        .as[(Long, Boolean, Long, Long)].collect().toSeq
      val batches = hashes.grouped((hashes.size + 2) / 3).toSeq
      val mem = MemoryStream[(Long, Boolean, Long, Long)]
      val q = StreamingPHash.dupPairs(
          mem.toDF().toDF("doc_id", "decoded", "hash_hi", "hash_lo"),
          maxHamming = 3)
        .writeStream.format("memory").queryName("sph").outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("sph-ckpt").toString)
        .start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      // RE-ARRIVAL: replay the first batch (at-least-once upstream) — the
      // per-bucket guard must make it a no-op, not a pair re-emission
      mem.addData(batches.head)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("sph").as[(Long, Long, Long)]
        .collect().toSeq.sorted
      val batch = Multimodal.perceptualDups(
          hashes.toDF("doc_id", "decoded", "hash_hi", "hash_lo"), maxHamming = 3)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(batch.nonEmpty, "seeded fixture should contain perceptual dups")
      assert(streamed == batch)
      assert(streamed.map(p => (p._1, p._2)).distinct.size == streamed.size)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Stateful.TransformWithStateConf._1, v)
        case None => spark.conf.unset(Stateful.TransformWithStateConf._1)
      }
    }
  }

  test("phash re-arrival: identical rows are no-ops, an updated hash is a new observation, never a self-pair") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(Stateful.TransformWithStateConf._1)
    spark.conf.set(Stateful.TransformWithStateConf._1, Stateful.TransformWithStateConf._2)
    try {
      val mem = MemoryStream[(Long, Boolean, Long, Long)]
      val q = StreamingPHash.dupPairs(
          mem.toDF().toDF("doc_id", "decoded", "hash_hi", "hash_lo"),
          maxHamming = 3)
        .writeStream.format("memory").queryName("sph_upd").outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("sphu-ckpt").toString)
        .start()
      val (h1hi, h1lo) = (0x12345678L, 0x0000ABCDL)
      mem.addData(Seq((1L, true, h1hi, h1lo), (2L, true, h1hi, h1lo)))
      q.processAllAvailable() // identical hashes -> pair (1,2,0)
      // CONTENT UPDATE: doc 1 re-arrives with bit 0 of the low half
      // flipped — a new observation, inserted in every bucket its bands
      // land in; vs doc 2's standing hash it is hamming 1
      mem.addData(Seq((1L, true, h1hi, h1lo ^ 1L)))
      q.processAllAvailable()
      // exact re-delivery of the updated observation: full-tuple guard
      // makes it a no-op
      mem.addData(Seq((1L, true, h1hi, h1lo ^ 1L)))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("sph_upd").as[(Long, Long, Long)]
        .collect().toSeq.sorted
      // no (1,1,·) self-pair from doc 1's two observations, no duplicate
      // emission from the replay
      assert(out == Seq((1L, 2L, 0L), (1L, 2L, 1L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Stateful.TransformWithStateConf._1, v)
        case None => spark.conf.unset(Stateful.TransformWithStateConf._1)
      }
    }
  }

  test("streaming minhash pairs across micro-batches equal the batch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(Stateful.TransformWithStateConf._1)
    spark.conf.set(Stateful.TransformWithStateConf._1, Stateful.TransformWithStateConf._2)
    try {
      // fixture documents (they contain engineered near-dups), split into
      // three micro-batches — pairs must surface regardless of whether the
      // two members arrive together or batches apart
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").as[(Long, String)].collect().toSeq
      val batches = docs.grouped((docs.size + 2) / 3).toSeq
      val mem = MemoryStream[(Long, String)]
      val q = StreamingMinHash.minHashPairs(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, k = 12, rowsPerBand = 3, threshold = 0.3)
        .writeStream.format("memory").queryName("smh").outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("smh-ckpt").toString)
        .start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table("smh").as[(Long, Long, Double)]
        .collect().toSeq.sorted
      val batch = Dedup.minHashDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, k = 12, rowsPerBand = 3, threshold = 0.3)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(batch.nonEmpty, "fixture should contain near-dups")
      assert(streamed == batch)
      // exactly-once: no pair emitted twice even when members share >1 band
      assert(streamed.map(p => (p._1, p._2)).distinct.size == streamed.size)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Stateful.TransformWithStateConf._1, v)
        case None => spark.conf.unset(Stateful.TransformWithStateConf._1)
      }
    }
  }
}
