package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.streaming.StreamingIndex

/** Streaming index maintenance beyond the q140/q141 oracle gates: the
  * bookkeeping claims — restart on a completed checkpoint ingests
  * nothing twice, per-trigger segments land one marker each.
  */
class StreamingIndexSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  test("ingestTextIndex: completed-run restart is a no-op; one marker per batch") {
    val root = java.nio.file.Files.createTempDirectory("graft-sidx").toString
    val base = Seq((0L, "spark hash window"), (2L, "hash join"))
      .toDF("doc_id", "text")
    TextAnalysis.buildTextIndex(base, "doc_id", "text", root, buckets = 8)
    val arrivals = Seq((1L, "spark window stream"), (3L, "window state"))
      .toDF("doc_id", "text")
    arrivals.repartition(2).write.parquet(s"$root/arrivals")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sidx-ck").toString
    def src = spark.readStream
      .schema(spark.read.parquet(s"$root/arrivals").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/arrivals")
    StreamingIndex.ingestTextIndex(spark, src, ckpt, root, "doc_id", "text", 8)
    // one marker per micro-batch (2 files, 1 per trigger)
    val markers = new java.io.File(s"$root/ingested").listFiles()
      .map(_.getName).sorted.toSeq
    assert(markers == Seq("batch=0", "batch=1"), markers.toString)
    val stats = spark.read.parquet(s"$root/stats")
      .agg(sum("n_docs"), sum("sum_dl")).collect()(0)
    assert(stats.getLong(0) == 4)
    // restart on the completed checkpoint: nothing replays, stats hold
    StreamingIndex.ingestTextIndex(spark, src, ckpt, root, "doc_id", "text", 8)
    val stats2 = spark.read.parquet(s"$root/stats")
      .agg(sum("n_docs"), sum("sum_dl")).collect()(0)
    assert(stats == stats2)
    // and the streamed docs are searchable
    val hits = TextAnalysis.searchTextIndex(spark, root,
      Seq("window"), buckets = 8, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(0L, 1L, 3L), hits.toString)
  }

  test("ingestIvfPqIndex: streamed codes searchable; restart a no-op") {
    import graft.operators.Similarity
    val root = java.nio.file.Files.createTempDirectory("graft-spq").toString
    val base = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)), (2L, Array(0.9f, 0.1f, 0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 1.0f)), (6L, Array(0.1f, 0.9f, 0.1f, 0.9f)),
    ).toDF("vec_id", "embedding")
    Similarity.buildIvfPqIndex(base, "vec_id", "embedding", root,
      m = 2, ksub = 4, ivfStep = 3, pqStep = 1)
    val arrivals = Seq(
      (1L, Array(0.95f, 0.05f, 0.95f, 0.05f)),
      (5L, Array(0.05f, 0.95f, 0.05f, 0.95f)),
    ).toDF("vec_id", "embedding")
    arrivals.repartition(2).write.parquet(s"$root/arrivals")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-spq-ck").toString
    def src = spark.readStream
      .schema(spark.read.parquet(s"$root/arrivals").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/arrivals")
    StreamingIndex.ingestIvfPqIndex(spark, src, ckpt, root,
      "vec_id", "embedding")
    val nPost = spark.read.parquet(s"$root/postings").count()
    assert(nPost == 6, nPost.toString) // 4 built + 2 streamed code words
    // restart on the completed checkpoint: nothing replays
    StreamingIndex.ingestIvfPqIndex(spark, src, ckpt, root,
      "vec_id", "embedding")
    assert(spark.read.parquet(s"$root/postings").count() == 6)
    // the streamed vector ranks for a same-cluster query
    val hits = Similarity.searchIvfPqIndex(spark, root,
        base.filter(col("vec_id") === 0), "vec_id", "embedding",
        k = 5, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hits.contains(1L), hits.toString)
  }

  test("ingestSnapshotDeltas: a half-written delta without its marker is dropped and rewritten on replay") {
    import graft.operators.Curation
    val root = java.nio.file.Files.createTempDirectory("graft-sdelta").toString
    val base = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    Curation.writeSnapshot(base, root, version = 1)
    val changes = Seq((1L, "b2", "u"), (2L, "", "d"))
      .toDF("doc_id", "text", "op")
    changes.coalesce(1).write.parquet(s"$root/arrivals")
    // simulate the crash window: the previous attempt wrote the UPSERTS
    // half of delta version=2 and died before deletes and marker — the
    // exact state the r13 advisory flagged as a permanent stream-kill
    // (writeSnapshotDelta is errorifexists) and a readSnapshotAt breaker
    Seq((1L, "stale-half-write")).toDF("doc_id", "text")
      .write.parquet(s"$root/_delta/version=2/upserts")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdelta-ck").toString
    val src = spark.readStream
      .schema(spark.read.parquet(s"$root/arrivals").schema)
      .parquet(s"$root/arrivals")
    // must NOT die on errorifexists: the partial dir is detected (no
    // marker) and replaced by the replayed batch
    StreamingIndex.ingestSnapshotDeltas(spark, src, ckpt, root,
      "doc_id", "op", startVersion = 2)
    val got = Curation.readSnapshotAt(spark, root, version = 2, idCol = "doc_id")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((0L, "a"), (1L, "b2")), got.toString)
  }
}
