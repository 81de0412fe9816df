package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, IndexSync, Similarity, StoreFs, TextAnalysis}

/** CDC-driven index freshness ([[graft.operators.IndexSync]]): the
  * rebuild-equivalence half is oracle-gated (q236 hash-equals the
  * from-scratch BM25 oracle over the reconstruction); these tests pin
  * the pieces a fixture-parquet oracle can't — the cross-sync re-birth
  * (the tombstone-shadow hazard), the range discipline (noop / gap
  * refusal), and the crash markers (pending refusal + abandon).
  */
class IndexSyncSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  // distinctive per-doc terms so search results identify membership
  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def hits(idx: String, term: String): Set[Long] =
    TextAnalysis.searchTextIndex(spark, idx, Seq(term), k = 50,
      buckets = 4).collect().map(_.getAs[Long]("doc_id")).toSet

  private val v1 = docs(
    1L -> "alpha common", 2L -> "bravo common", 3L -> "charlie common",
    4L -> "delta common", 5L -> "echo common")

  test("one sync applies a multi-delta range and equals the from-scratch build") {
    val store = tmp("graft-sync-store")
    val idx = tmp("graft-sync-idx")
    Curation.writeSnapshot(v1, store, version = 1)
    // v2: change 2, remove 4, add 6
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = docs(2L -> "bravo revised common", 6L -> "foxtrot common"),
      deleteIds = Seq(4L).toDF("doc_id"), idCol = "doc_id")
    // v3: change 6 again, remove 5
    Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = docs(6L -> "foxtrot final common"),
      deleteIds = Seq(5L).toDF("doc_id"), idCol = "doc_id")
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 1, "doc_id"),
      "doc_id", "text", idx, buckets = 4)
    val r = IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      oldVersion = 1, newVersion = 3, idCol = "doc_id", textCol = "text",
      buckets = 4).collect().head
    assert(r.getAs[String]("action") == "applied")
    assert(r.getAs[Long]("n_added") == 1L)    // 6
    assert(r.getAs[Long]("n_changed") == 1L)  // 2
    assert(r.getAs[Long]("n_removed") == 2L)  // 4, 5
    assert(r.getAs[Boolean]("compacted"))     // 2's re-append forced a drain
    assert(IndexSync.appliedVersion(spark, idx).contains(3L))
    // membership through search: survivors 1,2,3,6; 2 and 6 on NEW text
    assert(hits(idx, "common") == Set(1L, 2L, 3L, 6L))
    assert(hits(idx, "revised") == Set(2L))
    assert(hits(idx, "final") == Set(6L))
    assert(hits(idx, "foxtrot") == Set(6L))
    // full equivalence vs a from-scratch build at v3 (same scores)
    val fresh = tmp("graft-sync-fresh")
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 3, "doc_id"),
      "doc_id", "text", fresh, buckets = 4)
    val a = TextAnalysis.searchTextIndex(spark, idx, Seq("common"), k = 50,
      buckets = 4).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = TextAnalysis.searchTextIndex(spark, fresh, Seq("common"), k = 50,
      buckets = 4).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("cross-sync re-birth: a doc deleted by one sync and re-added by the next is served with its NEW content") {
    val store = tmp("graft-rebirth-store")
    val idx = tmp("graft-rebirth-idx")
    Curation.writeSnapshot(v1, store, version = 1)
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      deleteIds = Seq(3L).toDF("doc_id"), idCol = "doc_id")
    Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = docs(3L -> "charlie reborn common"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 1, "doc_id"),
      "doc_id", "text", idx, buckets = 4)
    val r1 = IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      1, 2, "doc_id", "text", buckets = 4).collect().head
    assert(r1.getAs[Long]("n_removed") == 1L)
    assert(!r1.getAs[Boolean]("compacted")) // pure delete: tombstone is enough
    assert(!hits(idx, "common").contains(3L))
    // the re-add arrives while 3's tombstone is live — without the drain,
    // the search anti-join would shadow the NEW postings
    val r2 = IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      2, 3, "doc_id", "text", buckets = 4).collect().head
    assert(r2.getAs[String]("action") == "applied")
    assert(r2.getAs[Long]("n_added") == 1L)
    assert(r2.getAs[Boolean]("compacted"))
    assert(hits(idx, "reborn") == Set(3L))
    assert(hits(idx, "common") == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("range discipline: replay is a noop, a gap or overlap is refused") {
    val store = tmp("graft-range-store")
    val idx = tmp("graft-range-idx")
    Curation.writeSnapshot(v1, store, version = 1)
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = docs(2L -> "bravo revised common"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = docs(1L -> "alpha revised common"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 1, "doc_id"),
      "doc_id", "text", idx, buckets = 4)
    assert(IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      1, 2, "doc_id", "text", buckets = 4)
      .collect().head.getAs[String]("action") == "applied")
    // replayed range: clean noop (the scheduled-job re-fire)
    val noop = IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      1, 2, "doc_id", "text", buckets = 4).collect().head
    assert(noop.getAs[String]("action") == "noop")
    assert(IndexSync.appliedVersion(spark, idx).contains(2L))
    // overlapping range (1,3] after (1,2]: a doc changed in v2 and
    // changed BACK in v3 would diff(1,3) as unchanged and be skipped —
    // refused, not silently diverged
    val e = intercept[IllegalArgumentException] {
      IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
        1, 3, "doc_id", "text", buckets = 4)
    }
    assert(e.getMessage.contains("does not start at"))
    // the correct next range applies
    assert(IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      2, 3, "doc_id", "text", buckets = 4)
      .collect().head.getAs[String]("action") == "applied")
    assert(hits(idx, "revised") == Set(1L, 2L))
  }

  test("crash markers: a pending sync refuses until abandoned; abandon records the rebuild version") {
    val store = tmp("graft-crash-store")
    val idx = tmp("graft-crash-idx")
    Curation.writeSnapshot(v1, store, version = 1)
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = docs(2L -> "bravo revised common"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 1, "doc_id"),
      "doc_id", "text", idx, buckets = 4)
    // a crashed sync left its pending marker
    StoreFs.writeFile(spark, s"$idx/_sync/pending", "1\t2")
    val e = intercept[IllegalStateException] {
      IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
        1, 2, "doc_id", "text", buckets = 4)
    }
    assert(e.getMessage.contains("PENDING"))
    // observability: the status TVF names the crashed range
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    val st = spark.sql(s"SELECT * FROM graft_sync_status('$idx')")
      .collect().head
    assert(st.getAs[Boolean]("pending"))
    assert(st.isNullAt(st.fieldIndex("applied_version")))
    assert(st.getAs[Long]("pending_old") == 1L &&
      st.getAs[Long]("pending_new") == 2L)
    // operator rebuilds at v2 and abandons the marker
    StoreFs.deleteContents(spark, idx)
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 2, "doc_id"),
      "doc_id", "text", idx, buckets = 4)
    IndexSync.abandonSync(spark, idx, rebuiltAtVersion = 2)
    assert(IndexSync.appliedVersion(spark, idx).contains(2L))
    assert(!StoreFs.exists(spark, s"$idx/_sync/pending"))
    val st2 = spark.sql(s"SELECT * FROM graft_sync_status('$idx')")
      .collect().head
    assert(!st2.getAs[Boolean]("pending"))
    assert(st2.getAs[Long]("applied_version") == 2L)
    // and the next range syncs normally
    Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = docs(6L -> "foxtrot common"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    assert(IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      2, 3, "doc_id", "text", buckets = 4)
      .collect().head.getAs[String]("action") == "applied")
    assert(hits(idx, "foxtrot") == Set(6L))
  }

  // one-hot direction per id (id % 3) + a small id-proportional tail, so
  // "which centroid a vector matches" is controlled by the test
  private def vecs(ids: Long*): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      val v = Array.fill(4)(0.0); v((i % 3).toInt) = 1.0; v(3) = 0.001 * i
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")

  private def oneHot(d: Int): Seq[Double] = {
    val v = Array.fill(4)(0.0); v(d) = 1.0; v.toSeq
  }

  private def neighbors(idx: String, dir: Int, k: Int): Set[Long] =
    Similarity.searchIvfIndex(spark, idx,
        Seq((999L, oneHot(dir))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = k, nprobe = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet

  test("IVF sync: changed vectors re-assign to their new cells, re-birth served after the drain") {
    val store = tmp("graft-ivf-sync-store")
    val idx = tmp("graft-ivf-sync-idx")
    // ids 0..8: directions 0,1,2,0,1,2,0,1,2
    Curation.writeSnapshot(vecs(0L to 8L: _*), store, version = 1)
    // v2: id 4 deleted (delete-only — the tombstone stays live, no drain)
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = spark.emptyDataset[(Long, Seq[Double])]
        .toDF("vec_id", "embedding"),
      deleteIds = Seq(4L).toDF("vec_id"), idCol = "vec_id")
    // v3: id 3 flips direction 0 -> 2 (changed), id 9 arrives (dir 1),
    // id 4 reborn on direction 0 — the re-adds meet 4's LIVE tombstone
    Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = Seq(
          (3L, { val v = Array.fill(4)(0.0); v(2) = 1.0; v(3) = 0.003; v.toSeq }),
          (9L, { val v = Array.fill(4)(0.0); v(1) = 1.0; v(3) = 0.009; v.toSeq }),
          (4L, { val v = Array.fill(4)(0.0); v(0) = 1.0; v(3) = 0.004; v.toSeq }))
        .toDF("vec_id", "embedding"),
      deleteIds = spark.emptyDataset[Long].toDF("vec_id"), idCol = "vec_id")
    Similarity.buildIvfIndex(
      Curation.readSnapshotAt(spark, store, 1, "vec_id"),
      "vec_id", "embedding", idx, centStep = 3)
    val r1 = IndexSync.syncIvfIndexFromSnapshots(spark, idx, store,
      1, 2, "vec_id", "embedding").collect().head
    assert(r1.getAs[String]("action") == "applied")
    assert(r1.getAs[Long]("n_removed") == 1L)  // 4
    assert(!r1.getAs[Boolean]("compacted"))    // pure delete: tombstone only
    // membership after sync1 (all 3 cells probed, so k=20 = full live set)
    assert(neighbors(idx, 0, k = 20) ==
      Set(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L))
    // sync2: 3 changed (its own delete shadows it), 4 reborn against its
    // LIVE v2 tombstone, 9 added — ONE drain serves all of them
    val r2 = IndexSync.syncIvfIndexFromSnapshots(spark, idx, store,
      2, 3, "vec_id", "embedding").collect().head
    assert(r2.getAs[Long]("n_added") == 2L)    // 4, 9
    assert(r2.getAs[Long]("n_changed") == 1L)  // 3
    assert(r2.getAs[Boolean]("compacted"))
    assert(neighbors(idx, 0, k = 20) ==
      Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))
    // 3's content moved to direction 2: it ranks in dir-2's top-3
    // (tails .002/.003/.005 — ids 2, 3, 5) and is OUT of dir-0's top-3
    // ({0, 4, 6}; a stale dir-0 posting for 3 would rank cos≈1 and flip
    // this — the re-assignment proof); reborn 4 (tail .004) slots
    // between 0 and 6
    assert(neighbors(idx, 2, k = 3) == Set(2L, 3L, 5L))
    assert(neighbors(idx, 0, k = 3) == Set(0L, 4L, 6L))
    assert(IndexSync.appliedVersion(spark, idx).contains(3L))
  }

  test("IVF-PQ sync: the compressed store follows the same snapshot chain") {
    val store = tmp("graft-pq-sync-store")
    val idx = tmp("graft-pq-sync-idx")
    Curation.writeSnapshot(vecs(0L to 11L: _*), store, version = 1)
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = Seq(
          (12L, { val v = Array.fill(4)(0.0); v(1) = 1.0; v(3) = 0.012; v.toSeq }))
        .toDF("vec_id", "embedding"),
      deleteIds = Seq(7L).toDF("vec_id"), idCol = "vec_id")
    Similarity.buildIvfPqIndex(
      Curation.readSnapshotAt(spark, store, 1, "vec_id"),
      "vec_id", "embedding", idx, m = 2, ksub = 4, ivfStep = 4, pqStep = 3)
    val r = IndexSync.syncIvfPqIndexFromSnapshots(spark, idx, store,
      1, 2, "vec_id", "embedding").collect().head
    assert(r.getAs[String]("action") == "applied")
    assert(r.getAs[Long]("n_added") == 1L)
    assert(r.getAs[Long]("n_removed") == 1L)
    assert(!r.getAs[Boolean]("compacted")) // no shadowed re-append
    val got = Similarity.searchIvfPqIndex(spark, idx,
        Seq((999L, oneHot(1))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 12, nprobe = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(got.contains(12L) && !got.contains(7L))
  }

  test("empty range: zero churn applies cleanly and advances the marker") {
    val store = tmp("graft-empty-store")
    val idx = tmp("graft-empty-idx")
    Curation.writeSnapshot(v1, store, version = 1)
    Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    TextAnalysis.buildTextIndex(
      Curation.readSnapshotAt(spark, store, 1, "doc_id"),
      "doc_id", "text", idx, buckets = 4)
    val r = IndexSync.syncTextIndexFromSnapshots(spark, idx, store,
      1, 2, "doc_id", "text", buckets = 4).collect().head
    assert(r.getAs[String]("action") == "applied")
    assert(r.getAs[Long]("n_added") + r.getAs[Long]("n_changed") +
      r.getAs[Long]("n_removed") == 0L)
    assert(IndexSync.appliedVersion(spark, idx).contains(2L))
    assert(hits(idx, "common") == Set(1L, 2L, 3L, 4L, 5L))
  }
}
