package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** The end-to-end curation pipeline: each stage's effect is visible in a
  * hand-built corpus (quality drop, dedup keep-min-id, per-source cap,
  * split attach), and the yield accounting matches the curated frame.
  */
class CurationSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog again today"
  private val corpus = (
    Seq((0L, good, "s1"), (1L, good, "s1"), (2L, good, "s1"),  // dups: keep 0
        (3L, "too short", "s1"))                               // quality drop
      ++ (10L until 30L).map(i => (i, s"$good unique marker token number$i", "s2"))
  ).toDF("doc_id", "text", "source")

  test("curate: drops low-quality, keeps min id per content, caps per source") {
    val out = Curation.curate(corpus, "doc_id", "text", "source",
      maxPerGroup = 5, minTokens = 5)
    val rows = out.select("doc_id", "source", "split").collect()
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.contains(0L) && !ids.contains(1L) && !ids.contains(2L)) // dedup keeps min id
    assert(!ids.contains(3L))                                          // quality gate
    val bySource = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource("s1") == 1 && bySource("s2") == 5, bySource.toString)
    assert(rows.forall(r => Set("train", "val", "test")(r.getString(2))))
    // n_tokens column carries the quality pass's count
    val n = out.filter(col("doc_id") === 0L).select("n_tokens").collect()(0).getLong(0)
    assert(n == 11, n.toString)
  }

  test("packingSweep: hand-computed ceil-division packing cost per seq_len") {
    // s1: 7 + 3 = 10 tokens; s2: 5 tokens
    val docs = Seq(
      (1L, "a b c d e f g", "s1"), (2L, "h i j", "s1"),
      (3L, "k l m n o", "s2")).toDF("doc_id", "text", "source")
    val out = Curation.packingSweep(docs, "doc_id", "text", "source",
        Seq(4, 8, 16))
      .orderBy("seq_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // L=4: s1 ceil(10/4)=3, s2 ceil(5/4)=2 → 5 seqs, pad 20-15=5, ppm 5e6/20
    // L=8: s1 2, s2 1 → 3 seqs, pad 24-15=9; L=16: 1+1 → pad 32-15=17
    assert(out.toSeq == Seq(
      (4L, 5L, 15L, 5L, 250000L),
      (8L, 3L, 15L, 9L, 375000L),
      (16L, 2L, 15L, 17L, 531250L)))
    // agrees with actually running the packer: max seq index + 1 per group
    val packed = Curation.packSequences(docs, "doc_id", "text", "source", seqLen = 4)
    val nSeqs = packed.groupBy("source")
      .agg(max("seq_last").as("m")).collect()
      .map(r => r.getLong(1) + 1).sum
    assert(nSeqs == 5L)
  }

  test("curate is deterministic under repartitioning") {
    val a = Curation.curate(corpus, "doc_id", "text", "source", 5, minTokens = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.curate(corpus.repartition(13), "doc_id", "text", "source",
        5, minTokens = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("curateIncremental: quota is the remainder, base dups rejected, append-only") {
    val base = Curation.curate(corpus, "doc_id", "text", "source",
      maxPerGroup = 5, minTokens = 5)
    // batch: one dup of a base doc, one within-batch dup pair, fresh docs
    val batch = (
      Seq((100L, good, "s1"),                                   // dup of base doc 0
          (101L, s"$good batch pair", "s1"), (102L, s"$good batch pair", "s1"),
          (103L, "too short", "s1"))                            // quality drop
        ++ (110L until 130L).map(i => (i, s"$good fresh token number$i", "s2"))
    ).toDF("doc_id", "text", "source")
    val inc = Curation.curateIncremental(base, batch, "doc_id", "text",
      "source", maxPerGroup = 8, minTokens = 5)
    val ids = inc.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(100L), "base duplicate must be rejected")
    assert(ids.contains(101L) && !ids.contains(102L), "within-batch dedup keeps min id")
    assert(!ids.contains(103L), "quality gate applies to the batch")
    // s1 base has 1 member → quota 7 but only 1 fresh candidate; s2 base
    // has 5 members → quota 3 of the 20 fresh candidates
    val bySource = inc.select("source").collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(bySource("s1") == 1 && bySource("s2") == 3, bySource.toString)
    // append-only union: no fingerprint dup, group sizes ≤ maxPerGroup
    val union = base.select("doc_id", "text", "source")
      .unionAll(inc.select("doc_id", "text", "source"))
    assert(union.groupBy(graft.operators.TextAnalysis.fingerprint(col("text")))
      .count().filter(col("count") > 1).count() == 0)
    assert(union.groupBy("source").count()
      .filter(col("count") > 8).count() == 0)
    // splits are the same pure per-id function as the base load's
    val sp = inc.filter(col("doc_id") === 101L).select("split")
    val full = Curation.curate(batch.filter(col("doc_id") === 101L),
      "doc_id", "text", "source", 8, minTokens = 5).select("split")
    assert(sp.collect().head.getString(0) == full.collect().head.getString(0))
  }

  test("curateIncremental is deterministic under repartitioning") {
    val base = Curation.curate(corpus, "doc_id", "text", "source", 5, minTokens = 5)
    val batch = (110L until 130L).map(i =>
      (i, s"$good fresh token number$i", "s2")).toDF("doc_id", "text", "source")
    def ids(b: org.apache.spark.sql.DataFrame, ba: org.apache.spark.sql.DataFrame) =
      Curation.curateIncremental(b, ba, "doc_id", "text", "source", 8, minTokens = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(base, batch) == ids(base.repartition(7), batch.repartition(13)))
  }

  test("packSequences: placements follow the running total, straddling allowed") {
    // tokens: 3, 4, 5 in one group at seqLen=4 → cums 3,7,12
    val docs = Seq(
      (1L, "a b c", "g"),          // cum 3: seq 0, offset 0..2
      (2L, "d e f g", "g"),        // cum 7: starts at 3 (seq 0), ends at 6 (seq 1)
      (3L, "h i j k l", "g"),      // cum 12: starts at 7 (seq 1), ends at 11 (seq 2)
      (4L, "", "g"),               // zero tokens → dropped
    ).toDF("doc_id", "text", "source")
    val out = Curation.packSequences(docs, "doc_id", "text", "source", seqLen = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 4L, 0L, 1L, 3L),
      (3L, 5L, 1L, 2L, 3L),
    ))
  }

  test("packSequences: groups pack independently and restart at sequence 0") {
    val docs = Seq((1L, "a b", "g1"), (2L, "c d", "g2")).toDF("doc_id", "text", "source")
    val out = Curation.packSequences(docs, "doc_id", "text", "source", seqLen = 8)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(5)))
    assert(out.toSet == Set(("g1", 0L, 0L), ("g2", 0L, 0L)))
  }

  test("packSequences conserves tokens and places docs contiguously") {
    val rnd = new scala.util.Random(5)
    val docs = (0L until 200L)
      .map(i => (i, ("tok " * (rnd.nextInt(40) + 1)).trim, s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val out = Curation.packSequences(docs, "doc_id", "text", "source", seqLen = 32)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.foreach { case (_, n, first, last, off) =>
        // each doc starts exactly where the previous one ended
        assert(first == cum / 32 && off == cum % 32)
        cum += n
        assert(last == (cum - 1) / 32)
      }
    }
  }

  test("packSequences is deterministic under repartitioning") {
    val docs = (0L until 50L).map(i => (i, ("tok " * (i % 7 + 1).toInt).trim, s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = Curation.packSequences(docs, "doc_id", "text", "source", 16)
      .orderBy("source", "doc_id").collect().toSeq
    val b = Curation.packSequences(docs.repartition(11), "doc_id", "text", "source", 16)
      .orderBy("source", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("thresholdSweep: exact counts, monotone, zero-survivor rows present") {
    val docs = Seq((0L, "a b c"), (1L, "a a a a"), (2L, "x y z w v"))
      .toDF("doc_id", "text")
    // score = doc_id/10 (0.0, 0.1, 0.2): hand-checkable survivors
    val out = Curation.thresholdSweep(docs, "text",
        col("doc_id").cast("double") / 10.0, Seq(0.0, 0.15, 5.0))
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0.0, 3L, 12L),   // all docs, 3+4+5 tokens
      (0.15, 1L, 5L),   // only doc 2
      (5.0, 0L, 0L)))   // nobody — but the curve point still exists
    // shares are exact integer ppm (never round(double) — the q7
    // cross-engine half-boundary hazard): 1/3 of docs → 333333 exactly
    val ppm = Curation.thresholdSweep(docs, "text",
        col("doc_id").cast("double") / 10.0, Seq(0.0, 0.15, 5.0))
      .orderBy("threshold").collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(ppm.toSeq == Seq(
      (1000000L, 1000000L),
      (333333L, 416666L),   // 1/3 docs, 5/12 tokens — floor division
      (0L, 0L)))
  }

  test("snapshot store: versioned put/get-versions round trip, immutability, partition pruning") {
    val root = java.nio.file.Files.createTempDirectory("graft-snapspec").toFile
    try {
      val v0 = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
      val v1 = Seq((2L, "two"), (3L, "three")).toDF("doc_id", "text")
      val v2 = Seq((3L, "three"), (4L, "four")).toDF("doc_id", "text")
      Curation.writeSnapshot(v0, root.getPath, 0L)
      Curation.writeSnapshot(v1, root.getPath, 1L)
      Curation.writeSnapshot(v2, root.getPath, 2L)
      assert(Curation.snapshotVersions(root.getPath) == Seq(0L, 1L, 2L))
      // a version is immutable: re-putting it fails like the reference's
      // counter (every put gets a NEW version)
      intercept[Exception] { Curation.writeSnapshot(v0, root.getPath, 1L) }
      // get-versions 2 = versions 1 and 2 only
      val last2 = Curation.readSnapshots(spark, root.getPath, lastN = 2)
      val got = last2.collect()
        .map(r => (r.getAs[Long]("version"), r.getAs[Long]("doc_id"))).toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L)))
      // the version predicate must reach the scan as a PARTITION filter
      // (pruned directory listing — cost ∝ versions requested, not
      // history length), not a post-scan row filter
      val plan = last2.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") &&
        """PartitionFilters: \[[^\]]*version""".r.findFirstIn(plan).isDefined,
        plan)
      // pairwise audit between stored versions
      val diff = Curation.diffSnapshots(spark, root.getPath, 1L, 2L,
          "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(diff == Map(2L -> "removed", 3L -> "unchanged", 4L -> "added"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(root)
    }
  }

  test("diffSnapshotsAt: churn-scoped diff over deltas, full-compare fallback across a full rewrite") {
    val root = java.nio.file.Files.createTempDirectory("graft-snapdiff").toFile
    try {
      // v1 full: ids 1-6. v2 delta: edit 2, delete 3, delete 9 (absent —
      // must emit nothing), re-write 4 with IDENTICAL text (unchanged —
      // must emit nothing). v3 delta: add 7, re-birth 3.
      Curation.writeSnapshot(
        (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text"),
        root.getPath, 1L)
      Curation.writeSnapshotDelta(spark, root.getPath, 2L,
        upserts = Seq((2L, "doc 2 edited"), (4L, "doc 4"))
          .toDF("doc_id", "text"),
        deleteIds = Seq(3L, 9L).toDF("doc_id"), idCol = "doc_id")
      Curation.writeSnapshotDelta(spark, root.getPath, 3L,
        upserts = Seq((7L, "doc 7"), (3L, "doc 3 reborn"))
          .toDF("doc_id", "text"),
        deleteIds = spark.range(0).select(col("id").as("doc_id")),
        idCol = "doc_id")
      def diffMap(o: Long, n: Long) =
        Curation.diffSnapshotsAt(spark, root.getPath, o, n, "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // v1 -> v2: only the delta's REAL changes; the no-op upsert of 4
      // and the delete of absent 9 are silent
      assert(diffMap(1L, 2L) == Map(2L -> "changed", 3L -> "removed"))
      // v1 -> v3 spans both deltas; the v3 re-birth of 3 lands as
      // changed (present on both sides, text moved)
      assert(diffMap(1L, 3L) ==
        Map(2L -> "changed", 3L -> "changed", 7L -> "added"))
      // v2 -> v3: the re-birth is an ADD against v2 (where 3 was deleted)
      assert(diffMap(2L, 3L) == Map(7L -> "added", 3L -> "added"))
      // a FULL snapshot in the range declares no churn — the fallback
      // full compare must still catch its silent rewrite of id 5
      Curation.writeSnapshot(
        Seq((1L, "doc 1"), (2L, "doc 2 edited"), (3L, "doc 3 reborn"),
          (5L, "doc 5 silently rewritten"), (6L, "doc 6"), (7L, "doc 7"))
          .toDF("doc_id", "text"),
        root.getPath, 4L)
      assert(diffMap(3L, 4L) ==
        Map(4L -> "removed", 5L -> "changed"))
      // same reconstruction on both sides (no versions in range): empty
      Curation.writeSnapshotDelta(spark, root.getPath, 6L,
        upserts = Seq((8L, "doc 8")).toDF("doc_id", "text"),
        deleteIds = spark.range(0).select(col("id").as("doc_id")),
        idCol = "doc_id")
      assert(diffMap(4L, 5L).isEmpty)
      require(diffMap(4L, 6L) == Map(8L -> "added"))
      intercept[IllegalArgumentException] {
        Curation.diffSnapshotsAt(spark, root.getPath, 3L, 3L, "doc_id", "text")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(root)
    }
  }

  test("model-based CDC lifecycle: random delta/full chains — reconstruction and diff equal the in-memory model at every version") {
    // the storage-layer assurance pattern (StoreSegmentsSpec's model
    // tests) applied to the delta-chain store: drive a seeded random
    // sequence of deltas (new ids, edits, no-op re-upserts, deletes) and
    // full snapshots (compaction points, occasionally with a SILENT
    // rewrite no delta declares), and after every version compare both
    // the reconstruction AND the version-to-version diff against a plain
    // in-memory map — any last-writer-wins, tombstone, scope-join, or
    // fallback-dichotomy error surfaces at the step that introduced it
    val rnd = new scala.util.Random(11)
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-model")
      .toFile
    try {
      var model = (0L until 12L).map(i => i -> s"doc$i").toMap
      val history = scala.collection.mutable.Map(1L -> model)
      var nextId = 12L
      Curation.writeSnapshot(
        model.toSeq.toDF("doc_id", "text"), root.getPath, 1L)
      def modelDiff(o: Map[Long, String], n: Map[Long, String]) =
        (n.keySet -- o.keySet).map(_ -> "added") ++
          (o.keySet -- n.keySet).map(_ -> "removed") ++
          (o.keySet & n.keySet).filter(k => o(k) != n(k))
            .map(_ -> "changed")
      def engineDiff(a: Long, b: Long) =
        Curation.diffSnapshotsAt(spark, root.getPath, a, b,
            "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
      (2L to 13L).foreach { version =>
        if (rnd.nextInt(4) == 0) {
          // full compaction point; half the time with a silent rewrite
          // the fallback full-compare must catch
          if (rnd.nextBoolean() && model.nonEmpty) {
            val k = model.keys.toSeq(rnd.nextInt(model.size))
            model = model.updated(k, s"${model(k)} silent$version")
          }
          Curation.writeSnapshot(
            model.toSeq.toDF("doc_id", "text"), root.getPath, version)
        } else {
          val adds = (0 until rnd.nextInt(3))
            .map(i => (nextId + i) -> s"doc${nextId + i}")
          nextId += adds.size
          val existing = model.keys.toSeq.sorted
          val edits = existing.filter(_ => rnd.nextInt(5) == 0).take(3)
            .map(k => k -> s"${model(k)} v$version")
          val noops = existing.filter(_ => rnd.nextInt(7) == 0).take(2)
            .filterNot(edits.map(_._1).contains)
            .map(k => k -> model(k)) // re-upsert identical content
          val upserts = (adds ++ edits ++ noops).toMap
          val deletes = existing
            .filterNot(upserts.keySet.contains)
            .filter(_ => rnd.nextInt(6) == 0).take(3)
          Curation.writeSnapshotDelta(spark, root.getPath, version,
            upserts = upserts.toSeq.toDF("doc_id", "text"),
            deleteIds = deletes.toDF("doc_id"), idCol = "doc_id")
          model = (model ++ upserts) -- deletes
        }
        history(version) = model
        val got = Curation.readSnapshotAt(spark, root.getPath, version,
            "doc_id")
          .collect().map(r => r.getAs[Long]("doc_id") ->
            r.getAs[String]("text")).toMap
        assert(got == model, s"version $version reconstruction diverged")
        assert(engineDiff(version - 1, version) ==
          modelDiff(history(version - 1), model),
          s"version ${version - 1}->$version diff diverged")
      }
      // random cross-version spans (delta-only scoped path AND
      // full-in-range fallback, chosen by the chain's own metadata)
      (1 to 8).foreach { _ =>
        val a = 1L + rnd.nextInt(12)
        val b = a + 1L + rnd.nextInt((13 - a).toInt)
        assert(engineDiff(a, b) == modelDiff(history(a), history(b)),
          s"span $a->$b diff diverged")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(root)
    }
  }

  test("corpusDiff: added/removed/changed/unchanged; normalization-invariant") {
    val oldDf = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val newDf = Seq((2L, "  Two "), (3L, "trois"), (4L, "four"))
      .toDF("doc_id", "text")
    val got = Curation.corpusDiff(oldDf, newDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2 survives as unchanged: fingerprint is md5(lower(trim)) — case and
    // padding are not content changes
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // a pure re-order of the same snapshot diffs as all-unchanged
    val self = Curation.corpusDiff(oldDf,
        oldDf.repartition(5).orderBy(col("doc_id").desc), "doc_id", "text")
      .collect().map(_.getString(1))
    assert(self.forall(_ == "unchanged"))
  }

  test("tokenYield matches aggregating the curated frame") {
    val cur = Curation.curate(corpus, "doc_id", "text", "source", 5, minTokens = 5)
    val expect = cur.groupBy("split")
      .agg(count(lit(1)), sum("n_tokens"), sum("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = Curation.tokenYield(corpus, "doc_id", "text", "source", 5, minTokens = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("sequenceIndex: hand-computed occupants, boundaries, fill, and the straddle case") {
    // seqLen 10; docs of 7, 8, 12 tokens -> cum 7, 15, 27
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "s", words(7)), (2L, "s", words(8)), (3L, "s", words(12))
    ).toDF("doc_id", "source", "text")
    val out = Curation.sequenceIndex(df, "doc_id", "text", "source", seqLen = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      // seq 0: doc1 fully (starts at 0), doc2's head (starts at 7)
      ("s", 0L, 2L, 2L, 10L, 7L, 1L, 2L),
      // seq 1: doc2's tail (no start), doc3 starts at offset 5
      ("s", 1L, 2L, 1L, 10L, 5L, 2L, 3L),
      // seq 2: doc3's tail alone — partial fill 7
      ("s", 2L, 1L, 0L, 7L, 0L, 3L, 3L)))
    // conservation: per-sequence fills sum to the corpus token count
    assert(out.map(_._5).sum == 27L)
  }

  test("curationLineage: independent flags plus the fixed-order verdict") {
    def en(n: Int) = (1 to n).map(i => s"the fast a$i").mkString(" ")
    val df = Seq(
      (1L, "short doc"),                         // 2 tokens -> too_short
      (2L, en(10)),                              // clean english -> kept
      (3L, en(10)),                              // exact dup of 2 -> dup_loser
      (4L, "hash merge batch group row " * 4),   // german markers
    ).map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")
    val rows = Curation.curationLineage(df, "doc_id", "text",
        minTokens = 5, maxTokens = 1000)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(4), r.getString(6)))
    assert(rows(0) == ((1L, true, false, "too_short")))
    assert(rows(1) == ((2L, false, false, "kept")))
    assert(rows(2) == ((3L, false, true, "dup_loser")))
    assert(rows(3)._1 == 4L && rows(3)._4 == "non_english")
    // every doc appears exactly once — the audit is total
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("snapshot delta chain: time travel to every version; clash rejected") {
    val root = java.nio.file.Files.createTempDirectory("snap-delta").toString
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    Curation.writeSnapshot(base, root, version = 1)
    Curation.writeSnapshotDelta(spark, root, version = 2,
      upserts = Seq((2L, "two v2"), (4L, "four")).toDF("doc_id", "text"),
      deleteIds = Seq(Tuple1(3L)).toDF("doc_id"), idCol = "doc_id")
    Curation.writeSnapshotDelta(spark, root, version = 3,
      upserts = Seq((3L, "three is back")).toDF("doc_id", "text"),
      deleteIds = Seq(Tuple1(1L)).toDF("doc_id"), idCol = "doc_id")
    def at(v: Long) = Curation.readSnapshotAt(spark, root, v, "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(at(1) == Seq(1L -> "one", 2L -> "two", 3L -> "three"))
    assert(at(2) == Seq(1L -> "one", 2L -> "two v2", 4L -> "four"))
    assert(at(3) == Seq(2L -> "two v2", 3L -> "three is back", 4L -> "four"))
    // upsert+delete of one id in the same delta is ambiguous -> rejected
    intercept[IllegalArgumentException] {
      Curation.writeSnapshotDelta(spark, root, version = 4,
        upserts = Seq((5L, "five")).toDF("doc_id", "text"),
        deleteIds = Seq(Tuple1(5L)).toDF("doc_id"), idCol = "doc_id")
    }
    // duplicate ids within one delta's upserts -> rejected (the window
    // would pick an arbitrary winner)
    intercept[IllegalArgumentException] {
      Curation.writeSnapshotDelta(spark, root, version = 4,
        upserts = Seq((6L, "a"), (6L, "b")).toDF("doc_id", "text"),
        deleteIds = Seq(Tuple1(7L)).toDF("doc_id"), idCol = "doc_id")
    }
  }

  test("reconstruction AT a compaction point plans as the pruned base " +
      "scan — no fold window, no shuffle (r15)") {
    val root = java.nio.file.Files.createTempDirectory("snap-nofold").toString
    Curation.writeSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), root, version = 1)
    Curation.writeSnapshotDelta(spark, root, version = 2,
      upserts = Seq((3L, "c")).toDF("doc_id", "text"),
      deleteIds = Seq(Tuple1(1L)).toDF("doc_id"), idCol = "doc_id")
    // at v1 (a full snapshot) nothing folds: the last-writer-wins window
    // is an identity there, and the r15 shortcut removes it — at 100 TB
    // that is a pruned read instead of a corpus shuffle
    val atFull = Curation.readSnapshotAt(spark, root, 1, "doc_id")
    val planFull = atFull.queryExecution.executedPlan.toString()
    assert(!planFull.contains("Window"),
      s"v1 reconstruction should not fold:\n$planFull")
    assert(!planFull.contains("Exchange"),
      s"v1 reconstruction should not shuffle:\n$planFull")
    assert(atFull.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
    // at v2 (delta-defined) the fold window must still run
    val atDelta = Curation.readSnapshotAt(spark, root, 2, "doc_id")
    assert(atDelta.queryExecution.executedPlan.toString().contains("Window"))
    assert(atDelta.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 3L))
  }

  test("snapshot delta chain: a later FULL snapshot becomes the new base (compaction point)") {
    val root = java.nio.file.Files.createTempDirectory("snap-delta2").toString
    Curation.writeSnapshot(Seq((1L, "a")).toDF("doc_id", "text"), root, 1)
    Curation.writeSnapshotDelta(spark, root, 2,
      Seq((2L, "b")).toDF("doc_id", "text"),
      spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0), "doc_id")
    // compaction: version 3 written FULL; older deltas must not reapply
    Curation.writeSnapshot(Seq((9L, "z")).toDF("doc_id", "text"), root, 3)
    val got = Curation.readSnapshotAt(spark, root, 3, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(9L -> "z"))
  }

  test("pruneSnapshots sweeps unreachable deltas; below-window time travel fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("snap-retain-d").toString
    val none = spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
    Curation.writeSnapshot(Seq((1L, "a")).toDF("doc_id", "text"), root, 1)
    Curation.writeSnapshotDelta(spark, root, 2,
      Seq((2L, "b")).toDF("doc_id", "text"), none, "doc_id")
    Curation.writeSnapshot(
      Curation.readSnapshotAt(spark, root, 2, "doc_id"), root, 3)
    Curation.writeSnapshotDelta(spark, root, 4,
      Seq((5L, "e")).toDF("doc_id", "text"), none, "doc_id")
    assert(Curation.pruneSnapshots(root, keepLast = 1) == Seq(1L))
    // delta v2 folds only over a full STRICTLY below it — all pruned, so
    // the sweep removed its directory; delta v4 (over full v3) survives
    assert(Curation.deltaVersions(root) == Seq(4L))
    val got = Curation.readSnapshotAt(spark, root, 4, "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 2L -> "b", 5L -> "e"))
    // targets below the retained window are gone — loudly, not wrongly
    intercept[IllegalArgumentException] {
      Curation.readSnapshotAt(spark, root, 2, "doc_id")
    }
  }
}
