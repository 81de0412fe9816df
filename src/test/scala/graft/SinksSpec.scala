package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sinks.Sinks

/** Golden-file tests for the K1–K3 formatted sinks — exact expected file
  * content, byte for byte (the determinism the reference's map-iteration
  * output lacks).
  */
class SinksSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def readSingleText(path: String): String = {
    val part = Files.list(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq match {
      case Seq(p) => p
      case ps => fail(s"expected exactly one part file, got $ps")
    }
    new String(Files.readAllBytes(part), "UTF-8")
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  test("K1 wordcount sink: word:count lines sorted by word") {
    val out = tmp("k1")
    Sinks.writeWordCount(Seq(("be", 4L), ("or", 2L), ("not", 1L)).toDF("word", "cnt"),
      "word", "cnt", out)
    assert(readSingleText(out) == "be:4\nnot:1\nor:2\n")
  }

  test("K2 top-K sink: count desc, key tie-break, cut at K") {
    val out = tmp("k2")
    val counts = Seq(("u1", 5L), ("u3", 7L), ("u2", 5L), ("u4", 1L)).toDF("user", "cnt")
    Sinks.writeTopK(counts, "user", "cnt", k = 3, out)
    assert(readSingleText(out) == "u3:7\nu1:5\nu2:5\n")
  }

  test("corpus export: hive-partitioned layout, lossless roundtrip, partition pruning") {
    import org.apache.spark.sql.functions._
    val out = tmp("corpus")
    val df = Seq(
      (0L, "alpha text", "train", "s1"), (1L, "beta text", "train", "s2"),
      (2L, "gamma text", "test", "s1"),
    ).toDF("doc_id", "text", "split", "source")
    Sinks.writeCorpus(df, out, Seq("split", "source"))
    // hive layout: split=<v>/source=<v> directories
    assert(Files.isDirectory(Paths.get(out, "split=train", "source=s1")))
    assert(Files.isDirectory(Paths.get(out, "split=test", "source=s1")))
    // roundtrip is lossless
    val back = TestSpark.spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.select("doc_id", "text", "split", "source").collect().toSet ==
      df.collect().toSet)
    // a split filter prunes at the directory level, not per row
    val pruned = TestSpark.spark.read.parquet(out).filter(col("split") === "train")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(split"), scan)
    assert(pruned.count() == 2)
  }

  test("writeShuffled: per-shard file row order realizes shuffleAssign's permutation") {
    import graft.operators.Sampling
    val df = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = tmp("shards")
    Sinks.writeShuffled(df, "doc_id", numShards = 4, seed = 42L, out)
    val expect = Sampling.shuffleAssign(df, "doc_id", 4, 42L)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(r.fieldIndex("shard")),
        r.getLong(r.fieldIndex("doc_id")))).toSeq
    // read each shard directory's part files in name order; parquet row
    // order within a small file is scan order — the written permutation
    val got = (0 until 4).flatMap { s =>
      val dir = Paths.get(out, s"shard=$s")
      assert(Files.isDirectory(dir), s"missing shard dir $dir")
      Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.getFileName.toString)
        .flatMap { p =>
          TestSpark.spark.read.parquet(p.toString)
            .select("doc_id").collect().map(_.getLong(0))
        }.map(id => (s.toLong, id))
    }
    assert(got == expect)
  }

  test("export manifest/audit: healthy round trip; lost shard, duplicate rows, and missing manifest all flagged") {
    val spark = TestSpark.spark
    val df = (0L until 120L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = tmp("export-audit")
    Sinks.writeShuffled(df, "doc_id", numShards = 4, seed = 3L, out)
    // no manifest yet: the audit refuses with a pointer, not a null join
    val e = intercept[IllegalArgumentException] {
      Sinks.exportAudit(spark, out, Seq("shard"), "doc_id")
    }
    assert(e.getMessage.contains("_export_manifest"), e.getMessage)
    Sinks.exportManifest(spark, out, Seq("shard"), "doc_id")
    def audit() = Sinks.exportAudit(spark, out, Seq("shard"), "doc_id")
    assert(audit().collect().forall(_.getAs[Boolean]("healthy")))
    assert(audit().count() == 4)
    // duplicate delivery: a shard's part file copied in place (the
    // double-applied transfer) — count AND checksum... count flips, the
    // xor checksum alone would cancel pair-duplicates, which is why the
    // audit verdict requires BOTH
    val shard0 = Paths.get(out, "shard=0")
    val part = Files.list(shard0).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.head
    Files.copy(part, shard0.resolve("part-copy.parquet"))
    val dup = audit().orderBy("shard").collect()
    assert(!dup.head.getAs[Boolean]("shard_ok"))
    assert(dup.forall(r => !r.getAs[Boolean]("healthy")))
    assert(dup.count(_.getAs[Boolean]("shard_ok")) == 3)
    Files.delete(shard0.resolve("part-copy.parquet"))
    assert(audit().collect().forall(_.getAs[Boolean]("healthy")))
    // lost shard: the whole directory gone mid-transfer — the audit
    // keeps the manifest's row (data-side nulls), flags it, and the
    // global verdict flips
    def rmDir(p: java.nio.file.Path): Unit = {
      Files.list(p).iterator().asScala.toSeq.foreach(Files.delete)
      Files.delete(p)
    }
    rmDir(Paths.get(out, "shard=2"))
    val lost = Sinks.exportAudit(spark, out, Seq("shard"), "doc_id")
      .orderBy("shard").collect()
    assert(lost.length == 4)
    val s2 = lost.find(_.getAs[Int]("shard") == 2).get
    assert(!s2.getAs[Boolean]("shard_ok") && s2.isNullAt(s2.fieldIndex("n_rows_data")))
    assert(lost.forall(r => !r.getAs[Boolean]("healthy")))
  }

  test("writeShuffled: order survives maxRecordsPerFile splitting a shard into many files") {
    import graft.operators.Sampling
    val df = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = tmp("shards-split")
    // ~75 rows/shard forced into files of <=20 rows: 4+ files per shard,
    // whose NAME order must still replay the permutation
    Sinks.writeShuffled(df, "doc_id", numShards = 4, seed = 9L, out,
      maxRecordsPerFile = 20L)
    val expect = Sampling.shuffleAssign(df, "doc_id", 4, 9L)
      .orderBy("shard", "pos").collect()
      .map(r => (r.getLong(r.fieldIndex("shard")),
        r.getLong(r.fieldIndex("doc_id")))).toSeq
    val got = (0 until 4).flatMap { s =>
      val parts = Files.list(Paths.get(out, s"shard=$s")).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toSeq.sortBy(_.getFileName.toString)
      assert(parts.length >= 3, s"expected the shard split into files: $parts")
      parts.flatMap { p =>
        TestSpark.spark.read.parquet(p.toString)
          .select("doc_id").collect().map(_.getLong(0))
      }.map(id => (s.toLong, id))
    }
    assert(got == expect)
  }

  test("K3 host report: header, sorted routes, === separator, hosts sorted") {
    val out = tmp("k3")
    val perHost = Seq(
      ("hostB", 2L, Seq("hostB/x")),
      ("hostA", 3L, Seq("hostA/b", "hostA/a")),
    ).toDF("host", "cnt", "routes")
    Sinks.writeHostReport(perHost, "host", "cnt", "routes", out)
    assert(readSingleText(out) ==
      "hostA:3\nhostA/a\nhostA/b\n===\nhostB:2\nhostB/x\n===\n")
  }

  test("exportDelta apply contract: delete removes then ingest adds turns a v1 copy into exactly v3") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val store = Files.createTempDirectory("graft-delta-store").toString
    val exp = Files.createTempDirectory("graft-delta-exp").toString
    val v1 = Seq(1L -> "alpha", 2L -> "bravo", 3L -> "charlie",
      4L -> "delta", 5L -> "echo").toDF("doc_id", "text")
    graft.operators.Curation.writeSnapshot(v1, store, version = 1)
    // v2: change 2, remove 4, add 6
    graft.operators.Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = Seq(2L -> "bravo2", 6L -> "foxtrot").toDF("doc_id", "text"),
      deleteIds = Seq(4L).toDF("doc_id"), idCol = "doc_id")
    // v3: change 6, remove 5
    graft.operators.Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = Seq(6L -> "foxtrot3").toDF("doc_id", "text"),
      deleteIds = Seq(5L).toDF("doc_id"), idCol = "doc_id")
    val r = Sinks.exportDelta(spark, store, oldVersion = 1, newVersion = 3,
      "doc_id", "text", exp, numShards = 4, seed = 9L).collect().head
    assert(r.getAs[Long]("n_adds") == 2L)    // 6 added, 2 changed
    assert(r.getAs[Long]("n_removes") == 3L) // 4, 5 removed, 2 changed
    // the consumer's apply: v1 copy minus removes' ids, plus adds' rows
    val removes = spark.read.parquet(s"$exp/removes").select("doc_id")
    val adds = spark.read.parquet(s"$exp/adds").select("doc_id", "text")
    val applied = v1.join(removes, Seq("doc_id"), "left_anti")
      .unionByName(adds)
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    val want = graft.operators.Curation
      .readSnapshotAt(spark, store, 3, "doc_id")
      .select("doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(applied == want)
    assert(want == Set(1L -> "alpha", 2L -> "bravo2", 3L -> "charlie",
      6L -> "foxtrot3"))
    // both sides carry healthy integrity manifests
    Seq("adds", "removes").foreach { side =>
      val a = Sinks.exportAudit(spark, s"$exp/$side", Seq("shard"), "doc_id")
      assert(a.select("healthy").head.getBoolean(0), s"$side unhealthy")
    }
    // the range marker records the export
    assert(graft.operators.StoreFs
      .readFileUtf8(spark, s"$exp/_delta_range") == "1\t3\t2\t3")
    // re-export overwrites (idempotent delivery), zero-churn range ships
    // nothing but still writes its marker
    Sinks.exportDelta(spark, store, 1, 3, "doc_id", "text", exp,
      numShards = 4, seed = 9L)
    assert(spark.read.parquet(s"$exp/adds").count() == 2)
    val exp2 = Files.createTempDirectory("graft-delta-empty").toString
    graft.operators.Curation.writeSnapshotDelta(spark, store, version = 4,
      upserts = spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      deleteIds = spark.emptyDataset[Long].toDF("doc_id"), idCol = "doc_id")
    val r2 = Sinks.exportDelta(spark, store, 3, 4, "doc_id", "text", exp2,
      numShards = 4, seed = 9L).collect().head
    assert(r2.getAs[Long]("n_adds") == 0L && r2.getAs[Long]("n_removes") == 0L)
    assert(!graft.operators.StoreFs.exists(spark, s"$exp2/adds"))
    assert(graft.operators.StoreFs
      .readFileUtf8(spark, s"$exp2/_delta_range") == "3\t4\t0\t0")
  }

  test("applyDelta: chained applies reach the head version; gap, in-place, and damaged deliveries refuse") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val store = Files.createTempDirectory("graft-apply-store").toString
    val base = Files.createTempDirectory("graft-apply").toString
    val v1 = Seq(1L -> "alpha", 2L -> "bravo", 3L -> "charlie",
      4L -> "delta", 5L -> "echo").toDF("doc_id", "text")
    graft.operators.Curation.writeSnapshot(v1, store, version = 1)
    graft.operators.Curation.writeSnapshotDelta(spark, store, version = 2,
      upserts = Seq(2L -> "bravo2", 6L -> "foxtrot").toDF("doc_id", "text"),
      deleteIds = Seq(4L).toDF("doc_id"), idCol = "doc_id")
    graft.operators.Curation.writeSnapshotDelta(spark, store, version = 3,
      upserts = Seq(6L -> "foxtrot3").toDF("doc_id", "text"),
      deleteIds = Seq(5L).toDF("doc_id"), idCol = "doc_id")
    // one full ship at v1, then per-version deltas
    val r0 = Sinks.exportSnapshot(spark, store, 1, "doc_id",
      s"$base/copy1", numShards = 4, seed = 9L).collect().head
    assert(r0.getAs[Long]("n_adds") == 5L)
    assert(graft.operators.StoreFs
      .readFileUtf8(spark, s"$base/copy1/_corpus_version").trim == "1")
    Sinks.exportDelta(spark, store, 1, 2, "doc_id", "text",
      s"$base/d12", numShards = 4, seed = 9L)
    Sinks.exportDelta(spark, store, 2, 3, "doc_id", "text",
      s"$base/d23", numShards = 4, seed = 9L)
    // chained applies: v1 + (1,2] + (2,3] == the v3 reconstruction
    val r1 = Sinks.applyDelta(spark, s"$base/copy1", s"$base/d12",
      s"$base/copy2", "doc_id", numShards = 4, seed = 9L).collect().head
    assert(r1.getAs[Long]("new_version") == 2L)
    val r2 = Sinks.applyDelta(spark, s"$base/copy2", s"$base/d23",
      s"$base/copy3", "doc_id", numShards = 4, seed = 9L).collect().head
    assert(r2.getAs[Long]("n_rows") == 4L)
    val got = spark.read.parquet(s"$base/copy3").select("doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    assert(got == Set(1L -> "alpha", 2L -> "bravo2", 3L -> "charlie",
      6L -> "foxtrot3"))
    // the applied copy is itself a manifested, version-stamped delivery
    assert(Sinks.exportAudit(spark, s"$base/copy3", Seq("shard"), "doc_id")
      .select("healthy").head.getBoolean(0))
    assert(graft.operators.StoreFs
      .readFileUtf8(spark, s"$base/copy3/_corpus_version").trim == "3")
    // gap refusal: the (2,3] delta cannot apply to the v1 copy
    val gap = intercept[IllegalArgumentException] {
      Sinks.applyDelta(spark, s"$base/copy1", s"$base/d23",
        s"$base/bad", "doc_id", numShards = 4, seed = 9L)
    }
    assert(gap.getMessage.contains("range mismatch"))
    // in-place refusal
    assert(intercept[IllegalArgumentException] {
      Sinks.applyDelta(spark, s"$base/copy1", s"$base/d12",
        s"$base/copy1", "doc_id")
    }.getMessage.contains("in place"))
    // damaged delivery: duplicate a data file after manifest time (a
    // double-copied shard in transfer) — counts flip, the audit fails,
    // and the apply refuses before writing anything
    val shardDir = Files.list(Paths.get(s"$base/d12/adds")).iterator()
      .asScala.filter(_.getFileName.toString.startsWith("shard=")).toSeq.head
    val dataFile = Files.list(shardDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    Files.copy(dataFile, shardDir.resolve("zdup.parquet"))
    val dmg = intercept[IllegalArgumentException] {
      Sinks.applyDelta(spark, s"$base/copy1", s"$base/d12",
        s"$base/bad2", "doc_id", numShards = 4, seed = 9L)
    }
    assert(dmg.getMessage.contains("unhealthy"))
    assert(!graft.operators.StoreFs.exists(spark, s"$base/bad2"))
  }
}
