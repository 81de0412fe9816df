package graft

import org.apache.spark.sql.functions._

import graft.api.SqlFrontDoor
import graft.operators.Relational

/** The SQL text surface must be the SAME engine as the operator library:
  * identical results, identical physical strategies. CORRECTNESS gates
  * q60-q62 against the DuckDB oracle; these tests pin the equivalences the
  * gate can't see (result parity against the library form, and the physical
  * plan of the SQL text).
  */
class SqlFrontDoorSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("registered views are lazy names over the fixture parquet") {
    SqlFrontDoor.registerViews(spark, dir)
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(SqlFrontDoor.TableNames.toSet.subsetOf(names))
    assert(spark.sql("SELECT count(*) AS n FROM documents").head().getLong(0) > 0)
  }

  test("SQL wordcount text == operator-library wordCount, row for row") {
    val viaSql = SparkEntry.queries("q60_sql_wordcount")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaLib = Relational.wordCount(Tables(spark, dir).documents, "text")
      .orderBy("word")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaLib)
    assert(viaSql.nonEmpty)
  }

  test("graft_cosine resolves from SQL text and the kNN plan broadcasts the query side") {
    val df = SparkEntry.queries("q62_sql_knn")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every query id gets at most k=5 neighbors, cosines in [-1, 1]
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 5))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    // corpus must NOT shuffle: the non-equi join plans as a broadcast
    // nested-loop join with the 20-row query side as the build side
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("SQL top-k text plans as TakeOrderedAndProject, not a full sort") {
    val df = SparkEntry.queries("q61_sql_topk")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("bloom primitives resolve from SQL text: no false negatives") {
    SqlFrontDoor.registerViews(spark, dir)
    val total = spark.sql("SELECT count(*) AS n FROM documents")
      .head().getLong(0)
    // every lang value went into the filter, so might_contain must admit
    // every row — Bloom filters cannot false-negative
    val admitted = spark.sql(
      """SELECT count(*) AS n FROM documents
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(lang), 1024L, 8192L)
        |   FROM documents),
        |  xxhash64(lang))""".stripMargin).head().getLong(0)
    assert(admitted == total)
  }

  test("table functions: bm25 index search from pure SQL equals the Scala operator") {
    import TestSpark.spark.implicits._
    val docs = Seq((0L, "spark hash window spark"), (1L, "spark window"),
      (2L, "hash hash join"), (5L, "zebra quokka")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-sqltvf").toString
    graft.operators.TextAnalysis.buildTextIndex(docs, "doc_id", "text", root, buckets = 8)
    val viaSql = SqlFrontDoor.sql(spark, dir,
      s"SELECT * FROM graft_bm25_search('$root', 'spark hash', 10, 8) ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaScala = graft.operators.TextAnalysis
      .searchTextIndex(spark, root, Seq("spark", "hash"), k = 10, buckets = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // non-literal argument: a clean analysis-time error, not a mystery NPE
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25_search(concat('$root', doc_id), 'spark', 1)")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("write-verb TVFs: SQL-built store equals the Scala-built one; lock still bites") {
    import TestSpark.spark.implicits._
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    val docs = Seq((0L, "spark hash window spark"), (1L, "spark window"),
      (2L, "hash hash join"), (5L, "zebra quokka")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("wv_docs")
    val sqlRoot = java.nio.file.Files.createTempDirectory("graft-wv-sql").toString
    val receipt = spark.sql(
      s"SELECT * FROM graft_text_index_build('$sqlRoot', 'wv_docs', 'doc_id', 'text', 8)")
      .head
    assert(receipt.getString(0) == "text_index_build" && receipt.getBoolean(2))
    val scalaRoot = java.nio.file.Files.createTempDirectory("graft-wv-scala").toString
    graft.operators.TextAnalysis.buildTextIndex(docs, "doc_id", "text",
      scalaRoot, buckets = 8)
    def search(root: String) = graft.operators.TextAnalysis
      .searchTextIndex(spark, root, Seq("spark", "hash"), k = 10, buckets = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(search(sqlRoot) == search(scalaRoot) && search(sqlRoot).nonEmpty)
    // the single-writer lock reaches through the SQL surface too — and
    // is OBSERVABLE from it (graft_store_lock_status)
    def lockedFromSql = spark.sql(
      s"SELECT locked FROM graft_store_lock_status('$sqlRoot')")
      .head.getBoolean(0)
    assert(!lockedFromSql)
    graft.operators.StoreLock.withWriteLock(sqlRoot) {
      assert(lockedFromSql)
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT * FROM graft_text_index_append('$sqlRoot', 'wv_docs', 'doc_id', 'text', 8)")
          .collect()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
      assert(chain(e).exists(_.contains("concurrent writer")),
        chain(e).mkString(" | "))
    }
    assert(!lockedFromSql)
  }

  test("write-verb TVFs mutate at EXECUTION, not analysis: EXPLAIN is side-effect-free, collect writes once") {
    import TestSpark.spark.implicits._
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    val docs = Seq((0L, "spark hash"), (1L, "spark window"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("dw_docs")
    val root = java.nio.file.Files.createTempDirectory("graft-defer-wv").toString
    val stmt = spark.sql(
      s"SELECT * FROM graft_text_index_build('$root', 'dw_docs', 'doc_id', 'text', 8)")
    // the r13 shape wrote HERE (analysis time): spark.sql() has analyzed
    // the statement, EXPLAIN has rendered the plan — and nothing exists
    stmt.explain()
    assert(!graft.operators.StoreFs.exists(spark, s"$root/postings"),
      "analysis/EXPLAIN performed the store write")
    // first action performs the write exactly once
    val receipt = stmt.collect()
    assert(receipt.length == 1 && receipt.head.getBoolean(2))
    assert(graft.operators.StoreFs.exists(spark, s"$root/postings"))
    def hits = graft.operators.TextAnalysis
      .searchTextIndex(spark, root, Seq("spark"), k = 10, buckets = 8).count()
    val afterBuild = hits
    // re-collecting the SAME DataFrame memoizes — no double write; the
    // append-twice-via-view hazard the advisory flagged needs a fresh
    // statement (INSERT semantics), not a re-read of this one
    stmt.collect()
    assert(hits == afterBuild)
    // a destructive verb is EXPLAIN-safe too: the advisory's exact case
    val prune = spark.sql(s"SELECT * FROM graft_snapshot_prune('$root', 1)")
    prune.explain()
    assert(hits == afterBuild, "EXPLAIN of a prune mutated the store")
  }

  test("graft_store_segments: classic layout reports one row; a compact flips it to a live segment view") {
    import TestSpark.spark.implicits._
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    val vecs = (0L until 30L).map { i =>
      val base = Array.fill(4)(0.0); base((i % 3).toInt) = 1.0
      base(3) = 0.01 * i
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-segtvf").toString
    graft.operators.Similarity.buildIvfIndex(vecs, "vec_id", "embedding",
      root, centStep = 3)
    def seg() = spark.sql(
      s"SELECT * FROM graft_store_segments('$root', 'postings')").collect()
    val classic = seg()
    assert(classic.length == 1 && classic.head.getString(1) == "classic")
    graft.operators.Similarity.deleteFromIvfIndex(spark, root,
      Seq(1L).toDF("vec_id"), "vec_id")
    graft.operators.Similarity.compactIvfIndex(spark, root)
    val after = seg()
    assert(after.exists(r => r.getString(1) == "segment" && r.getBoolean(4)),
      after.mkString("; "))
    assert(after.exists(_.getLong(2) > 0), after.mkString("; "))
  }

  test("maintain TVFs return the DECISION RECEIPT (action + signals), still execution-time and memoized") {
    import TestSpark.spark.implicits._
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    val vecs = (0L until 30L).map { i =>
      val base = Array.fill(4)(0.0); base((i % 3).toInt) = 1.0
      base(3) = 0.01 * i
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-mnt-rcpt").toString
    graft.operators.Similarity.buildIvfIndex(vecs, "vec_id", "embedding",
      root, centStep = 3)
    graft.operators.Similarity.deleteFromIvfIndex(spark, root,
      Seq(1L, 4L).toDF("vec_id"), "vec_id")
    val stmt = spark.sql(s"SELECT * FROM graft_ivf_maintain('$root')")
    // analysis/EXPLAIN must not run the policy: the tombstones are
    // still there after the plan renders
    stmt.explain()
    assert(graft.operators.StoreFs.exists(spark, s"$root/tombstones"),
      "EXPLAIN ran the maintenance")
    // first action runs it ONCE and the rows are the receipt: the
    // tombstoned store decides 'compact', signals included
    val r = stmt.collect()
    assert(r.length == 1, r.mkString("; "))
    assert(r.head.getAs[String]("action") == "compact", r.head.toString)
    assert(r.head.getAs[Long]("n_tombstones") == 2L, r.head.toString)
    assert(r.head.getAs[Long]("n_live_legs") >= 1L, r.head.toString)
    // re-collecting the same DataFrame memoizes (no second maintenance:
    // the receipt still says compact, not none)
    assert(stmt.collect().head.getAs[String]("action") == "compact")
    // a FRESH statement re-probes: the drained store now decides none
    val r2 = spark.sql(s"SELECT * FROM graft_ivf_maintain('$root')").collect()
    assert(r2.head.getAs[String]("action") == "none", r2.head.toString)
    assert(r2.head.getAs[Long]("n_tombstones") == 0L, r2.head.toString)
  }
}
