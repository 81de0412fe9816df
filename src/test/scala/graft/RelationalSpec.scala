package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Unit tests for the §2 operator library on tiny in-memory frames —
  * the edge cases VERDICT.md called out: F1 boundary at exactly 8 chars,
  * F4 malformed-row drop, T1 tie-break, A5 determinism.
  */
class RelationalSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  // ---- F1 metadata-line filter -------------------------------------------

  test("F1 drops lines whose first token is >8 chars and starts with http/2008") {
    val df = Seq(
      "http://example.com/x rest",   // 20 chars, http -> drop
      "20081231x trailing",          // 9 chars, 2008 -> drop
      "http8chr keep",               // exactly 8 chars -> KEEP (>8 required)
      "20081231 keep",               // exactly 8 chars -> KEEP
      "httpsomethinglong keep",      // drop
      "hello world",                 // keep
      "2008 short"                   // 4 chars -> keep
    ).toDF("line")
    val kept = df.filter(Relational.metadataLineFilter(col("line")))
      .as[String].collect().toSet
    assert(kept == Set("http8chr keep", "20081231 keep", "hello world", "2008 short"))
  }

  test("F1 keeps long first tokens that do not start with http/2008") {
    val df = Seq("verylongtoken rest of line").toDF("line")
    assert(df.filter(Relational.metadataLineFilter(col("line"))).count() == 1)
  }

  // ---- F2 / F3 ------------------------------------------------------------

  test("F2 non-negative keeps zero, drops negatives and nulls") {
    val df = Seq(Some(5.0), Some(0.0), Some(-1.0), None).toDF("v")
    val kept = df.filter(Relational.nonNegative(col("v"))).as[Option[Double]].collect()
    assert(kept.flatten.sorted.toSeq == Seq(0.0, 5.0))
  }

  test("F3 equality filter is exact string match") {
    val df = Seq("200", "2000", "404", "200 ").toDF("s")
    assert(df.filter(Relational.equalsFilter(col("s"), "200")).count() == 1)
  }

  // ---- P2 / A1+A2 wordcount ----------------------------------------------

  test("wordCount splits on single spaces and drops empty tokens") {
    // "a  b" has a double space -> Go strings.Split yields an empty token,
    // which the reference then counts as a word of length 0; we drop empties.
    val df = Seq("a  b", "a b", "").toDF("line")
    val wc = Relational.wordCount(df, "line").as[(String, Long)].collect().toMap
    assert(wc == Map("a" -> 2L, "b" -> 2L))
  }

  test("wordCount applies F1 before tokenizing") {
    val df = Seq("httpverylong a a a", "b b").toDF("line")
    val wc = Relational.wordCount(df, "line").as[(String, Long)].collect().toMap
    assert(wc == Map("b" -> 2L))
  }

  // ---- A3/A4 countPerKey --------------------------------------------------

  test("countPerKey counts rows per group") {
    val df = Seq("x", "x", "y").toDF("k")
    val got = Relational.countPerKey(df, "k").as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 2L, "y" -> 1L))
  }

  // ---- A5 countAndDistinct ------------------------------------------------

  test("countAndDistinct: count is per-row, routes are sorted distinct") {
    val df = Seq(("h1", "r2"), ("h1", "r1"), ("h1", "r2"), ("h2", "r9")).toDF("k", "item")
    val got = Relational.countAndDistinct(df, "k", "item")
      .orderBy("k").as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("h1", 3L, "r1,r2"), ("h2", 1L, "r9")))
  }

  test("countAndDistinct output is deterministic across partitionings") {
    val rows = (1 to 100).map(i => ("h" + (i % 3), "r" + (i % 7)))
    val a = Relational.countAndDistinct(rows.toDF("k", "item").repartition(1), "k", "item")
      .orderBy("k").collect().toSeq
    val b = Relational.countAndDistinct(rows.toDF("k", "item").repartition(13), "k", "item")
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  // ---- T1+T2 topK ---------------------------------------------------------

  test("topK breaks count ties by key ascending") {
    val df = Seq(("u3", 5L), ("u1", 5L), ("u2", 7L), ("u4", 1L)).toDF("user_id", "cnt")
    val got = Relational.topK(df, 3, desc = "cnt", tieBreak = "user_id")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("u2", 7L), ("u1", 5L), ("u3", 5L)))
  }

  test("topK with k larger than input returns everything ordered") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("user_id", "cnt")
    val got = Relational.topK(df, 50, "cnt", "user_id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("b", 2L), ("a", 1L)))
  }

  test("topK plans as TakeOrderedAndProject, not a global sort") {
    // Needs an input whose maxRows exceeds k, else Catalyst eliminates the
    // limit (EliminateLimits) and falls back to a plain sort.
    val df = spark.range(1000).selectExpr("concat('u', id) as user_id", "id % 7 as cnt")
    val plan = Relational.topK(df.toDF(), 5, "cnt", "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  // ---- P1 route projection ------------------------------------------------

  test("routeProjection concats host+url and prunes other columns") {
    val df = Seq(("h", "/a", "junk")).toDF("host", "url", "extra")
    val got = Relational.routeProjection(df, "host", "url")
    assert(got.columns.toSeq == Seq("host", "route"))
    assert(got.as[(String, String)].collect().toSeq == Seq(("h", "h/a")))
  }

  // ---- Set operations (§2.6) ---------------------------------------------

  private def ab = Seq((1L, "x"), (2L, "y"), (2L, "y")).toDF("id", "v")
  private def cd = Seq((2L, "y"), (3L, "z")).toDF("id", "v")

  test("unionAll keeps duplicates and matches by name, not position") {
    val swapped = cd.select(col("v"), col("id")) // column order reversed
    val got = Relational.unionAll(ab, swapped).orderBy("id", "v").collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 2L, 2L, 3L))
  }

  test("unionDistinct / exceptRows / intersectRows have SQL set semantics") {
    assert(Relational.unionDistinct(ab, cd).orderBy("id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // EXCEPT dedupes: (2,y) appears twice in ab but is removed entirely
    assert(Relational.exceptRows(ab, cd).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(Relational.intersectRows(ab, cd).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("semiJoin keeps each matching row once; antiJoin is its complement") {
    val events = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "p")
    // allowlist with a DUPLICATE key — a semi join must not duplicate output
    val allow = Seq(Tuple1(1L), Tuple1(1L), Tuple1(2L)).toDF("id")
    val semi = Relational.semiJoin(events, allow, Seq("id"))
      .orderBy("id", "p").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(semi.toSeq == Seq((1L, "a"), (1L, "b"), (2L, "c")))
    val anti = Relational.antiJoin(events, allow, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(anti.toSeq == Seq((3L, "d")))
  }

  test("rollupAgg: leaf groups, prefix subtotals, grand total — all consistent") {
    val df = Seq(("a", "x", 1L), ("a", "x", 2L), ("a", "y", 4L), ("b", "x", 8L))
      .toDF("k1", "k2", "v")
    val out = Relational.rollupAgg(df, Seq("k1", "k2"),
        Seq(count(lit(1)).as("n"), sum("v").as("s")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("a", "x", 2L, 3L), ("a", "y", 1L, 4L), ("b", "x", 1L, 8L), // leaves
      ("a", "ALL", 3L, 7L), ("b", "ALL", 1L, 8L),                 // k1 subtotals
      ("ALL", "ALL", 4L, 15L)))                                   // grand total
  }

  test("cubeAgg additionally emits the k2-only grouping set") {
    val df = Seq(("a", "x", 1L), ("a", "y", 4L), ("b", "x", 8L))
      .toDF("k1", "k2", "v")
    val out = Relational.cubeAgg(df, Seq("k1", "k2"), Seq(sum("v").as("s")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out.contains(("ALL", "x", 9L)) && out.contains(("ALL", "y", 4L)))
    assert(out.contains(("ALL", "ALL", 13L)))
    assert(out.size == 3 + 2 + 2 + 1) // leaves + k1 + k2 + grand
  }

  test("rollupAgg: a real NULL key is NOT mistaken for a subtotal row") {
    // one leaf group whose k2 is genuinely NULL in the data
    val df = Seq(("a", Some("x"), 1L), ("a", None, 2L), ("b", Some("x"), 8L))
      .toDF("k1", "k2", "v")
    val out = Relational.rollupAgg(df, Seq("k1", "k2"), Seq(sum("v").as("s")))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2)))
      .toSet
    // the NULL-key leaf survives as NULL; only ROLLED-UP levels say ALL
    assert(out.contains(("a", None, 2L)), out.toString)
    assert(out.contains(("a", Some("ALL"), 3L)))       // k1=a subtotal
    assert(out.contains(("ALL", Some("ALL"), 11L)))    // grand total
  }

  test("rollupAgg withGroupingId disambiguates every level unconditionally") {
    // pathological data: a real key VALUE equal to the fill sentinel
    val df = Seq(("a", "ALL", 1L), ("a", "x", 2L)).toDF("k1", "k2", "v")
    val out = Relational.rollupAgg(df, Seq("k1", "k2"),
        Seq(sum("v").as("s")), withGroupingId = true)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // gid 0 = leaf, 1 = k2 rolled up, 3 = both rolled up
    assert(out.contains(("a", "ALL", 0L, 1L)), out.toString) // REAL 'ALL' leaf
    assert(out.contains(("a", "ALL", 1L, 3L)))               // k1=a subtotal
    assert(out.contains(("ALL", "ALL", 3L, 3L)))             // grand total
  }

  test("rollupAgg plans one Expand + one aggregate exchange") {
    val df = Seq(("a", "x", 1L)).toDF("k1", "k2", "v")
    val plan = Relational.rollupAgg(df, Seq("k1", "k2"), Seq(sum("v").as("s")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert(plan.split("Exchange").length - 1 <= 1, plan)
  }

  test("skewReport: hand-computed shares on a 90%-hot key, top-k plans TakeOrdered") {
    // 900 rows of key 1, 50 of key 2, 50 singleton keys
    val df = ((1 to 900).map(_ => 1L) ++ (1 to 50).map(_ => 2L) ++
      (100L until 150L)).toDF("k")
    val rep = Relational.skewReport(df, "k", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rep.length == 3)
    assert(rep(0) == ((1L, 1L, 900L, 900000L, 1000L, 52L)))
    assert(rep(1) == ((2L, 2L, 50L, 50000L, 1000L, 52L)))
    assert(rep(2)._3 == 1L && rep(2)._4 == 1000L)
    val plan = Relational.skewReport(df, "k", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("profile: per-column counts/nulls/ndv/min/max in one pass, string-rendered") {
    import TestSpark.spark.implicits._
    val df = Seq(
      (1L, Some("b"), 10L), (2L, Some("a"), 20L),
      (3L, None, 10L), (4L, Some("a"), 30L)
    ).toDF("id", "s", "v")
    val out = Relational.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(out("id") == ((4L, 0L, 4L, "1", "4")))
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))   // null excluded from ndv/min/max
    assert(out("v") == ((4L, 0L, 3L, "10", "30")))
    // single full-scan aggregation: exactly one scan of the input in the plan
    val plan = Relational.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan").length <= 3, plan) // one data scan (+1 for split semantics)
  }
}
