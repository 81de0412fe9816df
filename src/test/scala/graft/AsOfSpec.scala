package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Point-in-time join semantics: most recent right row with rt <= lt per
  * key, equal timestamps match, no right row yields NULL.
  */
class AsOfSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val quotes = Seq( // (sym, t, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0),
  ).toDF("sym", "qt", "px")

  private val trades = Seq( // (sym, t, qty)
    ("A", 9L, 100L),   // before any quote -> null
    ("A", 10L, 200L),  // equal time matches
    ("A", 25L, 300L),  // between quotes -> 2.0
    ("A", 99L, 400L),  // after last -> 3.0
    ("B", 14L, 500L),  // before B's only quote -> null
    ("C", 50L, 600L),  // key with no right rows -> null
  ).toDF("sym", "tt", "qty")

  test("asof join picks the latest right row at or before each left time") {
    val out = AsOf.joinAsOf(trades, quotes, "sym", "tt", "qt", Seq("px"))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", 9L, 100L, null), ("A", 10L, 200L, 1.0), ("A", 25L, 300L, 2.0),
      ("A", 99L, 400L, 3.0), ("B", 14L, 500L, null), ("C", 50L, 600L, null)))
  }

  test("left columns pass through and multiple payload columns carry together") {
    val right = Seq(("A", 10L, 1.0, "x"), ("A", 20L, 2.0, "y"))
      .toDF("sym", "qt", "px", "src")
    val out = AsOf.joinAsOf(trades.filter(col("sym") === "A"), right,
      "sym", "tt", "qt", Seq("px", "src"))
      .orderBy("tt").collect()
    assert(out.map(_.length).forall(_ == 5)) // sym, tt, qty, px, src
    val at25 = out.find(_.getLong(1) == 25L).get
    assert(at25.getDouble(3) == 1.0 || at25.getDouble(3) == 2.0)
    assert(at25.getDouble(3) == 2.0 && at25.getString(4) == "y")
  }

  test("plan shuffles once on the key: a single Exchange, no join node") {
    val plan = AsOf.joinAsOf(trades, quotes, "sym", "tt", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoop"), plan)
    assert("hashpartitioning\\(sym".r.findAllIn(plan).length >= 1, plan)
  }

  test("bucketed variant equals the per-key window on every edge case") {
    for (span <- Seq(1L, 7L, 16L, 1000L)) { // incl. span > whole time range
      val a = AsOf.joinAsOf(trades, quotes, "sym", "tt", "qt", Seq("px"))
        .orderBy("sym", "tt").collect().toSeq
      val b = AsOf.joinAsOfBucketed(trades, quotes, "sym", "tt", "qt",
        Seq("px"), bucketSpan = span).orderBy("sym", "tt").collect().toSeq
      assert(a == b, s"span=$span")
    }
  }

  test("bucketed variant spreads a hot key over many tasks") {
    val spark = TestSpark.spark
    import spark.implicits._
    // one key holds 95% of all rows, spanning time 0..9999
    val hotL = (0 until 9500).map(i => ("hot", i.toLong, i.toLong))
    val coldL = (0 until 500).map(i => (s"c${i % 20}", i.toLong, i.toLong))
    val left = (hotL ++ coldL).toDF("k", "t", "v")
    val right = (0 until 100).map(i => ("hot", i * 100L, i * 1.0)).toDF("k", "rt", "px")
    val bucketed = AsOf.joinAsOfBucketed(left, right, "k", "t", "rt",
      Seq("px"), bucketSpan = 500)
    // correctness: identical to the per-key-window form
    val expect = AsOf.joinAsOf(left, right, "k", "t", "rt", Seq("px"))
      .orderBy("k", "t").collect().toSeq
    assert(bucketed.orderBy("k", "t").collect().toSeq == expect)
    // skew: the big-side window partitions on (key, bucket) — the hot key's
    // 9500 rows land in 20 window partitions, not one task. Assert on the
    // plan (the window spec must include the bucket column)...
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(k"), plan)
    assert("hashpartitioning\\(k#\\d+, __bk".r.findAllIn(plan).nonEmpty, plan)
    // ...and empirically: no (key, bucket) window partition holds more than
    // 10% of the data (the hot key's densest bucket is 500/10000 + rights)
    val maxPart = left.select(col("k"), floor(col("t") / 500).as("bk"))
      .groupBy("k", "bk").count().agg(max("count")).head.getLong(0)
    assert(maxPart <= 1000, s"densest (key,bucket) holds $maxPart rows")
  }
}
