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
}
