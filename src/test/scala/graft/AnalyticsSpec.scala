package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Analytic window surface: lag gap, exact integer running totals, and
  * trailing mean, verified against hand-computed values on a keyed
  * sequence, including single-row keys and moving windows shorter than k.
  */
class AnalyticsSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  // user 1: three purchases (10.00, 20.00, 30.01) at t=100,160,400
  // user 2: one purchase (5.55) at t=50
  private val events = Seq(
    (1L, 11L, 100L, 10.00),
    (1L, 12L, 160L, 20.00),
    (1L, 13L, 400L, 30.01),
    (2L, 21L, 50L, 5.55),
  ).toDF("user_id", "event_id", "sec", "value")

  test("sequenceStats: gap, running cents, trailing mean are exact") {
    val out = Analytics.sequenceStats(events, "user_id", "sec", "event_id",
      "value", movK = 3).orderBy("user_id", "sec").collect()
    // (gap_s, run_cents, mov_avg) per row
    val got = out.map(r => (r.getLong(0),
      Option(r.get(3)).map(_.asInstanceOf[Long]),
      r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, None, 1000L, 10.0),            // first row: no gap, avg of itself
      (1L, Some(60L), 3000L, 15.0),       // avg(1000,2000)/100
      (1L, Some(240L), 6001L, 20.0033),   // avg(1000,2000,3001)/100 → 4dp
      (2L, None, 555L, 5.55),
    ))
  }

  test("sequenceStats: frames never cross keys") {
    val out = Analytics.sequenceStats(events, "user_id", "sec", "event_id",
      "value").filter(col("user_id") === 2).collect()
    assert(out.length == 1 && out(0).isNullAt(3)) // user 2's lag sees nothing
  }

  test("sequenceStats: one window sort serves all three analytics") {
    val plan = Analytics.sequenceStats(events, "user_id", "sec", "event_id",
      "value").queryExecution.executedPlan.toString
    // same partition/order spec → Catalyst collapses to Window execs over
    // ONE exchange+sort; a second Exchange would mean the specs diverged
    assert(plan.split("Exchange").length - 1 <= 1, plan)
  }

  test("sequenceStatsBucketed equals sequenceStats exactly — hot key, sparse buckets, gaps") {
    val rnd = new scala.util.Random(11)
    // one hot key with 95% of rows spanning many buckets, several sparse
    // keys with 1-row buckets and multi-bucket gaps between events
    val rows = (0 until 950).map { i =>
      (7L, 1000L + i, rnd.nextInt(5000).toLong, rnd.nextDouble() * 50)
    } ++ (0 until 50).map { i =>
      ((i % 5).toLong, 5000L + i, (i * 977L) % 9000, rnd.nextDouble() * 50)
    }
    val df = rows.toDF("user_id", "event_id", "sec", "value")
    for (movK <- Seq(1, 3); bucketSecs <- Seq(100L, 1000L)) {
      val plain = Analytics.sequenceStats(df, "user_id", "sec", "event_id",
        "value", movK).orderBy("user_id", "sec", "event_id").collect().toSeq
      val bucketed = Analytics.sequenceStatsBucketed(df, "user_id", "sec",
        "event_id", "value", movK, bucketSecs)
        .orderBy("user_id", "sec", "event_id").collect().toSeq
      assert(bucketed == plain, s"mismatch at movK=$movK bucket=$bucketSecs")
    }
  }

  test("sequenceStatsBucketed: the big window partitions on (key, bucket), not the key") {
    val plan = Analytics.sequenceStatsBucketed(events, "user_id", "sec",
      "event_id", "value", movK = 3, bucketSeconds = 100)
      .queryExecution.optimizedPlan.toString
    // every Window over the full data must include __bkt in its partition
    // spec — a key-only window would re-serialize the hot key into one task
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val fullDataSpecs = windowSpecs.filterNot(_.contains("__bkt"))
    // the only key-only windows allowed are over the tiny per-(key,bucket)
    // frame (lead/cumPrev on aggregated buckets) — they mention __tot/lead
    assert(fullDataSpecs.forall(l => l.contains("__tot") || l.contains("lead")),
      fullDataSpecs.mkString("\n"))
  }

  test("sequenceStats is deterministic under repartitioning") {
    val a = Analytics.sequenceStats(events, "user_id", "sec", "event_id", "value")
      .orderBy("user_id", "sec").collect().toSeq
    val b = Analytics.sequenceStats(events.repartition(7), "user_id", "sec",
      "event_id", "value").orderBy("user_id", "sec").collect().toSeq
    assert(a == b)
  }
}
