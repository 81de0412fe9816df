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

  test("sequenceStats is deterministic under repartitioning") {
    val a = Analytics.sequenceStats(events, "user_id", "sec", "event_id", "value")
      .orderBy("user_id", "sec").collect().toSeq
    val b = Analytics.sequenceStats(events.repartition(7), "user_id", "sec",
      "event_id", "value").orderBy("user_id", "sec").collect().toSeq
    assert(a == b)
  }
}
