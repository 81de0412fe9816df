package graft

import graft.operators.RangeJoin

/** Bucketed interval-containment join: half-open boundaries, bucket-border
  * crossing, overlapping intervals (no duplicate pairs), and the plan must
  * be an equi-join, not a nested loop.
  */
class RangeJoinSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val intervals = Seq( // [start, end)
    (100L, 200L, "a"),
    (150L, 450L, "b"),   // overlaps a; crosses bucket borders at b=100
    (400L, 401L, "c"),   // single-second interval
  ).toDF("s", "e", "name")

  private val points = Seq(
    99L,   // before everything
    100L,  // == a.start (included)
    150L,  // in a and b
    199L,  // last second of a
    200L,  // == a.end (excluded from a), in b
    399L,  // in b only
    400L,  // in b and c
    401L,  // in b; == c.end (excluded)
    450L,  // == b.end (excluded) -> nothing
  ).toDF("t")

  private def matches(bucket: Long): Set[(Long, String)] =
    RangeJoin.pointsInIntervals(points, "t", intervals, "s", "e", bucket)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet

  private val expected = Set(
    (100L, "a"), (150L, "a"), (199L, "a"),
    (150L, "b"), (199L, "b"), (200L, "b"), (399L, "b"), (400L, "b"), (401L, "b"),
    (400L, "c"))

  test("containment is exact: half-open bounds, overlaps matched once each") {
    assert(matches(bucket = 100) == expected)
  }

  test("result is independent of the bucket size (correctness knob-free)") {
    for (b <- Seq(1L, 7L, 64L, 1000L, 1000000L)) {
      assert(matches(b) == expected, s"bucket=$b")
    }
  }

  test("plan is an equi-join on the bucket, not a nested-loop cross product") {
    val plan = RangeJoin.pointsInIntervals(points, "t", intervals, "s", "e", 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }
}
