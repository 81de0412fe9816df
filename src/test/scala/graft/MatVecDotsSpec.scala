package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.operators.Similarity

/** The native mat×vec dot-products expression must be bit-identical to the
  * composed per-plane `aggregate(zip_with(…)) / scale` form it replaced —
  * the invariant that lets [[Similarity.randomProject]] and
  * [[Similarity.signBucket]] swap implementations without touching any
  * oracle. (CosineSimSpec's contract, applied to projection.)
  */
class MatVecDotsSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def composedPlaneDots(planes: Array[Array[Double]], scale: Double) =
    array(planes.toSeq.map { w =>
      Similarity.dot(col("v"), array(w.toSeq.map(lit): _*)) / lit(scale)
    }: _*)

  test("native planeDots equals composed per-plane HOF dots bit-for-bit") {
    GraftExtensions.ensureRegistered(spark, "graft_matvec_dots")
    val hp = Similarity.hyperplanes(16, 64)
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map(i => (i.toLong,
      Array.fill(64)(rnd.nextDouble() * 2 - 1))).toDF("id", "v")
    val out = df.select(
      composedPlaneDots(hp, 4.0).as("hof"),
      Similarity.planeDots(col("v"), hp, 4.0).as("native"))
      .collect()
    out.foreach { r =>
      val h = r.getSeq[Double](0)
      val n = r.getSeq[Double](1)
      assert(h.length == n.length)
      h.zip(n).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b), s"$a != $b")
      }
    }
  }

  test("expression participates in whole-stage codegen; plan is O(1) in planes") {
    GraftExtensions.ensureRegistered(spark, "graft_matvec_dots")
    val hp = Similarity.hyperplanes(16, 64)
    // the vector feeder must itself be codegen-capable: a transform() HOF
    // would collapse into the same Project and veto whole-stage codegen
    val df = spark.range(1, 11)
      .select(array((0 until 64).map(i =>
        (col("id") + i).cast("double")): _*).as("v"))
      .select(Similarity.planeDots(col("v"), hp, 4.0).as("proj"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[matvecdots""".r.findFirstIn(plan).isDefined, plan)
    // the planes ride as ONE literal: no per-plane aggregate/zip_with nodes
    assert(!plan.contains("zip_with") && !plan.contains("aggregate("), plan)
    df.collect()
  }

  test("mismatched/null matrix rows yield NULL elements, like the HOF form") {
    GraftExtensions.ensureRegistered(spark, "graft_matvec_dots")
    val mat = typedLit(Seq(Seq(1.0, 1.0), Seq(1.0, 2.0, 3.0), null))
    val out = spark.range(1, 3)
      .select(array(col("id").cast("double"), lit(10.0)).as("v"))
      .select(call_function("graft_matvec_dots", col("v"), mat, lit(1.0)).as("d"))
      .collect()
    out.zipWithIndex.foreach { case (r, i) =>
      val d = r.getSeq[java.lang.Double](0)
      assert(d.length == 3)
      assert(d(0) == (i + 1) + 10.0)     // matching row: left-to-right dot
      assert(d(1) == null, "length-mismatched row must be null")
      assert(d(2) == null, "null row must be null")
    }
  }

  test("signBucket on a NULL vector stays bucket 0 (composed-form behavior)") {
    GraftExtensions.ensureRegistered(spark, "graft_matvec_dots")
    val hp = Similarity.hyperplanes(8, 4)
    val df = Seq((0L, Some(Array(1.0, -1.0, 1.0, -1.0))), (1L, None))
      .toDF("id", "v")
    val out = df.select(col("id"), Similarity.signBucket(col("v"), hp).as("b"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).getLong(1) == 0L, "null vector must land in bucket 0")
  }
}
