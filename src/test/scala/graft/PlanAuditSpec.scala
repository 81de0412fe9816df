package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.PlanAudit

/** The plan linter against constructed plans whose hazards are known by
  * construction — and a proof that auditing never executes the query.
  */
class PlanAuditSpec extends SparkTestBase {
  import TestSpark.spark
  import spark.implicits._

  private def hazardSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanAudit.hazards(df).map(h => s"${h.severity}:${h.hazard}").toSet

  test("cartesian product and non-equi join are ERROR hazards; scaleSafe refuses them") {
    val a = spark.range(0, 1000).toDF("x")
    val b = spark.range(0, 1000).toDF("y")
    val noBroadcast = spark.newSession()
    noBroadcast.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val a2 = noBroadcast.range(0, 1000).toDF("x")
    val b2 = noBroadcast.range(0, 1000).toDF("y")
    val cross = a2.crossJoin(b2)
    assert(hazardSet(cross).contains("ERROR:cartesian-product"))
    assert(!PlanAudit.scaleSafe(cross))
    // non-equi OUTER join can only plan as a nested-loop
    val bnl = a.join(b, col("x") < col("y"), "left_outer")
    assert(hazardSet(bnl).contains("ERROR:nested-loop-join"))
    assert(!PlanAudit.scaleSafe(bnl))
  }

  test("scalar-broadcast cross joins downgrade to INFO bounded-pair-join") {
    val noBroadcast = spark.newSession()
    noBroadcast.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val d = noBroadcast.range(0, 1000).toDF("x")
    // corpus-total against every row: the ordinary scalar idiom
    val scalarCross = d.crossJoin(d.agg(sum("x").as("total")))
    assert(hazardSet(scalarCross).contains("INFO:bounded-pair-join"))
    assert(!hazardSet(scalarCross).contains("ERROR:cartesian-product"))
    assert(PlanAudit.scaleSafe(scalarCross))
    // literal few-row side, non-equi: bounded work per probe row
    import noBroadcast.implicits._
    val thresholds = Seq(10L, 100L, 500L).toDF("t")
    val banded = d.join(thresholds, col("x") < col("t"), "left_outer")
    assert(hazardSet(banded).contains("INFO:bounded-pair-join"))
    assert(PlanAudit.scaleSafe(banded))
  }

  test("global window is WARN; partitioned window is not flagged") {
    val d = spark.range(0, 100).toDF("x")
    val global = d.withColumn("r", row_number().over(Window.orderBy("x")))
    assert(hazardSet(global).contains("WARN:global-window"))
    assert(PlanAudit.scaleSafe(global)) // WARN, not ERROR
    val partitioned = d.withColumn("r",
      row_number().over(Window.partitionBy(col("x") % 10).orderBy("x")))
    assert(!hazardSet(partitioned).contains("WARN:global-window"))
  }

  test("global sort is INFO; a clean aggregation carries only exchange-count rows") {
    val d = spark.range(0, 100).toDF("x")
    // sort a DERIVED column: range is already ordered by x, so an
    // orderBy("x") is optimizer-eliminated before planning
    assert(hazardSet(d.select((col("x") * 7 % 13).as("y")).orderBy("y"))
      .contains("INFO:global-sort"))
    val clean = d.groupBy((col("x") % 10).as("g")).agg(sum("x").as("s"))
    val hs = PlanAudit.hazards(clean)
    assert(hs.forall(_.severity == "INFO"))
    assert(hs.find(_.hazard == "shuffles").get.detail == "count=1")
  }

  test("unfiltered parquet scan is INFO; a pushed filter clears it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    spark.range(0, 100).toDF("x").write.mode("overwrite")
      .parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    assert(hazardSet(t.groupBy().count()).contains("INFO:unfiltered-scan"))
    assert(!hazardSet(t.filter(col("x") > 50).groupBy().count())
      .contains("INFO:unfiltered-scan"))
  }

  test("hint-forced broadcast over the threshold is WARN; planner-chosen broadcast is not") {
    val ns = spark.newSession()
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    val big = ns.range(0, 100000).toDF("x")
    val forced = big.join(
      broadcast(big.withColumnRenamed("x", "y")), col("x") === col("y"))
    assert(hazardSet(forced).contains("WARN:large-broadcast"))
    // a side the planner itself sized under the threshold is fine
    val small = ns.range(0, 10).toDF("y")
    val chosen = big.join(small, col("x") === col("y"))
    assert(hazardSet(chosen).contains("INFO:broadcasts") &&
      !hazardSet(chosen).contains("WARN:large-broadcast"))
    // with auto-broadcast disabled every broadcast is deliberate: skip
    val off = spark.newSession()
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val offBig = off.range(0, 100000).toDF("x")
    val offForced = offBig.join(
      broadcast(offBig.withColumnRenamed("x", "y")), col("x") === col("y"))
    assert(!hazardSet(offForced).contains("WARN:large-broadcast"))
  }

  test("dogfood: the engine's own operators plan scale-safe") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(PlanAudit.scaleSafe(
      graft.operators.Dedup.exact(docs, "doc_id", "text")))
    assert(PlanAudit.scaleSafe(
      graft.operators.TextAnalysis.qualityRules(docs, "doc_id", "text")))
    // bm25Search carries a corpus-stats scalar cross join: must read as
    // the bounded idiom, not an ERROR
    assert(PlanAudit.scaleSafe(graft.operators.TextAnalysis.bm25Search(
      docs, "doc_id", "text", Seq("beta"), k = 2)))
  }

  test("audit plans but never executes; TVF form works from SQL") {
    val d = spark.range(0, 10).toDF("x")
      .select(expr("assert_true(x < 5, 'boom')").as("a"), col("x"))
    // executing d would throw (rows with x >= 5); auditing must not
    val rows = PlanAudit.audit(d).collect()
    assert(rows.nonEmpty)
    graft.functions.GraftTableFunctions.ensureRegistered(spark)
    spark.range(0, 10).toDF("x").createOrReplaceTempView("plan_audit_t")
    val tvf = spark.sql(
      "SELECT * FROM graft_plan_audit(" +
        "'SELECT x, row_number() OVER (ORDER BY x) r FROM plan_audit_t')")
      .collect()
    assert(tvf.exists(r => r.getString(1) == "global-window"))
  }
}
