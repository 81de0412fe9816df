package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The fused `graft_shingles64` expression must agree with the composable
  * column chain it replaced (tokenize → shingle → distinct → md5 → 60-bit →
  * sort) — that chain is what the DuckDB oracles reproduce, so equality here
  * is what keeps q9/q10/q21/q25 under the same oracle hashes.
  */
class HashedShinglesSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  graft.functions.HashedShingles.ensureRegistered(TestSpark.spark)

  /** The pre-fusion reference implementation, kept verbatim. */
  private def composable(text: org.apache.spark.sql.Column, n: Int) =
    array_sort(transform(
      TextAnalysis.shingles(text, n),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))

  private def assertAgree(texts: Seq[String], n: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(
      call_function("graft_shingles64", col("text"), lit(n)).as("fused"),
      composable(col("text"), n).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fused=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
    }
  }

  test("matches the composable chain on hand-picked shapes") {
    assertAgree(Seq(
      "a b c d e",
      "a b c d e f g h i j k l m",
      "a a a a a",            // repeated shingles collapse
      "one_token",            // shorter than n -> empty
      "two tokens",           // exactly n-1 at n=3 -> empty
      "a b c",                // exactly n -> one shingle
      "",                     // empty string -> one empty token
      "a  b c d",             // double space -> empty middle token kept
      " leading and trailing ",
      "unicode café über straße tokens here",
    ), n = 3)
  }

  test("matches the composable chain across n") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs")
    Seq(1, 2, 3, 5).foreach(n => assertAgree(texts, n))
  }

  test("matches the composable chain on fixture documents") {
    val docs = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(200)
      .as[String].collect().toSeq
    assertAgree(docs, n = 3)
  }

  test("null text yields null, and stays inside codegen") {
    val df = Seq((1L, Option("a b c d")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val out = df.select(col("id"),
      call_function("graft_shingles64", col("text"), lit(3)).as("sh"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1).nonEmpty)
    assert(out(1).isNullAt(1))
    // whole-stage codegen marker: the fused expression must not fall back
    val plan = df.select(call_function("graft_shingles64", col("text"), lit(3)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("LocalTableScan"),
      s"expected codegen'd plan, got:\n$plan")
  }
}
