package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.{CsvSource, JsonSource, LogLines, TextSource}

/** Source-layer tests (S1/S2/S4/S5): the three reference apps run end-to-end
  * from RAW files — text lines, headerless CSV, CLF log lines — written to a
  * temp dir by the test (FIXTURES.md §A shapes), with results checked against
  * in-memory expectations.
  */
class SourcesSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-src").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.write(content) finally w.close()
    f.getAbsolutePath
  }

  // ---- S1+S5 text source --------------------------------------------------

  test("S1: Q1 wordcount from a raw text file") {
    val path = tmpFile("memes.txt",
      """the quick fox
        |http://t.co/abc 2008-01-02
        |the slow fox
        |20081231xyz dropped line
        |""".stripMargin)
    val wc = Relational.wordCount(TextSource.lines(spark, path), "line")
      .as[(String, Long)].collect().toMap
    assert(wc == Map("the" -> 2L, "quick" -> 1L, "slow" -> 1L, "fox" -> 2L))
  }

  test("S5: linesNumbered assigns exact contiguous file-order numbers") {
    val path = tmpFile("n.txt", "alpha\nbeta\ngamma\n")
    val got = TextSource.linesNumbered(spark, path)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")))
  }

  test("S5: linesWithId ids are unique and file-order monotonic") {
    val path = tmpFile("m.txt", (1 to 100).map(i => s"line$i").mkString("\n"))
    val got = TextSource.linesWithId(spark, path)
      .select("linenumber").as[Long].collect()
    assert(got.distinct.length == 100)
  }

  // ---- S2+S4 CSV source ---------------------------------------------------

  test("S2/S4: Q2 reddit top-K from a raw headerless 13-column CSV") {
    // 13 columns; only 2 (rawtime), 10 (score), 12 (username) matter here.
    def rec(score: String, user: String) =
      s"id,x,2008-01-01,title,5,r1,a,b,c,d,$score,3,$user"
    val path = tmpFile("reddit.csv", Seq(
      rec("10", "alice"), rec("0", "alice"), rec("-5", "alice"),
      rec("7", "bob"), rec("bad", "carol") // non-numeric score -> null -> dropped
    ).mkString("\n"))
    val df = CsvSource.reddit(spark, path)
    assert(df.columns.toSeq == CsvSource.redditFields)
    val counts = Relational.countPerKey(
      df.filter(Relational.nonNegative(Relational.toIntOrNull(col("score")))), "username")
    val got = Relational.topK(counts, 50, "cnt", "username")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("alice", 2L), ("bob", 1L)))
  }

  test("S4: column pruning reaches the CSV scan") {
    val path = tmpFile("prune.csv", "a,b,c,d,e,f,g,h,i,j,k,l,m")
    val plan = CsvSource.reddit(spark, path).select("username")
      .queryExecution.executedPlan.toString
    // The scan should read only the projected column, not all 13.
    assert(plan.contains("ReadSchema: struct<username:string>"), plan)
  }

  // ---- S3 CLF through the full Q3 pipeline --------------------------------

  test("S3: Q3 nasalog from raw CLF lines with P1 route projection") {
    val path = tmpFile("nasa.log", Seq(
      """h1 - - [01/Jul/1995:00:00:01 -0400] "GET /a HTTP/1.0" 200 100""",
      """h1 - - [01/Jul/1995:00:00:02 -0400] "GET /b HTTP/1.0" 200 100""",
      """h1 - - [01/Jul/1995:00:00:03 -0400] "GET /a HTTP/1.0" 200 100""",
      """h2 - - [01/Jul/1995:00:00:04 -0400] "GET /a HTTP/1.0" 404 100""",
      """malformed line""").mkString("\n"))
    val parsed = LogLines.parseClf(TextSource.lines(spark, path), "line")
    val routed = Relational.routeProjection(
      parsed.filter(col("status") === "200"), "host", "url")
    val got = Relational.countAndDistinct(routed, "host", "route")
      .orderBy("host").as[(String, Long, String)].collect().toSeq
    assert(got == Seq(("h1", 3L, "h1/a,h1/b")))
  }

  // ---- from_csv string-column parsing (the in-gate q2_csv_roundtrip path) --

  test("parseCsvColumn round-trips rendered records") {
    import org.apache.spark.sql.types._
    val df = Seq((1L, 2.5), (2L, -1.0)).toDF("user_id", "value")
      .select(concat_ws(",", col("user_id"), col("value")).as("rec"))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val got = CsvSource.parseCsvColumn(df, "rec", schema)
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 2.5), (2L, -1.0)))
  }

  // ---- JSONL source ------------------------------------------------------

  test("jsonl reads schema'd lines, drops or quarantines malformed rows") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jsonl"),
      Seq("""{"user_id": 1, "value": 2.5}""",
        """not json at all""",
        """{"user_id": 2, "value": -1.0}""").mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    // default: malformed rows dropped
    val clean = JsonSource.jsonl(spark, dir, schema)
      .as[(Long, Double)].collect().toSet
    assert(clean == Set((1L, 2.5), (2L, -1.0)))
    // quarantine form: the raw line is preserved for a dead-letter sink
    val kept = JsonSource.jsonl(spark, dir, schema, keepCorrupt = true)
    assert(kept.count() == 3)
    val corrupt = kept.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(corrupt.toSeq == Seq("not json at all"))
  }

  test("parseJsonColumn round-trips to_json output") {
    import org.apache.spark.sql.types._
    val df = Seq((1L, 2.5), (2L, -1.0)).toDF("user_id", "value")
      .select(to_json(struct(col("user_id"), col("value"))).as("rec"))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val got = JsonSource.parseJsonColumn(df, "rec", schema)
      .as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 2.5), (2L, -1.0)))
  }
}
