package graft

import org.apache.spark.sql.functions._
import graft.sources.LogLines

class LogLinesSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val clf =
    """in24.inetnebr.com - - [01/Aug/1995:00:00:01 -0400] "GET /shuttle/missions/sts-68/news/sts-68-mcc-05.txt HTTP/1.0" 200 1839"""

  test("parseClf extracts the reference's five fields") {
    val got = LogLines.parseClf(Seq(clf).toDF("line"), "line")
      .as[(String, String, String, String, String)].collect().head
    // spout/spout.go:186-198: host=f0, date=f3[1:3], request=f5[1:], url=f6, status=f8
    assert(got == (
      "in24.inetnebr.com",
      "01",                                    // day-of-month chars of "[01/Aug..."
      "GET",                                   // leading quote stripped
      "/shuttle/missions/sts-68/news/sts-68-mcc-05.txt",
      "200"))
  }

  test("parseClf drops malformed lines (<9 whitespace fields)") {
    val df = Seq(clf, "too short line", "a b c d e f g h", "").toDF("line")
    assert(LogLines.parseClf(df, "line").count() == 1)
    // exactly 9 fields passes
    val nine = Seq("h - - [02/X:0 -0] \"GET /u HTTP/1.0\" 200").toDF("line")
    assert(LogLines.parseClf(nine, "line").count() == 1)
  }

  test("parseClf collapses whitespace runs like Go strings.Fields") {
    val spaced = clf.replace(" - - ", "  -   -  ")
    val got = LogLines.parseClf(Seq(spaced).toDF("line"), "line")
      .select("host", "status").as[(String, String)].collect().head
    assert(got == ("in24.inetnebr.com", "200"))
  }

  test("parseClf round-trips the q4 rendered lines") {
    // q4_log_parse renders CLF from events columns then parses back;
    // assert parse(render(x)) == x on a hand-built example.
    val rendered = Seq("u42 - - [01/Jul/1995:00:00:01 -0400] \"GET /e/click HTTP/1.0\" 200 0")
      .toDF("line")
    val got = LogLines.parseClf(rendered, "line")
      .select("host", "url", "status").as[(String, String, String)].collect().head
    assert(got == ("u42", "/e/click", "200"))
  }
}
