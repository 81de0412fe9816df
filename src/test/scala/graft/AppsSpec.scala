package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sinks.Sinks
import graft.sources.{CsvSource, LogLines, TextSource}

/** App parity, end to end: the reference's three hard-coded topologies run
  * raw input file → operator pipeline → formatted sink file, and the sink
  * file is compared byte-for-byte. A user of the reference's wordcount /
  * reddit / nasalog apps gets the same artifacts from this engine (modulo
  * the deterministic ordering the reference lacks — SURVEY §7.5).
  */
class AppsSpec extends SparkTestBase {

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-app").toFile
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.write(content) finally w.close()
    f.getAbsolutePath
  }

  private def outDir(): String =
    Files.createTempDirectory("graft-app-out").resolve("out").toString

  private def readSink(path: String): String = {
    val part = Files.list(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq.head
    new String(Files.readAllBytes(part), "UTF-8")
  }

  test("wordcount app: text file -> F1+P2+A1/A2 -> K1 sink") {
    val in = tmpFile("memes.txt",
      """to be or not
        |http://example.org/very-long dropped
        |to be
        |""".stripMargin)
    val out = outDir()
    Sinks.writeWordCount(
      Relational.wordCount(TextSource.lines(spark, in), "line"),
      "word", "cnt", out)
    assert(readSink(out) == "be:2\nnot:1\nor:1\nto:2\n")
  }

  test("reddit app: headerless CSV -> F2+A3+T1/T2 -> K2 sink") {
    def rec(score: String, user: String) =
      s"id,x,2008-01-01,title,5,r1,a,b,c,d,$score,3,$user"
    val in = tmpFile("reddit.csv", Seq(
      rec("10", "alice"), rec("0", "alice"), rec("-5", "alice"),
      rec("3", "bob"), rec("7", "bob"), rec("1", "carol"),
    ).mkString("\n"))
    val out = outDir()
    val counts = Relational.countPerKey(
      CsvSource.reddit(spark, in)
        .filter(Relational.nonNegative(Relational.toIntOrNull(col("score")))),
      "username")
    Sinks.writeTopK(counts, "username", "cnt", k = 2, out)
    // alice: 2 kept (score -5 dropped), bob: 2, carol: 1; tie alice<bob
    assert(readSink(out) == "alice:2\nbob:2\n")
  }

  test("nasalog app: CLF lines -> F3+F4+P1+A4/A5 -> K3 sink") {
    val in = tmpFile("nasa.log", Seq(
      """h1 - - [01/Jul/1995:00:00:01 -0400] "GET /a HTTP/1.0" 200 100""",
      """h1 - - [01/Jul/1995:00:00:02 -0400] "GET /b HTTP/1.0" 200 100""",
      """h1 - - [01/Jul/1995:00:00:03 -0400] "GET /a HTTP/1.0" 200 100""",
      """h2 - - [01/Jul/1995:00:00:04 -0400] "GET /z HTTP/1.0" 404 0""",
      """h2 - - [01/Jul/1995:00:00:05 -0400] "GET /y HTTP/1.0" 200 50""",
      """malformed line""",
    ).mkString("\n"))
    val out = outDir()
    val routed = Relational.routeProjection(
      LogLines.parseClf(TextSource.lines(spark, in), "line")
        .filter(Relational.equalsFilter(col("status"), "200")),
      "host", "url")
    val perHost = routed.groupBy("host").agg(
      count(lit(1)).as("cnt"), collect_set(col("route")).as("routes"))
    Sinks.writeHostReport(perHost, "host", "cnt", "routes", out)
    assert(readSink(out) ==
      "h1:3\nh1/a\nh1/b\n===\nh2:1\nh2/y\n===\n")
  }
}
