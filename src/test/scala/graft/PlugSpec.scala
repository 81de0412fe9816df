package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Plug
import graft.operators.Relational

/** The pluggable operator API (§2.10): a wordcount topology assembled purely
  * from Plug contracts must equal the operator-library implementation.
  */
class PlugSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  test("a Plug pipeline reproduces Relational.wordCount exactly") {
    val lines = Seq("to be or not", "to be", "be be").toDF("line")

    // spout = the frame above; bolts: F1 filter, P2 tokenize+explode, A1+A2 count
    val spout = new Plug.Spout {
      def open(spark: SparkSession): DataFrame = lines
    }
    val pipeline = Plug.Pipeline(
      spout,
      Plug.FilterBolt(Relational.metadataLineFilter(col("line"))),
      Plug.GeneratorBolt(split(col("line"), " "), as = "word"),
      Plug.FilterBolt(col("word") =!= ""),
      new Plug.Bolt { def apply(df: DataFrame): DataFrame =
        df.groupBy("word").agg(count(lit(1)).as("cnt")) },
    )

    val viaPlug = pipeline.run(spark).orderBy("word")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaLib = Relational.wordCount(lines, "line").orderBy("word")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaPlug.toSeq == viaLib.toSeq && viaLib.nonEmpty)
  }

  test("ScalarBolt is a named-expression projection") {
    val df = Seq((2, 3)).toDF("a", "b")
    val out = Plug.ScalarBolt("sum" -> (col("a") + col("b")), "a" -> col("a"))(df)
    assert(out.columns.toSeq == Seq("sum", "a"))
    assert(out.head.getInt(0) == 5)
  }

  test("foldBolt: typed Aggregator sums per key with partial/final split") {
    val ds = Seq(("a", 1L), ("b", 10L), ("a", 2L)).toDS()
    val out = Plug.foldBolt[(String, Long), String, Long, Long](
      ds, _._1, Plug.LongSum[(String, Long)](_._2))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 3L), ("b", 10L)))
  }

  test("a file-backed Spout streams through the same pipeline") {
    val dir = Files.createTempDirectory("plug-src")
    Files.write(dir.resolve("in.txt"), "x y\nx".getBytes("UTF-8"))
    val spout = new Plug.Spout {
      def open(spark: SparkSession): DataFrame =
        graft.sources.TextSource.lines(spark, dir.toString)
    }
    val out = Plug.Pipeline(
      spout,
      Plug.GeneratorBolt(split(col("line"), " "), as = "word"),
      new Plug.Bolt { def apply(df: DataFrame): DataFrame =
        df.groupBy("word").agg(count(lit(1)).as("cnt")) },
    ).run(spark).orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("x", 2L), ("y", 1L)))
  }
}
