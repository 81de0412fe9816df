package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Count-Min sketch (`graft_cms` + [[TextAnalysis.cmsEstimate]]): the
  * one-sided error contract and partial-aggregation invariance — the two
  * properties the 100 TB story stands on (bounded mergeable state, never
  * an undercount).
  */
class CountMinSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def sketchOf(terms: Seq[String], depth: Int, width: Int,
                       parts: Int): Array[Long] = {
    graft.functions.CountMinSketch.ensureRegistered(spark)
    terms.toDF("term").repartition(parts)
      .agg(call_function("graft_cms", col("term"), lit(depth), lit(width)))
      .head.getSeq[Long](0).toArray
  }

  test("estimate >= true count for every term; total slot = stream length") {
    val rnd = new scala.util.Random(41)
    val terms = (0 until 5000).map(_ => s"t${rnd.nextInt(300)}")
    val sk = sketchOf(terms, depth = 4, width = 64, parts = 7)  // narrow: collisions guaranteed
    assert(sk.length == 4 * 64 + 1)
    assert(sk.last == 5000L)
    val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Seq(1).toDF("x")
      .crossJoin(truth.keys.toSeq.toDF("term"))
      .withColumn("est", TextAnalysis.cmsEstimate(
        typedlit(sk.toSeq), col("term"), depth = 4, width = 64))
      .select("term", "est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"undercount for $t: est=${est(t)} true=$c")
    }
    // every sketch row's cells sum to the stream length (mass conservation)
    (0 until 4).foreach { r =>
      assert(sk.slice(r * 64, (r + 1) * 64).sum == 5000L, s"row $r")
    }
  }

  test("sketch is invariant to partitioning (mergeable-summary contract)") {
    val terms = (0 until 2000).map(i => s"w${i % 111}")
    val one = sketchOf(terms, depth = 4, width = 128, parts = 1)
    val many = sketchOf(terms, depth = 4, width = 128, parts = 13)
    assert(one.toSeq == many.toSeq)
  }

  test("wide sketch over a small vocabulary is exact (no collisions regime)") {
    val terms = (0 until 900).map(i => s"v${i % 30}")
    val rep = TextAnalysis.cmsFrequencyReport(
        terms.map(t => (1L, t)).toDF("doc_id", "text"), "text",
        k = 30, depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.length == 30)
    // 30 distinct 28-bit-hashed terms in 4096 cells: any collision would
    // surface as est > true on BOTH colliding terms in all 4 rows — with
    // these fixed md5 hashes there is none, so the sketch reads exact
    rep.foreach { case (t, tc, ec) => assert(ec == tc, s"$t: $ec != $tc") }
  }

  test("graft_cms rejects bad geometry") {
    val df = Seq("a").toDF("term")
    graft.functions.CountMinSketch.ensureRegistered(spark)
    intercept[Exception] {
      df.agg(expr("graft_cms(term, 0, 16)")).collect()
    }
    intercept[Exception] {
      df.agg(expr("graft_cms(term, 99, 16)")).collect()
    }
  }

  test("streaming (complete mode) sketch equals batch: buffers merge through the state store") {
    graft.functions.CountMinSketch.ensureRegistered(spark)
    import org.apache.spark.sql.DataFrame
    import graft.streaming.BoundedStream
    val dir = java.nio.file.Files.createTempDirectory("cms_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("cms_ckpt").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.txt").toPath,
      java.util.Arrays.asList("a b a c", "d a"))
    java.nio.file.Files.write(new java.io.File(dir, "b.txt").toPath,
      java.util.Arrays.asList("b b c e", "a f"))
    val transform = (df: DataFrame) =>
      df.select(explode(split(col("line"), " ")).as("term"))
        .filter(col("term") =!= "")
        .agg(call_function("graft_cms", col("term"), lit(4), lit(64)).as("sk"))
    val streamed = BoundedStream.runAvailableNow(spark,
      BoundedStream.textStream(spark, dir.getPath, maxFilesPerTrigger = Some(1)),
      transform, ckpt.getPath, "cms_stream_parity")
      .head.getSeq[Long](0)
    val batch = transform(
      spark.read.text(dir.getPath).withColumnRenamed("value", "line"))
      .head.getSeq[Long](0)
    assert(streamed == batch)          // cell-for-cell, total slot included
    assert(streamed.last == 12L)
  }
}
