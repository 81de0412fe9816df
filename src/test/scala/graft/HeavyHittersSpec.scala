package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The Misra-Gries guarantees, pinned:
  *
  *  - capacity >= distinct  →  EXACT counts (no decrement ever fires),
  *    repartition-invariant — the regime q86's oracle gate runs in;
  *  - capacity < distinct   →  for every reported (term, cnt_lb, err):
  *    cnt_lb <= true <= cnt_lb + err, err <= n/(capacity+1), and every
  *    term with true count > n/(capacity+1) is present — the mergeable-
  *    summaries bound, which must survive Spark's partial/final split at
  *    ANY partitioning.
  */
class HeavyHittersSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  // deterministic skewed stream: term t_i appears ~ n/(i+1) times (zipf-ish)
  private def zipfStream(nTerms: Int, scale: Int): Seq[String] =
    (0 until nTerms).flatMap(i => Seq.fill(scale / (i + 1))(f"t$i%03d"))

  private def trueCounts(s: Seq[String]): Map[String, Long] =
    s.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }

  private def summarize(s: Seq[String], capacity: Int, parts: Int): Seq[Row] = {
    graft.functions.HeavyHitters.ensureRegistered(spark)
    s.toDF("term").repartition(parts)
      .agg(expr(s"graft_heavy_hitters(term, $capacity)").as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt_lb"), col("e.err"))
      .collect().toSeq
  }

  test("capacity >= distinct: exact counts, err 0, repartition-invariant") {
    val stream = zipfStream(20, 400)
    val exact = trueCounts(stream)
    for (parts <- Seq(1, 7)) {
      val got = summarize(stream, capacity = 64, parts)
      assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap == exact,
        s"parts=$parts")
      assert(got.forall(_.getLong(2) == 0L))
    }
  }

  test("capacity < distinct: lower/upper bounds and the presence guarantee, any partitioning") {
    val stream = zipfStream(150, 3000)
    val exact = trueCounts(stream)
    val n = stream.length.toLong
    val cap = 16
    val threshold = n / (cap + 1) // any term above this MUST be reported
    for (parts <- Seq(1, 4, 13)) {
      val got = summarize(stream, cap, parts)
      assert(got.size <= cap)
      val reported = got.map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      reported.foreach { case (t, (lb, err)) =>
        val truth = exact(t)
        assert(lb <= truth, s"parts=$parts $t: lb $lb > true $truth")
        assert(truth <= lb + err, s"parts=$parts $t: true $truth > $lb+$err")
        assert(err <= threshold, s"parts=$parts err $err > n/(cap+1) $threshold")
      }
      exact.filter(_._2 > threshold).keys.foreach { t =>
        assert(reported.contains(t), s"parts=$parts heavy term $t missing")
      }
    }
  }

  test("nulls and empties are ignored; output is (cnt desc, term asc) ordered") {
    graft.functions.HeavyHitters.ensureRegistered(spark)
    val got = Seq(Some("b"), None, Some("a"), Some("b"), Some("c"), Some("a"))
      .toDF("term")
      .agg(expr("graft_heavy_hitters(term, 8)").as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.term"), col("e.cnt_lb"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("count ties break in UTF-8 BINARY order, not UTF-16 (supplementary plane)") {
    graft.functions.HeavyHitters.ensureRegistered(spark)
    // U+1F600 (😀, UTF-8 F0 9F 98 80; UTF-16 surrogate D83D DE00) vs
    // U+FFFD (UTF-8 EF BF BD; UTF-16 FFFD): UTF-16 code-unit order puts
    // the emoji FIRST, UTF-8 byte order (the oracle's ORDER BY) puts
    // U+FFFD first — the orders disagree, pinning the comparator
    val emoji = "😀"
    val fffd = "�"
    val got = Seq(emoji, fffd).toDF("term")
      .agg(expr("graft_heavy_hitters(term, 8)").as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.term"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(fffd, emoji), s"tie order was $got")
  }

  test("heavyHitterTerms operator: per-group top-k with rank, bounded by k") {
    val df = Seq(
      ("g1", "x x x y y z"), ("g1", "x w"),
      ("g2", "p q p")).toDF("source", "text")
    val out = TextAnalysis.heavyHitterTerms(df, "source", "text",
        capacity = 64, k = 2)
      .orderBy("source", "rk").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(4))).toSeq ==
      Seq(("g1", "x", 4L, 1L), ("g1", "y", 2L, 2L),
          ("g2", "p", 2L, 1L), ("g2", "q", 1L, 2L)))
  }

  test("streaming (complete mode) equals batch: summary state survives the state store") {
    graft.functions.HeavyHitters.ensureRegistered(spark)
    import org.apache.spark.sql.DataFrame
    import graft.streaming.BoundedStream
    val dir = java.nio.file.Files.createTempDirectory("hh_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("hh_ckpt").toFile
    java.nio.file.Files.write(new java.io.File(dir, "a.txt").toPath,
      java.util.Arrays.asList("a b a", "c a"))
    java.nio.file.Files.write(new java.io.File(dir, "b.txt").toPath,
      java.util.Arrays.asList("b b c", "a"))
    val transform = (df: DataFrame) =>
      df.select(explode(split(col("line"), " ")).as("term"))
        .filter(col("term") =!= "")
        .agg(expr("graft_heavy_hitters(term, 8)").as("hh"))
    // one file per micro-batch, so partial summaries MERGE through the
    // streaming state store (serialize/deserialize round trip included)
    val streamed = BoundedStream.runAvailableNow(spark,
      BoundedStream.textStream(spark, dir.getPath, maxFilesPerTrigger = Some(1)),
      transform, ckpt.getPath, "hh_stream_parity")
    def rows(df: DataFrame) = df.select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt_lb"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = transform(
      spark.read.text(dir.getPath).withColumnRenamed("value", "line"))
    assert(rows(streamed) == Seq(("a", 4L), ("b", 3L), ("c", 2L)))
    assert(rows(streamed) == rows(batch))
  }

  test("plan fact: the aggregate runs as ObjectHashAggregate (partial + final)") {
    graft.functions.HeavyHitters.ensureRegistered(spark)
    val plan = Seq("a", "b").toDF("term")
      .groupBy(lit(1)).agg(expr("graft_heavy_hitters(term, 8)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
