package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.sinks.ZOrder

/** The z-order layout's one claim is OBSERVABLE skipping: a range predicate
  * on the second dimension must decode far fewer rows from a z-ordered
  * parquet directory than from one laid out by the first dimension alone —
  * that is what the parquet row-group min/max stats can and cannot exclude.
  */
class ZOrderSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  test("zValue interleaves bits; order groups both dimensions") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x bit i -> position 2i, y bit i -> position 2i+1
    assert(z == Seq(0L, 1L, 2L, 15L))
  }

  /** Rows DECODED by the scan (post row-group skipping, pre Spark filter) —
    * read from the executed plan's scan metric, on the same QueryExecution
    * that ran (AQE finalizes the plan only after execution).
    */
  private def decodedRows(path: String, cond: Column): (Long, Long) = {
    val q = spark.read.parquet(path).filter(cond)
    // collect() runs q's OWN QueryExecution (count() would spawn a fresh
    // one and leave these metrics untouched)
    val kept = q.collect().length.toLong
    val plan = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collect { case f: FileSourceScanExec => f }.head
    (scan.metrics("numOutputRows").value, kept)
  }

  test("second-dimension predicate decodes far fewer rows than a linear sort") {
    val n = 1 << 14
    // two independent uniform dims in [0, 128)
    val df = spark.range(n).select(
      (col("id") % 128).as("x"),
      pmod(hash(col("id")), lit(128)).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString

    // linear layout: ideal for x-filters, blind for y
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrder.writeZOrdered(df, s"$base/zorder", Seq("x", "y"), numFiles = 16,
      bits = 7)

    val cond = col("y") < 8 // 1/16 of the y space
    val (linDecoded, linKept) = decodedRows(s"$base/linear", cond)
    val (zDecoded, zKept) = decodedRows(s"$base/zorder", cond)
    // identical answers ...
    assert(zKept == linKept && zKept > 0)
    // ... but the linear layout decodes everything (y uniform per file)
    // while z-contiguous files exclude the y range via row-group stats
    assert(linDecoded == n.toLong, s"linear decoded $linDecoded")
    assert(zDecoded <= n / 2, s"z-ordered decoded $zDecoded of $n")

    // the layout still skips on the FIRST dimension too (z covers both)
    val (zxDecoded, _) = decodedRows(s"$base/zorder", col("x") < 8)
    assert(zxDecoded <= n / 2, s"z-ordered decoded $zxDecoded for x-filter")
  }
}
