package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** S1 text-line file source + S5 line-number generator.
  *
  * The reference's spout opens a local file and scans it line-by-line with a
  * monotonically increasing `LineNum` attached to each tuple
  * (`spout/spout.go:82-97`, `:185-186`, `:234-237`). Spark-native form:
  * `spark.read.text` (distributed, columnar, pushdown-capable) with a choice
  * of two line-number flavors, because exact contiguity costs a pass:
  *
  *  - [[linesNumbered]]: exact, contiguous, file-order line numbers via
  *    `zipWithIndex` — needs one extra job to count partition sizes; use when
  *    the reference's exact `LineNum` semantics matter (they never do
  *    downstream in the reference: no operator reads `linenumber`).
  *  - [[linesWithId]]: `monotonically_increasing_id` — single-pass, unique,
  *    ordered within a partition but non-contiguous; the 100 TB default.
  */
object TextSource {

  /** S1: the raw line stream, one string column `line`. */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "line")

  /** S1+S5, scale path: unique-but-sparse ids, no extra pass. */
  def linesWithId(spark: SparkSession, path: String): DataFrame =
    lines(spark, path).withColumn("linenumber", monotonically_increasing_id())

  /** S1+S5, exact semantics: contiguous 0-based line numbers in file order
    * (`zipWithIndex` runs one extra count job — fine for bounded inputs,
    * documented cost at scale).
    */
  def linesNumbered(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.read.text(path).rdd.map(_.getString(0)).zipWithIndex()
    val schema = StructType(Seq(
      StructField("linenumber", LongType, nullable = false),
      StructField("line", StringType, nullable = true)))
    spark.createDataFrame(rdd.map { case (l, i) => Row(i, l) }, schema)
  }
}
