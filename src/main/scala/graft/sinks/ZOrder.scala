package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) write layout: multi-dimensional data skipping for
  * the columns a table is FILTERED by but not partitioned on.
  *
  * Hive partitioning prunes on the partition column and bucketing co-locates
  * a join key, but a range predicate on a SECOND column still scans every
  * file — at 100 TB that is the difference between touching 2% of the
  * corpus and all of it. Sorting files by the interleaved bits of k ranked
  * columns makes every file cover a small hyper-rectangle of the value
  * space, so the parquet reader's row-group min/max statistics exclude most
  * files for a predicate on ANY of the k columns (the classic z-order
  * clustering of analytic table formats, here as a plain write-path
  * operator producing ordinary parquet).
  *
  * Mechanics: each column is scaled to a `bits`-bit integer rank by its
  * global min/max (one aggregation row, broadcast into the plan — never a
  * driver scalar), ranks interleave bit-by-bit into one long z-value
  * (column j's bit i lands at position `i·k + j`), and the frame is
  * range-partitioned + sorted by that z-value, then written WITHOUT it.
  * `k · bits` must fit a signed long (≤ 62); 16 bits over 2-3 columns is
  * the usual sweet spot — finer ranks than the row-group count cannot be
  * observed by the stats anyway.
  *
  * Scale: one agg for the bounds + one range exchange (the write's
  * repartition, which a layout rewrite pays by definition); the z-value
  * itself is pure codegen'd bit arithmetic. `repartitionByRange` samples
  * the z distribution for boundaries, so file BOUNDARIES can shift between
  * runs — the skipping property holds for any boundaries because the data
  * inside each file is z-contiguous either way.
  */
object ZOrder {

  /** Interleave the low `bits` bits of k NON-NEGATIVE long columns into one
    * z-value long (column j's bit i at position `i·k + j`). Callers feed
    * already-ranked columns; [[writeZOrdered]] does the ranking.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 1, "zValue needs at least one column")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must be in [1, 62], got $k*$bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as parquet laid out along the z-order curve of `zCols`
    * (numeric columns), in `numFiles` z-contiguous files. The scaling
    * bounds come from one broadcast aggregation row; a constant column
    * (max = min) ranks to 0 everywhere and simply contributes nothing to
    * the curve.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    val aggs = zCols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"_min_$c"),
      max(col(c)).cast("double").as(s"_max_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val maxRank = (1L << bits) - 1
    val ranked = zCols.map { c =>
      val span = col(s"_max_$c") - col(s"_min_$c")
      when(span <= 0, lit(0L)).otherwise(
        ((col(c).cast("double") - col(s"_min_$c")) / span * maxRank)
          .cast("long")).as(s"_rank_$c")
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", zValue(ranked.map(r => r), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .select(df.columns.map(col).toSeq: _*)
      .write.mode("overwrite").parquet(path)
  }
}
