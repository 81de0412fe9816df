package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic (ordered per-key) window functions — the lag/running-total/
  * moving-average surface. The reference has no window functions at all
  * (SURVEY §2.7); event-time windows live in [[Windowed]], and this
  * declares the ORDER-dependent analytic family over a keyed sequence.
  *
  * Determinism contract: the window order is the total order
  * (`secCol`, `idCol`) — `idCol` must be unique — so every lag/frame is
  * identical across engines and runs. Monetary values are aggregated as
  * integer cents (`round(value·100)` once, map-side), so running totals
  * and windowed means are EXACT 64-bit arithmetic: no float-summation
  * order to disagree on, which is what makes the output oracle-hashable.
  *
  * Scale shape: one shuffle on `keyCol`, then a single sort per partition
  * serves all four window functions (Catalyst collapses same-spec windows
  * into one Window exec). Per-key data must fit a task — the same hot-key
  * bound as any per-key ordered pass; [[sequenceStatsBucketed]] is the
  * hot-key form (same output, proven identical), partitioning on
  * (key, time bucket) and stitching bucket edges with carry rows.
  */
object Analytics {

  /** Per-key sequence statistics over an event stream: for each row,
    * the gap to the previous event (`gap_s`), the running total of the
    * value in cents (`run_cents`), and the mean of the trailing `movK`
    * values (`mov_avg`, rounded to 4dp). Input: `secCol` epoch seconds,
    * `valCol` a double "amount"; output keeps (key, id, sec) plus the
    * three analytics.
    */
  def sequenceStats(df: DataFrame, keyCol: String, secCol: String,
                    idCol: String, valCol: String, movK: Int = 3): DataFrame = {
    require(movK >= 1, s"movK must be >= 1: $movK")
    val order = Seq(col(secCol).asc, col(idCol).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-(movK - 1), Window.currentRow)
    df.select(col(keyCol), col(idCol), col(secCol),
        round(col(valCol) * 100).cast("long").as("cents"))
      .withColumn("gap_s", col(secCol) - lag(col(secCol), 1).over(w))
      .withColumn("run_cents", sum("cents").over(wRun).cast("long"))
      .withColumn("mov_avg",
        round(sum("cents").over(wMov).cast("double")
          / count(lit(1)).over(wMov) / 100.0, 4))
      .drop("cents")
  }

  /** [[sequenceStats]] for HOT keys: identical output (AnalyticsSpec proves
    * row-for-row equality, including across empty buckets), but no task
    * ever sorts a whole key — the window partitions on (key, time bucket)
    * and two cheap boundary passes stitch the bucket edges:
    *
    *  1. CARRY ROWS: each (key, bucket)'s last c = max(movK−1, 1) rows are
    *     re-tagged into the key's next c NON-EMPTY buckets (`lead` over the
    *     tiny per-(key, bucket) frame finds them, so multi-bucket gaps are
    *     handled). A bucket's early rows thus always see their movK−1 true
    *     predecessors — even when intervening buckets hold fewer than c
    *     rows, the context reaches from further back; surplus carried rows
    *     are themselves true predecessors in correct sort positions, so
    *     the trailing frame simply picks the immediate ones.
    *  2. RUNNING OFFSET: per (key, bucket), the cumulative total of all
    *     PRIOR buckets minus the carried-in cents (which the within-bucket
    *     running sum will count again) — added to the within-bucket
    *     running sum, this reconstructs the global `run_cents` exactly.
    *
    * Cost: the big data shuffles once on (key, bucket) — per-task work is
    * bounded by the bucket, so one user with 10⁹ events spreads over
    * horizon/bucketSeconds tasks; everything else (bucket totals, carries,
    * offsets) is rows-per-(key, bucket)-sized. Pick `bucketSeconds` so a
    * hot key's densest bucket fits a task.
    */
  def sequenceStatsBucketed(df: DataFrame, keyCol: String, secCol: String,
                            idCol: String, valCol: String, movK: Int = 3,
                            bucketSeconds: Long = 86400L): DataFrame = {
    require(movK >= 1 && bucketSeconds >= 1,
      s"need movK >= 1 and bucketSeconds >= 1, got $movK/$bucketSeconds")
    val carryN = math.max(movK - 1, 1)
    val base = df.select(col(keyCol), col(idCol), col(secCol),
        round(col(valCol) * 100).cast("long").as("cents"))
      .withColumn("__bkt", expr(s"$secCol div $bucketSeconds"))

    // per-(key, bucket) totals + the next carryN non-empty successors
    val wBkts = Window.partitionBy(col(keyCol)).orderBy(col("__bkt").asc)
    val buckets = base.groupBy(col(keyCol), col("__bkt"))
      .agg(sum("cents").as("__tot"))
      .withColumn("__nexts", array(
        (1 to carryN).map(i => lead(col("__bkt"), i).over(wBkts)): _*))
      .withColumn("__cumPrev",
        coalesce(sum("__tot").over(
          wBkts.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

    // carry rows: the last carryN rows of each (key, bucket), re-tagged
    // into each of the key's next carryN non-empty buckets. Persisted
    // (scoped — see CacheScope): the tiny frame feeds both the augmented
    // union and the carry-in offsets, and without the cache the second
    // use would re-scan the full input (the rank is map-side-pruned by
    // WindowGroupLimit, but a 100 TB corpus still shouldn't scan twice).
    val wDesc = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(secCol).desc, col(idCol).desc)
    val carries = CacheScope.persisted(base
      .withColumn("__rk", row_number().over(wDesc))
      .filter(col("__rk") <= carryN)
      .drop("__rk")
      .join(buckets.select(col(keyCol), col("__bkt"), col("__nexts")),
        Seq(keyCol, "__bkt"))
      .withColumn("__tgt", explode(col("__nexts")))
      .filter(col("__tgt").isNotNull)
      .withColumn("__bkt", col("__tgt")).drop("__tgt", "__nexts")
      .withColumn("__carry", lit(1)))
    val aug = base.withColumn("__carry", lit(0)).unionByName(carries)

    // within-(key, bucket) windows over real rows + their carried context
    val w = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(secCol).asc, col(idCol).asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-(movK - 1), Window.currentRow)
    val stats = aug
      .withColumn("gap_s", col(secCol) - lag(col(secCol), 1).over(w))
      .withColumn("__runIncl", sum("cents").over(wRun).cast("long"))
      .withColumn("mov_avg",
        round(sum("cents").over(wMov).cast("double")
          / count(lit(1)).over(wMov) / 100.0, 4))
      .filter(col("__carry") === 0)

    // running offset: prior buckets' cents minus what was carried in here
    val carryIn = carries.groupBy(col(keyCol), col("__bkt"))
      .agg(sum("cents").as("__carryIn"))
    val offsets = buckets
      .join(carryIn, Seq(keyCol, "__bkt"), "left")
      .select(col(keyCol), col("__bkt"),
        (col("__cumPrev") - coalesce(col("__carryIn"), lit(0L))).as("__off"))

    stats.join(offsets, Seq(keyCol, "__bkt"))
      .select(col(keyCol), col(idCol), col(secCol), col("gap_s"),
        (col("__off") + col("__runIncl")).cast("long").as("run_cents"),
        col("mov_avg"))
  }
}
