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
  * bound as any per-key ordered pass; for a pathological key, pre-bucket
  * by coarse time exactly as [[AsOf.joinAsOfBucketed]] does and stitch the
  * first row of each bucket (its lag/running-total seeds) with one cheap
  * per-(key,bucket) boundary pass.
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
}
