package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamJoin

/** Stream-stream interval join: the streamed result must equal the batch
  * inequality join regardless of how arrival is split across micro-batches
  * (matches can only form once both rows have arrived; inner joins emit
  * eagerly, so a bounded drain recovers the full batch answer).
  */
class StreamJoinSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  // (user, id, epoch-sec) views; (user, id, epoch-sec, cents) purchases
  private val views = Seq((1L, 100L, 1000L), (1L, 101L, 5000L), (2L, 200L, 1000L))
  private val purchases =
    Seq((1L, 900L, 1500L, 10L),  // matches view 100 (within 3600)
        (1L, 901L, 5200L, 20L),  // matches view 101
        (1L, 902L, 9999L, 30L),  // matches nothing (too late)
        (2L, 903L, 999L, 40L))   // matches nothing (before the view)

  private def asViews(df: DataFrame): DataFrame =
    df.toDF("v_user", "view_id", "vs")
      .select(col("v_user"), col("view_id"),
        timestamp_seconds(col("vs")).as("view_t"))

  private def asPurchases(df: DataFrame): DataFrame =
    df.toDF("p_user", "purchase_id", "ps", "cents")
      .select(col("p_user"), col("purchase_id"),
        timestamp_seconds(col("ps")).as("purchase_t"), col("cents"))

  private def joinPairs(v: DataFrame, p: DataFrame,
                        delay: String = "2 hours"): DataFrame =
    StreamJoin.intervalJoin(v, p, "v_user", "p_user", "view_t", "purchase_t",
        within = "1 hour", watermarkDelay = delay)
      .select("view_id", "purchase_id")

  test("batch form of the interval join gives the expected pairs") {
    val got = joinPairs(asViews(views.toDF()), asPurchases(purchases.toDF()))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 900L), (101L, 901L)))
  }

  test("streamed interval join equals the batch join across arrival splits") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Long, Long)]
    val pIn = MemoryStream[(Long, Long, Long, Long)]
    val joined = joinPairs(asViews(vIn.toDF()), asPurchases(pIn.toDF()))
    val ckpt = Files.createTempDirectory("sj-ckpt").toString
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // batch 1: two views + the purchase matching the SECOND view
      vIn.addData(views(0), views(1))
      pIn.addData(purchases(1))
      q.processAllAvailable()
      // batch 2: remaining view + purchases, incl. one whose matching view
      // arrived a batch earlier (the join must have buffered it)
      vIn.addData(views(2))
      pIn.addData(purchases(0), purchases(2), purchases(3))
      q.processAllAvailable()
      val got = spark.table("sj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 900L), (101L, 901L)))
    } finally {
      q.stop()
      spark.catalog.dropTempView("sj_out")
    }
  }

  test("saltedIntervalJoin: hot key spreads across state partitions, output equals unsalted join") {
    implicit val sqlCtx = spark.sqlContext
    // one viral user holds 95% of the view stream: 190 hot views + 10 cold,
    // purchases land inside every view's 1h window so matches are dense
    val hotViews = (0 until 190).map(i => (7L, 1000L + i, 1000L + i))
    val coldViews = (0 until 10).map(i => (100L + i, 5000L + i, 1000L))
    val allViews = hotViews ++ coldViews
    val somePurchases = Seq((7L, 900L, 1100L, 5L), (7L, 901L, 1180L, 6L),
      (100L, 902L, 1500L, 7L), (105L, 903L, 1200L, 8L))

    val batchExpect = StreamJoin.intervalJoin(
        asViews(allViews.toDF()), asPurchases(somePurchases.toDF()),
        "v_user", "p_user", "view_t", "purchase_t",
        within = "1 hour", watermarkDelay = "2 hours")
      .select("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchExpect.nonEmpty)

    val vIn = MemoryStream[(Long, Long, Long)]
    val pIn = MemoryStream[(Long, Long, Long, Long)]
    val joined = StreamJoin.saltedIntervalJoin(
        asViews(vIn.toDF()), asPurchases(pIn.toDF()),
        "v_user", "p_user", "view_t", "purchase_t",
        within = "1 hour", watermarkDelay = "2 hours", salt = 8)
      // the joined output is produced INSIDE the state stage (the
      // micro-batch shuffle on the (key, salt) join key), so the partition
      // id observed here IS the state partition that buffered the rows
      .select(col("view_id"), col("purchase_id"),
        spark_partition_id().as("state_pid"))
    val ckpt = Files.createTempDirectory("sj-salt-ckpt").toString
    val q = joined.writeStream.format("memory").queryName("sj_salted")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // split arrival across batches so buffering is actually exercised
      vIn.addData(hotViews.take(100))
      pIn.addData(somePurchases(0))
      q.processAllAvailable()
      vIn.addData(hotViews.drop(100) ++ coldViews)
      pIn.addData(somePurchases.drop(1))
      q.processAllAvailable()
      val rows = spark.table("sj_salted").collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batchExpect,
        s"salted stream join diverged: missing=${batchExpect -- got} extra=${got -- batchExpect}")
      // the hot key's matches must NOT have been processed by one state
      // partition — the salt split them
      val hotPids = rows.filter(_.getLong(1) < 902L).map(_.getInt(2)).toSet
      assert(hotPids.size > 1,
        s"hot key's rows all sat in one state partition: $hotPids")
    } finally {
      q.stop()
      spark.catalog.dropTempView("sj_salted")
    }
  }

  test("rows later than the watermark delay are dropped from the join") {
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Long, Long, Long)]
    val pIn = MemoryStream[(Long, Long, Long, Long)]
    // zero allowed out-of-orderness: purchase 900 (t=1500) arriving after
    // the right watermark reached 5200 is late and must be discarded
    val joined = joinPairs(asViews(vIn.toDF()), asPurchases(pIn.toDF()),
      delay = "0 seconds")
    val ckpt = Files.createTempDirectory("sj-late-ckpt").toString
    val q = joined.writeStream.format("memory").queryName("sj_late")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      vIn.addData(views(0), views(1))
      pIn.addData(purchases(1))      // watermark advances to t=5200
      q.processAllAvailable()
      pIn.addData(purchases(0))      // t=1500 < watermark → late, dropped
      q.processAllAvailable()
      val got = spark.table("sj_late").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((101L, 901L)), got.toString)
    } finally {
      q.stop()
      spark.catalog.dropTempView("sj_late")
    }
  }
}
