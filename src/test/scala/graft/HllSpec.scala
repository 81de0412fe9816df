package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** HyperLogLog (`graft_hll` + [[TextAnalysis.hllDistinctReport]]): the
  * register derivation, the mergeable-summary invariance, and the
  * idempotence that makes it the safest streaming sketch.
  */
class HllSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private def regsOf(terms: Seq[String], p: Int, parts: Int): Array[Long] = {
    graft.functions.HyperLogLogSketch.ensureRegistered(spark)
    terms.toDF("term").repartition(parts)
      .agg(call_function("graft_hll", col("term"), lit(p)))
      .head.getSeq[Long](0).toArray
  }

  test("register = max rho of the md5-derived 48-bit hash, per the documented rule") {
    val terms = Seq("alpha", "beta", "gamma", "alpha")
    val regs = regsOf(terms, p = 6, parts = 2)
    assert(regs.length == 64)
    // recompute the expected registers from the same public derivation
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = new Array[Long](64)
    terms.distinct.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      val idx = (h >>> 42).toInt
      val w = h & ((1L << 42) - 1)
      val rho = if (w == 0L) 43
        else 43 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > expect(idx)) expect(idx) = rho
    }
    assert(regs.toSeq == expect.toSeq)
  }

  test("registers are invariant to partitioning (mergeable-summary contract)") {
    val terms = (0 until 3000).map(i => s"w${i % 537}")
    assert(regsOf(terms, p = 6, parts = 1).toSeq ==
      regsOf(terms, p = 6, parts = 13).toSeq)
  }

  test("idempotent: duplicating the whole stream changes nothing (MAX merge)") {
    val terms = (0 until 500).map(i => s"t$i")
    assert(regsOf(terms, p = 5, parts = 3).toSeq ==
      regsOf(terms ++ terms ++ terms, p = 5, parts = 5).toSeq)
  }

  test("estimate lands within the advertised error band at p=6") {
    // 1.04/sqrt(64) = 13% standard error; assert a generous 3-sigma band
    val docs = (0 until 2000).map(i => (i.toLong, s"u$i v${i % 700}"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.hllDistinctReport(docs, "text", p = 6)
      .select("est", "true_distinct").head
    val (est, truth) = (row.getLong(0), row.getLong(1))
    assert(truth == 2700L)
    assert(math.abs(est - truth).toDouble / truth < 0.39,
      s"est=$est truth=$truth")
  }

  test("graft_hll rejects bad p and non-foldable p") {
    graft.functions.HyperLogLogSketch.ensureRegistered(spark)
    val df = Seq("a").toDF("term")
    intercept[Exception] { df.agg(expr("graft_hll(term, 2)")).collect() }
    intercept[Exception] { df.agg(expr("graft_hll(term, 99)")).collect() }
    intercept[Exception] {
      df.agg(expr("graft_hll(term, cast(null as int))")).collect()
    }
  }

  test("per-group report: each group's estimate tracks its own vocabulary") {
    val docs = Seq(
      (1L, "a b c d e", "small"),
      (2L, (1 to 400).map(i => s"w$i").mkString(" "), "big"),
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.hllDistinctByGroup(docs, "source", "text", p = 6)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("big", "small"))
    assert(rows(0)._4 == 400L && rows(1)._4 == 5L)
    // big group: raw estimate within the 3-sigma band (13% se at p=6)
    val (_, _, bigEst, bigTruth) = rows(0)
    assert(math.abs(bigEst - bigTruth).toDouble / bigTruth < 0.39,
      s"$bigEst vs $bigTruth")
    // small group: the RAW estimate is in the documented small-range
    // regime (most registers zero, estimate biased high) — and the
    // published zero_regs column is exactly what linear counting needs
    val (_, smallZeros, _, _) = rows(1)
    assert(smallZeros >= 59L)    // >= 64 - 5 non-zero registers
    val lc = 64.0 * math.log(64.0 / smallZeros)
    assert(math.abs(lc - 5.0) <= 2.0, s"linear count $lc")
  }

  test("report: register rows carry consistent summary columns") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val rows = TextAnalysis.hllDistinctReport(docs, "text", p = 6).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
    val zeroRegs = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == zeroRegs))
    assert(zeroRegs == rows.count(_.getLong(1) == 0L))
    assert(rows.forall(_.getLong(4) == 4L)) // true distinct: a b c d
  }
}
