package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic splits/samples: pure functions of the id — stable across
  * runs, re-orderings, and dataset growth (the training-pipeline contract
  * `randomSplit` can't give).
  */
class SamplingSpec extends SparkTestBase {
  import TestSpark.spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("hashSplit is exhaustive, disjoint, and roughly proportioned") {
    val counts = Sampling.hashSplit(ids, "id", trainPct = 80, valPct = 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 buckets are uniform; at n=2000 allow generous tolerance
    assert(counts("train") > 1500 && counts("train") < 1700, counts.toString)
    assert(counts("val") > 120 && counts("val") < 280, counts.toString)
  }

  test("assignment is stable under re-partitioning and row order") {
    val a = Sampling.hashSplit(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids.repartition(13).orderBy(col("id").desc), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("a row's fate never changes when the dataset grows") {
    val small = Sampling.deterministicSample(ids.filter(col("id") < 500), "id", 20)
      .collect().map(_.getLong(0)).toSet
    val large = Sampling.deterministicSample(ids, "id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(small == large.filter(_ < 500))
  }

  test("stratifiedSample keeps pct per stratum and drops unknown strata") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 50, "de" -> 10))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") > 200 && out("en") < 300, out.toString)   // ~250 of 500
    assert(out("de") > 20 && out("de") < 80, out.toString)     // ~50 of 500
    val none = Sampling.stratifiedSample(df, "id", "lang", Map("fr" -> 100))
    assert(none.count() == 0)
  }

  test("split is map-side only: no Exchange in the plan") {
    val plan = Sampling.hashSplit(ids, "id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("capPerGroup keeps exactly k per group, deterministically") {
    // heavily skewed: one group holds 95% of the rows
    val df = (0L until 2000L)
      .map(i => (i, if (i < 1900) "hot" else s"g${i % 7}")).toDF("id", "grp")
    val out = Sampling.capPerGroup(df, "grp", "id", k = 10)
    val counts = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 10), counts.toString)
    assert(counts("hot") == 10)
    // membership equals the single-window reference form
    val ref = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("grp"))
        .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10).drop("rk")
    }
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      ref.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("capPerGroup membership is stable under re-partitioning") {
    val df = (0L until 500L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val a = Sampling.capPerGroup(df, "grp", "id", 7)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerGroup(df.repartition(17).orderBy(col("id").desc),
        "grp", "id", 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("capPerGroup relies on rank-limit pushdown: partial WindowGroupLimit before the shuffle") {
    // the scale contract: each map partition ships at most k rows per
    // group (SPARK-37099), so a hot group never serializes its raw row
    // count into the final window task
    val df = (0L until 100L).map(i => (i, "onlygroup")).toDF("id", "grp")
    val plan = Sampling.capPerGroup(df.repartition(8), "grp", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2, plan) // partial + final
  }

  test("weightedSample: keep rate tracks the weight, membership is deterministic") {
    // constant weights: 0 drops everything, 1 keeps everything
    assert(Sampling.weightedSample(ids, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(ids, "id", lit(1.0)).count() == 2000)
    // w = 0.25: binomial(2000, .25) → expect ~500, tolerate ±5σ (±97)
    val quarter = Sampling.weightedSample(ids, "id", lit(0.25)).count()
    assert(math.abs(quarter - 500) < 100, s"kept $quarter of 2000 at w=0.25")
    // monotone: raising the weight never drops a previously-kept row
    val lo = Sampling.weightedSample(ids, "id", lit(0.3))
      .as[Long].collect().toSet
    val hi = Sampling.weightedSample(ids, "id", lit(0.6))
      .as[Long].collect().toSet
    assert(lo.subsetOf(hi))
    // deterministic under repartitioning
    val again = Sampling.weightedSample(ids.repartition(13), "id", lit(0.3))
      .as[Long].collect().toSet
    assert(again == lo)
  }

  test("weightedSample fails loudly on NULL or out-of-range weights") {
    // constant bad weights fold to the error at the driver
    // (SparkRuntimeException); per-row bad weights surface task-wrapped
    // (SparkException) — both carry the operator's message
    def mustRaise(body: => Any): Unit = {
      val e = intercept[Exception](body)
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("weightedSample"), s"unexpected error: $e")
    }
    // out-of-range: > 1 would silently mean keep-everything
    mustRaise(Sampling.weightedSample(ids, "id", lit(1.5)).count())
    // < 0 would silently mean drop-everything
    mustRaise(Sampling.weightedSample(ids, "id", lit(-0.1)).count())
    // NULL comparisons are false-y — without the guard the row would just
    // vanish; with it, the bad weight is an error
    mustRaise(Sampling.weightedSample(ids, "id", lit(null).cast("double")).count())
    // a NON-constant weight column with one bad row also raises
    mustRaise(Sampling.weightedSample(ids, "id",
      when(col("id") === 7L, lit(2.0)).otherwise(lit(0.5))).count())
    // boundary values stay legal
    assert(Sampling.weightedSample(ids, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(ids, "id", lit(1.0)).count() == 2000)
  }

  test("tokenBudgetMix: running total respects per-group budgets, prefix is deterministic") {
    val df = (0L until 50L)
      .map(i => (i, s"g${i % 2}", ("tok " * 10).trim)) // 10 tokens per doc
      .toDF("id", "grp", "text")
    val out = Sampling.tokenBudgetMix(df, "id", "text", "grp",
      defaultBudget = 35L, budgets = Map("g1" -> 100L))
    val got = out.groupBy("grp")
      .agg(count(lit(1)).as("n"), max("cum_tokens").as("cum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10-token docs: budget 35 fits 3 docs (cum 30), budget 100 fits 10
    assert(got == Map("g0" -> ((3L, 30L)), "g1" -> ((10L, 100L))), got.toString)
    // membership is a prefix of the same md5 order capPerGroup uses
    val capIds = Sampling.capPerGroup(df.filter(col("grp") === "g0"), "grp", "id", 3)
      .select("id").collect().map(_.getLong(0)).toSet
    val mixIds = out.filter(col("grp") === "g0")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mixIds == capIds)
    // stable under repartition
    val re = Sampling.tokenBudgetMix(df.repartition(7), "id", "text", "grp",
      35L, Map("g1" -> 100L)).select("id").collect().map(_.getLong(0)).toSet
    assert(re == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetMix: zero budget drops the group; zero-token docs never consume") {
    val df = Seq((0L, "g", "a b c"), (1L, "g", ""), (2L, "x", "d e")).toDF("id", "grp", "text")
    val out = Sampling.tokenBudgetMix(df, "id", "text", "grp",
      defaultBudget = 10L, budgets = Map("x" -> 0L))
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L)) // empty doc 1 dropped, group x zeroed out
  }

  test("mixToTarget: binding group keeps all, others downsample to the solved rate") {
    // two sources, 100 tokens each (50 docs x 2 tokens); targets 80/20:
    // cap = min(100/0.8, 100/0.2) = 125 -> rate_a = 1.0, rate_b = 0.25
    val docs = (0L until 100L)
      .map(i => (i, "tok tok", if (i < 50) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.mixToTarget(docs, "doc_id", "text", "source",
      Map("a" -> 0.8, "b" -> 0.2))
    val rates = out.groupBy("source").agg(min("rate"), max("rate"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(rates("a")._1 == 1.0 && rates("a")._2 == 1.0)
    assert(rates("a")._3 == 50L)                       // binding: keeps all
    assert(rates("b")._1 == 0.25 && rates("b")._2 == 0.25)
    assert(rates("b")._3 > 5L && rates("b")._3 < 20L)  // ~12.5 of 50
    // membership is the deterministic md5 unit — stable across reruns
    val again = Sampling.mixToTarget(docs.repartition(7), "doc_id", "text",
      "source", Map("a" -> 0.8, "b" -> 0.2))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // untargeted groups are dropped
    val some = Sampling.mixToTarget(docs, "doc_id", "text", "source",
      Map("a" -> 1.0))
    assert(some.select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    // malformed shares refuse loudly
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(docs, "doc_id", "text", "source", Map("a" -> 1.5))
    }
  }

  test("shuffleAssign: contiguous positions, exhaustive, repartition-invariant") {
    val out = Sampling.shuffleAssign(ids, "id", numShards = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every id appears once; shards partition the id space
    assert(out.map(_._1).toSet == (0L until 2000L).toSet)
    // positions within each shard are exactly 0..n-1 (a permutation, no
    // gaps and no duplicates)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).toSet == (0L until rows.length).toSet,
        s"shard $shard positions not contiguous")
    }
    // md5 shards are roughly even at n=2000
    val sizes = out.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.forall(n => n > 350 && n < 650), sizes.toMap.toString)
    // pure function of (seed, id): partitioning and input order are irrelevant
    val again = Sampling.shuffleAssign(
        ids.repartition(13).orderBy(col("id").desc), "id", 4, 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("shuffleAssign: a new seed is a genuinely different permutation") {
    val a = Sampling.shuffleAssign(ids, "id", 4, seed = 7L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = Sampling.shuffleAssign(ids, "id", 4, seed = 8L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // not a proof, but 2000 ids all landing identically would be ~impossible
    assert(a != b)
  }

  test("exact quantile profile: hand-computed interpolation, approx within tolerance") {
    // group a: values 1..5 -> p50 = 3.0, p75 = 0.75*(5-1)=rank 3 -> 4.0
    //          p25 = rank 1 -> 2.0, p90 = rank 3.6 -> 4.6
    val df = ((1 to 5).map(v => ("a", v.toDouble)) ++
      (1 to 100).map(v => ("b", v.toDouble))).toDF("k", "v")
    val exact = Sampling.quantileProfile(df, "k", "v", Seq(0.25, 0.5, 0.75, 0.9))
      .orderBy("k").collect()
    assert(exact(0).getLong(1) == 5L)
    assert((2 to 5).map(exact(0).getDouble) == Seq(2.0, 3.0, 4.0, 4.6))
    // approx (sketch) must track exact within 2 positions on the 100-value group
    val approx = Sampling.quantileProfileApprox(df, "k", "v", Seq(0.25, 0.5, 0.75, 0.9))
      .orderBy("k").collect()
    (2 to 5).foreach { i =>
      assert(math.abs(approx(1).getDouble(i) - exact(1).getDouble(i)) <= 2.0,
        s"col $i: approx=${approx(1).getDouble(i)} exact=${exact(1).getDouble(i)}")
    }
  }

  test("rangeBoundaries: numParts-1 sorted boundaries, deterministic across runs") {
    val df = (0 until 2000).map(i => (i.toLong, (i * 37 % 5000).toLong))
      .toDF("id", "key")
    val b1 = Sampling.rangeBoundaries(df, "id", "key", numParts = 8, pct = 20)
    val b2 = Sampling.rangeBoundaries(df, "id", "key", numParts = 8, pct = 20)
    assert(b1 == b2)                               // md5 plan, not RNG
    assert(b1.length == 7 && b1 == b1.sorted)
    assert(Sampling.rangeBoundaries(df, "id", "key", numParts = 1) == Nil)
  }

  test("rangeBoundaries caps its rank-window input by ROWS; boundaries stay near ideal quantiles") {
    // 80k sample rows > MaxBoundarySampleRows = 64Ki: the md5-ordered
    // TakeOrdered cut engages, the window sees ≤ 64Ki rows, and because
    // md5(id) is uniform the capped subsample's quantiles track the full
    // sample's (uniform keys 0..80k: ideal boundary i is i·80000/8)
    val big = (0L until 80000L).map(i => (i, i)).toDF("id", "key")
    val b1 = Sampling.rangeBoundaries(big, "id", "key", numParts = 8, pct = 100)
    val b2 = Sampling.rangeBoundaries(big, "id", "key", numParts = 8, pct = 100)
    assert(b1 == b2)                       // deterministic under the cap
    assert(b1.length == 7 && b1 == b1.sorted)
    b1.zipWithIndex.foreach { case (b, i) =>
      val ideal = (i + 1) * 80000L / 8
      assert(math.abs(b - ideal) < 2000L,
        s"boundary $i drifted: $b vs ideal $ideal")
    }
  }

  test("assignRangePartition: contiguous key ranges, all rows kept, balance sane") {
    val df = (0 until 2000).map(i => (i.toLong, (i * 37 % 5000).toLong))
      .toDF("id", "key")
    val prof = Sampling.rangePartitionProfile(df, "id", "key", numParts = 8, pct = 20)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(prof.map(_._1).toSeq == (0 until 8))    // every partition populated
    assert(prof.map(_._2).sum == 2000L)            // no row lost or duplicated
    prof.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 < b._3, s"ranges overlap: $a vs $b")  // strictly disjoint
    }
    // a 20% sample of a near-uniform key space must not plan a degenerate
    // partitioning (no partition more than 3x the even share)
    assert(prof.map(_._2).max <= 3 * 2000 / 8)
  }

  test("assignRangePartition boundary semantics: key == boundary stays below it") {
    val out = Sampling.assignRangePartition(
        Seq((1L, 5L), (2L, 10L), (3L, 11L), (4L, 20L), (5L, 21L))
          .toDF("id", "key"), "key", boundaries = Seq(10L, 20L))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2))
  }

  test("temperatureMix: sqrt flattens the head, quotas exact-integer, membership capped") {
    // sources of 400 / 100 / 4 docs: proportional quotas would be 100:25:1;
    // sqrt weights are 20:10:2 -> the head is flattened 5x vs proportional
    val df = ((0 until 400).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (2000 until 2004).map(i => (i.toLong, "tiny")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureMix(df, "doc_id", "source", budget = 160)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    val byS = out.map(t => t._1 -> t).toMap
    assert(byS("big")._3 == 20000000L && byS("mid")._3 == 10000000L
      && byS("tiny")._3 == 2000000L)                  // floor(sqrt(n)*1e6)
    // quota_i = budget * w_i div sum(w) = 160*w/32e6 -> 100, 50, 10
    assert(out.map(_._4) == List(100L, 50L, 10L))
    assert(out.map(_._5) == List(100L, 50L, 4L))      // tiny capped at n=4
    // sqrt ratio 2:1 between big and mid, where proportional would be 4:1
    assert(byS("big")._4 == 2 * byS("mid")._4)
    // deterministic: a second run reproduces every column exactly
    val again = Sampling.temperatureMix(df, "doc_id", "source", budget = 160)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(again == out)
  }

  test("temperatureMix alpha=1 is proportional") {
    val df = ((0 until 300).map(i => (i.toLong, "a")) ++
      (1000 until 1100).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val out = Sampling.temperatureMix(df, "doc_id", "source",
        budget = 40, alpha = 1.0)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(out("a") == 3 * out("b"))                  // 300:100 kept exactly
  }
}
