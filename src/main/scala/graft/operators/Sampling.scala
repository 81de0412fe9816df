package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines: every
  * assignment is a pure function of the row's id (md5 bucket), so splits
  * are REPRODUCIBLE across runs, engines, and re-orderings of the input —
  * the property a training pipeline needs (re-running the pipeline must
  * not move a document from test into train) and an RNG-based
  * `randomSplit` cannot give. Map-side only: zero shuffle at any scale.
  *
  * The bucket rule is the engine-portable md5 idiom (the DuckDB oracle
  * evaluates the identical expression): first 15 md5 hex digits of the id
  * string, base-16, mod 100 — uniform over [0,100) for any id type.
  */
object Sampling {

  /** Percentile bucket in [0,100) derived from the id column. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") % 100

  /** Train/val/test assignment: `trainPct`% → "train", next `valPct`% →
    * "val", rest → "test", decided by [[hashBucket]].
    */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct% val=$valPct%")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic ~`pct`% sample: keep rows whose bucket falls under
    * `pct`. Unlike `df.sample`, membership is stable across runs and
    * growing datasets (a row's fate never changes as neighbors arrive).
    */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Deterministic WEIGHTED sampling: keep a row with probability `weight`
    * (a column in [0,1] — e.g. a quality score), decided by comparing the
    * row's md5 unit value against the weight. The soft version of a
    * quality THRESHOLD: high-quality documents are kept more often, but
    * low-quality ones are downsampled, not erased (the mix-shaping move
    * when hard filtering discards too much volume). Like every sampler
    * here, membership is a pure function of the id and the weight — a
    * re-run, another engine, or a repartition reproduces the exact same
    * subset, which `df.sample`-style RNG sampling cannot do.
    *
    * `hashUnit` is the first 15 md5 hex digits as a 60-bit integer scaled
    * to [0,1) — uniform, and the identical expression the oracle runs.
    * Map-side only; zero shuffle.
    */
  def hashUnit(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")
      .cast("double") / lit(1152921504606846976.0) // 16^15 = 2^60

  /** Malformed weights fail LOUDLY: a NULL weight or one outside [0, 1]
    * raises at execution rather than silently meaning drop-always /
    * keep-always (NULL comparisons are false-y, so a bad weight column
    * would otherwise just quietly skew the mix). Clamping was the
    * alternative; erroring is chosen because a weight outside [0, 1] is
    * always an upstream bug, and a 100 TB sampling pass that silently
    * kept everything is far more expensive than a failed stage.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val checked = when(weight.isNull || weight < 0.0 || weight > 1.0,
        raise_error(concat(lit("weightedSample: weight must be in [0,1], got "),
          coalesce(weight.cast("string"), lit("NULL")))))
      .otherwise(weight)
    df.filter(hashUnit(col(idCol)) < checked)
  }

  /** Per-stratum deterministic sampling: `pcts` maps stratum value →
    * keep-percentage (strata not in the map are dropped). The per-row
    * decision is still a pure function of the id — one map-side pass, no
    * shuffle, no `sampleBy` RNG.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       pcts: Map[String, Int]): DataFrame = {
    val b = hashBucket(col(idCol))
    val keep = pcts.foldLeft(lit(false)) { case (acc, (stratum, pct)) =>
      acc || (col(strataCol) === stratum && b < pct)
    }
    df.filter(keep)
  }

  /** Per-group EXACT quantile profile — the distribution-drift check a
    * split pipeline runs after [[hashSplit]] (is val/test distributionally
    * similar to train on a quality metric?). One aggregation; Spark's exact
    * `percentile` uses the standard `p·(n-1)` linear interpolation, the
    * same rule as DuckDB's `quantile_cont`, so the profile is
    * oracle-comparable bit-for-bit.
    *
    * Scale: exact percentile state is the per-group value multiset — fine
    * for bounded metrics (quality scores), wrong for unbounded-cardinality
    * columns at extreme scale; [[quantileProfileApprox]] is the same call
    * shape with a bounded-memory sketch for that case.
    */
  def quantileProfile(df: DataFrame, keyCol: String, valCol: String,
                      ps: Seq[Double]): DataFrame =
    df.groupBy(keyCol).agg(
      count(lit(1)).as("n"),
      ps.map(p => round(percentile(col(valCol), lit(p)), 6)
        .as(s"p${(p * 100).round}")): _*)

  /** Per-group quota cap: keep at most `k` rows per `groupCol` value,
    * chosen DETERMINISTICALLY by md5(id) order (id tiebreak) — the
    * "at most N documents per domain/source" step a pretraining mix
    * applies so no single crawl source dominates, with the same
    * reproducibility contract as [[hashSplit]]: membership is a pure
    * function of the row ids present, never of partitioning or run order.
    *
    * Scale: a naive per-group rank would serialize a hot group (one
    * domain with 10⁹ pages) into one task. The `row_number ≤ k` filter
    * below, however, triggers Spark's rank-limit pushdown
    * (`WindowGroupLimit`, SPARK-37099): a PARTIAL group-limit runs
    * map-side before the exchange, so each input partition ships at most
    * k rows per group, and the final per-group window sees at most
    * k·numMapPartitions rows — bounded by the plan's width, never by the
    * group's raw row count. Same skew bound as a hand-written two-stage
    * top-k, one shuffle of pruned (not full) data. SamplingSpec asserts
    * the pushdown is present in the physical plan, so a Spark upgrade
    * that lost it would fail the suite.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"cap must be positive: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Token-budget mixing: keep documents per `groupCol` value, in the same
    * deterministic md5(id) order as [[capPerGroup]], while the group's
    * RUNNING token total stays within its budget — "take 5B tokens of
    * source X, 2B of Y" — the step that turns per-source weights into an
    * actual pretraining mix. Budgets come from `budgets` (policy), with
    * `defaultBudget` for unlisted groups. Membership is a pure function of
    * the ids and texts present: re-running the mix reproduces it exactly.
    *
    * Zero-token documents are dropped first (they add nothing to a mix and
    * would break the prune bound below). Output keeps the input columns
    * plus `n_tokens` and the group-running `cum_tokens`.
    *
    * Scale: a running sum cannot use the rank-limit pushdown (only
    * rank-like functions qualify), so the window is preceded by a
    * [[capPerGroup]] PRUNE at k = budget: every kept document carries ≥ 1
    * token, so `cum_tokens ≤ budget` implies `rank ≤ budget`, and the
    * pushdown bounds what reaches the cumulative window without changing
    * the answer. For budgets beyond Int.MaxValue documents the prune
    * saturates and the group's full (non-zero-token) row set meets the
    * window — at that scale, pre-thin with [[deterministicSample]] first.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, defaultBudget: Long,
                     budgets: Map[String, Long] = Map.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val maxBudget = (budgets.values.toSeq :+ defaultBudget).max
    val pruneK = math.min(maxBudget, Int.MaxValue.toLong).toInt
    val withTok = df
      .withColumn("n_tokens",
        TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .filter(col("n_tokens") >= 1)
    val pruned =
      if (pruneK > 0) capPerGroup(withTok, groupCol, idCol, pruneK)
      else withTok.limit(0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pruned
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** TARGET-SHARE mix reweighting: given target token shares per group
    * ("make the mix 50% web, 30% code, 20% books"), solve each group's
    * keep probability so the sampled corpus hits the target proportions,
    * then apply deterministic hash sampling. The standard no-upsampling
    * solve: the achievable total is capped by the BINDING group (the one
    * whose target share most exceeds its available share),
    * `cap = min_g tokens_g / share_g`; every group keeps
    * `cap·share_g / tokens_g` of its tokens — the binding group keeps
    * everything, the rest downsample. Groups absent from `targets` are
    * dropped (same contract as [[stratifiedSample]]). [[tokenBudgetMix]]
    * is the absolute-budget sibling; this is the proportional one — the
    * difference matters when the corpus grows: shares stay valid, budgets
    * go stale.
    *
    * Membership is a pure function of (id, the group token totals): a
    * re-run or another engine reproduces the exact subset. Output: the
    * kept rows plus `n_tokens` and the group's `rate`.
    *
    * Scale shape: one bounded-key aggregation for group token totals; the
    * cap is a broadcast 1-row frame (the q57 pattern), rates a broadcast
    * groups-sized frame; the keep decision is map-side. The sampled mix
    * tracks the target in expectation (per-document hash sampling); exact
    * per-token quotas are [[tokenBudgetMix]]'s job.
    */
  def mixToTarget(df: DataFrame, idCol: String, textCol: String,
                  groupCol: String, targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(v => v > 0.0 && v <= 1.0),
      s"target shares must be in (0, 1]: $targets")
    val spark = df.sparkSession
    import spark.implicits._
    val withTok = df.withColumn("n_tokens",
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val tg = targets.toSeq.toDF(groupCol, "tgt")
    // the groups-sized totals frame feeds BOTH the cap and the rates —
    // persist it (CacheScope) so its corpus-sized lineage runs once; the
    // op is then the 2-pass minimum (totals pass + keep pass), and only
    // bounded frames are ever cached or broadcast
    val g = CacheScope.persisted(withTok.groupBy(groupCol)
      .agg(sum("n_tokens").cast("long").as("tok"))
      .join(broadcast(tg), groupCol))
    val cap = g.agg(min(col("tok") / col("tgt")).as("cap"))
    // least() guards one-ulp overshoot of the binding group's rate
    // (fl(cap·tgt) can exceed tok by rounding); the oracle applies the
    // identical clamp so the arithmetic stays bit-shared
    val rates = g.crossJoin(broadcast(cap))
      .select(col(groupCol),
        least(lit(1.0), col("cap") * col("tgt") / col("tok")).as("rate"))
    withTok.join(broadcast(rates), groupCol)
      .filter(hashUnit(col(idCol)) < col("rate"))
  }

  /** Deterministic GLOBAL SHUFFLE for training order: every row gets a
    * `shard` in [0, numShards) and a 0-based `pos` within its shard, both
    * pure functions of (seed, id) — the reproducible permutation a
    * training run reads. Shuffling before sharding is what breaks
    * source/crawl locality (a sequential reader of shard files sees an
    * i.i.d.-looking document stream instead of a million consecutive pages
    * from one domain); making it a hash of (seed, id) instead of an RNG
    * makes the epoch order REPRODUCIBLE — rerunning the pipeline, or
    * re-materializing one lost shard, yields byte-identical order, and a
    * new seed is a fresh permutation.
    *
    * Both shard and order derive from one md5: `h = md5(seed ":" id)`;
    * shard = first-60-bits(h) mod numShards, order = (h, id) ascending.
    * Conditioned on the shard assignment the hash is still uniform, so
    * within-shard order carries no residual structure.
    *
    * Scale: assignment is map-side; the rank is one per-shard window sort.
    * A permutation must be materialized somewhere — the sort IS the
    * product — and md5 shard keys are uniform by construction, so no
    * shard ever hot-spots. The write path ([[graft.sinks.Sinks.writeShuffled]])
    * skips the window entirely: it clusters by shard and sorts within
    * partitions, so file row-order realizes `pos` without computing it.
    */
  def shuffleAssign(df: DataFrame, idCol: String, numShards: Int,
                    seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, s"numShards must be positive: $numShards")
    val h = shuffleHash(col(idCol), seed)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 15), 16, 10).cast("long")
          % numShards).cast("long"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** The permutation hash of [[shuffleAssign]] — shared with the write
    * path so assignment and file order agree.
    */
  private[graft] def shuffleHash(id: Column, seed: Long): Column =
    md5(concat(lit(seed.toString), lit(":"), id.cast("string")))

  /** [[quantileProfile]] with `approx_percentile` (KLL-style sketch,
    * `accuracy` controls error vs memory): constant per-group state, the
    * form to use when the value column has unbounded cardinality. Not
    * oracle-comparable (sketches are engine-specific); accuracy is
    * asserted against the exact form in SamplingSpec.
    */
  def quantileProfileApprox(df: DataFrame, keyCol: String, valCol: String,
                            ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(keyCol).agg(
      count(lit(1)).as("n"),
      ps.map(p => round(approx_percentile(col(valCol), lit(p), lit(accuracy)), 6)
        .as(s"p${(p * 100).round}")): _*)

  /** TEMPERATURE mixture sampling — the multilingual/multi-source mix
    * standard (weights ∝ n^α, α < 1 flattens the head so dominant sources
    * stop swamping tail ones; α = 1 is proportional, α → 0 uniform).
    * Per group: `weight = ⌊n^α · 10⁶⌋` exact-integer micro-units, `quota =
    * budget · weight div Σweights`, membership = the group's first `quota`
    * documents under the [[capPerGroup]] md5 rank — deterministic end to
    * end, so the whole mix policy (weights, quotas, membership) is
    * reproducible and oracle-checkable.
    *
    * α = 0.5 (the default, and the q120 gate) computes via `sqrt`, which
    * IEEE 754 requires to be correctly rounded — bit-identical in every
    * engine. Other α go through `pow`, which libms round differently; a
    * cross-engine gate for those would need a rational-power ladder, so
    * they are supported but documented as engine-local.
    *
    * Output per group: (group, n_docs, weight_micro, quota, n_kept,
    * id_sum) — the audit frame; callers wanting the kept ROWS join the
    * quota frame and reuse the same rank (the [[tokenBudgetMix]] shape).
    *
    * Scale: one bounded-group count, one broadcast quota join, one
    * rank-limited window per group (rank pushdown applies — quota is a
    * per-group constant after the join).
    */
  def temperatureMix(df: DataFrame, idCol: String, groupCol: String,
                     budget: Long, alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"budget must be >= 1: $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val weightOf =
      if (alpha == 0.5) sqrt(col("n")) else pow(col("n"), lit(alpha))
    // counts appears TWICE in the quotas plan (directly and under the
    // total-weight agg) — persist so its corpus scan runs once (r15; the
    // frame itself is group-cardinality-sized)
    val counts = CacheScope.persisted(
      df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
        .withColumn("weight_micro", floor(weightOf * 1e6).cast("long")))
    // corpus-wide weight total as a broadcast 1-row frame (the q57
    // pattern), never a driver scalar or a global window
    // budget × weight_micro in DECIMAL(38,0): at the corpus scale this
    // operator targets (budget ~1e9 docs, weight_micro ~1e11 for a 1e10-doc
    // source) the Long product overflows past 2^63 and non-ANSI `*` wraps
    // silently to a garbage quota — decimal keeps the product exact and
    // floor-division brings it back to a Long
    val quotas = CacheScope.persisted(
      counts.crossJoin(broadcast(counts.agg(sum("weight_micro").as("__tw"))))
        .select(col(groupCol), col("n").as("n_docs"), col("weight_micro"),
          expr(s"CAST(floor(CAST($budget AS DECIMAL(38, 0)) * weight_micro" +
            " / __tw) AS BIGINT)").as("quota")))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    val kept = df.select(col(groupCol), col(idCol))
      .join(broadcast(quotas.select(col(groupCol), col("quota"))), Seq(groupCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("quota"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), sum(col(idCol)).cast("long").as("id_sum"))
    quotas.join(kept, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"), col("weight_micro"), col("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
      // nulls LAST to match ANSI/DuckDB ORDER BY defaults (see
      // Dedup.dupRateByGroup — same hash-stability rationale)
      .orderBy(col(groupCol).asc_nulls_last)
  }

  /** Range-partition PLANNER — the boundary computation behind a globally
    * SORTED 100 TB write (the TeraSort primitive): take a deterministic
    * [[deterministicSample]] of the corpus, read `numParts - 1` boundary
    * keys off the sample's exact rank quantiles, and let every row compute
    * its partition as "how many boundaries are below my key" — a pure
    * map-side expression against a broadcast boundary list. Spark's own
    * `repartitionByRange` does exactly this shape but with reservoir
    * sampling (RNG — a re-run plans different boundaries); here membership
    * and boundaries are md5-deterministic, so the plan is reproducible,
    * auditable, and oracle-checkable (q114).
    *
    * Boundary `i` (1-based) is the sample key at rank
    * `max(1, ⌊i·n_s/numParts⌋)` under the TOTAL order (key, id) —
    * duplicate ranks (tiny samples) intentionally emit duplicate
    * boundaries so the boundary list always has `numParts - 1` entries
    * and the assignment rule stays a pure fold.
    *
    * The rank window's input is bounded by ROWS, not just by fraction:
    * a pct sample of a growing corpus still grows (10% of 100 TB is
    * 10 TB), so when the sample exceeds [[MaxBoundarySampleRows]] it is
    * first cut to the `MaxBoundarySampleRows` rows with the smallest
    * `(md5(id), id)` — an `orderBy.limit` that plans TakeOrdered
    * (per-partition heaps, never a corpus sort), and since md5(id) is
    * uniform the cut IS a deterministic uniform subsample, exactly what
    * Spark's own RangePartitioner does with its `sampleSizePerPartition`
    * reservoir (minus the RNG). The single rank window then sees ≤
    * [[MaxBoundarySampleRows]] rows whatever the corpus size; only
    * `numParts - 1` keys reach the driver.
    */
  def rangeBoundaries(df: DataFrame, idCol: String, keyCol: String,
                      numParts: Int, pct: Int = 10): Seq[Long] = {
    require(numParts >= 1, s"numParts must be >= 1: $numParts")
    if (numParts == 1) return Nil
    val samp0 = CacheScope.persisted(deterministicSample(
      df.select(col(idCol).as("id"), col(keyCol).cast("long").as("key")),
      "id", pct))
    val n0 = samp0.count()
    require(n0 >= numParts,
      s"sample too small for $numParts partitions: $n0 rows — raise pct")
    val (samp, n) =
      if (n0 <= MaxBoundarySampleRows) (samp0, n0)
      else (CacheScope.persisted(
        samp0.orderBy(md5(col("id").cast("string")), col("id"))
          .limit(MaxBoundarySampleRows)),
        MaxBoundarySampleRows.toLong)
    val ranks = (1 until numParts).map(i => math.max(1L, i * n / numParts))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("key"), col("id"))
    val byRank = samp.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk").isin(ranks.distinct: _*))
      .select("rk", "key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ranks.map(byRank)
  }

  /** Row cap on [[rangeBoundaries]]' rank-window input — the bound that
    * makes the boundary computation corpus-size-independent. 64Ki sample
    * rows give ≥ 16 samples per boundary up to 4096 partitions (Spark's
    * RangePartitioner defaults to 20 per partition) — boundary error
    * stays a fraction of a partition's width.
    */
  val MaxBoundarySampleRows = 1 << 16

  /** Assign each row its range partition against a planned boundary list:
    * `pid = |{b : key > b}|` — keys ≤ the first boundary land in 0, keys
    * above the last in `numParts - 1`. A codegen'd fold over a literal
    * list (boundaries are numParts-bounded); zero shuffle — the WRITE
    * side then clusters by `pid` (`partitionBy("pid")`, or a
    * `repartition(col("pid")) + sortWithinPartitions(key)` for a
    * globally-sorted layout).
    */
  def assignRangePartition(df: DataFrame, keyCol: String,
                           boundaries: Seq[Long]): DataFrame = {
    val key = col(keyCol).cast("long")
    val pid = boundaries.map(b => when(key > b, 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    df.withColumn("pid", pid.cast("int"))
  }

  /** The planner's AUDIT: plan boundaries, assign every row, report per
    * partition (pid, n_rows, min_key, max_key) — the balance evidence
    * (skewed n_rows says raise pct or pick a better key) and the q114
    * gate surface. One sample pass + one bounded-key aggregate.
    */
  def rangePartitionProfile(df: DataFrame, idCol: String, keyCol: String,
                            numParts: Int, pct: Int = 10): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(keyCol).cast("long").as("key"))
    val bounds = rangeBoundaries(keyed, "id", "key", numParts, pct)
    assignRangePartition(keyed, "key", bounds)
      .groupBy("pid")
      .agg(count(lit(1)).as("n_rows"), min("key").as("min_key"),
        max("key").as("max_key"))
      .orderBy("pid")
  }
}
