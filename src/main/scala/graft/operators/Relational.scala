package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's operator inventory (SURVEY.md §2) as composable,
  * codegen-friendly DataFrame transforms.
  *
  * Design note for scale: every transform here is declarative — filters and
  * projections reach the parquet scan via Catalyst pushdown; aggregations
  * plan as partial/final `HashAggregate` pairs (the reference hand-codes this
  * split as boltc/boltl, `bolt/bolt.go:544-583`); top-K plans as
  * `TakeOrderedAndProject` (no global sort — the reference fully sorts then
  * cuts, `bolt/bolt.go:407-413`, which would not survive 100 TB).
  */
object Relational {

  // ---- Filters (§2.2) -----------------------------------------------------

  /** F1 (`bolt/bolt.go:222-232`): drop a line when its FIRST token is longer
    * than 8 chars and starts with "http" or "2008" (URL/date metadata lines
    * in the memetracker corpus).
    */
  def metadataLineFilter(line: Column): Column = {
    val tok1 = element_at(split(line, " "), 1)
    !(length(tok1) > 8 && (tok1.startsWith("http") || tok1.startsWith("2008")))
  }

  /** F2 (`bolt/bolt.go:348-351`): keep records with non-negative numeric
    * value (the reddit `score >= 0` predicate; reference parses with Atoi).
    */
  def nonNegative(value: Column): Column = value >= 0

  /** F3 (`bolt/bolt.go:477-479`): exact string-equality predicate
    * (`status == "200"` in nasalog).
    */
  def equalsFilter(c: Column, v: String): Column = c === v

  // ---- Projections / scalar transforms (§2.3) -----------------------------

  /** P2 (`bolt/bolt.go:547`): tokenize a line into words on single spaces
    * (Go `strings.Split(s, " ")` — NOT whitespace-collapsing).
    */
  def words(line: Column): Column = split(line, " ")

  /** P1 (`bolt/bolt.go:596-603`): the nasalog route projection —
    * `{host, route: host ++ url}` with all other columns pruned.
    */
  def routeProjection(df: DataFrame, host: String, url: String): DataFrame =
    df.select(col(host), concat(col(host), col(url)).as("route"))

  /** P5 (`bolt/bolt.go:348`, `:574`): string→int cast at use sites. The
    * reference ignores Atoi errors, leaving 0 (so malformed scores pass the
    * `>= 0` filter); we follow SQL semantics instead — malformed → NULL →
    * filtered out — via `try_cast`, because Spark 4's ANSI-mode plain cast
    * would throw on the first bad record. Documented divergence (SURVEY §7.5).
    */
  def toIntOrNull(c: Column): Column = c.try_cast("int")

  // ---- Aggregations (§2.4) ------------------------------------------------

  /** A1+A2 (`bolt/bolt.go:544-583`): word count. The reference's
    * per-line partial count (boltc) + global merge (boltl) is exactly
    * Spark's partial/final HashAggregate split — `groupBy.count` plans it
    * automatically, so one declarative agg replaces both bolts.
    * Empty tokens (Go split artifacts on trailing spaces) are dropped.
    */
  def wordCount(lines: DataFrame, lineCol: String): DataFrame =
    lines
      .filter(metadataLineFilter(col(lineCol)))
      .select(explode(words(col(lineCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** A3/A4 (`bolt/bolt.go:585-594`, `:605-613`): count per group key. */
  def countPerKey(df: DataFrame, key: String, cntName: String = "cnt"): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as(cntName))

  /** A5 (`bolt/bolt.go:615-625`): distinct-collect per group. The reference
    * linear-scans a per-host list; we `collect_set` + `sort_array` for a
    * deterministic, testable output. At 100 TB the string-joined set column
    * is the pressure point — pair with `approx_count_distinct` when only the
    * cardinality is needed.
    */
  def countAndDistinct(df: DataFrame, key: String, item: String): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("cnt"),
      concat_ws(",", sort_array(collect_set(col(item)))).as("routes"))

  /** A5 hardened for 100 TB (VERDICT round-1 #9): [[countAndDistinct]]'s
    * unbounded per-key set is the scale hazard — a hot key builds a giant
    * row. This variant bounds per-key state: exact distinct count (itself a
    * shuffle-heavy but bounded agg) plus only the first `cap` distinct items
    * in sorted order. Callers that need only cardinality at extreme scale
    * should use [[approxDistinctPerKey]] (HLL sketch, constant state).
    */
  def countAndDistinctCapped(df: DataFrame, key: String, item: String,
                             cap: Int = 10): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("cnt"),
      countDistinct(col(item)).as("n_routes"),
      concat_ws(",", slice(sort_array(collect_set(col(item))), 1, cap)).as("routes_top"))

  /** A5 sketch variant: approximate distinct-count per key with constant
    * per-key state (HyperLogLog++). Not oracle-comparable across engines
    * (sketches differ) — accuracy is asserted in unit tests instead.
    */
  def approxDistinctPerKey(df: DataFrame, key: String, item: String,
                           rsd: Double = 0.05): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("cnt"),
      approx_count_distinct(col(item), rsd).as("approx_routes"))

  /** A5 under key skew: two-stage salted aggregation. Stage 1 groups by
    * (key, salt) where the salt is derived from the ITEM's hash — so one hot
    * key fans out over `salts` reducers, while each distinct item still
    * lands on exactly one salt (sets stay disjoint; no re-dedup needed at
    * merge). Stage 2 merges partials per key. Output is identical to
    * [[countAndDistinct]] (tested); the plan trades one extra shuffle for
    * bounded per-reducer state under a hot key — the standard 100 TB
    * skew-mitigation shape when AQE's skew handling isn't enough.
    */
  def countAndDistinctSalted(df: DataFrame, key: String, item: String,
                             salts: Int = 8): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(hash(col(item)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("pcnt"), collect_set(col(item)).as("pset"))
    partial.groupBy(key)
      .agg(
        sum("pcnt").as("cnt"),
        concat_ws(",", sort_array(flatten(collect_list(col("pset"))))).as("routes"))
  }

  /** Hierarchical subtotals (SQL `GROUP BY ROLLUP`) — the reference has no
    * grouping sets (SURVEY §2.4 "not present"); this declares them. One
    * pass produces per-(k1,k2,…) groups plus every prefix subtotal and the
    * grand total. Rolled-up key levels surface as `fill` (default "ALL")
    * instead of NULL so the output is totally ordered and hash-comparable.
    *
    * Subtotal detection uses `grouping(key)` — the aggregate's own marker
    * for "this key was rolled up" — NOT a null-coalesce, so a real NULL
    * key value in the data stays NULL at its detail level instead of
    * masquerading as a subtotal. A real key VALUE equal to `fill` is still
    * textually ambiguous in the key column itself; pass
    * `withGroupingId = true` to append Spark's `grouping_id()` bitmask
    * column, which disambiguates every level unconditionally.
    *
    * Scale: Spark plans rollup as ONE Expand + hash aggregate — each input
    * row is replicated once per grouping set (n+1 for n keys) map-side,
    * then a single shuffle on the expanded keys; subtotal rows hash to
    * their own reducers, so no single-reducer collapse and partial
    * aggregation still applies.
    */
  def rollupAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column],
                fill: String = "ALL", withGroupingId: Boolean = false): DataFrame =
    groupingSetsAgg(df.rollup(keys.map(col): _*), keys, aggs, fill, withGroupingId)

  /** All-combination subtotals (SQL `GROUP BY CUBE`): like [[rollupAgg]]
    * but over every subset of the keys (2ⁿ grouping sets — keep n small;
    * the Expand factor is the cost knob). Same `grouping()`-based subtotal
    * marking and optional `grouping_id` column.
    */
  def cubeAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column],
              fill: String = "ALL", withGroupingId: Boolean = false): DataFrame =
    groupingSetsAgg(df.cube(keys.map(col): _*), keys, aggs, fill, withGroupingId)

  /** Shared rollup/cube tail: `grouping(key)` markers are computed INSIDE
    * the aggregate (the only context where they resolve), drive the
    * fill-vs-value choice, then drop out of the result.
    */
  private def groupingSetsAgg(grouped: org.apache.spark.sql.RelationalGroupedDataset,
                              keys: Seq[String], aggs: Seq[Column],
                              fill: String, withGroupingId: Boolean): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty, "grouping-sets agg needs keys and aggs")
    val marks = keys.map(k => grouping(col(k)).as(s"__graft_grouping_$k"))
    val gid = if (withGroupingId) Seq(grouping_id().as("grouping_id")) else Nil
    val all = marks ++ gid ++ aggs
    val out = grouped.agg(all.head, all.tail: _*)
    val keep = out.columns.drop(keys.length)
      .filterNot(_.startsWith("__graft_grouping_"))
    out.select(keys.map(k =>
      when(col(s"__graft_grouping_$k") === 1, lit(fill))
        .otherwise(col(k).cast("string")).as(k))
      ++ keep.map(col): _*)
  }

  /** S7 (`spout/spout.go:198-203`): explicit round-robin redistribution —
    * Spark's RoundRobinPartitioning. The reference cycles tuples over boltc
    * workers for load balance; here it rebalances skewed inputs before an
    * expensive map-side stage (decode, shingling).
    */
  def roundRobin(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions)

  // ---- Set operations (§2.6) ----------------------------------------------
  // The reference composes these implicitly (stream merge = union, dedup
  // passes = anti-join); SURVEY §2.6 asks for them as a declared public
  // surface. All are thin declarative forms — Catalyst plans union as a
  // no-shuffle concatenation, distinct/except/intersect as hash
  // aggregates/joins on the full row, and semi/anti as real join strategies
  // (broadcast when one side is small, shuffled hash otherwise), so each
  // inherits AQE skew handling and pushdown for free.

  /** Multiset union (SQL UNION ALL), matched BY NAME — positional `union`
    * silently mis-binds when two pipelines emit columns in different
    * orders. No shuffle: partitions of both inputs are concatenated.
    */
  def unionAll(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)

  /** Set union (SQL UNION): [[unionAll]] plus one distinct hash aggregate
    * over the full row — the only shuffle, on the row hash.
    */
  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Set difference (SQL EXCEPT): rows of `a` absent from `b`, deduped. */
  def exceptRows(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  /** Set intersection (SQL INTERSECT): rows present in both, deduped. */
  def intersectRows(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  /** Semi-join filter: rows of `df` whose `on` key appears in `keys` —
    * the allowlist filter. Only `df`'s columns survive, each input row at
    * most once (unlike an inner join, which duplicates per match).
    */
  def semiJoin(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_semi")

  /** Anti-join filter: rows of `df` whose `on` key does NOT appear in
    * `keys` — the blocklist / "apply the drop list" filter (q31's dedup
    * apply step is exactly this shape).
    */
  def antiJoin(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_anti")

  // ---- Top-K (§2.5) -------------------------------------------------------

  /** T1+T2 (`bolt/bolt.go:398-440`): rank by count desc, cut at K, with the
    * deterministic tie-break (`count DESC, key ASC`) the reference lacks.
    * `orderBy.limit(k)` plans as TakeOrderedAndProject: each partition keeps
    * a K-sized heap, the driver merges — O(K) memory regardless of input
    * size, unlike the reference's full in-memory sort.
    */
  def topK(df: DataFrame, k: Int, desc: String, tieBreak: String): DataFrame =
    df.orderBy(col(desc).desc, col(tieBreak).asc).limit(k)

  /** KEY-SKEW diagnostic: the top-k heaviest values of a prospective
    * join/aggregation key with exact row shares in integer ppm, plus the
    * frame's row and distinct-key totals — the measurement that decides
    * between a plain shuffle, AQE skew splitting, and the salted
    * operators ([[countAndDistinctSalted]],
    * [[graft.streaming.StreamJoin.saltedIntervalJoin]],
    * [[graft.operators.Analytics.sequenceStatsBucketed]]); detection
    * completing the mitigation family. Output:
    * (rk, key, cnt, share_ppm, n_rows, n_keys).
    *
    * Scale shape: ONE map-side-combined aggregate on the key (measuring
    * skew costs one pass by definition), a TakeOrderedAndProject top-k
    * (O(k) per partition), totals as a broadcast 1-row frame; the final
    * rank window sees exactly k rows.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    val counts = CacheScope.persisted(
      df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt")))
    val totals = broadcast(counts.agg(
      sum("cnt").cast("long").as("n_rows"), count(lit(1)).as("n_keys")))
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    counts.orderBy(col("cnt").desc, col("key").asc).limit(k)
      .crossJoin(totals)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("key"), col("cnt"),
        expr("(cnt * 1000000) div n_rows").as("share_ppm"),
        col("n_rows"), col("n_keys"))
  }

  /** Table profiler — per-column row/null/distinct counts and min/max, the
    * ANALYZE-style statistics pass an ingest runs before anything else
    * (partition sizing, join-side choice, skew triage all read these
    * numbers; [[skewReport]] is the per-KEY drill-down this summary points
    * at). One row per profiled column, values rendered as strings so
    * heterogeneous column types share one output schema.
    *
    * ONE full-scan aggregation computes every column's stats in a single
    * pass (no per-column scans): all counts are map-side combinable, and
    * exact `count(DISTINCT …)` over k columns plans as Spark's standard
    * expand (k× the rows into partial aggregates) — exact ndv is the
    * documented trade; at extreme cardinality swap `approx_count_distinct`
    * in, the [[approxDistinctPerKey]] treatment. min/max of strings use
    * binary (UTF-8) ordering — the engine's comparator and DuckDB's.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"profile columns must be distinct: ${cols.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    // internal aliases are INDEX-based (`__n_0`), never derived from the
    // user's column names — a column literally named like another's alias
    // would otherwise produce an ambiguous-attribute analysis error
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__n_$i"),
        count_distinct(col(c)).as(s"__ndv_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val total = count(lit(1)).as("__rows")
    val one = df.agg(total, aggs: _*)
    // pivot the single stats row to one row per column — a driver-free
    // explode over a literal column-name array, not a collect
    val entries = array(cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col("__rows").cast("long").as("n_rows"),
      (col("__rows") - col(s"__n_$i")).cast("long").as("n_null"),
      col(s"__ndv_$i").cast("long").as("n_distinct"),
      col(s"__min_$i").as("min_value"),
      col(s"__max_$i").as("max_value")) }: _*)
    one.select(explode(entries).as("e")).select("e.*")
  }
}
