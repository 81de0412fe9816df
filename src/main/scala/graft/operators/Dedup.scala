package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator family for LLM-training-data pipelines: exact
  * (hash-groupBy), n-gram Jaccard (inverted-index join), MinHash + banded
  * LSH, and SimHash — every variant a shuffle-on-keys plan, never an
  * all-pairs `crossJoin`.
  *
  * Scale notes (the 100 TB contract):
  *  - [[exact]] is one hash aggregation on a 32-hex-char key — the cheapest
  *    possible full-corpus dedup; AQE handles fingerprint skew (which only
  *    occurs when one document is duplicated millions of times — exactly the
  *    case worth detecting).
  *  - [[jaccardPairs]] shuffles on the *shingle*, so cost is driven by
  *    shingle document-frequency, not corpus size squared. It is the exact
  *    ground-truth operator; hot shingles (boilerplate) are its skew risk —
  *    that is precisely what [[minHashDedup]] bounds: candidate generation
  *    touches each document k times (signature rows) regardless of shingle
  *    popularity, then verifies only bucket-collision pairs.
  *  - [[simHash]] reduces each document to one 32-bit signature in a single
  *    aggregation; near-dup detection becomes an equi-join on the signature
  *    (or its rotations), fully shuffle-bounded.
  *
  * Determinism contract: all hashing is `md5` over explicit strings —
  * reproducible bit-for-bit by the DuckDB oracle (`md5()` is identical), so
  * even the *approximate* operators hash-match the correctness gate.
  *
  * Cache lifecycle: the similarity joins persist their shingle frame (it
  * feeds 2-3 plan branches and Catalyst does not reuse non-exchange
  * subtrees). The returned frames are lazy, so the operators cannot
  * unpersist themselves. Long-lived sessions should run each pipeline
  * inside [[withShingleCache]], which unpersists exactly the caches the
  * scope created; the blunt alternative is a global
  * `spark.catalog.clearCache()` between runs (what Bench/Verify do — they
  * own their whole session).
  */
object Dedup {

  /** Scoped cache lifecycle for a dedup/similarity pipeline: run the
    * pipeline's ACTIONS inside; every shingle/index frame the operators
    * persisted in the scope is unpersisted on exit — nothing else in the
    * session is evicted. Delegates to [[CacheScope.withCaches]] (one scope
    * covers the whole operator family, TF-IDF included).
    *
    * {{{
    * val pairs = Dedup.withShingleCache {
    *   Dedup.minHashDedup(docs, "doc_id", "text").collect()
    * } // shingle cache released here
    * }}}
    */
  def withShingleCache[T](body: => T): T = CacheScope.withCaches(body)

  /** (id, sh) frame with every shingle hashed ONCE to a 60-bit long
    * (first 15 md5 hex digits — [[TextAnalysis.fingerprint64]]'s rule) and
    * the array sorted ascending. This is the frame the similarity joins run
    * on: the inverted index explodes 8-byte longs instead of shingle
    * strings, pair verification two-pointer-merges long arrays
    * (`graft_common`'s long overload), and the MinHash base hash is the top
    * 28 bits of the same value (`h >> 32` ≡ parsing the first 7 md5 hex
    * digits) — one md5 per shingle pays for candidate generation AND
    * verification. Distinct shingles collide in 60 bits with probability
    * ~|S|²/2⁶¹ per document; a collision undercounts one union size by one.
    *
    * Computed by the fused native expression
    * [[graft.functions.HashedShingles]] (`graft_shingles64`): the composable
    * tokenize→shingle→md5→sort chain is five `CodegenFallback` higher-order
    * functions, and it dominated the map side of every similarity query
    * (equality with the composable form is property-tested in
    * HashedShinglesSpec).
    */
  private def hashedShingleFrame(df: DataFrame, idCol: String, textCol: String,
                                 n: Int): DataFrame = {
    graft.functions.HashedShingles.ensureRegistered(df.sparkSession)
    df.select(col(idCol).as("id"),
        call_function("graft_shingles64", col(textCol), lit(n)).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Exact dedup: group documents by normalized-content fingerprint, keep
    * the minimum id as the canonical representative. Output one row per
    * distinct content: (keep_id, fp, n_copies).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "fp", "n_copies")

  /** Exact dedup for streams: keep the first occurrence of each key across
    * micro-batches, with state BOUNDED by the watermark —
    * `dropDuplicatesWithinWatermark` evicts a seen-key entry once the
    * watermark passes its event time plus `delay`, so a forever-running
    * ingest pipeline holds state only for the duplicate-arrival horizon
    * (plain `dropDuplicates` on a stream would keep every key forever).
    */
  def streamingExact(df: DataFrame, eventTimeCol: String, delay: String,
                     keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Exact n-gram Jaccard similarity join via inverted index: explode each
    * document's distinct shingles, equi-join on the shingle (never a cross
    * join), count the intersection per pair, and derive
    * |A∩B| / (|A| + |B| - |A∩B|). Returns (doc_a, doc_b, jaccard) for pairs
    * at or above `threshold`, doc_a < doc_b.
    *
    * HOT-SHINGLE GUARD: a shingle in f documents contributes f²/2 join
    * rows, and the plain inverted index puts them all in ONE join-key
    * partition — a boilerplate shingle in 50% of the corpus is a quadratic
    * straggler. Postings are therefore split by document frequency:
    *  - df ≤ `hotDf`: the normal inverted-index equi-join;
    *  - df > `hotDf`: a BLOCKED self-join — each posting gets a block id
    *    `hash(id) mod hotBlocks`, the probe side replicates to every
    *    block, and the join key becomes (shingle, block), spreading the
    *    shingle's f² work over `hotBlocks` tasks (max task ~ f²/blocks)
    *    at the price of replicating only the hot postings `hotBlocks`×.
    * Both joins emit raw (doc_a, doc_b) match rows into ONE count
    * aggregate, so every posting pair is counted exactly once and the
    * output is bit-identical to the unguarded join (tested both ways).
    * Pairs whose shared shingles are ALL hot (identical boilerplate
    * documents) still surface — through the blocked join, where their
    * quadratic output is inherent to the answer, not to the plan.
    *
    * Detection is SAMPLED (`hotSampleFraction`, default 2%): an exact df
    * count would shuffle every distinct shingle (measured ~25% on the
    * whole query), while a genuinely quadratic shingle — df in the tens
    * of thousands and up — is flagged from a small sample with
    * near-certainty. The cutoff sits at a 4× margin under `hotDf`, so
    * over-flagging warm shingles (harmless: the blocked join is exact) is
    * preferred to missing hot ones; a borderline miss degrades the task
    * bound by at most that margin, never to unbounded. Routing never
    * affects the OUTPUT, only the plan.
    *
    * The hot list is pulled to the DRIVER and inlined as an `InSet`
    * predicate rather than tag-joined: the split filters then run
    * map-side inside codegen, and with no hot shingles at all (the common
    * corpus) the hot branch constant-folds to an empty relation, leaving
    * the plan identical to the unguarded join (a broadcast tag join, the
    * first implementation, re-evaluated under every self-join branch and
    * cost ~25% even when the list was empty). Driver safety: the list is
    * bounded by 4·|postings|/hotDf entries (sampled count over cutoff) —
    * the same bounded-scalar contract as the IVF codebook cap.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.3,
                   hotDf: Long = 4096, hotBlocks: Int = 16,
                   hotSampleFraction: Double = 0.02): DataFrame = {
    // hashed frame: the inverted index shuffles 8-byte longs, not shingle
    // strings — same pair counts up to 60-bit collisions: a within-document
    // collision undercounts one set size, a CROSS-document collision
    // (distinct shingles of A and B hashing equal) overcounts one
    // intersection; both are p ≈ |S|²/2⁶¹ per pair
    val sh = CacheScope.persisted(hashedShingleFrame(df, idCol, textCol, n))
    val sizes = sh.select(col("id"), size(col("sh")).as("nsh"))
    val inv = sh.select(col("id"), explode(col("sh")).as("s"))
    val cutoff = math.max(1.0, hotDf * hotSampleFraction / 4)
    val hotSet = inv.sample(withReplacement = false, hotSampleFraction, seed = 42L)
      .groupBy("s").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > cutoff)
      .select("s").collect().map(_.getLong(0)).toSeq
    val isHot = col("s").isin(hotSet: _*) // InSet: O(1) map-side membership
    val cold = inv.filter(!isHot)
    val hotPost = inv.filter(isHot)
      .select(col("id"), col("s"), pmod(hash(col("id")), lit(hotBlocks)).as("blk"))
    // SHUFFLE_HASH: the self-join key (the shingle) is high-cardinality and
    // near-uniform once hot keys are routed away, so a hashed build beats
    // sorting both 500k-row sides (measured 2.6× on the bench corpus).
    val coldRows = cold.as("a")
      .join(cold.as("b").hint("SHUFFLE_HASH"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
    // blocked hot join: probe replicated to each block, build keeps its
    // own block — every unordered posting pair meets in exactly one
    // (shingle, block) partition
    val hotRows = hotPost
      .withColumn("tb", explode(sequence(lit(0), lit(hotBlocks - 1)))).as("a")
      .join(hotPost.as("b").hint("SHUFFLE_HASH"),
        col("a.s") === col("b.s") && col("a.tb") === col("b.blk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
    val common = coldRows.union(hotRows)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** [[jaccardPairs]] with PREFIX FILTERING (Chaudhuri/Bayardo SSJoin, plus
    * PPJoin's length and position filters), NUMERIC end-to-end: every shingle
    * is hashed ONCE to a 60-bit long (first 15 md5 hex digits — the same
    * `fp64` rule as [[TextAnalysis.fingerprint64]]), and everything
    * downstream — canonical sort, prefix slice, inverted-index join,
    * verification intersect — operates on 8-byte longs, never the shingle
    * strings (the round-4 fat-string form shuffled 32+ decoration bytes per
    * element and was slower than the unfiltered join).
    *
    * Candidate pruning, all lossless for Jaccard ≥ t:
    *  - prefix: index only the first `|S| - ⌈t·|S|⌉ + 1` shingles in the
    *    global hash order — a qualifying pair shares at least one prefix
    *    element;
    *  - length: J(A,B) ≤ min/max of the set sizes, so require
    *    `t·|A| ≤ |B| ∧ t·|B| ≤ |A|` inside the join;
    *  - position: a match at prefix positions (i, j) caps the overlap at
    *    `1 + min(|A|-1-i, |B|-1-j)`, which must reach the equivalent-overlap
    *    bound `⌈t/(1+t)·(|A|+|B|)⌉`; for the FIRST shared element this cap is
    *    exact-from-above, so dropping rows that fail it never drops a
    *    qualifying pair.
    * Duplicate candidates collapse in a count aggregate (a pair can match at
    * most prefix-length times), not a `distinct()` over a wider row.
    *
    * Hash note: distinct shingles collide in 60 bits with probability
    * ~|S|²/2⁶¹ per document (≪1e-12 at realistic shingle counts); a
    * collision would undercount one pair's union size. Output is otherwise
    * identical to [[jaccardPairs]] (same ground-truth oracle,
    * property-tested equal).
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.3): DataFrame = {
    val sh = CacheScope.persisted(hashedShingleFrame(df, idCol, textCol, n))
    // Every pruning bound below subtracts a tiny epsilon before its ceil /
    // comparison: at an exact J == t boundary, a 1-ulp UPWARD rounding of
    // nsh·t or t/(1+t)·(na+nb) would otherwise shorten a prefix / raise α /
    // fail the length filter and silently drop a qualifying pair that the
    // exact [[jaccardPairs]] (and the oracle) emit. The epsilon only ever
    // LOOSENS a bound (a few extra candidates, re-verified exactly), never
    // tightens one — losslessness is preserved by construction.
    val eps = 1e-9
    val prefixLen =
      (size(col("sh")) - ceil(size(col("sh")) * threshold - eps) + 1).cast("int")
    val prefixes = sh
      .select(col("id"), size(col("sh")).as("nsh"),
        posexplode(slice(col("sh"), lit(1), prefixLen)).as(Seq("pos", "h")))
    // Equivalent-overlap bound: |A∩B| ≥ t/(1+t)·(|A|+|B|) ⇔ J ≥ t.
    val alpha =
      ceil(lit(threshold / (1 + threshold)) * (col("a.nsh") + col("b.nsh")) - eps)
    val cand = prefixes.as("a")
      .join(prefixes.as("b").hint("SHUFFLE_HASH"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          // length filter: size ratio below t can't reach Jaccard t
          col("a.nsh") * threshold <= col("b.nsh") + eps &&
          col("b.nsh") * threshold <= col("a.nsh") + eps &&
          // position filter: suffix lengths after this match must allow α
          lit(1) + least(col("a.nsh") - 1 - col("a.pos"),
            col("b.nsh") - 1 - col("b.pos")) >= alpha)
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("n_matches"))
      .select("doc_a", "doc_b")
    verifyPairs(cand, sh, threshold)
  }

  /** Shared candidate verification: join back the full sorted shingle sets
    * and compute exact Jaccard with the codegen'd two-pointer intersection
    * count ([[graft.functions.SortedIntersectCount]]).
    */
  private def verifyPairs(cand: DataFrame, sh: DataFrame,
                          threshold: Double): DataFrame = {
    graft.functions.SortedIntersectCount.ensureRegistered(cand.sparkSession)
    cand
      .join(sh.select(col("id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("common", call_function("graft_common", col("sha"), col("shb")))
      .withColumn("jaccard",
        col("common") / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Universal-hash family for MinHash: `h_i(x) = (a_i·x + b_i) mod P` over
    * a 28-bit md5-derived base hash. One md5 per shingle instead of k — the
    * md5 is the expensive part of signature computation — with the k
    * permutations coming from integer arithmetic. Products stay < 2^56, so
    * the same literals evaluate identically in Spark (Java long) and DuckDB
    * (checked BIGINT). Constants are md5-derived in Scala and inlined into
    * the oracle SQL, so both engines share them by construction.
    */
  private[graft] val HashP: Long = 2147483647L // 2^31 - 1 (prime)
  private[graft] def hashConsts(k: Int): Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def c28(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    (0 until k).map(i => (c28(s"a$i") | 1L, c28(s"b$i"))) // a odd ⇒ nonzero
  }

  /** MinHash signature: k per-document minima of universally-hashed
    * shingles. One exploded pass + one aggregation; the k mins ride the
    * same shuffle.
    */
  def minHashSignature(df: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int): DataFrame =
    signatureOfHashed(hashedShingleFrame(df, idCol, textCol, n), k)

  /** [[minHashSignature]] over a pre-built HASHED (id, sh: array<long>)
    * shingle frame: the 28-bit base hash is the top bits of the 60-bit
    * element (`>> 32` ≡ `conv(substr(md5(shingle),1,7),16,10)` — the rule
    * the oracle evaluates in SQL), so no second md5 pass is needed.
    *
    * The signature is computed PER ROW by the fused
    * [[graft.functions.MinHashSig]] expression — no explode, no groupBy, no
    * exchange: the MinHash pipeline's only shuffle is the band-bucket join
    * (the composable explode + k-min-aggregate form paid a ×|shingles| row
    * blow-up plus a shuffle for a value a map-side loop produces; equality
    * is property-tested in DedupSpec).
    */
  private def signatureOfHashed(shl: DataFrame, k: Int): DataFrame = {
    graft.functions.MinHashSig.ensureRegistered(shl.sparkSession)
    shl.select(col("id"), call_function("graft_minhash", col("sh"), lit(k)).as("mh"))
      .select(col("id") +:
        (0 until k).map(i => element_at(col("mh"), i + 1).as(s"h$i")): _*)
  }

  /** Banded LSH candidate pairs from a MinHash signature frame: hash each
    * band of `rowsPerBand` signature slots to one md5, explode to
    * (id, band_idx, band_hash), and self-equi-join on the band — two
    * documents become a candidate iff they agree on at least one whole band.
    */
  def lshCandidates(sig: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val long = bandFrame(sig, k, rowsPerBand)
    long.as("a")
      .join(long.as("b").hint("SHUFFLE_HASH"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /** The long-form banded frame behind [[lshCandidates]]: hash each band of
    * `rowsPerBand` signature slots to one md5 and explode to
    * (id, band_idx, band_hash) — k/rowsPerBand rows per document.
    */
  private def bandFrame(sig: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val bands = k / rowsPerBand
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*))
        .as(s"band$b")
    }
    sig.select(col("id") +: bandCols: _*)
      .select(col("id"),
        posexplode(array((0 until bands).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band_hash")))
  }

  /** INCREMENTAL near-dup detection: which documents of a NEW `batch`
    * near-duplicate something already in `corpus`? The continuously-
    * ingesting twin of [[minHashDedup]] — a pipeline that deduped its
    * corpus once does not re-run the full self-join when a crawl increment
    * arrives; it checks the increment AGAINST the corpus (batch-internal
    * duplicates are [[minHashDedup]] on the batch alone, corpus-internal
    * ones are already resolved).
    *
    * Same signature/band machinery as [[minHashDedup]] (per-row fused
    * signatures, zero exchanges until the join), but the band join is
    * ASYMMETRIC: batch bands against corpus bands, no self-pairing. Cost is
    * |batch|·bands + |corpus|·bands join rows, never corpus²; when the
    * increment is small its banded side falls under the broadcast
    * threshold and Catalyst/AQE picks a broadcast join — the corpus side
    * then never shuffles at all (left to the planner rather than hinted:
    * a backfill-sized "increment" must stay shuffle-joinable).
    *
    * Returns (batch_id, corpus_id, jaccard ≥ threshold), one row per
    * verified cross pair.
    */
  def minHashAgainst(corpus: DataFrame, batch: DataFrame,
                     idCol: String, textCol: String,
                     n: Int = 3, k: Int = 12, rowsPerBand: Int = 3,
                     threshold: Double = 0.3): DataFrame = {
    val shC = CacheScope.persisted(hashedShingleFrame(corpus, idCol, textCol, n))
    val shB = CacheScope.persisted(hashedShingleFrame(batch, idCol, textCol, n))
    val cand = bandFrame(signatureOfHashed(shB, k), k, rowsPerBand).as("b")
      .join(bandFrame(signatureOfHashed(shC, k), k, rowsPerBand).as("c"),
        col("b.band_idx") === col("c.band_idx") &&
          col("b.band_hash") === col("c.band_hash"))
      .select(col("b.id").as("batch_id"), col("c.id").as("corpus_id"))
      .distinct()
    graft.functions.SortedIntersectCount.ensureRegistered(cand.sparkSession)
    cand
      .join(shB.select(col("id").as("batch_id"), col("sh").as("sha")), "batch_id")
      .join(shC.select(col("id").as("corpus_id"), col("sh").as("shb")), "corpus_id")
      .withColumn("common", call_function("graft_common", col("sha"), col("shb")))
      .withColumn("jaccard",
        col("common") / (size(col("sha")) + size(col("shb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: signature → banded candidates →
    * exact-Jaccard verification of candidates only. Output matches
    * [[jaccardPairs]]'s shape but touches only bucket-collision pairs —
    * the scale path when the corpus (or a boilerplate shingle) is hot.
    */
  def minHashDedup(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 12, rowsPerBand: Int = 3,
                   threshold: Double = 0.3): DataFrame = {
    // The HASHED shingle frame feeds three plan branches (signature + both
    // sides of the verification join); persist it so shingling+hashing run
    // once — the same materialize-the-shingles step a 100 TB run would make
    // explicit (persist here, a checkpointed table there). NOTE:
    // CacheManager holds the InMemoryRelation until an explicit unpersist,
    // and this operator returns a LAZY frame, so it cannot unpersist before
    // the caller's action; long-lived sessions should call
    // `spark.catalog.clearCache()` between pipeline runs (Bench/Verify do).
    val sh = CacheScope.persisted(hashedShingleFrame(df, idCol, textCol, n))
    val cand = lshCandidates(signatureOfHashed(sh, k), k, rowsPerBand)
    verifyPairs(cand, sh, threshold)
  }

  /** MinHash ACCURACY report — per candidate pair, the sketch's Jaccard
    * ESTIMATE (matching signature slots / k, the unbiased MinHash
    * estimator) next to the TRUE Jaccard from the full shingle sets. The
    * whole near-dup family ([[minHashDedup]], [[minHashAgainst]], the
    * streaming twin) stands on "k slots approximate Jaccard well enough
    * for the band threshold" — this operator MEASURES that premise on the
    * corpus at hand, so the k/band budget is chosen from evidence, the
    * same role [[Similarity.recallReport]] plays for the ANN index.
    *
    * Output: (doc_a, doc_b, n_match, est_ppm, jaccard) for every banded
    * LSH candidate (no threshold cut — the report wants the misses too);
    * `est_ppm = n_match·10⁶ div k` exact-integer, `jaccard` the verified
    * truth. Cost is the [[minHashDedup]] pipeline's own: per-row fused
    * signatures, the banded candidate join, and ONE verification join —
    * the k-slot comparison rides the signature join for free (k fixed
    * columns, no explode).
    */
  def minHashAccuracy(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 12,
                      rowsPerBand: Int = 3): DataFrame = {
    graft.functions.SortedIntersectCount.ensureRegistered(df.sparkSession)
    val sh = CacheScope.persisted(hashedShingleFrame(df, idCol, textCol, n))
    val sig = CacheScope.persisted(signatureOfHashed(sh, k))
    val cand = lshCandidates(sig, k, rowsPerBand)
    val nMatch = (0 until k)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(sig.as("a"), col("doc_a") === col("a.id"))
      .join(sig.as("b"), col("doc_b") === col("b.id"))
      .select(col("doc_a"), col("doc_b"), nMatch.as("n_match"))
      .join(sh.select(col("id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("common", call_function("graft_common", col("sha"), col("shb")))
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        expr(s"CAST(n_match * 1000000 DIV $k AS BIGINT)").as("est_ppm"),
        round(col("common") /
          (size(col("sha")) + size(col("shb")) - col("common")), 4)
          .as("jaccard"))
  }

  /** Per-GROUP near-dup rate — the curation diagnostic over
    * [[minHashDedup]]'s pairs: for each `groupCol` value (source, domain,
    * language…), how many documents participate in at least one verified
    * near-dup pair, in exact integer ppm of the group. The report that
    * says WHERE the duplication lives — which crawl source to dedup
    * harder, which to drop — before any document is touched.
    *
    * Cost: the [[minHashDedup]] pipeline plus one distinct over the
    * (small) pair-member set and one bounded-group aggregate; the group
    * totals never touch text.
    */
  def dupRateByGroup(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, n: Int = 3, k: Int = 12,
                     rowsPerBand: Int = 3,
                     threshold: Double = 0.3): DataFrame = {
    val pairs = minHashDedup(df, idCol, textCol, n, k, rowsPerBand, threshold)
    val dupDocs = pairs.select(col("doc_a").as("id"))
      .unionAll(pairs.select(col("doc_b").as("id")))
      .distinct()
    val dups = df.select(col(groupCol), col(idCol).as("id"))
      .join(dupDocs, "id")
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_dup"))
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .join(dups, Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_ppm", expr("n_dup * 1000000 div n_docs"))
      // nulls LAST to match ANSI/DuckDB ORDER BY defaults — Spark's
      // nulls-first default would silently flip row order (and the gate
      // hash) the day a fixture grows a NULL group key
      .orderBy(col(groupCol).asc_nulls_last)
  }

  /** Cross-signal dedup RECONCILIATION — a real pipeline runs every
    * detector (exact fingerprint, MinHash near-dup, embedding-space
    * semantic dup) and then has to reconcile them before purging: a doc
    * flagged only semantically is a paraphrase (different purge policy
    * than a byte-twin), one flagged by all three is a clear kill, and the
    * marginal value of each detector IS this report's column margins.
    * One row per document flagged by ≥ 1 signal:
    * (doc_id, exact_dup, near_dup, semantic_dup) with 0/1 flags.
    *
    * Scale shape: the three detectors run their own documented plans
    * (one md5 hash agg; the banded LSH pipeline; the 4-byte PQ-candidate
    * pipeline) and the reconciliation itself is two full-outer joins on
    * the unique doc_id — skew-free, ∝ flagged docs, not corpus.
    */
  def dedupSignalReport(docs: DataFrame, docId: String, textCol: String,
                        embs: DataFrame, vecId: String, vecCol: String,
                        n: Int = 3, k: Int = 12, rowsPerBand: Int = 3,
                        jaccardThreshold: Double = 0.3,
                        cosThreshold: Double = 0.35, m: Int = 8,
                        ksub: Int = 2, centStep: Int = 25): DataFrame = {
    val fp = docs.select(col(docId).cast("long").as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val exGroups = fp.groupBy("fp").agg(count(lit(1)).as("nc"))
      .filter(col("nc") >= 2)
    val exM = fp.join(exGroups, "fp").select(col("doc_id"))
      .withColumn("exact_dup", lit(1L))
    val ndPairs = minHashDedup(docs, docId, textCol, n, k, rowsPerBand,
      jaccardThreshold)
    val ndM = ndPairs.select(col("doc_a").cast("long").as("doc_id"))
      .unionAll(ndPairs.select(col("doc_b").cast("long").as("doc_id")))
      .distinct().withColumn("near_dup", lit(1L))
    val sdM = Similarity.pqDupGroups(embs, vecId, vecCol, cosThreshold,
        m, ksub, centStep)
      .select(col("vec_id").as("doc_id"))
      .withColumn("semantic_dup", lit(1L))
    exM.join(ndM, Seq("doc_id"), "full")
      .join(sdM, Seq("doc_id"), "full")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0L)).as("exact_dup"),
        coalesce(col("near_dup"), lit(0L)).as("near_dup"),
        coalesce(col("semantic_dup"), lit(0L)).as("semantic_dup"))
      .orderBy("doc_id")
  }

  /** Duplicate-GROUP resolution: the similarity joins emit PAIRS, but a
    * dedup pipeline needs each document mapped to ONE canonical
    * representative — i.e. connected components over the near-dup graph
    * (A≈B, B≈C ⇒ {A,B,C} keep min id), which no single join can express.
    *
    * Distributed min-label propagation with POINTER JUMPING: each round
    * takes the min label over {self} ∪ neighbors (one hop), then replaces
    * every label with its label's label (one jump). The jump halves the
    * label-forest depth per round, so convergence is O(log diameter)
    * rounds, not O(diameter) — a 10⁶-long duplicate chain resolves in ~20
    * rounds. Each round is two shuffles on node/label; lineage truncates
    * per round — `localCheckpoint` by default, or a reliable `checkpoint`
    * when `checkpointDir` names a fault-tolerant directory (what a 100 TB
    * run passes so executor loss mid-iteration never replays the chain).
    * Termination is an exact changed-label count — one cheap action per
    * round.
    *
    * Input: (aCol, bCol) pair frame. Output: (doc_id, canon_id) for every
    * document that appears in a pair, canon_id = min id of its component.
    * Documents with no near-dup are absent (they keep themselves).
    *
    * SMALL-GRAPH FAST PATH: when the edge list fits under `driverEdgeCap`
    * (counted first — one cheap action on the persisted edges), the
    * components are solved by an in-memory union-find on the driver: one
    * collect of (u, v) longs, zero iteration jobs. This is the same
    * bounded-driver-scalar pattern as the IVF codebook cap — the
    * DUPLICATE-PAIR graph is orders of magnitude smaller than the corpus
    * (most documents have no near-dup), so even a 100 TB corpus usually
    * produces an edge list of millions, not billions; the default cap
    * (2²² edges ≈ 64 MB) keeps the driver safe, and anything larger takes
    * the distributed pointer-jumping loop below. `driverEdgeCap = 0`
    * forces the loop (tests use this to cover both paths).
    */
  def canonicalIds(pairs: DataFrame, aCol: String = "doc_a",
                   bCol: String = "doc_b", maxIters: Int = 50,
                   driverEdgeCap: Long = 1L << 22,
                   checkpointDir: Option[String] = None): DataFrame = {
    // The pair frame is usually the output of an expensive similarity join
    // and fans out into THREE union branches below — persist it so the
    // join runs once, not three times (measured 3× the q9 cost without).
    val edges = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (edges.count() <= driverEdgeCap) {
      val out = unionFindLocal(pairs.sparkSession,
        edges.collect().map(r => (r.getLong(0), r.getLong(1))))
      edges.unpersist(false)
      return out
    }
    // symmetric closure PLUS self-loops: the self-loop makes the one-hop
    // aggregation below take min over {self} ∪ neighbors in a single join —
    // no per-iteration union (unioning a checkpointed frame with a frame
    // derived from it trips constraint rewriting in Spark 4.1)
    val nodes = edges.select(col("u")).union(edges.select(col("v")))
      .distinct().select(col("u").as("node"))
    val sym = edges
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .union(nodes.select(col("node").as("u"), col("node").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Initial labels are the lazy identity over nodes — no eager
    // checkpoint, no initial sum action: round 1's single job materializes
    // edges/nodes/sym caches and the first propagation together (every pair
    // strictly lowers one label, so round 1 can never already be the
    // fixpoint and the identity sum never needs computing).
    var labels = nodes.select(col("node"), col("node").as("label"))
    // Convergence witness: every node's label is non-increasing (hop takes
    // min over a set containing it; jump replaces it with its label's
    // label, which the hop already lowered), so Σ labels strictly decreases
    // until the fixpoint — an aggregate comparison detects change without
    // joining old vs new. decimal(38,0) so huge ids can't overflow the sum.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prev: java.math.BigDecimal = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val hop = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u").as("node"), col("label"))
        .groupBy("node").agg(min("label").as("label"))
      // pointer jump: label := label(label) — labels only decrease, and
      // every label is itself a node, so the self-join always resolves
      val jumpedPlan = hop.as("x")
        .join(hop.select(col("node").as("jn"), col("label").as("jl")).as("y"),
          col("x.label") === col("jn"), "left")
        .select(col("x.node").as("node"),
          coalesce(col("jl"), col("x.label")).as("label"))
      // lazy: the labelSum action materializes it. localCheckpoint unless
      // the caller passed a reliable checkpointDir (cluster runs that must
      // survive executor loss mid-iteration)
      val jumped = Checkpoints.cut(jumpedPlan, checkpointDir, eager = false)
      val cur = labelSum(jumped)
      // null sum = empty pair frame (nothing to resolve); otherwise compare
      // against the previous round (round 1 has nothing to compare to)
      converged = cur == null || (prev != null && cur.compareTo(prev) == 0)
      labels = jumped
      prev = cur
      iter += 1
    }
    if (!converged)
      // Unconverged labels mean canon_id may not be the component minimum —
      // a downstream keep/drop (q31's apply) would then keep the wrong
      // documents. Surface it loudly; with pointer jumping, hitting 50
      // rounds means a component diameter ~2^50, i.e. something is wrong
      // with the input, not the iteration budget.
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"canonicalIds stopped at maxIters=$maxIters WITHOUT reaching " +
          "the label fixpoint; canon_id values may not be component minima")
    sym.unpersist(false)
    edges.unpersist(false)
    labels.select(col("node").as("doc_id"), col("label").as("canon_id"))
  }

  /** Quality-aware duplicate-group resolution: [[canonicalIds]]' connected
    * components, but the surviving member of each group is the one with
    * the HIGHEST score (ties → lowest doc_id) instead of the lowest id —
    * what a curation pipeline actually wants when near-duplicates differ
    * in quality (keep the clean crawl, drop the boilerplate-ridden one).
    * `scores` maps `idCol` → `scoreCol`; integer micro-unit scores keep
    * the argmax engine-portable. Output per group member:
    * (doc_id, group_id, keep_id, keep, <scoreCol>) — `group_id` is the
    * component's canonical min-id label, `keep_id` the quality winner.
    *
    * Scale: one unique-key join onto the (already bounded) component
    * frame, then a per-group `min(struct(-score, doc_id))` argmax —
    * map-side combinable, one row per group out of the exchange.
    */
  def resolveByScore(pairs: DataFrame, scores: DataFrame, idCol: String,
                     scoreCol: String, aCol: String = "doc_a",
                     bCol: String = "doc_b"): DataFrame = {
    val members = canonicalIds(pairs, aCol, bCol)
      .join(scores.select(col(idCol).as("doc_id"),
        col(scoreCol).cast("long").as("__score")), "doc_id")
    val keep = members.groupBy("canon_id")
      .agg(min(struct((col("__score") * -1).as("ns"), col("doc_id"))).as("w"))
      .select(col("canon_id"), col("w.doc_id").as("keep_id"))
    members.join(keep, "canon_id")
      .select(col("doc_id"), col("canon_id").as("group_id"), col("keep_id"),
        (col("doc_id") === col("keep_id")).as("keep"),
        col("__score").as(scoreCol))
  }

  /** Driver-side union-find over a collected edge list — the
    * [[canonicalIds]] fast path. Union-by-min-root (the larger root always
    * attaches under the smaller) keeps every root the minimum id of its
    * component, so `find` IS the canon_id; path compression makes the whole
    * pass effectively linear. The result ships back as a parallelized frame
    * (not a LocalRelation — millions of rows inlined into a plan would
    * bloat every downstream optimization pass).
    */
  private def unionFindLocal(spark: org.apache.spark.sql.SparkSession,
                             es: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val ru = find(u); val rv = find(v)
      if (ru < rv) parent(rv) = ru
      else if (rv < ru) parent(ru) = rv
    }
    val rows = parent.keysIterator
      .map(n => org.apache.spark.sql.Row(n, find(n))).toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("canon_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val slices = math.max(1, math.min(32, rows.length / 500000))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, slices), schema)
  }

  /** Train/eval DECONTAMINATION — the dedup family's asymmetric twin: which
    * corpus documents share at least one word n-gram with a held-out
    * evaluation set? The standard contamination rule (n = 13, the 13-gram
    * overlap check used across LLM training-data reports) is the default.
    *
    * Output: (doc_id, n_overlap, example_h) per CONTAMINATED corpus
    * document — the count of its distinct n-grams that appear anywhere in
    * the eval set, plus the smallest 60-bit gram hash as a stable example
    * witness. Clean documents are absent (a 100 TB corpus is mostly clean;
    * emitting only violations keeps the output proportional to the
    * contamination, not the corpus).
    *
    * Scale shape: the corpus side is map-side only — fused shingle hashing
    * ([[graft.functions.HashedShingles]]) then explode; the eval side (eval
    * sets are thousands of documents, not billions) collapses to a DISTINCT
    * 8-byte-hash set and BROADCASTS, so the corpus never shuffles to meet
    * it. The only exchange is the final groupBy on the (rare) contaminated
    * doc ids. For an eval set too large to broadcast, pass
    * `broadcastEval = false` to fall back to a shuffle equi-join on the
    * gram hash — same output, same no-all-pairs bound.
    */
  def contaminatedDocs(corpus: DataFrame, corpusId: String, corpusText: String,
                       evalSet: DataFrame, evalTextCol: String,
                       n: Int = 13, broadcastEval: Boolean = true): DataFrame = {
    graft.functions.HashedShingles.ensureRegistered(corpus.sparkSession)
    val evalGrams = evalSet
      .select(explode(
        call_function("graft_shingles64", col(evalTextCol), lit(n))).as("h"))
      .distinct()
    val corpusGrams = hashedShingleFrame(corpus, corpusId, corpusText, n)
      .select(col("id").as("doc_id"), explode(col("sh")).as("h"))
    val hits = corpusGrams.join(
      if (broadcastEval) broadcast(evalGrams) else evalGrams, "h")
    // corpus shingles are distinct per document and the eval side is a
    // distinct set, so count(*) = |distinct corpus grams ∩ eval grams|
    hits.groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"), min(col("h")).as("example_h"))
  }

  /** [[contaminatedDocs]] with SEVERITY: per contaminated document, the
    * overlapping-gram count, the document's total distinct gram count,
    * and their ratio in exact integer parts-per-million — the column a
    * decontamination pass thresholds on ("drop if > 5% of the document
    * overlaps eval, keep-and-flag below"), where the binary form can only
    * drop. Same asymmetric join shape; the totals ride out of the same
    * (persisted) shingle frame, so the corpus is still scanned once.
    */
  def contaminationReport(corpus: DataFrame, corpusId: String,
                          corpusText: String, evalSet: DataFrame,
                          evalTextCol: String, n: Int = 13,
                          broadcastEval: Boolean = true): DataFrame = {
    graft.functions.HashedShingles.ensureRegistered(corpus.sparkSession)
    val evalGrams = evalSet
      .select(explode(
        call_function("graft_shingles64", col(evalTextCol), lit(n))).as("h"))
      .distinct()
    // persisted: the shingle frame feeds BOTH the totals and overlaps
    // branches — without the cache each would rescan the corpus and
    // recompute the shingles (the dominant cost), doubling the single
    // corpus pass this operator's scale contract advertises
    val shFrame = CacheScope.persisted(
      hashedShingleFrame(corpus, corpusId, corpusText, n))
    val totals = shFrame.select(col("id").as("doc_id"),
      size(col("sh")).cast("long").as("n_grams"))
    val overlaps = shFrame
      .select(col("id").as("doc_id"), explode(col("sh")).as("h"))
      .join(if (broadcastEval) broadcast(evalGrams) else evalGrams, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    overlaps.join(totals, "doc_id")
      .select(col("doc_id"), col("n_overlap"), col("n_grams"),
        expr("(n_overlap * 1000000) div n_grams").as("overlap_ppm"))
  }

  /** The MULTI-benchmark decontamination matrix: contamination rate per
    * (corpus group × benchmark) — the release-readiness table a lab reads
    * before training ("web-crawl is 2,000 ppm against MMLU-like eval A
    * but clean against eval B"), where [[contaminatedDocs]] answers for
    * ONE eval set at a time. Every (group, benchmark) cell is present —
    * including exact-zero cells, which are the point of the report — with
    * doc counts and the rate in exact integer ppm.
    *
    * Scale shape: the corpus is shingled ONCE (the persisted frame serves
    * every benchmark's join and the group totals); each benchmark
    * contributes one asymmetric broadcast join against its distinct-gram
    * set (eval sets are small by definition — that asymmetry is the whole
    * decontamination design); the grid is group-totals × a literal
    * benchmark list. Nothing quadratic, nothing corpus-sized shuffled
    * more than once.
    */
  def decontaminationMatrix(corpus: DataFrame, idCol: String,
                            textCol: String, groupCol: String,
                            benchmarks: Seq[(String, DataFrame)],
                            evalTextCol: String, n: Int = 13): DataFrame = {
    require(benchmarks.nonEmpty, "need at least one benchmark")
    val sp = corpus.sparkSession
    graft.functions.HashedShingles.ensureRegistered(sp)
    val c = CacheScope.persisted(corpus.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(groupCol).as("grp")))
    val totals = c.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    val hits = benchmarks.map { case (name, ev) =>
      contaminatedDocs(c, "doc_id", "text", ev, evalTextCol, n)
        .join(c.select("doc_id", "grp"), "doc_id")
        .groupBy("grp").agg(count(lit(1)).as("contaminated_docs"))
        .withColumn("benchmark", lit(name))
    }.reduce(_ unionByName _)
    val grid = totals.crossJoin(
      broadcast(sp.createDataset(benchmarks.map(_._1))(
        org.apache.spark.sql.Encoders.STRING).toDF("benchmark")))
    grid.join(hits, Seq("grp", "benchmark"), "left")
      .select(col("grp").as(groupCol), col("benchmark"), col("n_docs"),
        coalesce(col("contaminated_docs"), lit(0L)).as("contaminated_docs"))
      .withColumn("contam_ppm",
        expr("(contaminated_docs * 1000000) div n_docs"))
  }

  /** [[decontaminationMatrix]] with the benchmarks as ONE relation
    * (`benchNameCol`, `benchTextCol` columns) instead of a Scala list —
    * both the SQL-front-door form (a TVF can take a view name, not a
    * list of frames) and the better plan when benchmarks are many: ALL
    * benchmark grams ride one tagged broadcast set, so the corpus-side
    * work is ONE join for N benchmarks instead of N joins. Gated
    * hash-identical to the per-frame form (q202 ≡ q185).
    */
  def decontaminationMatrixView(corpus: DataFrame, idCol: String,
                                textCol: String, groupCol: String,
                                benchmarks: DataFrame, benchNameCol: String,
                                benchTextCol: String,
                                n: Int = 13): DataFrame = {
    graft.functions.HashedShingles.ensureRegistered(corpus.sparkSession)
    val c = CacheScope.persisted(corpus.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(groupCol).as("grp")))
    val totals = c.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    val evalGrams = benchmarks
      .select(col(benchNameCol).as("benchmark"),
        explode(call_function("graft_shingles64",
          col(benchTextCol), lit(n))).as("h"))
      .distinct()
    val corpusGrams = hashedShingleFrame(c, "doc_id", "text", n)
      .select(col("id").as("doc_id"), explode(col("sh")).as("h"))
    val hits = corpusGrams.join(broadcast(evalGrams), "h")
      .select("doc_id", "benchmark").distinct()
      .join(c.select("doc_id", "grp"), "doc_id")
      .groupBy("grp", "benchmark")
      .agg(count(lit(1)).as("contaminated_docs"))
    val grid = totals.crossJoin(
      broadcast(benchmarks.select(col(benchNameCol).as("benchmark"))
        .distinct()))
    grid.join(hits, Seq("grp", "benchmark"), "left")
      .select(col("grp").as(groupCol), col("benchmark"), col("n_docs"),
        coalesce(col("contaminated_docs"), lit(0L)).as("contaminated_docs"))
      .withColumn("contam_ppm",
        expr("(contaminated_docs * 1000000) div n_docs"))
  }

  /** K-Minimum-Values (KMV / bottom-k) sketch of a corpus's distinct
    * content fingerprints (Bar-Yossef et al., RANDOM 2002; the
    * theta-sketch family's simplest member): the `k` smallest 48-bit md5
    * hashes. The fourth
    * sketch in the family, and the one that buys SET OPERATIONS: two
    * corpora's bottom-k sketches merge (union, keep k smallest) into the
    * union's sketch, and the fraction of the merged sketch present in
    * BOTH inputs estimates Jaccard — so "how much does crawl A overlap
    * crawl B" costs two bottom-k scans instead of a corpus-sized join.
    * HLL cannot intersect (register MAX destroys the evidence); KMV can,
    * which is why both exist.
    *
    * Order-insensitive and deterministic by construction (the k smallest
    * of a SET — no RNG, no merge-order sensitivity; contrast KLL-style
    * quantile sketches, whose compaction depends on arrival order and
    * which are deliberately NOT in the gate set for that reason). The
    * implementation is Spark's own mergeable bottom-k machinery:
    * distinct → sort → limit plans as TakeOrderedAndProject — an O(k)
    * heap per partition, partials merged on the driver, never a global
    * sort. Output: the sketch rows (hash asc), ≤ k.
    */
  def kmvSketch(df: DataFrame, textCol: String, k: Int): DataFrame = {
    // k−1 for the estimator; the cap keeps (k−1)·2^48 inside a long (the
    // estimator numerator — past it the division wraps silently)
    require(k >= 2 && k <= MaxKmvK, s"k must be in [2, $MaxKmvK]: $k")
    df.select(hash48(lower(trim(col(textCol)))).as("h"))
      .distinct().orderBy("h").limit(k)
  }

  /** `(MaxKmvK − 1) · 2^48 < 2^63`: the estimator numerator's long bound. */
  val MaxKmvK = 16384

  /** 48-bit hash: first 12 md5 hex digits — `('0x' ||
    * substr(md5(x), 1, 12))::BIGINT` in the oracle.
    */
  private def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Cross-corpus overlap report from two KMV sketches — one row of
    * exact-integer estimator arithmetic:
    *
    *  - `est_a` / `est_b`: distinct counts, `(k−1)·2^48 ÷ kth-min` (the
    *    classic KMV estimator, computed in exact 64-bit integers — the
    *    numerator is ≤ (k−1)·2^48 < 2^63 for k ≤ 16384);
    *  - `est_union`: same estimator over the MERGED sketch (k smallest
    *    of the union — exactly the union's own sketch);
    *  - `matches` / `jaccard_ppm`: how many merged-sketch hashes appear
    *    in both inputs, over k — the Jaccard estimate;
    *  - `est_intersection`: `jaccard_ppm · est_union ÷ 10⁶`.
    *
    * An UNDER-FILLED sketch (a corpus with fewer than `k` distinct
    * values) is handled exactly, not silently skewed: a bottom-k sketch
    * holding n < k rows IS the complete distinct set, so its estimate is
    * the exact count n (the standard KMV degenerate rule), and the
    * Jaccard divisor is the ACTUAL merged-sketch size (`n_union =
    * min(k, |union|)`), never the nominal k — dividing matches by k when
    * the merged sketch is short deflates the estimate for no reason. The
    * sketch sizes (`n_a`, `n_b`, `n_union`) are emitted so the regime is
    * observable in the report itself. All joins touch ≤ k rows per side —
    * the whole report after the two bottom-k scans is sketch-sized.
    */
  def kmvOverlapReport(a: DataFrame, b: DataFrame, textCol: String,
                       k: Int): DataFrame = {
    val sa = CacheScope.persisted(kmvSketch(a, textCol, k))
    val sb = CacheScope.persisted(kmvSketch(b, textCol, k))
    val merged = CacheScope.persisted(
      sa.unionByName(sb).distinct().orderBy("h").limit(k))
    val num = lit((k - 1).toLong * (1L << 48))
    // under-filled sketch (n < k) = the complete distinct set: exact n
    def est(kth: Column, n: Column): Column =
      when(n < k, n).otherwise(call_function("div", num, kth))
    val aggA = sa.agg(max("h").as("kth_a"), count(lit(1)).as("n_a"))
    val aggB = sb.agg(max("h").as("kth_b"), count(lit(1)).as("n_b"))
    val aggU = merged.agg(max("h").as("kth_u"), count(lit(1)).as("n_union"))
    val matches = merged.join(sa, "h").join(sb, "h")
      .agg(count(lit(1)).as("matches"))
    aggA.crossJoin(aggB).crossJoin(aggU).crossJoin(matches)
      .select(
        lit(k.toLong).as("k"),
        col("kth_a"), col("n_a"),
        est(col("kth_a"), col("n_a")).as("est_a"),
        col("kth_b"), col("n_b"),
        est(col("kth_b"), col("n_b")).as("est_b"),
        col("kth_u"), col("n_union"),
        est(col("kth_u"), col("n_union")).as("est_union"),
        col("matches"),
        call_function("div", col("matches") * lit(1000000L),
          greatest(col("n_union"), lit(1L))).as("jaccard_ppm"))
      .withColumn("est_intersection",
        call_function("div", col("jaccard_ppm") * col("est_union"),
          lit(1000000L)))
  }

  /** The cross-source OVERLAP MATRIX: pairwise Jaccard/union/distinct
    * estimates between every pair of corpus groups, from per-group
    * [[kmvSketch]]es — "which sources duplicate each other" as one
    * report, at sketch cost. The corpus contributes ONE distinct pass
    * and a TWO-STAGE per-group bottom-k ([[graft.operators.Similarity
    * .embeddingOutliers]]'s device): a first window over (grp,
    * scan-partition id) keeps k per task — so the per-group window, whose
    * partition count is the (low) source cardinality, only ever sees
    * ≤ partitions·k rows per source, never a source's every distinct hash
    * funneled through one task (bottom-k of the per-partition bottom-k's
    * is the group bottom-k — knnBrute's argument, plan-asserted in
    * DedupSpec). Everything pairwise happens on the (groups × k)-row
    * sketch table, so 20 sources cost 190 sketch-sized merges, never 190
    * corpus joins. Under-filled groups (fewer than `k` distinct values)
    * get [[kmvOverlapReport]]'s exact treatment: their estimate is the
    * exact sketch size, and the Jaccard divisor is the actual merged size
    * `n_union`, which is emitted. Output one row per unordered pair:
    * (source_a, source_b, n_a, n_b, est_a, est_b, n_union, est_union,
    * matches, jaccard_ppm), exact-integer estimator arithmetic
    * throughout.
    */
  def kmvOverlapMatrix(df: DataFrame, groupCol: String, textCol: String,
                       k: Int): DataFrame = {
    require(k >= 2 && k <= MaxKmvK, s"k must be in [2, $MaxKmvK]: $k")
    import org.apache.spark.sql.expressions.Window
    val hx = df.select(col(groupCol).as("grp"),
      hash48(lower(trim(col(textCol)))).as("h")).distinct()
    val wPre = Window.partitionBy("grp", "scan_pid").orderBy("h")
    val w = Window.partitionBy("grp").orderBy("h")
    val sk = CacheScope.persisted(
      hx.withColumn("scan_pid", spark_partition_id())
        .withColumn("prk", row_number().over(wPre))
        .filter(col("prk") <= k)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).select("grp", "h"))
    val gs = sk.select("grp").distinct()
    val pairs = gs.select(col("grp").as("ga"))
      .crossJoin(gs.select(col("grp").as("gb")))
      .filter(col("ga") < col("gb"))
    val aRows = pairs.join(sk.withColumnRenamed("grp", "ga"), "ga")
      .select("ga", "gb", "h")
    val bRows = pairs.join(sk.withColumnRenamed("grp", "gb"), "gb")
      .select("ga", "gb", "h")
    // the per-PAIR union window is bounded by construction: its input is
    // two ≤ k sketches, so a (ga, gb) partition holds ≤ 2k rows
    val wu = Window.partitionBy("ga", "gb").orderBy("h")
    val merged = CacheScope.persisted(
      aRows.unionByName(bRows).distinct()
        .withColumn("rk", row_number().over(wu))
        .filter(col("rk") <= k).select("ga", "gb", "h"))
    val matches = merged
      .join(sk.select(col("grp").as("ga"), col("h")), Seq("ga", "h"))
      .join(sk.select(col("grp").as("gb"), col("h")), Seq("gb", "h"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("matches"))
    val kth = sk.groupBy("grp")
      .agg(max("h").as("kth"), count(lit(1)).as("n_g"))
    val ku = merged.groupBy("ga", "gb")
      .agg(max("h").as("kth_u"), count(lit(1)).as("n_union"))
    val num = lit((k - 1).toLong * (1L << 48))
    // under-filled sketch (n < k) = the complete distinct set: exact n
    def est(kth: Column, n: Column): Column =
      when(n < k, n).otherwise(call_function("div", num, kth))
    pairs
      .join(kth.select(col("grp").as("ga"), col("kth").as("kth_a"),
        col("n_g").as("n_a")), "ga")
      .join(kth.select(col("grp").as("gb"), col("kth").as("kth_b"),
        col("n_g").as("n_b")), "gb")
      .join(ku, Seq("ga", "gb"))
      .join(matches, Seq("ga", "gb"), "left")
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("n_a"), col("n_b"),
        est(col("kth_a"), col("n_a")).as("est_a"),
        est(col("kth_b"), col("n_b")).as("est_b"),
        col("n_union"),
        est(col("kth_u"), col("n_union")).as("est_union"),
        coalesce(col("matches"), lit(0L)).as("matches"))
      .withColumn("jaccard_ppm",
        call_function("div", col("matches") * lit(1000000L),
          greatest(col("n_union"), lit(1L))))
  }

  /** SimHash: 32-bit locality-sensitive signature. Each token votes ±1 on
    * every bit of its 32-bit hash (first 8 md5 hex chars); the signature
    * sets bit b iff the bit-b vote sum is positive.
    *
    * Computed PER ROW by the fused [[graft.functions.SimHashSig]]
    * expression — zero exchanges (the composable form exploded the tokens
    * and shuffled `bits` vote-sums per document for a value one map-side
    * loop produces; equality is property-tested in DedupSpec). Documents
    * with no non-empty token are dropped, matching the aggregate form,
    * which emitted no group for them.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    graft.functions.SimHashSig.ensureRegistered(df.sparkSession)
    df.select(col(idCol).as("id"),
        call_function("graft_simhash", col(textCol), lit(bits)).as("simhash"))
      .filter(col("simhash").isNotNull)
  }

  /** [[contaminatedDocs]] for an eval set TOO BIG TO BROADCAST: the same
    * exact answer, reached through a Bloom-filter prefilter instead of a
    * broadcast gram set. The eval grams aggregate into one Bloom filter
    * (Spark's own `BloomFilterAggregate`, attached to the corpus scan as a
    * scalar subquery — the engine's runtime-filter shape, made explicit
    * and user-controllable), `might_contain` prunes the corpus grams
    * map-side, and only the surviving candidates enter an ordinary
    * SHUFFLE equi-join with the eval grams, which removes the Bloom's
    * false positives. Output and semantics are identical to
    * [[contaminatedDocs]] — the filter only ever discards rows the exact
    * join would discard anyway.
    *
    * Scale: the broadcast form moves |eval grams| × executors bytes and
    * dies when the eval set stops fitting in memory; this form moves
    * `numBits/8` bytes (a few MB for hundreds of millions of grams at ~1%
    * FPR) regardless of eval size, and the shuffle join's corpus side is
    * pre-shrunk to true overlaps + FPR·|corpus grams|. Size `numBits` ≈
    * 8–10 bits per expected DISTINCT eval gram for ~2–1% FPR; an undersized
    * filter stays CORRECT (the exact join still removes every false
    * positive) — it only prunes less.
    */
  def contaminatedDocsBloom(corpus: DataFrame, corpusId: String,
                            corpusText: String, evalSet: DataFrame,
                            evalTextCol: String, n: Int = 13,
                            expectedGrams: Long = 1L << 22,
                            numBits: Long = 8L << 22): DataFrame = {
    import org.apache.spark.sql.graft.CatalystBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    graft.functions.HashedShingles.ensureRegistered(corpus.sparkSession)
    val evalGrams = CacheScope.persisted(evalSet
      .select(explode(
        call_function("graft_shingles64", col(evalTextCol), lit(n))).as("h"))
      .distinct())
    // 42 is the seed the SQL builtin xxhash64 uses
    val bloomAgg = column(new BloomFilterAggregate(
      XxHash64(Seq(expression(col("h"))), 42L),
      Literal(expectedGrams), Literal(numBits)).toAggregateExpression())
    val bloomPlan = evalGrams.agg(bloomAgg.as("bf")).queryExecution.analyzed
    val mightContain = column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan), XxHash64(Seq(expression(col("h"))), 42L)))
    val corpusGrams = hashedShingleFrame(corpus, corpusId, corpusText, n)
      .select(col("id").as("doc_id"), explode(col("sh")).as("h"))
    corpusGrams
      .filter(mightContain)
      .join(evalGrams, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"), min(col("h")).as("example_h"))
  }

  /** PARAGRAPH-level exact dedup with document reassembly — the span-unit
    * counterpart of [[exact]]: instead of dropping whole duplicate
    * documents, drop every repeated paragraph and stitch the survivors
    * back together. This is the boilerplate-removal pass of a pretraining
    * pipeline (headers, footers, license blocks repeat across millions of
    * pages while the documents around them are unique), and the REMOVAL
    * sibling of [[TextAnalysis.duplicateSpans]], which only detects.
    *
    * A "paragraph" here is a consecutive run of `window` tokens
    * ([[TextAnalysis.chunkByTokens]] with zero overlap) — corpora with
    * structural newlines would split on those instead, but the semantics
    * (keep FIRST occurrence corpus-wide, first = smallest `(doc, position)`
    * pair; drop the rest; reassemble per doc in position order) are unit-
    * independent. Every input document keeps a row even if all its
    * paragraphs were seen before (`n_kept = 0`, fingerprint of the empty
    * string). Output: (doc_id, n_paras, n_kept, kept_toks, kept_fp) where
    * `kept_fp = md5` of the reassembled text — small enough to gate, strong
    * enough to prove the reassembly byte-exact.
    *
    * Scale: the keep/drop DECISION shuffles only the skinny
    * `(md5, doc, pos)` frame, keyed by paragraph hash with a partial-agg
    * `min(struct(doc, pos))` — a paragraph duplicated a billion times
    * combines map-side to one row per input partition, so hot boilerplate
    * never floods a reducer. Paragraph TEXT moves on uniform keys only:
    * the winner join is keyed `(hash, doc, pos)` (distinct per row by
    * construction) and the reassembly agg is keyed by doc — the deliberate
    * alternative to a `row_number() over (partition by hash)` window,
    * which would sort every copy of the hottest paragraph's text in one
    * task. Reassembly order is explicit (`sort_array` on (pos, text)
    * structs), never collect_list encounter order.
    */
  /** Decontamination SCRUB — [[contaminatedDocs]] detects, this REMOVES:
    * split each corpus document into positional `window`-token paragraphs,
    * drop every paragraph sharing ANY `n`-gram with the (broadcast
    * distinct) eval-set gram table, and stitch the survivors back in
    * order, byte-exact ([[paragraphDedup]]'s reassembly contract). The
    * surgical alternative to dropping whole documents: a 10k-token page
    * quoting one eval question loses one paragraph, not its other 9950
    * tokens — the volume argument that matters when decontamination runs
    * over the entire training corpus, not a sample.
    *
    * Paragraphs shorter than `n` tokens carry no `n`-gram and are never
    * dropped (same rule as the detector — containment needs a full
    * n-gram). Output per corpus doc: (doc_id, n_paras, n_kept, kept_toks,
    * kept_fp).
    *
    * Scale shape: eval grams are the asymmetric broadcast side (eval
    * suites are MBs); the corpus pays one chunk-explode + one gram
    * explode map-side, one broadcast semi-join, and one per-doc
    * aggregate — no corpus-keyed join ever shuffles text except the final
    * doc_id groupBy, the [[paragraphDedup]] inventory.
    */
  /** `emitText = true` additionally returns `kept_text` — the stitched
    * scrubbed document itself (the exact `array_join` input of `kept_fp`,
    * empty string when every paragraph was dropped) — so a pipeline can
    * MATERIALIZE the cleaned corpus, not just audit its digest. Off by
    * default: the digest-only form keeps the gate frame (and any report
    * sink) skinny, while the text form is the one a real scrub job
    * writes back out.
    */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
                    evalSet: DataFrame, evalTextCol: String,
                    n: Int = 13, window: Int = 50,
                    broadcastEval: Boolean = true,
                    emitText: Boolean = false): DataFrame = {
    graft.functions.HashedShingles.ensureRegistered(corpus.sparkSession)
    val evalGrams = evalSet
      .select(explode(
        call_function("graft_shingles64", col(evalTextCol), lit(n))).as("h"))
      .distinct()
    val paras = CacheScope.persisted(
      TextAnalysis.chunkByTokens(corpus, corpusId, corpusText, window, overlap = 0)
        .select(col("doc_id"), col("chunk_idx").as("pos"),
          col("n_toks"), col("chunk"),
          call_function("graft_shingles64", col("chunk"), lit(n)).as("sh")))
    val dirty = paras
      .select(col("doc_id"), col("pos"), explode(col("sh")).as("h"))
      .join(if (broadcastEval) broadcast(evalGrams) else evalGrams, "h")
      .select("doc_id", "pos").distinct()
    val stitched = array_join(transform(
      sort_array(collect_list(struct(col("pos"), col("chunk")))),
      p => p("chunk")), " ")
    val aggCols = Seq(
      sum(col("n_toks")).cast("long").as("kept_toks"),
      md5(stitched).as("kept_fp")) ++
      (if (emitText) Seq(stitched.as("kept_text")) else Nil)
    val rebuilt = paras.join(dirty, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"), aggCols: _*)
    paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select((Seq(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_toks"), lit(0L)).as("kept_toks"),
        coalesce(col("kept_fp"), md5(lit(""))).as("kept_fp")) ++
        (if (emitText) Seq(coalesce(col("kept_text"), lit("")).as("kept_text")) else Nil)): _*)
  }

  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 50): DataFrame = {
    val paras = CacheScope.persisted(
      TextAnalysis.chunkByTokens(df, idCol, textCol, window, overlap = 0)
        .select(col("doc_id"), col("chunk_idx").as("pos"),
          col("n_toks"), col("chunk"), md5(col("chunk")).as("h")))
    val winners = paras
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("h"), col("w.doc_id").as("w_doc"), col("w.pos").as("w_pos"))
    val kept = paras.join(winners,
      paras("h") === winners("h") && paras("doc_id") === winners("w_doc") &&
        paras("pos") === winners("w_pos"))
    val rebuilt = kept
      .groupBy(paras("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_toks")).cast("long").as("kept_toks"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("chunk")))),
          p => p("chunk")), " ")).as("kept_fp"))
    paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_toks"), lit(0L)).as("kept_toks"),
        coalesce(col("kept_fp"), md5(lit(""))).as("kept_fp"))
  }
}
