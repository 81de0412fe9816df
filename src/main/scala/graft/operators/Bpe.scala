package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IN-ENGINE BPE tokenizer training — the classic byte-pair-encoding
  * algorithm (Sennrich et al. 2016, arXiv:1508.07909) over the corpus's
  * whitespace-pre-tokenized words, as a Spark job.
  *
  * The key scale property is the classic one: BPE trains on the WORD
  * FREQUENCY TABLE, not the corpus. One corpus-sized aggregation builds
  * `(word, freq)`; every merge iteration after that touches only the
  * vocab-sized symbol table — count adjacent symbol pairs (weighted by
  * word freq), pick the most frequent pair (deterministic tie-break: freq
  * desc, then pair asc), rewrite the symbol lists, repeat. At 100 TB the
  * corpus is read once; the loop cost is `numMerges × O(vocab)`.
  *
  * The per-iteration winning pair is a bounded driver scalar (one row per
  * iteration, like [[Similarity.kmeans]]'s codebook) — the merge RULE must
  * reach the next iteration's expression tree, which is exactly the
  * codebook-as-data pattern. The symbol-list rewrite is a left fold
  * (`aggregate` HOF): leftmost-first non-overlapping merge falls out of
  * folding — `aaa` under merge (a,a) becomes `[aa, a]`, never `[a, aa]`.
  * HOFs are CodegenFallback, which is acceptable HERE because they run on
  * the vocab-sized table, never the corpus (the same reasoning that keeps
  * the corpus-sized kernels native expressions elsewhere).
  *
  * Not SQL-expressible (iterative, data-dependent rules), so the gate is
  * test-based: BpeSpec pins the distributed trainer bit-for-bit to an
  * independent single-node reference implementation, plus repartition
  * invariance; the declared query (q67) records rows-only.
  */
object Bpe {

  /** `(w, freq)` word-frequency table — the ONE corpus-sized pass. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Characters of `w` plus the end-of-word marker — the starting symbol
    * list. The marker makes word-final merges distinct from word-internal
    * ones (standard BPE).
    */
  private def initialSymbols(w: Column): Column =
    // regex split on "" can emit a trailing empty string; drop any empties
    concat(filter(split(w, ""), s => s =!= ""), array(lit("</w>")))

  /** Left-fold merge of adjacent pair (a, b) → a+b over a symbol list:
    * leftmost-first, non-overlapping (a fold can never re-merge the symbol
    * it just produced with a consumed input).
    */
  private def mergePair(syms: Column, a: String, b: String): Column = {
    val merged = a + b
    when(size(syms) < 2, syms).otherwise(
      aggregate(
        slice(syms, lit(2), size(syms) - 1),
        slice(syms, lit(1), lit(1)),
        (acc, x) => when(element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x)))))
  }

  /** Train `numMerges` BPE merges. Returns the learned merge table
    * `(rank, left, right, merged, pair_freq)` — THE tokenizer artifact —
    * and leaves the segmented word vocabulary reachable via [[segment]].
    * Stops early when no adjacent pair reaches `minFreq`.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  minFreq: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, _) = trainInternal(df, textCol, numMerges, minFreq)
    merges.zipWithIndex
      .map { case ((a, b, f), i) => (i.toLong, a, b, a + b, f) }
      .toDF("rank", "left", "right", "merged", "pair_freq")
  }

  /** The trained word→symbols table `(w, freq, symbols)`: every corpus
    * word segmented by the learned merges. This IS the "apply" artifact —
    * tokenizing a corpus is a broadcast/shuffle join of its words against
    * this table (OOV words fall back to character symbols by definition).
    */
  def segment(df: DataFrame, textCol: String, numMerges: Int,
              minFreq: Long = 2L): DataFrame =
    trainInternal(df, textCol, numMerges, minFreq)._2

  /** APPLY the tokenizer to a corpus: per-document whitespace-word and
    * BPE-token counts under `vocab` (a [[segment]] frame — usually trained
    * on the same corpus, but any `(w, syms)` table works). The number a
    * token-budget mix or packing plan should use once a real tokenizer
    * exists — whitespace counts over- or under-state documents whose
    * vocabulary compresses differently. Out-of-vocabulary words fall back
    * to their character segmentation (`len(w) + 1` symbols with the
    * end-of-word marker) — BPE's defined zero-merge behavior.
    *
    * Scale shape: the q65 classifier's exactly — (doc, word) counts
    * pre-reduce map-side, then join the BROADCAST vocab table (word
    * types, Heaps-sublinear in corpus size) and one per-doc aggregate;
    * no shuffle ever keys by word, so stopword skew is impossible.
    */
  def tokenizeCorpus(df: DataFrame, idCol: String, textCol: String,
                     vocab: DataFrame): DataFrame = {
    val counts = df
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
    val sizes = vocab.select(col("w"), size(col("syms")).as("n_sym"))
    counts
      .join(broadcast(sizes), Seq("w"), "left")
      .withColumn("n_sym",
        coalesce(col("n_sym"), length(col("w")) + lit(1)))
      .groupBy("doc_id")
      .agg(sum("cnt").cast("long").as("n_words"),
        sum(col("cnt") * col("n_sym")).cast("long").as("n_bpe_tokens"))
  }

  private def trainInternal(df: DataFrame, textCol: String, numMerges: Int,
                            minFreq: Long)
      : (Seq[(String, String, Long)], DataFrame) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    var words = CacheScope.persisted(
      wordFreq(df, textCol)
        .select(col("w"), col("freq"), initialSymbols(col("w")).as("syms")))
    // previous iteration's frame: safe to release only once the CURRENT
    // frame has materialized its cache (the best-pair collect below does
    // that) — releasing earlier would recompute the whole merge chain;
    // keeping everything would cache numMerges copies of the vocab
    var release: DataFrame = null
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      // adjacent pairs weighted by word frequency — vocab-sized agg.
      // Fully-merged single-symbol words have no pairs and MUST be
      // filtered first: sequence(1, 0) would count DOWN, not stay empty.
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("p"))
        .select(element_at(col("syms"), col("p")).as("a"),
          element_at(col("syms"), col("p") + 1).as("b"), col("freq"))
        .groupBy("a", "b").agg(sum("freq").as("pf"))
        .orderBy(col("pf").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect() // bounded driver scalar: ONE row per iteration —
                   // also materializes `words`' cache as a side effect
      if (release != null) { release.unpersist(); release = null }
      if (best.isEmpty || best.head.getLong(2) < minFreq) done = true
      else {
        val (a, b, f) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((a, b, f))
        val next = CacheScope.persisted(
          words.select(col("w"), col("freq"),
            mergePair(col("syms"), a, b).as("syms")))
        release = words
        words = next
        i += 1
      }
    }
    (merges.result(), words)
  }
}
