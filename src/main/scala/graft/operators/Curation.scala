package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline: the composition a
  * training-data run actually executes, wired from the operator family —
  *
  *   quality gate ([[TextAnalysis.qualityRules]])
  *     → exact dedup, keep min id ([[TextAnalysis.fingerprint]])
  *     → per-source quota ([[Sampling.capPerGroup]])
  *     → deterministic split ([[Sampling.hashSplit]])
  *
  * Every stage is a pure function of content and ids, so the surviving
  * corpus — not just its size — is reproducible across runs, engines and
  * repartitioning. The oracle gate (q45) hashes per-split document/token
  * totals plus an id checksum, putting the whole composition under one
  * hash.
  *
  * Scale shape: one scan computes flags map-side; the dedup keep is a
  * rank-1 window on the content fingerprint (rank-limit pushdown prunes
  * duplicates map-side, and fingerprint keys are md5-uniform — no skew);
  * the quota cap is the same pushed-down rank on the source key; the split
  * is map-side. Two pruned shuffles end-to-end before the final bounded
  * aggregate.
  */
object Curation {

  /** The curated corpus: input documents that survive the quality gate,
    * exact-dup removal (minimum id per normalized content wins), and a
    * per-`groupCol` cap of `maxPerGroup`, with a deterministic
    * train/val/test `split` column attached. Preserves the input columns
    * and adds `n_tokens` and `split`.
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
             groupCol: String, maxPerGroup: Int,
             minTokens: Int = 5, maxTokens: Int = 100000,
             trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val flags = TextAnalysis.qualityRules(df, idCol, textCol,
      minTokens, maxTokens)
    val kept = df.join(
      flags.filter(col("keep")).select(col("doc_id").as(idCol), col("n_tokens")),
      idCol)
    val dedupW = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol).asc)
    val deduped = kept
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val capped = Sampling.capPerGroup(deduped, groupCol, idCol, maxPerGroup)
    Sampling.hashSplit(capped, idCol, trainPct, valPct)
  }

  /** Concat-and-chunk sequence packing: documents are laid end-to-end in
    * deterministic `idCol` order within each `groupCol` value and chopped
    * into fixed `seqLen`-token training sequences — the packing a
    * GPT-style pretraining loader applies (no padding between documents;
    * a document may straddle a sequence boundary). Output per document:
    * which sequence its first token lands in (`seq_first`), which its
    * last token lands in (`seq_last`), and its starting offset within
    * `seq_first` (`seq_offset`) — the index a loader needs to materialize
    * any sequence without re-scanning the corpus. Zero-token documents
    * contribute nothing and are dropped.
    *
    * All three outputs derive from one per-group running token total
    * (exact integer arithmetic), so the packing is reproducible across
    * engines — the oracle gate (q50) hashes every document's placement.
    *
    * Scale shape: packing is inherently sequential WITHIN a group (each
    * placement depends on every predecessor), so the parallel unit is the
    * group — one shuffle on `groupCol`, one ordered pass per group. That
    * is the right contract for a sharded corpus (pack per source/shard,
    * train across shards); for a single giant group, pre-split it into
    * deterministic sub-shards ([[Sampling.hashBucket]] on the id) and
    * pack each — sequences then restart per sub-shard, which training
    * loaders accept.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    groupCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1: $seqLen")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("__cum", sum("n_tokens").over(w).cast("long"))
      // `div`, not `/`: Column `/` is DOUBLE division, which rounds past
      // 2^53 — a 100 TB corpus's cumulative token count must stay exact.
      .select(col(groupCol), col(idCol), col("n_tokens"),
        expr(s"(__cum - n_tokens) div $seqLen").as("seq_first"),
        expr(s"(__cum - 1) div $seqLen").as("seq_last"),
        ((col("__cum") - col("n_tokens")) % seqLen).cast("long").as("seq_offset"))
  }

  /** Token-yield accounting over [[curate]]: per split, how many documents
    * and training tokens survive the whole pipeline — the number a
    * pretraining budget is planned against (plus an id checksum so the
    * gate hashes membership, not just volume).
    */
  def tokenYield(df: DataFrame, idCol: String, textCol: String,
                 groupCol: String, maxPerGroup: Int,
                 minTokens: Int = 5, maxTokens: Int = 100000): DataFrame =
    curate(df, idCol, textCol, groupCol, maxPerGroup, minTokens, maxTokens)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        sum(col(idCol)).as("id_sum"))
}
