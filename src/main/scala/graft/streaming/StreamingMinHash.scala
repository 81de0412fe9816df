package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** One banded row of a document's MinHash index: the (band, band-hash)
  * bucket key plus everything verification needs — the full k-slot
  * signature (to decide which shared band "owns" a pair) and the sorted
  * 60-bit shingle array (to compute EXACT Jaccard, the same verification
  * the batch pipeline runs).
  */
case class MinHashBandRow(bandIdx: Int, bandHash: String, docId: Long,
                          mh: Array[Long], sh: Array[Long])

/** A verified near-duplicate pair, `docA < docB`. */
case class MinHashPair(doc_a: Long, doc_b: Long, jaccard: Double)

/** STREAMING MinHash near-dup detection — the continuous-ingest form of
  * [[graft.operators.Dedup.minHashDedup]]: as documents arrive across
  * micro-batches, each is checked against the already-seen corpus and every
  * verified near-dup pair is emitted exactly once (append mode).
  *
  * Shape mirrors the batch plan stage for stage:
  *  - map side (zero exchange): fused `graft_shingles64` + `graft_minhash`
  *    per row, then band hashes exploded to (band_idx, band_hash) keys —
  *    identical strings to the batch [[graft.operators.Dedup.lshCandidates]]
  *    banding, so stream and batch bucket identically;
  *  - the batch self-join on the band bucket becomes PER-BUCKET STATE: a
  *    `transformWithState` processor keyed by (band_idx, band_hash) holds
  *    the signatures+shingles seen in its bucket and compares each arrival
  *    against them — work per arrival ∝ bucket occupancy, exactly the
  *    |bucket|² bound the batch join has, never corpus-wide;
  *  - candidate de-dup across bands needs no shuffle: a colliding pair is
  *    emitted only by the FIRST band in which the two signatures agree
  *    (both full signatures are in hand, so each bucket decides ownership
  *    locally — the batch form pays a `distinct()` for the same guarantee);
  *  - verification is the same exact-Jaccard two-pointer intersect over the
  *    sorted hashed-shingle arrays, at the same threshold.
  *
  * State growth is the operator's 100 TB contract: pass a TTL (`horizon`)
  * to bound each bucket to the dedup horizon — the streaming-exact analog
  * of `dropDuplicatesWithinWatermark`'s eviction ([[graft.operators.Dedup
  * .streamingExact]]). A pair whose earlier member expired is missed BY
  * DESIGN (that is what a horizon means). `TTLConfig.NONE` keeps state
  * forever — parity with batch over the full history, for bounded corpora.
  *
  * Requires the RocksDB state store ([[Stateful.TransformWithStateConf]]) —
  * per-bucket lists are exactly the state that outgrows heap at scale.
  *
  * PRECONDITION: `idCol` unique per document (same as the batch operators).
  */
object StreamingMinHash {

  /** The streaming pair frame. Parameters and output match
    * [[graft.operators.Dedup.minHashDedup]]; `horizon` bounds seen-state
    * lifetime (TTL is wall-clock, so it needs `TimeMode.ProcessingTime`).
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 12, rowsPerBand: Int = 3,
                   threshold: Double = 0.3,
                   horizon: TTLConfig = TTLConfig.NONE): Dataset[MinHashPair] = {
    require(k % rowsPerBand == 0, s"k=$k not divisible by rowsPerBand=$rowsPerBand")
    val spark = df.sparkSession
    graft.functions.HashedShingles.ensureRegistered(spark)
    graft.functions.MinHashSig.ensureRegistered(spark)
    import spark.implicits._
    val bands = k / rowsPerBand
    val sigged = df.select(col(idCol).cast("long").as("docId"),
        call_function("graft_shingles64", col(textCol), lit(n)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("mh", call_function("graft_minhash", col("sh"), lit(k)))
    // band hash = md5 of the '|'-joined signature slots — the identical
    // string the batch banding hashes, so buckets agree across engines
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand)
        .map(r => element_at(col("mh"), b * rowsPerBand + r + 1)): _*)).as(s"band$b")
    }
    val banded = sigged
      .select(col("docId") +: col("mh") +: col("sh") +: bandCols: _*)
      .select(col("docId"), col("mh"), col("sh"),
        posexplode(array((0 until bands).map(b => col(s"band$b")): _*))
          .as(Seq("bandIdx", "bandHash")))
      .select("bandIdx", "bandHash", "docId", "mh", "sh")
      .as[MinHashBandRow]
    val timeMode =
      if (horizon == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    banded.groupByKey(r => (r.bandIdx, r.bandHash))
      .transformWithState(
        new MinHashDedupProcessor(rowsPerBand, threshold, horizon),
        timeMode, OutputMode.Append())
  }
}

/** Per-bucket near-dup detector: ListState of the rows seen in this
  * (band_idx, band_hash) bucket; each arrival is compared against them,
  * pairs whose first shared band is this bucket's band are verified by
  * exact Jaccard and emitted.
  */
class MinHashDedupProcessor(rowsPerBand: Int, threshold: Double, ttl: TTLConfig)
    extends StatefulProcessor[(Int, String), MinHashBandRow, MinHashPair] {
  @transient private var seen: ListState[MinHashBandRow] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[MinHashBandRow]("seen",
      Encoders.product[MinHashBandRow], ttl)

  override def handleInputRows(key: (Int, String),
                               rows: Iterator[MinHashBandRow],
                               timerValues: TimerValues): Iterator[MinHashPair] = {
    val out = ArrayBuffer.empty[MinHashPair]
    val present = ArrayBuffer.empty[MinHashBandRow]
    seen.get().foreach(present += _)
    rows.foreach { row =>
      present.foreach { other =>
        if (other.docId != row.docId &&
            MinHashDedupProcessor.firstSharedBand(row.mh, other.mh, rowsPerBand) == key._1) {
          val common = MinHashDedupProcessor.intersectCount(row.sh, other.sh)
          val j = common.toDouble / (row.sh.length + other.sh.length - common)
          if (j >= threshold)
            out += MinHashPair(math.min(row.docId, other.docId),
              math.max(row.docId, other.docId),
              MinHashDedupProcessor.round4(j))
        }
      }
      present += row
      seen.appendValue(row)
    }
    out.iterator
  }
}

object MinHashDedupProcessor {

  /** Smallest band index on which the two signatures fully agree (the
    * bucket that "owns" the pair); bands are `rowsPerBand` consecutive
    * slots. Two signatures agree on a band iff their slot values match —
    * the md5 band hashes the shuffle keys on are injective in the slots up
    * to md5 collision, so slot equality is the same predicate without
    * re-hashing.
    */
  private[streaming] def firstSharedBand(a: Array[Long], b: Array[Long],
                                         rowsPerBand: Int): Int = {
    val bands = a.length / rowsPerBand
    var band = 0
    while (band < bands) {
      var r = 0
      var same = true
      while (same && r < rowsPerBand) {
        if (a(band * rowsPerBand + r) != b(band * rowsPerBand + r)) same = false
        r += 1
      }
      if (same) return band
      band += 1
    }
    -1 // unreachable for rows that met in a shared bucket
  }

  /** Two-pointer |A∩B| over sorted distinct long arrays — the plain-array
    * twin of [[graft.functions.SortedIntersectCount]] (which operates on
    * Catalyst ArrayData inside codegen; state rows here are JVM arrays).
    */
  private[streaming] def intersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** HALF_UP to 4 decimals — the same rule as Spark's `round(col, 4)`, so
    * streamed jaccard values compare equal to the batch pipeline's.
    */
  private[streaming] def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
}
