package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** One banded row of a perceptual-hash index: the (band, 16-bit value)
  * bucket key plus the full 64-bit signature (two 32-bit halves) that
  * verification and band-ownership need.
  */
case class PHashBandRow(bandIdx: Int, bandVal: Long, docId: Long,
                        hashHi: Long, hashLo: Long)

/** A verified perceptual near-duplicate pair, `doc_a < doc_b`. */
case class PHashPair(doc_a: Long, doc_b: Long, hamming: Long)

/** STREAMING perceptual dedup — the continuous-ingest form of
  * [[graft.operators.Multimodal.perceptualDups]], and deliberately
  * modality-agnostic like its batch twin: the input is any
  * `(doc_id, decoded, hash_hi, hash_lo)` signature frame
  * ([[graft.operators.Multimodal.imagePHash]] or `audioPHash` applied
  * map-side to the arriving payloads), so ONE stateful pipeline serves
  * images and audio.
  *
  * Shape mirrors [[StreamingMinHash]] stage for stage:
  *  - map side (zero exchange): the 4×16-bit band split — the identical
  *    values the batch join buckets on, so stream and batch agree;
  *  - the batch self-join per band bucket becomes PER-BUCKET STATE
  *    (`transformWithState` keyed by (band, value)); work per arrival ∝
  *    bucket occupancy — the same |bucket|² bound as the batch join;
  *  - a colliding pair is emitted only by the FIRST band on which the two
  *    hashes agree (both full signatures are in hand, so each bucket
  *    decides ownership locally — exactly-once without a distinct());
  *  - verification is the same exact Hamming (`bitCount(xor)`) at the
  *    same threshold, so the pair set equals the batch operator's.
  *
  * The pigeonhole completeness contract carries over: for
  * `maxHamming ≤ 3`, every qualifying pair shares some intact band and is
  * found. `horizon` TTL-bounds each bucket to the dedup horizon (the
  * [[StreamingMinHash]] contract); `TTLConfig.NONE` = full-history parity.
  * Requires the RocksDB state store
  * ([[Stateful.TransformWithStateConf]]).
  */
object StreamingPHash {

  def dupPairs(hashes: DataFrame, maxHamming: Int = 3,
               horizon: TTLConfig = TTLConfig.NONE): Dataset[PHashPair] = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64]: $maxHamming")
    val spark = hashes.sparkSession
    import spark.implicits._
    val banded = hashes.filter(col("decoded"))
      .select(col("doc_id").cast("long").as("docId"),
        col("hash_hi").as("hashHi"), col("hash_lo").as("hashLo"),
        // the ONE band-split definition, shared with the batch join
        posexplode(graft.operators.Multimodal.bandSplit(
          col("hash_hi"), col("hash_lo"))).as(Seq("bandIdx", "bandVal")))
      .select("bandIdx", "bandVal", "docId", "hashHi", "hashLo")
      .as[PHashBandRow]
    val timeMode =
      if (horizon == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    banded.groupByKey(r => (r.bandIdx, r.bandVal))
      .transformWithState(new PHashDedupProcessor(maxHamming, horizon),
        timeMode, OutputMode.Append())
  }
}

/** Per-bucket detector: ListState of the signatures seen in this
  * (band, value) bucket; each arrival is compared against them, pairs
  * whose first shared band is this bucket's band are Hamming-verified and
  * emitted.
  */
class PHashDedupProcessor(maxHamming: Int, ttl: TTLConfig)
    extends StatefulProcessor[(Int, Long), PHashBandRow, PHashPair] {
  @transient private var seen: ListState[PHashBandRow] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[PHashBandRow]("seen",
      Encoders.product[PHashBandRow], ttl)

  override def handleInputRows(key: (Int, Long),
                               rows: Iterator[PHashBandRow],
                               timerValues: TimerValues): Iterator[PHashPair] = {
    val out = ArrayBuffer.empty[PHashPair]
    val present = ArrayBuffer.empty[PHashBandRow]
    seen.get().foreach(present += _)
    rows.foreach { row =>
      // RE-ARRIVAL guard on the FULL (docId, hash) observation: an
      // at-least-once upstream (re-crawl, replayed batch) can deliver a
      // row twice; without this, the second arrival re-emits every
      // existing pair and double-appends state, breaking the
      // pair-for-pair batch equality. The guard deliberately compares the
      // whole tuple, not just docId — a doc_id re-delivered with a NEW
      // hash (content update) is a new observation, inserted and compared
      // in EVERY bucket its bands land in (a docId-only guard would drop
      // it exactly in the buckets where a band value happens to coincide
      // with the old hash, leaving state incoherently mixed). A pair may
      // then legitimately re-emit with the updated hamming; downstream
      // consumers that want only the latest content dedup on arrival
      // time. The scan is O(bucket), which the comparison loop below
      // already pays.
      if (!present.exists(p => p.docId == row.docId &&
          p.hashHi == row.hashHi && p.hashLo == row.hashLo)) {
        present.foreach { other =>
          // never pair a doc with its own earlier observation
          if (other.docId != row.docId && PHashDedupProcessor.firstSharedBand(
              row.hashHi, row.hashLo, other.hashHi, other.hashLo) == key._1) {
            val ham = java.lang.Long.bitCount(row.hashHi ^ other.hashHi) +
              java.lang.Long.bitCount(row.hashLo ^ other.hashLo)
            if (ham <= maxHamming)
              out += PHashPair(math.min(row.docId, other.docId),
                math.max(row.docId, other.docId), ham.toLong)
          }
        }
        present += row
        seen.appendValue(row)
      }
    }
    out.iterator
  }
}

object PHashDedupProcessor {

  /** JVM mirror of [[graft.operators.Multimodal.bandSplit]] (band 0 =
    * low 16 bits of the low half, same order) — the ownership rule runs
    * inside the processor where Column expressions don't reach; the q100
    * gate pins the two in lockstep.
    */
  private def bandVals(hi: Long, lo: Long): Array[Long] =
    Array(lo & 0xFFFFL, lo >>> 16, hi & 0xFFFFL, hi >>> 16)

  /** Smallest band index on which the two hashes agree (the bucket that
    * "owns" the pair); -1 when none (unreachable for rows that met in a
    * shared bucket).
    */
  private[streaming] def firstSharedBand(aHi: Long, aLo: Long,
                                         bHi: Long, bLo: Long): Int = {
    val a = bandVals(aHi, aLo)
    val b = bandVals(bHi, bLo)
    var i = 0
    while (i < 4) {
      if (a(i) == b(i)) return i
      i += 1
    }
    -1
  }
}
