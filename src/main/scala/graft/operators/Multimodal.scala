package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes plus typed metadata. In a real pipeline
  * `data` holds an encoded image/audio/video payload read from parquet or a
  * binary-file source; here the payload is whatever bytes the caller attached.
  */
final case class MediaRow(doc_id: Long, mime: String, data: Array[Byte],
                          width: Int, height: Int)

/** Features extracted by the (stubbed) decoder. */
final case class MediaFeatures(doc_id: Long, mime: String, size_bytes: Long,
                               n_chunks: Int, checksum: String, n_space: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, and a decode/feature-extract stage as a
  * typed `mapPartitions` over `Dataset[MediaRow]`.
  *
  * The decode step is a STUB — this container has no image/audio codecs, so
  * [[decodeFeatures]] computes deterministic byte-level features (size,
  * chunk count, md5 checksum, 0x20-byte count) in place of a real
  * decoder. Everything around it is the real production shape: a typed
  * binary schema, per-partition batch iteration (where a real decoder would
  * amortize codec/JNI init per partition, exactly like `mapInPandas`
  * batches), and a columnar feature output that re-enters the relational
  * plan. A real deployment swaps only the per-row function body.
  *
  * Scale: `mapPartitions` is map-side only — no shuffle; partition sizing is
  * governed by `spark.sql.files.maxPartitionBytes` on the binary source, the
  * knob that keeps decoded batches inside executor memory at 100 TB.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to the documents table —
    * the fixture stand-in for reading real media files
    * (`spark.read.format("binaryFile")` in production).
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("data"),
      // deterministic fake frame geometry derived from the metadata column
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** The decode/feature-extract stage: per-partition iteration so a real
    * decoder would pay codec init once per partition, not per row.
    */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() — once per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val checksum = md.digest(r.data).map(b => f"$b%02x").mkString
        MediaFeatures(
          doc_id = r.doc_id,
          mime = r.mime,
          size_bytes = r.data.length.toLong,
          n_chunks = (r.data.length + 63) / 64,
          checksum = checksum,
          n_space = r.data.count(_ == ' '.toByte).toLong)
      }
    }
  }

  /** End-to-end: documents → binary column → typed decode → feature frame.
    * Returned as a DataFrame so it composes with the relational operators.
    */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeFeatures(attachBinary(docs).as[MediaRow]).toDF()
  }

  /** Deterministic frame sampling over the binary payload: every `stride`-th
    * 64-byte chunk, as (doc_id, frame_idx, frame_md5) — the video
    * frame-sample shape with the codec stubbed to raw chunking.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val nChunks = ceil(length(col("data")) / lit(64.0)).cast("int")
    media
      .select(col("doc_id"), col("data"),
        explode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("data").substr(col("frame_idx") * 64 + 1, lit(64))).as("frame_md5"))
  }
}
