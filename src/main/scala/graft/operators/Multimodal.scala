package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes plus typed metadata. In a real pipeline
  * `data` holds an encoded image/audio/video payload read from parquet or a
  * binary-file source; here the payload is whatever bytes the caller attached.
  */
final case class MediaRow(doc_id: Long, mime: String, data: Array[Byte],
                          width: Int, height: Int)

/** Byte-level features extracted by the mime-agnostic fallback path. */
final case class MediaFeatures(doc_id: Long, mime: String, size_bytes: Long,
                               n_chunks: Int, checksum: String, n_space: Long)

/** Features from a REAL image decode ([[Multimodal.decodeImages]]).
  * `decoded = false` rows are the fallback (unknown mime or undecodable
  * payload): geometry is -1/0 and luminance 0, `size_bytes` still real.
  * `sum_rgb` is the exact integer sum of the three sRGB components over all
  * pixels — kept alongside the derived `mean_luma` double so cross-engine
  * comparisons can stay in integer space.
  */
final case class ImageFeatures(doc_id: Long, mime: String, decoded: Boolean,
                               width: Int, height: Int, channels: Int,
                               n_px: Long, sum_rgb: Long, mean_luma: Double,
                               size_bytes: Long)

/** 64-bit perceptual average-hash of a REAL image decode
  * ([[Multimodal.imagePHash]]), split into two 32-bit halves (bits 0–31 in
  * `hash_lo`, 32–63 in `hash_hi`, each in [0, 2³²)) so neither engine ever
  * touches the sign bit of a 64-bit integer — DuckDB BIGINT cannot hold
  * `1 << 63` unsigned, and a split hash keeps every shift ≤ 31 on both
  * sides of the oracle. `decoded = false` rows carry zero halves and are
  * excluded from dedup.
  */
final case class ImagePHash(doc_id: Long, decoded: Boolean,
                            hash_hi: Long, hash_lo: Long)

/** Features from a REAL audio decode ([[Multimodal.decodeAudio]]).
  * `decoded = false` rows are the fallback (unknown mime, undecodable or
  * non-16-bit-PCM payload): rate/channels/frames are -1/0 and the sums 0,
  * `size_bytes` still real. The three sums are EXACT integer arithmetic
  * over the decoded 16-bit samples (`sum_sq` ≤ 32768² · n_samples, so a
  * Long holds ~8.5e9 samples — ~295 h of 8 kHz audio per file — before
  * overflow): cross-engine comparisons never touch a float.
  */
final case class AudioFeatures(doc_id: Long, mime: String, decoded: Boolean,
                               sample_rate: Int, channels: Int,
                               n_frames: Long, n_samples: Long,
                               sum_amp: Long, sum_abs: Long, sum_sq: Long,
                               size_bytes: Long)

/** Per-frame features from a REAL video frame decode
  * ([[Multimodal.decodeVideoFrames]]). One row per SAMPLED frame;
  * `decoded = false` rows (one per undecodable payload, `frame_idx = -1`)
  * are the degradation path for corrupt containers or frames.
  */
final case class VideoFrameFeatures(doc_id: Long, mime: String, decoded: Boolean,
                                    frame_idx: Int, n_frames: Int,
                                    width: Int, height: Int, n_px: Long,
                                    sum_rgb: Long, size_bytes: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, and a decode/feature-extract stage as a
  * typed `mapPartitions` over `Dataset[MediaRow]`.
  *
  * Image decode is REAL: [[decodeImages]] decodes `image/png` and
  * `image/jpeg` payloads with the JDK's own `javax.imageio` (no external
  * codec dependency) and extracts width / height / channel count / mean
  * luminance. Payloads with any other mime — audio, video, or formats the
  * JDK cannot read — fall through to the byte-level path
  * ([[decodeFeatures]]: size, chunk count, md5, space count), which is the
  * production shape for codecs that would arrive via native libraries.
  *
  * Scale: both stages are `mapPartitions`, map-side only — no shuffle;
  * partition sizing is governed by `spark.sql.files.maxPartitionBytes` on
  * the binary source, the knob that keeps decoded batches inside executor
  * memory at 100 TB. `ImageIO`'s disk cache is disabled per partition so
  * executors never touch local temp files for in-memory payloads.
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

  /** Mimes [[decodeImages]] hands to `javax.imageio` — the formats whose
    * readers ship with the JRE; anything else takes the byte-level
    * fallback. PNG/BMP are lossless (pixel-exact round-trip, tested);
    * JPEG is lossy (geometry exact, luminance approximate); GIF is
    * palette-quantized by the JDK writer (decode is deterministic and
    * matches any other `ImageIO` decode of the same bytes, tested).
    */
  val ImageMimes: Set[String] =
    Set("image/png", "image/jpeg", "image/gif", "image/bmp")

  /** REAL image decode: `javax.imageio` (pure JDK — PNG/JPEG readers ship
    * with the JRE) over the binary payload, per-partition so registry
    * scanning and the cache-off setting are paid once per partition, not
    * per row. Unknown mimes and undecodable payloads (truncated file,
    * wrong magic) degrade to a `decoded = false` row instead of failing
    * the job — at 100 TB some fraction of any media corpus is corrupt and
    * one bad file must not kill a stage.
    *
    * `sum_rgb` sums the three packed-sRGB components (`getRGB`) over every
    * pixel; for grayscale images r=g=b so the sum is 3× the gray total —
    * consistent across decoder-chosen raster layouts. `mean_luma` =
    * sum_rgb / (3 · n_px), one double division at the end of exact integer
    * arithmetic.
    */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.map { r =>
        val img =
          if (ImageMimes.contains(r.mime)) {
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.data)))
            catch { case _: java.io.IOException => None }
          } else None
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = im.getRGB(x, y)
                sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                x += 1
              }
              y += 1
            }
            val npx = w.toLong * h
            ImageFeatures(r.doc_id, r.mime, decoded = true, w, h,
              im.getColorModel.getNumComponents, npx, sum,
              sum.toDouble / (3.0 * npx), r.data.length.toLong)
          case None =>
            ImageFeatures(r.doc_id, r.mime, decoded = false, -1, -1, 0,
              0L, 0L, 0.0, r.data.length.toLong)
        }
      }
    }
  }

  /** Deterministic synthetic PNG: pixel (x, y) is an exact integer function
    * of (seed, x, y), encoded pure-JDK. PNG is lossless, so a decode must
    * reproduce the formula bit-for-bit — which is what lets an external
    * oracle recompute [[decodeImages]]' features arithmetically without
    * having a PNG decoder of its own.
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"image must be non-empty: ${w}x$h")
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 7 + x * 13 + y * 31) % 256).toInt
        val g = ((seed * 11 + x * 17 + y * 5) % 256).toInt
        val b = ((seed * 3 + x * 29 + y * 7) % 256).toInt
        im.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** Fixture stand-in for a real image corpus: one synthetic PNG per
    * document, geometry a function of doc_id (3–7 × 2–5 px). Generated
    * map-side inside the executors — the driver never holds an image.
    */
  def syntheticImages(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (3 + id % 5).toInt
      val h = (2 + id % 4).toInt
      MediaRow(id, "image/png", syntheticPng(id, w, h), w, h)
    }
  }

  /** End-to-end REAL-decode pipeline: documents → synthetic PNG payloads →
    * `javax.imageio` decode → columnar image features.
    */
  def imageFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImages(syntheticImages(spark, docs)).toDF()
  }

  /** Perceptual average-hash (aHash) over a REAL image decode: sample an
    * 8×8 grid of pixels by nearest-neighbor downscale (`x = i·w/8`,
    * `y = j·h/8` — the classic aHash reduction, exact integer index
    * arithmetic instead of an interpolating resampler so an external
    * oracle can reproduce it), take per-sample luma as the exact integer
    * r+g+b, and set bit `k = j·8+i` iff `64·luma > Σ luma` (the
    * strictly-above-mean rule kept in integer space — no division, no
    * float mean). Same degradation contract as [[decodeImages]]: unknown
    * mime or undecodable payload → `decoded = false`, never a failed
    * stage.
    *
    * Scale: `mapPartitions`, map-side only — the signature leaves each
    * executor as 2 longs per image regardless of image size, the
    * [[graft.functions.MinHashSig]] property that makes downstream dedup
    * independent of payload skew.
    */
  def imagePHash(ds: Dataset[MediaRow]): Dataset[ImagePHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.map { r =>
        val img =
          if (ImageMimes.contains(r.mime)) {
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.data)))
            catch { case _: java.io.IOException => None }
          } else None
        img match {
          case Some(im) =>
            val (hi, lo) = aHash64(im)
            ImagePHash(r.doc_id, decoded = true, hi, lo)
          case None =>
            ImagePHash(r.doc_id, decoded = false, 0L, 0L)
        }
      }
    }
  }

  /** The aHash kernel over a decoded image: 8×8 nearest-neighbor sampled
    * luma, strict `64·luma > Σ luma` bits, two 32-bit halves — shared by
    * [[imagePHash]] and [[videoPHash]] so every modality hashes by the
    * same rule.
    */
  private def aHash64(im: java.awt.image.BufferedImage): (Long, Long) = {
    val w = im.getWidth
    val h = im.getHeight
    val luma = new Array[Long](64)
    var total = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val p = im.getRGB(i * w / 8, j * h / 8)
        val l = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
        luma(j * 8 + i) = l
        total += l
        i += 1
      }
      j += 1
    }
    var lo = 0L
    var hi = 0L
    var k = 0
    while (k < 64) {
      if (64L * luma(k) > total) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Fixture image corpus WITH genuine perceptual duplicates: the pixel
    * seed (and the geometry, so equal seeds mean pixel-identical images)
    * is `doc_id % seedMod` — every residue class is one duplicate cluster,
    * the structure [[perceptualDups]] exists to find. [[syntheticImages]]
    * keeps per-doc-unique seeds for the decode-features gate (q59).
    */
  def syntheticImagesSeeded(spark: SparkSession, docs: DataFrame,
                            seedMod: Int = 97): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val seed = id % seedMod
      val w = (3 + seed % 5).toInt
      val h = (2 + seed % 4).toInt
      MediaRow(id, "image/png", syntheticPng(seed, w, h), w, h)
    }
  }

  /** Near-duplicate image pairs by banded Hamming join over [[imagePHash]]
    * signatures: the 64-bit hash splits into 4 bands of 16 bits; docs
    * sharing any band's value are candidates; candidates verify by exact
    * Hamming distance (`bit_count(xor)` on each 32-bit half).
    *
    * For `maxHamming ≤ 3` the candidate set is COMPLETE by pigeonhole: ≤ 3
    * differing bits cannot touch all 4 bands, so some band is intact and
    * the pair is a candidate — banding is a pure cost optimization, not a
    * recall trade (the LSH-band argument of [[Dedup.minHashDedup]], here
    * made exact). Above 3 it becomes approximate, like any LSH.
    *
    * Scale: candidates are generated per 16-bit band bucket, never
    * all-pairs; a cluster of identical hashes is quadratic WITHIN its
    * bucket — inherent to emitting its pairs (the output is that big), and
    * the duplicate-cluster resolution path ([[Dedup.canonicalIds]] over
    * these pairs) is the consumer that caps it.
    */
  /** THE 4×16-bit band split of a 64-bit hash held as two 32-bit halves,
    * band 0 = low 16 bits of the low half. One definition: the batch join
    * ([[perceptualDups]]), the streaming bucket keys
    * ([[graft.streaming.StreamingPHash]]), and the streaming ownership
    * rule's JVM mirror must all agree on it (the q100 gate checks that
    * agreement end-to-end) — a band-width or ordering change must happen
    * HERE, not drift per site.
    */
  private[graft] def bandSplit(hi: Column, lo: Column): Column = array(
    lo.bitwiseAND(lit(0xFFFFL)), shiftright(lo, 16),
    hi.bitwiseAND(lit(0xFFFFL)), shiftright(hi, 16))

  /** `scopeCols` (both forms): optional partition-key columns carried on
    * the signature frame — candidates only form between rows agreeing on
    * every scope column (the band-bucket join key includes them). This is
    * how a MIXED frame dedups safely: a 64-bit image aHash and a 64-bit
    * audio fingerprint can collide numerically, but comparing them is
    * meaningless — scoping by a modality column makes the one banded join
    * serve all modalities at once without ever crossing them. Caller
    * contract: `doc_id` must be unique ACROSS scopes (the group form feeds
    * one id space to [[Dedup.canonicalIds]]).
    */
  def perceptualDups(hashes: DataFrame, maxHamming: Int = 3,
                     scopeCols: Seq[String] = Nil): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0, 64]: $maxHamming")
    val scope = scopeCols.map(col)
    val h = CacheScope.persisted(
      hashes.filter(col("decoded"))
        .select(col("doc_id") +: scope :+ col("hash_hi") :+ col("hash_lo"): _*))
    val bands = h.select(col("doc_id") +: scope :+
      posexplode(bandSplit(col("hash_hi"), col("hash_lo"))).as(Seq("band", "bv")): _*)
    val scoped = scopeCols
      .map(c => col(s"x.$c") === col(s"y.$c"))
      .foldLeft(col("x.band") === col("y.band") &&
        col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))(_ && _)
    val cand = bands.as("x").join(bands.as("y"), scoped)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(h.select(col("doc_id").as("doc_a"),
        col("hash_hi").as("a_hi"), col("hash_lo").as("a_lo")), Seq("doc_a"))
      .join(h.select(col("doc_id").as("doc_b"),
        col("hash_hi").as("b_hi"), col("hash_lo").as("b_lo")), Seq("doc_b"))
      .withColumn("hamming",
        (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** End-to-end perceptual image dedup: documents → seeded synthetic PNGs →
    * REAL decode + aHash → banded Hamming pairs.
    */
  def imageDups(spark: SparkSession, docs: DataFrame,
                seedMod: Int = 97, maxHamming: Int = 3): DataFrame =
    perceptualDups(imagePHash(syntheticImagesSeeded(spark, docs, seedMod)).toDF(),
      maxHamming)

  /** Perceptual duplicate GROUPS — connected components of the
    * hamming ≤ `maxHamming` graph, WITHOUT enumerating the quadratic pair
    * list inside identical-hash clusters. The 10× scaling run measured
    * [[perceptualDups]]' pair output growing ~100× when duplicate
    * clusters grow 10× (quadratic in cluster size, inherent to emitting
    * pairs); this operator is the linear path:
    *
    *  1. collapse identical hashes to one REPRESENTATIVE (min doc id) —
    *     one hash aggregate, the exact-dedup (q8) shape, LINEAR;
    *  2. run the banded Hamming join on DISTINCT signatures only — the
    *     quadratic step now scales with signature diversity, not corpus
    *     size (a million copies of one image contribute ONE row);
    *  3. connect members to their representative by star edges (linear)
    *     and feed star ∪ representative-pairs to [[Dedup.canonicalIds]].
    *
    * The components equal the all-pairs graph's exactly: identical-hash
    * members are hamming-0 (≤ any threshold) so the star keeps them
    * connected, and for differing hashes the Hamming distance is a pure
    * function of the hash values, so an edge exists between two clusters
    * iff it exists between their representatives. Gated: q98 runs THIS
    * operator against the all-pairs transitive-closure oracle.
    *
    * Output: (doc_id, canon_id), one row per doc in a non-singleton
    * component — [[Dedup.canonicalIds]]' contract.
    */
  def perceptualDupGroups(hashes: DataFrame, maxHamming: Int = 3,
                          scopeCols: Seq[String] = Nil): DataFrame = {
    val scope = scopeCols.map(col)
    val h = CacheScope.persisted(
      hashes.filter(col("decoded"))
        .select(col("doc_id") +: scope :+ col("hash_hi") :+ col("hash_lo"): _*))
    val groups = CacheScope.persisted(
      h.groupBy(scope :+ col("hash_hi") :+ col("hash_lo"): _*)
        .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n")))
    val star = h.join(groups, scopeCols :+ "hash_hi" :+ "hash_lo")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
    val repPairs = perceptualDups(
      groups.select(col("rep").as("doc_id") +: lit(true).as("decoded") +:
        scope :+ col("hash_hi") :+ col("hash_lo"): _*), maxHamming, scopeCols)
      .select(col("doc_a"), col("doc_b"))
    Dedup.canonicalIds(star.unionAll(repPairs))
  }

  /** ALL THREE modalities through ONE scoped dedup: image aHashes, audio
    * loudness fingerprints and video rotated-XOR signatures, tagged and
    * union'd into a single frame, grouped by [[perceptualDupGroups]] with
    * `modality` as the scope key — one representative collapse, one banded
    * join, one connected-components pass serve the whole media corpus,
    * and the scope key guarantees an image never "duplicates" an audio
    * clip whose 64 bits happen to land nearby. Ids are disambiguated as
    * `doc_id·4 + modality-code` internally (the union carries each doc
    * three times) and decoded back in the output: (modality, doc_id,
    * canon_id), canon_id always within the same modality.
    *
    * Gated (q113) against the union of the three per-modality all-pairs
    * closure oracles — the end-to-end form of the modality-agnostic claim
    * q98/q103/q104 prove one modality at a time.
    */
  def crossModalDupGroups(spark: SparkSession, docs: DataFrame,
                          imageSeedMod: Int = 97, audioSeedMod: Int = 89,
                          videoSeedMod: Int = 83, stride: Int = 2,
                          maxHamming: Int = 3): DataFrame = {
    def tag(df: DataFrame, code: Int): DataFrame =
      df.select((col("doc_id") * 4 + code).as("doc_id"), col("decoded"),
        lit(code).as("modality"), col("hash_hi"), col("hash_lo"))
    val sigs = tag(imagePHash(syntheticImagesSeeded(spark, docs, imageSeedMod)).toDF(), 0)
      .unionAll(tag(audioPHash(syntheticAudioSeeded(spark, docs, audioSeedMod)), 1))
      .unionAll(tag(videoPHash(syntheticVideosSeeded(spark, docs, videoSeedMod), stride), 2))
    // decode with pmod + exact floor division (subtract the residue, THEN
    // divide): plain `%` keeps the dividend's sign and `DIV` truncates
    // toward zero, so a negative doc_id would decode to the wrong
    // modality and the wrong id — pmod is sign-safe for any Long
    perceptualDupGroups(sigs, maxHamming, scopeCols = Seq("modality"))
      .select(
        when(pmod(col("doc_id"), lit(4)) === 0, "image")
          .when(pmod(col("doc_id"), lit(4)) === 1, "audio")
          .otherwise("video").as("modality"),
        expr("(doc_id - pmod(doc_id, 4)) DIV 4").as("doc_id"),
        expr("(canon_id - pmod(canon_id, 4)) DIV 4").as("canon_id"))
  }

  /** Mimes [[decodeAudio]] hands to `javax.sound.sampled` — the JRE ships
    * WAV/AIFF/AU readers; compressed codecs (mp3, opus…) would arrive via
    * native libraries and take the byte-level fallback here.
    */
  val AudioMimes: Set[String] =
    Set("audio/wav", "audio/x-wav", "audio/aiff", "audio/basic")

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (pure JDK) over
    * the binary payload — the q59 image recipe applied to audio. Extracts
    * the header geometry (sample rate, channels, frame count) and exact
    * integer amplitude statistics over every decoded 16-bit sample:
    * `sum_amp` (signed sum), `sum_abs` (L1 mass — silence detection),
    * `sum_sq` (energy — the integer core of RMS; callers derive RMS/
    * loudness as ONE division at the end, [[imageFeatures]]' `mean_luma`
    * treatment). Non-16-bit or big-endian PCM and any unparseable payload
    * degrade to `decoded = false` instead of failing the job — at 100 TB
    * some fraction of any media corpus is corrupt and one bad file must
    * not kill a stage.
    *
    * Scale: `mapPartitions`, map-side only, like [[decodeImages]] — the
    * stream decodes incrementally (64 KB reads), so a long recording never
    * needs frames × channels × 2 bytes of extra heap beyond the payload.
    */
  def decodeAudio(ds: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val decoded: Option[AudioFeatures] =
          if (!AudioMimes.contains(r.mime)) None
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.data))
            try {
              val fmt = ais.getFormat
              val ok = fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
              if (!ok) None
              else {
                val ch = fmt.getChannels
                var sumAmp = 0L; var sumAbs = 0L; var sumSq = 0L
                var nSamples = 0L
                val buf = new Array[Byte](1 << 16)
                var carry = -1 // low byte of a sample split across reads
                var n = ais.read(buf)
                while (n > 0) {
                  var i = 0
                  if (carry >= 0 && n >= 1) {
                    val s = ((buf(0) << 8) | carry).toShort.toLong
                    sumAmp += s; sumAbs += math.abs(s); sumSq += s * s
                    nSamples += 1
                    carry = -1; i = 1
                  }
                  while (i + 1 < n) {
                    val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toLong
                    sumAmp += s; sumAbs += math.abs(s); sumSq += s * s
                    nSamples += 1
                    i += 2
                  }
                  if (i < n) carry = buf(i) & 0xff
                  n = ais.read(buf)
                }
                Some(AudioFeatures(r.doc_id, r.mime, decoded = true,
                  fmt.getSampleRate.toInt, ch, nSamples / ch, nSamples,
                  sumAmp, sumAbs, sumSq, r.data.length.toLong))
              }
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        decoded.getOrElse(AudioFeatures(r.doc_id, r.mime, decoded = false,
          -1, 0, 0L, 0L, 0L, 0L, 0L, r.data.length.toLong))
      }
    }
  }

  /** Perceptual audio fingerprint — the [[imagePHash]] recipe applied to
    * WAV: sample 64 frames by nearest-neighbor downscale over the frame
    * axis (`frame_b = b·n/64`, the aHash reduction applied to time), take
    * per-sample "loudness" as the exact integer Σ_channels |sample|, and
    * set bit `b` iff `64·loud_b > Σ loud` — the same strictly-above-mean
    * integer rule, same two 32-bit halves, so [[perceptualDups]] consumes
    * these signatures UNCHANGED (one banded-Hamming join implementation
    * for every modality). Decode is the REAL `javax.sound.sampled` stream
    * ([[decodeAudio]]'s contract: 16-bit LE PCM, incremental reads, a
    * corrupt payload degrades to `decoded = false`).
    *
    * The sampled positions are visited with a sorted-pointer sweep over
    * ONE streaming pass — no random access, no frames×channels buffering
    * — so an hour-long recording costs one sequential read, the
    * [[decodeAudio]] scale contract.
    */
  def audioPHash(ds: Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        var result: (Long, Boolean, Long, Long) = (r.doc_id, false, 0L, 0L)
        if (AudioMimes.contains(r.mime)) {
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.data))
            try {
              val fmt = ais.getFormat
              val ok = fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
                ais.getFrameLength > 0 && ais.getFrameLength <= Int.MaxValue
              if (ok) {
                val ch = fmt.getChannels
                val n = ais.getFrameLength.toInt
                // Long multiply: b·n overflows Int past ~34M frames
                // (~13 min at 44.1 kHz) and a wrapped position would
                // silently zero the tail of the fingerprint
                val pos = Array.tabulate(64)(b => (b.toLong * n / 64).toInt) // non-decreasing
                val vals = new Array[Long](64)
                val frameBytes = ch * 2
                val buf = new Array[Byte](frameBytes)
                var frame = 0
                var b = 0
                var short = false
                while (frame < n && !short) {
                  // read exactly one frame (the stream may return partials)
                  var got = 0
                  var r0 = 0
                  while (got < frameBytes && r0 >= 0) {
                    r0 = ais.read(buf, got, frameBytes - got)
                    if (r0 > 0) got += r0
                  }
                  if (got < frameBytes) short = true
                  else {
                    if (b < 64 && pos(b) == frame) {
                      var loud = 0L
                      var c = 0
                      while (c < ch) {
                        val s = ((buf(2 * c + 1) << 8) | (buf(2 * c) & 0xff))
                          .toShort.toLong
                        loud += math.abs(s)
                        c += 1
                      }
                      while (b < 64 && pos(b) == frame) { vals(b) = loud; b += 1 }
                    }
                    frame += 1
                  }
                }
                if (!short) {
                  var total = 0L
                  var k = 0
                  while (k < 64) { total += vals(k); k += 1 }
                  var lo = 0L; var hi = 0L
                  k = 0
                  while (k < 64) {
                    if (64L * vals(k) > total) {
                      if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
                    }
                    k += 1
                  }
                  result = (r.doc_id, true, hi, lo)
                }
              }
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => ()
            case _: java.io.IOException => ()
          }
        }
        result
      }
    }.toDF("doc_id", "decoded", "hash_hi", "hash_lo")
  }

  /** Fixture audio corpus WITH genuine perceptual duplicates — the
    * [[syntheticImagesSeeded]] device for WAV: seed (and geometry, so
    * equal seeds mean sample-identical audio) is `doc_id % seedMod`.
    */
  def syntheticAudioSeeded(spark: SparkSession, docs: DataFrame,
                           seedMod: Int = 89): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val seed = id % seedMod
      val nFrames = (40 + seed % 25).toInt
      val ch = (1 + seed % 2).toInt
      MediaRow(id, "audio/wav",
        syntheticWav(seed, nFrames, ch, frameMul = 40503L), 0, 0)
    }
  }

  /** End-to-end perceptual AUDIO dedup: documents → seeded synthetic WAVs →
    * REAL streaming decode + 64-block fingerprint → the SAME banded
    * Hamming join as images ([[perceptualDups]] is modality-agnostic).
    */
  def audioDups(spark: SparkSession, docs: DataFrame,
                seedMod: Int = 89, maxHamming: Int = 3): DataFrame =
    perceptualDups(audioPHash(syntheticAudioSeeded(spark, docs, seedMod)),
      maxHamming)

  /** [[audioDups]]' GROUP form — [[perceptualDupGroups]] over the same
    * audio fingerprints: the mega-cluster-safe path (identical fingerprints
    * collapse to one representative before the quadratic banded step) for
    * the modality whose 10× run measured ~14M enumerated pairs. Gated
    * (q103) against the all-pairs transitive-closure oracle, q98's recipe —
    * the modality-agnostic claim proven end-to-end, not just asserted.
    */
  def audioDupGroups(spark: SparkSession, docs: DataFrame,
                     seedMod: Int = 89, maxHamming: Int = 3): DataFrame =
    perceptualDupGroups(audioPHash(syntheticAudioSeeded(spark, docs, seedMod)),
      maxHamming)

  /** Perceptual VIDEO fingerprint — the [[imagePHash]] recipe applied to
    * the GVID frame container: every `stride`-th frame is PNG-decoded
    * (skipped frames advance by their length prefix, the
    * [[decodeVideoFrames]] contract — decode CPU is corpus/stride), each
    * sampled frame takes the shared [[aHash64]] kernel, each half is
    * ROTATED left by the frame's sampled ordinal (mod 32) and the rotated
    * hashes XOR into the signature. The rotation is positional mixing: a
    * plain XOR cancels repeated frames pairwise, so every static video
    * with an even sampled count would hash to (0, 0) and all collide as
    * hamming-0 duplicates; rotated, identical frames at different
    * ordinals no longer cancel, while a single changed frame still flips
    * only `popcount(old⊕new)` bits (rotation preserves the delta's
    * popcount) — the near-dup property the banded join needs. Still two
    * 32-bit halves, so [[perceptualDups]] consumes it UNCHANGED (images,
    * audio and video all dedup through the one banded join). Corrupt
    * containers/frames degrade to `decoded = false`.
    */
  def videoPHash(ds: Dataset[MediaRow], stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.map { r =>
        var result: (Long, Boolean, Long, Long) = (r.doc_id, false, 0L, 0L)
        if (r.mime == VideoMime) {
          val bb = java.nio.ByteBuffer.wrap(r.data)
          val okMagic = bb.remaining >= 8 && bb.get() == 'G' && bb.get() == 'V' &&
            bb.get() == 'I' && bb.get() == 'D'
          if (okMagic) {
            val nFrames = bb.getInt()
            var hi = 0L
            var lo = 0L
            var idx = 0
            var ord = 0 // ordinal within the SAMPLED sequence
            var corrupt = nFrames <= 0
            while (!corrupt && idx < nFrames) {
              if (bb.remaining < 4) corrupt = true
              else {
                val len = bb.getInt()
                if (len < 0 || bb.remaining < len) corrupt = true
                else if (idx % stride != 0) bb.position(bb.position() + len)
                else {
                  val frame = new Array[Byte](len)
                  bb.get(frame)
                  val im =
                    try Option(javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(frame)))
                    catch { case _: java.io.IOException => None }
                  im match {
                    case Some(i) =>
                      val (fhi, flo) = aHash64(i)
                      val rot = ord % 32
                      hi ^= rotl32(fhi, rot)
                      lo ^= rotl32(flo, rot)
                      ord += 1
                    case None => corrupt = true
                  }
                }
                if (!corrupt) idx += 1
              }
            }
            if (!corrupt) result = (r.doc_id, true, hi, lo)
          }
        }
        result
      }
    }.toDF("doc_id", "decoded", "hash_hi", "hash_lo")
  }

  /** Rotate a 32-bit value (held in a Long's low half) left by `r` ∈
    * [0, 32). `v >>> (32 − r)` is 0 at r = 0 because v < 2³², so the
    * identity rotation is exact.
    */
  private def rotl32(v: Long, r: Int): Long =
    ((v << r) | (v >>> (32 - r))) & 0xFFFFFFFFL

  /** Fixture video corpus WITH genuine perceptual duplicates — the seeded
    * generator for GVID containers: seed (and frame count / geometry) is
    * `doc_id % seedMod`, frame `f`'s pixel seed is `seed·100 + f·7` (the
    * q85 frame-seed shape, but seeded so residue classes are
    * frame-identical).
    */
  def syntheticVideosSeeded(spark: SparkSession, docs: DataFrame,
                            seedMod: Int = 83): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val seed = id % seedMod
      val n = (2 + seed % 3).toInt
      val w = (3 + seed % 5).toInt
      val h = (2 + seed % 4).toInt
      MediaRow(id, VideoMime,
        packFrames((0 until n).map(f => syntheticPng(seed * 100 + f * 7, w, h))),
        w, h)
    }
  }

  /** End-to-end perceptual VIDEO dedup: documents → seeded GVID containers
    * → strided REAL frame decode + XOR'd aHash → the SAME banded Hamming
    * join as images and audio.
    */
  def videoDups(spark: SparkSession, docs: DataFrame, seedMod: Int = 83,
                stride: Int = 2, maxHamming: Int = 3): DataFrame =
    perceptualDups(videoPHash(syntheticVideosSeeded(spark, docs, seedMod), stride),
      maxHamming)

  /** [[videoDups]]' GROUP form — [[perceptualDupGroups]] over the same
    * XOR'd frame signatures; gated (q104) against the all-pairs closure
    * oracle, completing the per-modality group coverage (q98 images,
    * q103 audio, this video).
    */
  def videoDupGroups(spark: SparkSession, docs: DataFrame, seedMod: Int = 83,
                     stride: Int = 2, maxHamming: Int = 3): DataFrame =
    perceptualDupGroups(
      videoPHash(syntheticVideosSeeded(spark, docs, seedMod), stride),
      maxHamming)

  /** Deterministic synthetic 16-bit PCM WAV: sample (frame i, channel c)
    * is an exact integer function of (seed, i, c), RIFF-encoded by hand
    * (44-byte canonical header + little-endian PCM). Like
    * [[syntheticPng]], the formula lets an external oracle recompute
    * [[decodeAudio]]'s features arithmetically — any decode deviation
    * (wrong endianness, channel deinterleave, off-by-one frame count)
    * breaks the hash.
    */
  /** `frameMul` is the per-frame coefficient of the sample formula. The
    * default 13 (q82's oracle constant) makes a slow sawtooth —
    * |sample| is LINEAR across a short clip, which is exactly wrong for a
    * fingerprint fixture (every clip ranks its blocks identically, all
    * signatures collapse); [[syntheticAudioSeeded]] passes a
    * wraparound-heavy 40503 so block loudness is pseudo-random and the
    * q99 signatures discriminate.
    */
  def syntheticWav(seed: Long, nFrames: Int, channels: Int,
                   sampleRate: Int = 8000, frameMul: Long = 13L): Array[Byte] = {
    require(nFrames > 0 && channels > 0, s"audio must be non-empty: ${nFrames}x$channels")
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    bb.put("RIFF".getBytes(ascii)); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort)  // block align
    bb.putShort(16)                      // bits per sample
    bb.put("data".getBytes(ascii)); bb.putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        bb.putShort((((seed * 31 + i.toLong * frameMul + c.toLong * 7) % 65536) - 32768).toShort)
        c += 1
      }
      i += 1
    }
    bb.array()
  }

  /** Fixture stand-in for a real audio corpus: one synthetic WAV per
    * document, geometry a function of doc_id (40–64 frames, 1–2
    * channels at 8 kHz). Generated map-side inside the executors.
    */
  def syntheticAudio(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val nFrames = (40 + id % 25).toInt
      val ch = (1 + id % 2).toInt
      MediaRow(id, "audio/wav", syntheticWav(id, nFrames, ch), 0, 0)
    }
  }

  /** End-to-end REAL-decode pipeline: documents → synthetic WAV payloads →
    * `javax.sound.sampled` decode → columnar audio features.
    */
  def audioFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAudio(syntheticAudio(spark, docs)).toDF()
  }

  /** Mime [[decodeVideoFrames]] parses: the repo's deterministic
    * length-prefixed-PNG-frame container (an MJPEG-style stand-in — real
    * MP4/H.264 demux+decode needs native codecs the JDK doesn't ship; the
    * FRAMES inside this container are real PNG and the decode is the real
    * `javax.imageio` reader, so the whole frame-sample pipeline shape is
    * production-real even though the container is synthetic).
    */
  val VideoMime = "video/x-graft-frames"

  /** Pack PNG frames into the GVID container: `"GVID"` magic, big-endian
    * int32 frame count, then per frame a big-endian int32 length + the PNG
    * bytes. Length-prefixing is what makes [[decodeVideoFrames]]' strided
    * sampling cheap: skipped frames cost a pointer bump, not a decode.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "video must have at least one frame")
    val dataLen = frames.map(_.length + 4).sum
    val bb = java.nio.ByteBuffer.allocate(8 + dataLen) // big-endian default
    bb.put("GVID".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** REAL video frame sampling: parse the GVID container, decode every
    * `stride`-th frame with `javax.imageio`, and emit exact integer pixel
    * statistics per sampled frame — the q59 image recipe applied to video.
    * Frames NOT sampled are skipped by their length prefix without
    * decoding, so decode CPU is `1/stride` of the corpus while the
    * container is still read once — the production frame-sampling shape.
    *
    * Malformed containers (wrong magic, truncated mid-frame) and frames
    * the PNG reader rejects degrade to one `decoded = false` row with
    * `frame_idx = -1` instead of failing the job — at 100 TB some fraction
    * of any media corpus is corrupt and one bad file must not kill a
    * stage. Scale: `mapPartitions`, map-side only, like [[decodeImages]].
    */
  def decodeVideoFrames(ds: Dataset[MediaRow], stride: Int = 2): Dataset[VideoFrameFeatures] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.flatMap { r =>
        val bad = VideoFrameFeatures(r.doc_id, r.mime, decoded = false,
          -1, 0, -1, -1, 0L, 0L, r.data.length.toLong)
        if (r.mime != VideoMime) Iterator.single(bad)
        else {
          val bb = java.nio.ByteBuffer.wrap(r.data)
          val okMagic = bb.remaining >= 8 && bb.get() == 'G' && bb.get() == 'V' &&
            bb.get() == 'I' && bb.get() == 'D'
          if (!okMagic) Iterator.single(bad)
          else {
            val nFrames = bb.getInt()
            val out = List.newBuilder[VideoFrameFeatures]
            var idx = 0
            var corrupt = nFrames <= 0
            while (!corrupt && idx < nFrames) {
              if (bb.remaining < 4) corrupt = true
              else {
                val len = bb.getInt()
                if (len < 0 || bb.remaining < len) corrupt = true
                else if (idx % stride != 0) bb.position(bb.position() + len)
                else {
                  val frame = new Array[Byte](len)
                  bb.get(frame)
                  val im =
                    try Option(javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(frame)))
                    catch { case _: java.io.IOException => None }
                  im match {
                    case Some(i) =>
                      val w = i.getWidth; val h = i.getHeight
                      out += VideoFrameFeatures(r.doc_id, r.mime, decoded = true,
                        idx, nFrames, w, h, w.toLong * h, rgbSum(i),
                        r.data.length.toLong)
                    case None => corrupt = true
                  }
                }
                if (!corrupt) idx += 1
              }
            }
            if (corrupt) Iterator.single(bad) else out.result().iterator
          }
        }
      }
    }
  }

  /** Exact integer sum of the three packed-sRGB components over all pixels
    * (the [[decodeImages]] formula, shared with the video path).
    */
  private def rgbSum(im: java.awt.image.BufferedImage): Long = {
    val w = im.getWidth; val h = im.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = im.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Fixture stand-in for a real video corpus: one GVID container per
    * document with 2–4 PNG frames; frame f's pixels follow
    * [[syntheticPng]] at seed `doc_id * 100 + f * 7`, so an external
    * oracle can recompute every sampled frame's pixel sum arithmetically.
    * Generated map-side inside the executors.
    */
  def syntheticVideo(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = (3 + id % 5).toInt
      val h = (2 + id % 4).toInt
      val n = (2 + id % 3).toInt
      val frames = (0 until n).map(f => syntheticPng(id * 100 + f * 7, w, h))
      MediaRow(id, VideoMime, packFrames(frames), w, h)
    }
  }

  /** End-to-end REAL-decode pipeline: documents → synthetic GVID payloads →
    * strided PNG frame decode → columnar per-frame features.
    */
  def videoFrameFeatures(spark: SparkSession, docs: DataFrame,
                         stride: Int = 2): DataFrame = {
    import spark.implicits._
    decodeVideoFrames(syntheticVideo(spark, docs), stride).toDF()
  }

  /** Deterministic frame sampling over the binary payload: every `stride`-th
    * 64-byte chunk, as (doc_id, frame_idx, frame_md5) — the mime-agnostic
    * fallback shape for codecs that would arrive via native libraries
    * (real decode paths: [[decodeImages]], [[decodeAudio]],
    * [[decodeVideoFrames]]).
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
