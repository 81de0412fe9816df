package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch buffer: `depth × width` long counters plus the total
  * stream length. Row `r`'s hash is `((a_r·base + b_r) mod P) mod width`
  * over the 28-bit md5 base hash — [[graft.operators.Dedup.hashConsts]]'
  * universal-hash family, the SAME derivation the MinHash signatures use,
  * so an external engine (the q115 oracle) recomputes every cell with
  * plain `md5`/modular SQL. Point estimate = min over rows of the hashed
  * cell; always ≥ the true count (cells only ever add), with the classical
  * `≤ true + εN` guarantee w.h.p. at `width = ⌈e/ε⌉`.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val cells = new Array[Long](depth * width)
  var total: Long = 0L

  def add(term: String, w: Long = 1L): Unit = {
    val base = CountMinSketch.baseHash(term)
    var r = 0
    while (r < depth) {
      val (a, b) = CountMinSketch.consts(r)
      cells(r * width + (((a * base + b) % CountMinSketch.P) % width).toInt) += w
      r += 1
    }
    total += w
  }

  def merge(other: CmsBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"CMS geometry mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    total += other.total
  }
}

/** Native Catalyst aggregate `graft_cms(term, depth, width)` — one-pass
  * Count-Min frequency sketch with HARD-bounded state: `depth·width`
  * longs per aggregation buffer, whatever the vocabulary. Returns
  * `array<bigint>` of length `depth·width + 1` — the cells, then the
  * total stream count in the last slot.
  *
  * The companion of [[HeavyHitters]] on the frequency-estimation axis:
  * Misra-Gries answers "which terms are frequent" (top-k with a lower
  * bound), CMS answers "how frequent is THIS term" for ANY term after the
  * fact (upper-biased point estimate), without either ever shipping the
  * distinct-key set through the exchange. At 100 TB the exact per-term
  * count is a billions-of-keys shuffle; the sketch's partial buffers are
  * `depth·width·8` bytes per partition — merge is element-wise addition,
  * the canonical mergeable summary, which is exactly Spark's
  * partial/final aggregation contract.
  *
  * Hashes are md5-derived (no RNG, no seed state), so estimates are
  * deterministic and the q115 oracle rebuilds the identical sketch in
  * SQL. [[graft.operators.TextAnalysis.cmsEstimate]] is the query-side
  * point lookup over the returned array.
  */
case class CountMinSketch(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with TernaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        // Null-check BEFORE the lazy depth/width unbox: a foldable NULL
        // (e.g. CAST(NULL AS INT)) must be a clean analysis error, not an
        // NPE thrown from inside the analyzer.
        if (second.eval(null) == null || third.eval(null) == null)
          TypeCheckResult.TypeCheckFailure(
            "graft_cms depth/width must be non-null")
        else if (depth >= 1 && depth <= CountMinSketch.MaxDepth && width >= 1 &&
            depth.toLong * width <= CountMinSketch.MaxCells)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_cms needs 1 <= depth <= ${CountMinSketch.MaxDepth}, width >= 1, " +
            s"and depth*width <= ${CountMinSketch.MaxCells} cells, got ${depth}x$width")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_cms expects (string, foldable int, foldable int), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }

  private lazy val depth: Int = second.eval(null).asInstanceOf[Int]
  private lazy val width: Int = third.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = first.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: CmsBuffer): Any = {
    val out = new Array[Long](buffer.cells.length + 1)
    System.arraycopy(buffer.cells, 0, out, 0, buffer.cells.length)
    out(buffer.cells.length) = buffer.total
    new GenericArrayData(out)
  }

  override def serialize(buffer: CmsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.depth); out.writeInt(buffer.width)
    out.writeLong(buffer.total)
    buffer.cells.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new CmsBuffer(in.readInt(), in.readInt())
    s.total = in.readLong()
    var i = 0
    while (i < s.cells.length) { s.cells(i) = in.readLong(); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CountMinSketch =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CountMinSketch {
  /** Hash-row cap: [[graft.operators.Dedup.hashConsts]] is derived per
    * index from md5, so any depth works — 16 is far past the
    * `δ = e^-depth` failure odds any sketch needs.
    */
  val MaxDepth = 16

  /** Cell cap (2²⁴ longs = 128 MB): an Int-overflowing `depth·width`
    * would wrap the buffer allocation size (NegativeArraySizeException on
    * the executor — or worse, a small wrapped size that add() then writes
    * past), and a sketch anywhere near this cap has stopped being a
    * sketch. Checked as a Long product at analysis time.
    */
  val MaxCells: Long = 1L << 24
  private[graft] val P: Long = graft.operators.Dedup.HashP
  private[graft] lazy val consts: IndexedSeq[(Long, Long)] =
    graft.operators.Dedup.hashConsts(MaxDepth).toIndexedSeq

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The 28-bit md5 base hash — `('0x' || substr(md5(term), 1, 7))::BIGINT`
    * in the oracle's SQL. The first 7 hex digits are the first 4 digest
    * bytes right-shifted a nibble, read directly off the bytes
    * ([[HashedShingles]]' device) — this runs once per TOKEN corpus-wide,
    * so no per-row MessageDigest allocation and no hex-string detour.
    */
  private[graft] def baseHash(term: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 24 | (d(1) & 0xff) << 16 |
      (d(2) & 0xff) << 8 | (d(3) & 0xff)) >>> 4).toLong
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_cms")
}
