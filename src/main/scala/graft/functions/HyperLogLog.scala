package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register file (Flajolet, Fusy, Gandouet & Meunier, AofA
  * 2007): `m = 2^p` one-byte registers. A term's
  * 48-bit md5 base hash splits into the top `p` bits (register index) and
  * the remaining `window = 48 - p` bits; the register keeps the MAX over
  * terms of `rho` = (position of the leftmost 1-bit in the window) =
  * `window + 1 − bitlen(w)`, with the all-zero window scoring
  * `window + 1`. Merge is element-wise max — idempotent AND commutative,
  * so re-delivered rows (streaming retries) cannot inflate the estimate,
  * unlike a counter sketch.
  */
final class HllBuffer(val p: Int) {
  val regs = new Array[Byte](1 << p)

  def add(term: String): Unit = {
    val h = HyperLogLogSketch.baseHash48(term)
    val window = 48 - p
    val idx = (h >>> window).toInt
    val w = h & ((1L << window) - 1)
    val rho =
      if (w == 0L) window + 1
      else window + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  def merge(other: HllBuffer): Unit = {
    require(other.p == p, s"HLL geometry mismatch: p=$p vs p=${other.p}")
    var i = 0
    while (i < regs.length) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

/** Native Catalyst aggregate `graft_hll(term, p)` — one-pass distinct-count
  * sketch with HARD-bounded state: `2^p` bytes per aggregation buffer,
  * whatever the cardinality. Returns `array<bigint>` of the `2^p`
  * registers; the estimate is query-side arithmetic over the returned
  * array ([[graft.operators.TextAnalysis.hllDistinctReport]]), so the
  * registers themselves — not just a number — sit under any oracle gate.
  *
  * The third leg of the sketch family: Misra-Gries ([[HeavyHitters]])
  * answers "WHICH terms are frequent", Count-Min ([[CountMinSketch]])
  * answers "HOW frequent is this term", HLL answers "HOW MANY distinct
  * terms" — the three questions a 100 TB profile pass asks, none of which
  * may ship the distinct-key set through an exchange. A 64-register HLL
  * is 64 bytes of partial state per partition versus a billions-of-keys
  * `count(DISTINCT)` shuffle; merge is element-wise max, which is exactly
  * Spark's partial/final aggregation contract (and, being idempotent,
  * also safe under streaming re-delivery).
  *
  * Hashes are md5-derived (no RNG, no seed state): the 48-bit base is the
  * first 12 hex digits — `('0x' || substr(md5(term), 1, 12))::BIGINT` in
  * the q179 oracle, which rebuilds every register in SQL.
  */
case class HyperLogLogSketch(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        if (right.eval(null) == null)
          TypeCheckResult.TypeCheckFailure("graft_hll p must be non-null")
        else if (p >= HyperLogLogSketch.MinP && p <= HyperLogLogSketch.MaxP)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_hll needs ${HyperLogLogSketch.MinP} <= p <= " +
            s"${HyperLogLogSketch.MaxP}, got $p")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_hll expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private lazy val p: Int = right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = left.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: HllBuffer): Any =
    new GenericArrayData(buffer.regs.map(_.toLong))

  override def serialize(buffer: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buffer.regs.length)
    out(0) = buffer.p.toByte
    System.arraycopy(buffer.regs, 0, out, 1, buffer.regs.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val s = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, s.regs, 0, s.regs.length)
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLogSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLogSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperLogLogSketch =
    copy(left = newLeft, right = newRight)
}

object HyperLogLogSketch {
  /** `p` bounds: below 4 the estimator's constants stop making sense; 14
    * (16 KB of registers, ~0.8% error) is already luxurious for a sketch.
    */
  val MinP = 4
  val MaxP = 14

  /** Flajolet's bias-correction constant for `m = 2^p` registers (the
    * published values for m = 16/32/64, the asymptotic formula above).
    * A DOUBLE literal both engines parse identically, so estimate
    * arithmetic folds the same on both sides of a gate.
    */
  def alpha(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m => 0.7213 / (1.0 + 1.079 / m)
  }

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The 48-bit md5 base hash — the first 6 digest bytes big-endian,
    * which is exactly `('0x' || substr(md5(term), 1, 12))::BIGINT` in the
    * oracle's SQL. 48 bits leaves a 42-bit rho window at p = 6 — far
    * deeper than any corpus fills — while staying losslessly
    * representable in the oracle's BIGINT hex parse.
    */
  private[graft] def baseHash48(term: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_hll")
}
