package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries summary: at most `capacity` counters. Each stored count is a
  * LOWER bound on the item's true frequency, undercounting by at most
  * `n / (capacity + 1)` (n = stream length), so every item with true count
  * above that threshold is guaranteed present. Merging two summaries
  * (Agarwal et al., "Mergeable Summaries", PODS '12) preserves the bound —
  * which is exactly what Spark's partial/final aggregation needs. When
  * `capacity` >= the number of distinct items, no decrement ever fires and
  * the summary is EXACT (the oracle gate for q86 runs in this regime).
  */
final class MgSummary(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]
  /** Total decrement depth applied so far — added back as the documented
    * `+ err` upper bound; also the merge's threshold bookkeeping.
    */
  var err: Long = 0L

  def add(term: String, w: Long = 1L): Unit = {
    val cur = counts.getOrElse(term, -1L)
    if (cur >= 0L) counts.update(term, cur + w)
    else if (counts.size < capacity) counts.update(term, w)
    else {
      // classic MG overflow: decrement every counter by the new item's
      // weight (1 for streams), dropping zeros; each decrement unit
      // consumes one prior increment unit, so total work is O(n).
      err += w
      val dead = List.newBuilder[String]
      counts.mapValuesInPlace { (_, c) => c - w }
      counts.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.result().foreach(counts.remove)
    }
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity
    * subtract the (capacity+1)-th largest value from all and drop <= 0 —
    * the smallest uniform decrement that restores the size bound.
    */
  def merge(other: MgSummary): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    err += other.err
    if (counts.size > capacity) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      err += cut
      val dead = List.newBuilder[String]
      counts.mapValuesInPlace { (_, c) => c - cut }
      counts.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.result().foreach(counts.remove)
    }
  }
}

/** Native Catalyst aggregate `graft_heavy_hitters(term, capacity)`:
  * one-pass approximate heavy hitters (Misra-Gries) with HARD-bounded
  * state — at most `capacity` (term, count) counters per aggregation
  * buffer, whatever the vocabulary size. Returns
  * `array<struct<term string, cnt_lb bigint, err bigint>>` sorted by
  * count desc, term asc: `cnt_lb` is a guaranteed lower bound on the true
  * count and `cnt_lb + err` a guaranteed upper bound (`err` is the
  * summary-wide decrement depth, shared by all rows).
  *
  * Why custom: the exact top-k (`Relational.topK` over a full group-by)
  * ships one aggregate row per DISTINCT key through the exchange — at
  * 100 TB a web-scale vocabulary is billions of rows of shuffle for a
  * 20-row answer. This aggregate's partial buffers are `capacity`-sized
  * regardless of vocabulary, so the map side sends `capacity` rows per
  * partition and the guarantee (any term with true share > 1/(capacity+1)
  * of the stream survives, PROPERTY-TESTED in HeavyHittersSpec) does the
  * rest. With `capacity` >= distinct terms it degrades gracefully to the
  * exact answer — the regime q86's oracle gate pins.
  *
  * Reference scope: the reference's top-k (`bolt/topk.go`-shape) is exact
  * rank-over-counts, covered by T1/T2; this is the declared-beyond-
  * reference scale sibling.
  */
case class HeavyHitters(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        // Null-check BEFORE the lazy capacity unbox (a foldable NULL must
        // fail analysis cleanly, not NPE — same rule as graft_cms).
        if (right.eval(null) == null) TypeCheckResult.TypeCheckFailure(
          "graft_heavy_hitters capacity must be non-null")
        else if (capacity >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"graft_heavy_hitters capacity must be >= 1, got $capacity")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters expects (string, foldable int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private lazy val capacity: Int = right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt_lb", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val v = left.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgSummary, other: MgSummary): MgSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MgSummary): Any = {
    // UTF-8-binary tie-break (UTF8String.binaryCompare's ordering), NOT
    // Scala's UTF-16 code-unit order — the oracle's ORDER BY term is byte
    // order, and the two disagree for supplementary-plane vs U+E000..FFFF
    // terms tied on count (the Bpe.trainLocal comparator class of bug)
    // each term's UTF-8 bytes encoded ONCE up front — the comparator runs
    // O(n log n) times and re-encoding inside it would allocate per
    // comparison (capacity is small, but eval runs once per group)
    val sorted = buffer.counts.toArray
      .map { case (t, c) =>
        (t, t.getBytes(java.nio.charset.StandardCharsets.UTF_8), c) }
      .sortWith { case ((_, ba, ca), (_, bb, cb)) =>
        ca > cb || (ca == cb && java.util.Arrays.compareUnsigned(ba, bb) < 0)
      }
    new GenericArrayData(sorted.map { case (t, _, c) =>
      InternalRow(UTF8String.fromString(t), c, buffer.err)
    })
  }

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.err)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new MgSummary(in.readInt())
    s.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeavyHitters =
    copy(left = newLeft, right = newRight)
}

object HeavyHitters {
  def ensureRegistered(spark: SparkSession): Unit =
    GraftExtensions.ensureRegistered(spark, "graft_heavy_hitters")
}
