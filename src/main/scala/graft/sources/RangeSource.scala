package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S8 — the pluggable source API (SURVEY §2.1), done as a real DataSource V2
  * connector rather than the reference's vestigial `Init/Open/NextTuple`
  * iterator (`Apps/WordCountSpout.go:18-44`, never wired in).
  *
  * The source is a deterministic sharded range: rows `(id, payload)` for
  * `id in [start, end)`, `payload = "v<id>"`, split across `shards`
  * partitions. It reads as a BATCH table and as a MICRO-BATCH stream (each
  * trigger admits `batchSize` ids — the S6 admission-control knob as a DSv2
  * offset policy), with offsets checkpointable for exactly-once resume.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.RangeSource")
  *     .option("start", 0).option("end", 1000).option("shards", 8).load()
  *   spark.readStream.format("graft.sources.RangeSource")
  *     .option("end", 1000).option("batchSize", 100).load()
  * }}}
  *
  * This is the template a real pluggable source follows: everything
  * engine-facing (schema, partitions, offsets) is declared to Catalyst, so
  * column pruning and distribution happen like any built-in source.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeTable(
      start = Option(properties.get("start")).map(_.toLong).getOrElse(0L),
      end = Option(properties.get("end")).map(_.toLong).getOrElse(1000L),
      shards = Option(properties.get("shards")).map(_.toInt).getOrElse(4),
      batchSize = Option(properties.get("batchSize")).map(_.toLong).getOrElse(100L))
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

private final class RangeTable(start: Long, end: Long, shards: Int,
                               batchSize: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_range[$start,$end)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RangeSource.schema
        override def toBatch: Batch = new RangeBatch(start, end, shards)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RangeMicroBatchStream(start, end, shards, batchSize)
      }
    }
}

/** One contiguous id slice, the unit of parallelism. */
private final case class RangeShard(from: Long, until: Long) extends InputPartition

private final class RangeBatch(start: Long, end: Long, shards: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    RangeShards.split(start, end, shards)
  override def createReaderFactory(): PartitionReaderFactory = RangeReaderFactory
}

private object RangeShards {
  def split(start: Long, end: Long, shards: Int): Array[InputPartition] = {
    val n = math.max(end - start, 0L)
    val per = math.max(1L, (n + shards - 1) / shards)
    (start until end by per).map(f => RangeShard(f, math.min(f + per, end))).toArray
  }
}

private object RangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val shard = partition.asInstanceOf[RangeShard]
    new PartitionReader[InternalRow] {
      private var cur = shard.from - 1
      override def next(): Boolean = { cur += 1; cur < shard.until }
      override def get(): InternalRow =
        InternalRow(cur, UTF8String.fromString(s"v$cur"))
      override def close(): Unit = ()
    }
  }
}

/** Watermark-free offset: how far into the id range the stream has read. */
private final case class RangeOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

private final class RangeMicroBatchStream(start: Long, end: Long, shards: Int,
                                          batchSize: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = RangeOffset(start)
  override def deserializeOffset(json: String): Offset = RangeOffset(json.toLong)
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()

  // Admission control (S6): the reference throttles by sleeping 100µs per
  // tuple (spout/spout.go:294); a DSv2 stream throttles by bounding how far
  // the offset may advance per trigger. Capping here — NOT in
  // planInputPartitions — is essential: Spark commits whatever latestOffset
  // returns, so a cap applied only at planning time would silently skip the
  // uncapped remainder.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val from = startOffset.asInstanceOf[RangeOffset].pos
    RangeOffset(math.min(end, from + batchSize))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")
  override def reportLatestOffset(): Offset = RangeOffset(end)

  // Trigger.AvailableNow: drain everything known at query start, in
  // batchSize steps, then terminate — the bounded-stream END semantics.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def planInputPartitions(s: Offset, e: Offset): Array[InputPartition] =
    RangeShards.split(s.asInstanceOf[RangeOffset].pos,
      e.asInstanceOf[RangeOffset].pos, shards)

  override def createReaderFactory(): PartitionReaderFactory = RangeReaderFactory
}
