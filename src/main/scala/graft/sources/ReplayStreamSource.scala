package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 MICRO-BATCH STREAMING source — the streaming-read half
  * of the DSv2 surface next to [[PagedSource]] (batch read) and
  * [[BulkSink]] (batch write): a rate-limited deterministic event replay,
  * the harness shape of every queue/CDC connector (Kafka, Kinesis, a
  * change feed). A real deployment swaps the deterministic row generator
  * inside the PartitionReader for the remote fetch; everything around it
  * — monotonic offsets, `rowsPerBatch` admission control, offset-range
  * partition planning, checkpoint-recoverable `deserializeOffset` — is
  * the real streaming contract Spark drives.
  *
  * Offsets are plain row counts (LongOffset-style JSON longs), so a
  * planned range [start, end) maps to event_ids [start, end) and the
  * source is exactly-once replayable from any checkpoint: re-planning the
  * same range regenerates byte-identical rows (all fields are
  * splitmix64-derived from event_id — the hash-derived-weights
  * discipline, never driver RNG state).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.ReplayStreamSource")
  *     .option("totalRows", 100000).option("rowsPerBatch", 10000)
  *     .option("partitions", 8).load()
  * }}}
  */
class ReplayStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplayStreamSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ReplayTable(opts.getLong("totalRows", 1000L),
      opts.getLong("rowsPerBatch", 100L), opts.getInt("partitions", 2))
  }
}

object ReplayStreamSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_ns", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_milli", LongType, nullable = false)))

  private val Types =
    Array("login", "search", "view", "purchase", "logout")

  /** splitmix64 — the standard public-domain mixer; deterministic row
    * content from event_id alone, so any offset range replays
    * identically on any executor. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def rowAt(id: Long): (Long, Long, String, Long) = {
    val h = mix(id)
    (id, id * 1000000000L, Types(math.floorMod(h, 5L).toInt),
      math.floorMod(h >>> 3, 100000L))
  }
}

private[sources] class ReplayTable(total: Long, perBatch: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"replay($total @ $perBatch/batch)"
  override def schema(): StructType = ReplayStreamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ReplayStreamSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ReplayStream(total, perBatch, parts)
      }
    }
}

private[sources] case class ReplayOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class ReplayStream(total: Long, perBatch: Long, parts: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  // STATELESS admission control: the engine hands the restored start
  // offset into latestOffset(start, limit), so a recovered query (a
  // FRESH stream instance reading the checkpoint's offset log) computes
  // the next admission window without any in-memory pointer — the
  // restart-correct shape the no-arg latestOffset() cannot express.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perBatch)

  override def initialOffset(): Offset = ReplayOffset(0L)
  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.toLong)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ReplayOffset].n
    val cap = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => perBatch
    }
    ReplayOffset(math.min(total, s + cap))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: the engine must call latestOffset(start, limit)")
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].n
    val e = end.asInstanceOf[ReplayOffset].n
    if (e <= s) return Array.empty
    val per = (e - s + parts - 1) / parts
    (0 until parts).flatMap { p =>
      val lo = s + p * per
      val hi = math.min(lo + per, e)
      if (lo < hi) Some(ReplayRange(lo, hi): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = ReplayReaderFactory
}

private[sources] case class ReplayRange(lo: Long, hi: Long) extends InputPartition

private[sources] object ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[ReplayRange]
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        val (eid, ts, tpe, v) = ReplayStreamSource.rowAt(id)
        InternalRow(eid, ts, UTF8String.fromString(tpe), v)
      }
      override def close(): Unit = ()
    }
  }
}
