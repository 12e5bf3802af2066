package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DataSource V2 BATCH source that REPORTS ITS PARTITIONING — the
  * storage-partitioned-join (SPJ) surface, the third leg of the DSv2
  * read family next to [[PagedSource]] (pushdown) and
  * [[ReplayStreamSource]] (admission-controlled streaming): the table
  * declares `partitioning() = identity(grp)`, the scan reports
  * `KeyGroupedPartitioning(grp, P)`, and every input partition carries
  * its key via `HasPartitionKey` — so under
  * `spark.sql.sources.v2.bucketing.enabled` two reads of this source
  * JOIN ON grp WITH ZERO SHUFFLES, and a groupBy(grp) aggregates
  * exchange-free (the modern DSv2 version of the bucketed-table
  * co-located join; on a 1000-executor cluster this is the difference
  * between a corpus-sized exchange and none). Row content is
  * splitmix64-derived from (seed, grp, i) — the hash-derived-content
  * discipline: any partition replays byte-identically on any executor,
  * so the spec can recompute the expected join result driver-side.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.KeyedSource")
  *     .option("groups", 8).option("rowsPerGroup", 100)
  *     .option("seed", 1).load()
  * }}}
  */
class KeyedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KeyedTable(opts.getInt("groups", 8),
      opts.getLong("rowsPerGroup", 100L), opts.getLong("seed", 0L),
      opts.getInt("skewSplits", 1))
  }
}

object KeyedSource {
  val schema: StructType = StructType(Seq(
    StructField("grp", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v_milli", LongType, nullable = false)))

  /** Deterministic row content: splitmix64 of (seed, grp, i). */
  def rowAt(seed: Long, grp: Long, rowsPerGroup: Long, i: Long)
      : (Long, Long, Long) = {
    val h = ReplayStreamSource.mix(seed * 0x9e3779b9L + grp * 1000003L + i)
    (grp, grp * rowsPerGroup + i, math.floorMod(h, 1000000L))
  }
}

private[sources] class KeyedTable(groups: Int, perGroup: Long, seed: Long,
                                  skewSplits: Int = 1)
    extends Table with SupportsRead {
  override def name(): String = s"keyed($groups x $perGroup, seed=$seed)"
  override def schema(): StructType = KeyedSource.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("grp"))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with SupportsReportPartitioning {
        override def readSchema(): StructType = KeyedSource.schema
        // A skewed group reports MULTIPLE input partitions sharing one
        // partitionKey (the multi-split case
        // partiallyClusteredDistribution.enabled exists for); the
        // KeyGroupedPartitioning's numPartitions is the SPLIT count.
        private val nParts = groups + (skewSplits - 1)
        override def outputPartitioning(): Partitioning =
          new KeyGroupedPartitioning(
            Array(Expressions.identity("grp")), nParts)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            (0 until groups).flatMap { g =>
              if (g == 0 && skewSplits > 1) {
                // group 0 split into skewSplits contiguous row ranges
                val step = math.max(1L, perGroup / skewSplits)
                (0 until skewSplits).map { s =>
                  val from = s * step
                  val until = if (s == skewSplits - 1) perGroup
                              else (s + 1) * step
                  KeyedPart(g.toLong, from, until, perGroup, seed)
                    : InputPartition
                }
              } else Seq(KeyedPart(g.toLong, 0L, perGroup, perGroup, seed)
                : InputPartition)
            }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            KeyedReaderFactory
        }
      }
    }
}

/** One input partition per key group (or per SPLIT of a skewed group);
  * `partitionKey()` is what lets Spark line both sides' groups up
  * without an exchange. */
private[sources] case class KeyedPart(grp: Long, from: Long, until: Long,
                                      perGroup: Long, seed: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(grp)
}

private[sources] object KeyedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeyedPart]
    new PartitionReader[InternalRow] {
      private var i = p.from - 1L
      override def next(): Boolean = { i += 1; i < p.until }
      override def get(): InternalRow = {
        val (g, id, v) = KeyedSource.rowAt(p.seed, p.grp, p.perGroup, i)
        InternalRow(g, id, v)
      }
      override def close(): Unit = ()
    }
  }
}
