package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** DataSource V2 batch sink that REQUIRES ITS DISTRIBUTION AND ORDERING —
  * the writer-side mirror of [[KeyedSource]]'s storage-partitioned read:
  * the Write implements `RequiresDistributionAndOrdering`
  * (clustered by the first schema column, ordered within partitions by
  * (cluster, order) ascending), so SPARK plans the exchange and sort the
  * sink needs — the caller writes an unsorted, unpartitioned frame and
  * the engine delivers every cluster key to exactly one task, sorted.
  * This is how a real lakehouse writer (Iceberg/Delta clustered writes,
  * per-key output files, LSM ingest) asks for its layout instead of
  * trusting callers to `.repartition().sortWithinPartitions()` by hand —
  * at 100 TB the layout contract lives in the SINK, the one place every
  * writer path goes through.
  *
  * The in-memory writer VERIFIES the contract as it consumes rows (any
  * out-of-order row or split key fails the task loudly) and ships a
  * per-task summary in its commit message; SourcesSpec asserts keys
  * never span tasks and every task observed sorted input.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.ClusteredSink")
  *     .option("target", "t1").mode("append").save()
  * }}}
  */
class ClusteredSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ClusteredTable(schema, opts.get("target"))
  }
}

object ClusteredSink {
  /** One committed task's observation: which cluster keys it saw, whether
    * its input arrived (key, ord)-sorted, and its row count. */
  case class TaskSummary(keys: Set[Long], sorted: Boolean, n: Long)

  /** target → committed per-task summaries. */
  val committed: TrieMap[String, Vector[TaskSummary]] = TrieMap.empty
  def reset(target: String): Unit = committed.remove(target)
}

private[sources] class ClusteredTable(schema: StructType, target: String)
    extends Table with SupportsWrite {
  override def name(): String = s"clustered($target)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // Contract check up front: the writer consumes getLong(0)/getLong(1),
    // so a one-column or non-long frame must fail with the contract
    // spelled out, not an opaque ArrayIndexOutOfBounds deep in the task.
    val s = info.schema()
    require(s.length >= 2 &&
      s.fields(0).dataType == org.apache.spark.sql.types.LongType &&
      s.fields(1).dataType == org.apache.spark.sql.types.LongType,
      s"ClusteredSink requires (cluster LONG, order LONG) as the first " +
        s"two columns; got schema ${s.simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write with RequiresDistributionAndOrdering {
        private val k = info.schema().fieldNames(0)
        private val o = info.schema().fieldNames(1)
        override def requiredDistribution(): Distribution =
          Distributions.clustered(Array(Expressions.column(k)))
        override def requiredOrdering(): Array[SortOrder] = Array(
          Expressions.sort(Expressions.column(k),
            SortDirection.ASCENDING, NullOrdering.NULLS_FIRST),
          Expressions.sort(Expressions.column(o),
            SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
        override def toBatch: BatchWrite =
          new ClusteredBatchWrite(target)
      }
    }
  }
}

private[sources] case class ClusteredCommit(
    summary: ClusteredSink.TaskSummary) extends WriterCommitMessage

private[sources] class ClusteredBatchWrite(target: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ClusteredWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val sums = messages.collect { case ClusteredCommit(s) if s.n > 0 => s }
    ClusteredSink.committed.updateWith(target) {
      case Some(v) => Some(v ++ sums)
      case None    => Some(sums.toVector)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] object ClusteredWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var keys = Set.empty[Long]
      private var sorted = true
      private var n = 0L
      private var lastK = Long.MinValue
      private var lastO = Long.MinValue
      override def write(record: InternalRow): Unit = {
        val k = record.getLong(0)
        val o = record.getLong(1)
        // verify the engine honored the requested within-partition order
        if (k < lastK || (k == lastK && o < lastO)) sorted = false
        if (k != lastK) lastO = Long.MinValue
        lastK = k
        lastO = o
        keys += k
        n += 1
      }
      override def commit(): WriterCommitMessage =
        ClusteredCommit(ClusteredSink.TaskSummary(keys, sorted, n))
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
