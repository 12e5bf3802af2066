package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** DataSource V2 batch SINK modeling the reference's Elasticsearch bulk
  * writer (WriteToElasticsearchDoFn / write_to_elasticsearch.py): each
  * task buffers rows and "flushes" them in bounded bulk batches, and the
  * job-level commit is atomic — either every task's output registers or
  * (on abort) none of it does, which is exactly the two-phase
  * DataWriter/BatchWrite contract the ES bulk DoFn lacks (Beam retries
  * can double-write; a DSv2 sink cannot).
  *
  * This in-memory implementation ships rows back in commit messages so
  * specs can assert contents; a network-backed variant would flush each
  * bulk inside `write()` (idempotent ids, as the reference's `_id`-keyed
  * upserts) and carry only counts in the message — the interface is the
  * part being modeled.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.BulkSink")
  *     .option("target", "specimens").option("batchSize", "500")
  *     .mode("append").save()
  * }}}
  */
class BulkSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new BulkTable(schema, opts.get("target"), opts.getInt("batchSize", 1000))
  }
}

object BulkSink {
  /** target → committed rows (each row = values in schema field order). */
  val committed: TrieMap[String, Vector[Seq[Any]]] = TrieMap.empty
  /** target → number of simulated bulk flushes across committed jobs. */
  val flushes: TrieMap[String, Long] = TrieMap.empty
  val aborted = new java.util.concurrent.atomic.AtomicLong

  def reset(target: String): Unit = { committed.remove(target); flushes.remove(target) }
}

private[sources] class BulkTable(schema: StructType, target: String,
                                 batchSize: Int) extends Table with SupportsWrite {
  override def name(): String = s"bulk($target)"
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def schema(): StructType = schema
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite mode: clear the target as part of the SAME commit
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new BulkBatchWrite(info.schema(), target, batchSize, doTruncate)
      }
    }
}

private[sources] case class BulkCommitMessage(
    rows: Vector[Seq[Any]], nFlushes: Long) extends WriterCommitMessage

private[sources] class BulkBatchWrite(schema: StructType, target: String,
                                      batchSize: Int, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BulkWriterFactory(schema, batchSize)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: BulkCommitMessage => m }
    val rows = msgs.toVector.flatMap(_.rows)
    BulkSink.committed.updateWith(target) {
      case Some(prev) if !truncate => Some(prev ++ rows)
      case _ => Some(rows)
    }
    BulkSink.flushes.updateWith(target) {
      case Some(prev) if !truncate => Some(prev + msgs.map(_.nFlushes).sum)
      case _ => Some(msgs.map(_.nFlushes).sum)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    BulkSink.aborted.incrementAndGet(); ()
  }
}

private[sources] class BulkWriterFactory(schema: StructType, batchSize: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var buf = Vector.empty[Seq[Any]]
      private var pending = 0
      private var nFlushes = 0L

      override def write(row: InternalRow): Unit = {
        buf :+= schema.fields.indices.map { i =>
          schema.fields(i).dataType match {
            case StringType => row.getUTF8String(i).toString
            case dt => row.get(i, dt)
          }
        }
        pending += 1
        if (pending >= batchSize) flush()
      }

      // a network sink would issue the bulk request here
      private def flush(): Unit = { nFlushes += 1; pending = 0 }

      override def commit(): WriterCommitMessage = {
        if (pending > 0) flush()
        BulkCommitMessage(buf, nFlushes)
      }
      override def abort(): Unit = { buf = Vector.empty }
      override def close(): Unit = ()
    }
}
