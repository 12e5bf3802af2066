package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 batch source modeling the reference's paged scan of an
  * annotation index (FetchESFn, transforms.py:28-107: search_after pages of
  * `annotation_complete=Done` records).
  *
  * Each page is one InputPartition, so "pages" are fetched in parallel by
  * the executors — the Spark-native replacement for the reference's
  * driver-side pagination loop. Records are generated deterministically
  * (this container has no external index); a real deployment would issue
  * the per-page remote query inside the PartitionReader.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedSource")
  *     .option("pages", 8).option("pageSize", 250).load()
  * }}}
  */
class PagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedTable(opts.getInt("pages", 4), opts.getInt("pageSize", 100))
  }
}

object PagedSource {
  val schema: StructType = StructType(Seq(
    StructField("tax_id", LongType, nullable = false),
    StructField("accession", StringType, nullable = false),
    StructField("species", StringType, nullable = false),
    StructField("annotation_complete", StringType, nullable = false)))
}

private[sources] class PagedTable(pages: Int, pageSize: Int) extends Table with SupportsRead {
  override def name(): String = s"paged($pages x $pageSize)"
  override def schema(): StructType = PagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        (0 until pages).map(p => PagePartition(p, pageSize): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory = PagedReaderFactory
    }
}

private[sources] case class PagePartition(page: Int, pageSize: Int) extends InputPartition

private[sources] object PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val PagePartition(page, pageSize) = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < pageSize }
      override def get(): InternalRow = {
        val taxId = page.toLong * pageSize + i
        InternalRow(
          taxId,
          UTF8String.fromString(f"GCA_${taxId}%09d.1"),
          UTF8String.fromString(s"sp_${taxId % 50}"),
          UTF8String.fromString("Done"))
      }
      override def close(): Unit = ()
    }
  }
}
