package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
  * Scan pushdown (the part that matters at scale):
  *  - tax_id range filters prune whole PAGES at planning time (the remote
  *    analogue: turning predicates into index query clauses);
  *  - column pruning projects inside the reader (source_fields);
  *  - LIMIT caps the page range.
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
    new PagedScanBuilder(pages, pageSize)
}

private[sources] class PagedScanBuilder(pages: Int, pageSize: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var minTax = 0L
  private var maxTax = pages.toLong * pageSize - 1
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("tax_id", _: Number) | GreaterThanOrEqual("tax_id", _: Number) |
           LessThan("tax_id", _: Number) | LessThanOrEqual("tax_id", _: Number) |
           EqualTo("tax_id", _: Number) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("tax_id", v: Number) => minTax = math.max(minTax, v.longValue + 1)
      case GreaterThanOrEqual("tax_id", v: Number) => minTax = math.max(minTax, v.longValue)
      case LessThan("tax_id", v: Number) => maxTax = math.min(maxTax, v.longValue - 1)
      case LessThanOrEqual("tax_id", v: Number) => maxTax = math.min(maxTax, v.longValue)
      case EqualTo("tax_id", v: Number) =>
        minTax = math.max(minTax, v.longValue); maxTax = math.min(maxTax, v.longValue)
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(limit: Int): Boolean = {
    maxTax = math.min(maxTax, minTax + limit - 1)
    false // rows within the kept pages may still exceed limit — keep Spark's Limit
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      if (maxTax < minTax) return Array.empty
      val firstPage = (minTax / pageSize).toInt
      val lastPage = math.min((maxTax / pageSize).toInt, pages - 1)
      (firstPage to lastPage)
        .map(p => PagePartition(p, pageSize, minTax, maxTax,
          required.fieldNames): InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = PagedReaderFactory
  }
}

private[sources] case class PagePartition(page: Int, pageSize: Int,
    minTax: Long, maxTax: Long, columns: Array[String]) extends InputPartition

private[sources] object PagedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var taxId = math.max(p.page.toLong * p.pageSize, p.minTax) - 1
      private val end = math.min((p.page + 1).toLong * p.pageSize - 1, p.maxTax)
      override def next(): Boolean = { taxId += 1; taxId <= end }
      override def get(): InternalRow = {
        val values = p.columns.map {
          case "tax_id" => taxId.asInstanceOf[Any]
          case "accession" => UTF8String.fromString(f"GCA_${taxId}%09d.1")
          case "species" => UTF8String.fromString(s"sp_${taxId % 50}")
          case "annotation_complete" => UTF8String.fromString("Done")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
