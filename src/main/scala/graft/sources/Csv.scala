package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** CSV source/sink helpers — the delimited-file counterpart of [[Jsonl]],
  * for reference-style exchange files (GBIF occurrence downloads and
  * checklist exports ship as CSV/TSV).
  *
  * Same posture as JSONL: schema always explicit (inference is a full
  * extra pass over the data, and silently types everything it cannot
  * agree on as string), malformed rows quarantined instead of dropped,
  * writes partitioned by key so both sides scale out.
  */
object Csv {

  /** Schema-explicit CSV read with a header row. */
  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("delimiter", delimiter)
      .csv(path)

  /** Permissive read that quarantines malformed rows (wrong arity, type
    * mismatch) into `_corrupt_record` — the dead-letter split shape:
    * `filter(col("_corrupt_record").isNull)` is the success stream,
    * `isNotNull` the quarantine. Spark's FAILFAST would kill the job on
    * one bad row; DROPMALFORMED silently loses data — both wrong for a
    * pipeline that must account for every input record. */
  def readWithDeadLetters(spark: SparkSession, path: String,
                          schema: StructType,
                          delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Split a dead-letter read into (success, quarantine) frames. */
  def splitDeadLetters(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
    df.filter(col("_corrupt_record").isNotNull))

  /** Per-key CSV output: one directory per key value, headers on, file
    * sizes bounded. */
  def writePerKey(df: DataFrame, path: String, keyCol: String,
                  maxRecordsPerFile: Int = 1000000): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(keyCol)
      .csv(path)
}
