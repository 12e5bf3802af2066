package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL source/sink helpers mirroring the reference's file layer: raw
  * occurrence files are JSONL (WriteSpeciesOccurrencesFn), cleaned outputs
  * are per-species files plus an optional consolidated file
  * (cleaning_occs_pipeline.py:71-91).
  *
  * Per-species files become `partitionBy(keyCol)` directory partitioning —
  * the Spark-native layout: writers scale out, and readers get partition
  * pruning on the key for free.
  */
object Jsonl {

  /** Schema-explicit JSONL read (never infer at scale: inference is a full
    * extra pass over the data). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Permissive read that quarantines malformed lines into
    * `_corrupt_record` — the dead-letter shape of the reference's
    * occurrence fetch (occurrences_pipeline.py dead outputs). */
  def readWithDeadLetters(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Per-key JSONL output (cf. write_species_file): one directory per key
    * value. maxRecordsPerFile bounds file sizes at scale. */
  def writePerKey(df: DataFrame, path: String, keyCol: String,
                  maxRecordsPerFile: Int = 1000000): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(keyCol)
      .json(path)

  /** Consolidated single-file output (small results only — forces one
    * writer task, as the reference's num_shards=1 does). */
  def writeConsolidated(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(path)
}
