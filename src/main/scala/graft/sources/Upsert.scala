package graft.sources

import org.apache.spark.sql.DataFrame

/** Idempotent partition-level upsert — the Spark-native modeling of the
  * reference's index re-writes (Elasticsearch bulk upserts / BigQuery
  * WRITE_APPEND-with-gate): recomputed partitions replace their previous
  * contents, untouched partitions survive.
  *
  * Uses dynamic partition overwrite: `mode(overwrite)` only replaces the
  * partition directories present in this write, not the whole table —
  * safe to re-run (idempotent per partition), and each round writes only
  * changed keys.
  */
object Upsert {

  def overwritePartitions(df: DataFrame, path: String, keyCol: String): Unit =
    df.sparkSession.conf.synchronized {
      val conf = df.sparkSession.conf
      val prev = conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
      try df.write.mode("overwrite").partitionBy(keyCol).parquet(path)
      finally conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
}
