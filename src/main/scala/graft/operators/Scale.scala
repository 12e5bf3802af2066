package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: bucketed co-located joins and skew salting
  * (SURVEY.md §5 — partitioning & shuffle discipline).
  */
object Scale {

  /** Persist a DataFrame bucketed by a join key. Two tables bucketed the
    * same way join WITHOUT any Exchange — the shuffle is paid once at
    * write time, then every subsequent join on the key is local.
    * (Spark-native bucketing; no Hive metastore needed.) */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Exclusive per-bucket offsets for a two-level distributed prefix sum
    * — the shared core of dataCompactFiles / textVocabGrowth /
    * eventsPeakConcurrency: per-bucket totals for each measure, then the
    * EXCLUSIVE running sum over buckets (≤ |buckets| rows — the only
    * globally-ordered window, always tiny). Callers broadcast-join the
    * result back and add a within-bucket running window, so no
    * single-task global sort ever touches row-level data. Offset columns
    * come back as `<measure>_off`. */
  def bucketOffsets(df: DataFrame, bucketCol: String,
      measures: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOff = Window.orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sums = measures.map(m => sum(m).as(s"${m}_sum"))
    val withOffs = measures.foldLeft(
      df.groupBy(bucketCol).agg(sums.head, sums.tail: _*)) {
      case (acc, m) =>
        acc.withColumn(s"${m}_off",
          coalesce(sum(s"${m}_sum").over(wOff), lit(0L)))
    }
    withOffs.select(col(bucketCol) +: measures.map(m => col(s"${m}_off")): _*)
  }

  /** Salted aggregation for skewed keys: two-phase groupBy where phase 1
    * spreads each hot key over `salts` sub-keys (map-side partial combine
    * still applies), phase 2 merges the partials. Use for COUNT/SUM-like
    * decomposable aggregates when one key dominates the shuffle.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("n"))

  /** Salted join: replicate the small side `salts` times, salt the skewed
    * big side uniformly, equi-join on (key, salt). Spreads one hot key's
    * rows over `salts` reducers. AQE's skew-join handles sort-merge skew
    * automatically; this is the explicit fallback for cases AQE can't
    * split (e.g. a single monster key in a hash join). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(col(key), spark_partition_id(), monotonically_increasing_id()), lit(salts)))
    val replicatedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
