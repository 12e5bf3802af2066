package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Oracle hash-match discipline (SURVEY.md §4).
  *
  * Double addition is not associative, so a plain `sum(double)` depends on
  * partition order and will not reproduce DuckDB bit-for-bit. We instead
  * cast every *base factor* to DECIMAL before arithmetic: decimal products
  * and sums are exact and order-independent, and the single final
  * decimal→double conversion is deterministic in both engines.
  */
object Determinism {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent sum of a 2-decimal quantity, as double. */
  def dsum2(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** AVG with deterministic arithmetic: exact decimal sum, double divide. */
  def davg2(c: Column): Column = dsum2(c) / count(c)
}
