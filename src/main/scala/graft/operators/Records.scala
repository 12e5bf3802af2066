package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested document assembly — the metadata ETL's record-building surface
  * (beam map_functions.py:63-131 process_specimens_for_elasticsearch /
  * build_data_portal_record): derive a tracking status from related-data
  * presence, flatten attributes into a customFields array<struct>, and
  * nest the organism as a struct. Deep/nested output types are exactly
  * what the columnar engine handles natively (no JSON stringification
  * until the sink).
  */
object Records {

  def portalRecords(s: SparkSession, dir: String): DataFrame = {
    val experiments = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_experiments"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_assemblies"))
    t(s, dir, "customer")
      .join(experiments, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        concat(lit("ACC"), col("c_custkey").cast("string")).as("accession"),
        // Raw data wins over assemblies wins over plain submission
        // (map_functions.py:74-80).
        when(coalesce(col("n_experiments"), lit(0L)) > 0, "Raw Data - Submitted")
          .when(coalesce(col("n_assemblies"), lit(0L)) > 0, "Assemblies - Submitted")
          .otherwise("Submitted to BioSamples").as("tracking_status"),
        array(
          struct(lit("mktsegment").as("name"), col("c_mktsegment").cast("string").as("value")),
          struct(lit("acctbal").as("name"), col("c_acctbal").cast("string").as("value")))
          .as("customFields"),
        struct(
          concat(lit("sp_"), (col("c_custkey") % 50).cast("string")).as("text"),
          concat(lit("NCBITaxon:"), col("c_custkey").cast("string")).as("ontologyTerm"))
          .as("organism"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "meta_portal_records" -> (portalRecords _))
}
