package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested document assembly — the metadata ETL's record-building surface
  * (beam map_functions.py:63-131 process_specimens_for_elasticsearch /
  * build_data_portal_record): derive a tracking status from related-data
  * presence, flatten characteristics into a customFields array<struct> of
  * {name, value, unit, ontology_term} (common_functions.py:8-22
  * check_field_existence builds exactly that triple), carry taxId, and
  * nest the organism as a {text, ontologyTerm} struct. Deep/nested output
  * types are what the columnar engine handles natively (no JSON
  * stringification until the sink).
  */
object Records {

  /** The library API: full nested record. */
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
        col("c_custkey").as("taxId"),
        // check_field_existence: every characteristic becomes a
        // {name, value, unit, ontology_term} entry (map_functions.py:84-95).
        array(
          struct(lit("mktsegment").as("name"),
            col("c_mktsegment").cast("string").as("value"),
            lit("").as("unit"), lit("").as("ontology_term")),
          struct(lit("acctbal").as("name"),
            // double → decimal(12,2) → string: fixed 2-decimal rendering,
            // identical across engines (raw double→string reprs are not).
            col("c_acctbal").cast("decimal(12,2)").cast("string").as("value"),
            lit("USD").as("unit"), lit("").as("ontology_term")),
          struct(lit("geographic location").as("name"),
            concat(lit("nation_"), col("c_nationkey").cast("string")).as("value"),
            lit("").as("unit"),
            concat(lit("GAZ:"), col("c_nationkey").cast("string")).as("ontology_term")))
          .as("customFields"),
        struct(
          concat(lit("sp_"), (col("c_custkey") % 50).cast("string")).as("text"),
          concat(lit("NCBITaxon:"), col("c_custkey").cast("string")).as("ontologyTerm"))
          .as("organism"))
  }

  /** The checkable projection: nested columns serialized to deterministic
    * strings derived FROM the nested form (the driver's rows-only pandas
    * compare cannot sort array/struct cells, and string serialization also
    * makes the query fully SQL-oracle-able). */
  def portalRecordsFlat(s: SparkSession, dir: String): DataFrame =
    portalRecords(s, dir).select(
      col("accession"), col("tracking_status"), col("taxId"),
      expr("array_join(transform(customFields, f -> " +
        "concat(f.name, ':', f.value, '|', f.unit, '|', f.ontology_term)), ';')")
        .as("custom_fields"),
      concat(col("organism.text"), lit("|"), col("organism.ontologyTerm"))
        .as("organism"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "meta_portal_records" -> (portalRecordsFlat _))

  val oracle: Map[String, String] = Map(
    "meta_portal_records" ->
      """SELECT 'ACC' || CAST(c_custkey AS VARCHAR) AS accession,
        |  CASE WHEN COALESCE(n_experiments, 0) > 0 THEN 'Raw Data - Submitted'
        |       WHEN COALESCE(n_assemblies, 0) > 0 THEN 'Assemblies - Submitted'
        |       ELSE 'Submitted to BioSamples' END AS tracking_status,
        |  c_custkey AS taxId,
        |  'mktsegment:' || c_mktsegment || '||;'
        |    || 'acctbal:' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) || '|USD|;'
        |    || 'geographic location:nation_' || CAST(c_nationkey AS VARCHAR)
        |    || '||GAZ:' || CAST(c_nationkey AS VARCHAR) AS custom_fields,
        |  'sp_' || CAST(c_custkey % 50 AS VARCHAR)
        |    || '|NCBITaxon:' || CAST(c_custkey AS VARCHAR) AS organism
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_experiments,
        |    CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_assemblies
        |  FROM orders GROUP BY o_custkey) e ON c_custkey = o_custkey""".stripMargin)
}
