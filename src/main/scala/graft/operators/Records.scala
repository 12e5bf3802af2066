package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The library API: full nested record. Besides experiments and
    * assemblies, parse_data_records (common_functions.py:38-54) also
    * collects the `analyses` list (modeled as a count of final-status
    * related orders) and the `images_available` flag (true when ANY
    * related record carries it) — both ride the same related-records
    * aggregate, no extra shuffle. */
  def portalRecords(s: SparkSession, dir: String): DataFrame = {
    val experiments = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_experiments"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_assemblies"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_analyses"),
        max(col("o_orderpriority") === "1-URGENT").as("imgs"))
    t(s, dir, "customer")
      .join(experiments, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        concat(lit("ACC"), col("c_custkey").cast("string")).as("accession"),
        coalesce(col("n_analyses"), lit(0L)).as("n_analyses"),
        coalesce(col("imgs"), lit(false)).as("images_available"),
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
      col("n_analyses"), col("images_available"),
      expr("array_join(transform(customFields, f -> " +
        "concat(f.name, ':', f.value, '|', f.unit, '|', f.ontology_term)), ';')")
        .as("custom_fields"),
      concat(col("organism.text"), lit("|"), col("organism.ontologyTerm"))
        .as("organism"))

  /** DWH record build (map_functions.py:134-314 process_samples_for_dwh):
    * flatten characteristics into typed columns, derive trackingSystem,
    * and resolve each record's warehouse KEY by sample type — specimens
    * key by their own taxId; symbionts by their host's ('sample symbiont
    * of', one hop); metagenomes WALK 'sample derived from' links until an
    * ERC000053-checklist host (bounded here at 3 hops — each hop is a
    * lookup join, the relational analogue of the reference's per-sample
    * HTTP GETs). Missing links become dead-letter rows with the
    * reference's error messages (its TaggedOutput("Errors") side output,
    * flattened as an error_message column); an unreached ERC host within
    * the bound maps to its "Host sample doesn't exist" error. The
    * "Ochlodes sylvanus" hard-pin (map_functions.py:262-263) applies
    * before the type branch, overriding even the error paths.
    *
    * Host links are synthesized deterministically (symbiont host = k-1;
    * derived-from parent = k div 2; checklist ERC000053 ⟺ k % 5 = 0) so
    * the DuckDB oracle can recompute the walk arithmetically while the
    * Spark plan keeps the reference's lookup-join shape. */
  def dwhRecords(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val experiments = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_experiments"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_assemblies"))
    val base = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(experiments, k === col("o_custkey"), "left_outer")
      .select(
        k.as("k"),
        concat(lit("ACC"), k.cast("string")).as("accession"),
        when(k % 3 === 0, "specimens").when(k % 3 === 1, "symbionts")
          .otherwise("metagenomes").as("sample_type"),
        concat(lit("sp_"), (k % 50).cast("string")).as("organism"),
        when(k % 2 === 0, "female").otherwise("male").as("sex"),
        element_at(array(lit("leaf"), lit("blood"), lit("muscle"), lit("root")),
          (k % 4 + 1).cast("int")).as("organism_part"),
        concat(lit("tol"), k.cast("string")).as("tolid"),
        col("n_name").as("country"),
        element_at(array(lit("adult"), lit("juvenile"), lit("egg")),
          (k % 3 + 1).cast("int")).as("lifestage"),
        concat(lit("hab_"), (k % 6).cast("string")).as("habitat"),
        when(coalesce(col("n_experiments"), lit(0L)) > 0, "Raw Data - Submitted")
          .when(coalesce(col("n_assemblies"), lit(0L)) > 0, "Assemblies - Submitted")
          .otherwise("Submitted to BioSamples").as("tracking_system"))
    // per-hop host lookup: (key, is the host an ERC000053 terminal?).
    // Derived from the raw customer table, NOT from `base`: the lookup
    // needs only (k, checklist), and building it off base would replay
    // the nation join + orders aggregate once per hop.
    def look(n: Int) = t(s, dir, "customer")
      .select(col("c_custkey").as(s"hk$n"),
        (col("c_custkey") % 5 === 0).as(s"erc$n"))
    val resolved = base
      .join(look(0), col("k") - 1 === col("hk0"), "left_outer")
      .join(look(1), expr("k div 2") === col("hk1"), "left_outer")
      .join(look(2), expr("k div 4") === col("hk2"), "left_outer")
      .join(look(3), expr("k div 8") === col("hk3"), "left_outer")
    val missingSymbiont = col("sample_type") === "symbionts" && col("k") % 7 === 0
    val missingMetagenome = col("sample_type") === "metagenomes" && col("k") % 11 === 0
    val metaKey = when(col("erc1"), col("hk1"))
      .when(col("erc2"), col("hk2"))
      .when(col("erc3"), col("hk3"))
    val errorMsg =
      when(col("organism") === "sp_13", lit(null).cast("string")) // hard-pin wins
        .when(missingSymbiont,
          "missing 'sample symbiont of' field for symbiont sample")
        .when(missingMetagenome,
          "missing 'sample derived from' field for metagenome sample")
        .when(col("sample_type") === "metagenomes" && metaKey.isNull,
          "Host sample doesn't exist")
    val dwhKey = when(errorMsg.isNotNull, lit(null).cast("string"))
      .when(col("organism") === "sp_13", "876063_3126489")
      .when(col("sample_type") === "specimens", col("k").cast("string"))
      .when(col("sample_type") === "symbionts", col("hk0").cast("string"))
      .otherwise(metaKey.cast("string"))
    resolved.select(col("accession"), col("sample_type"),
      dwhKey.as("dwh_key"), errorMsg.as("error_message"),
      col("organism"), col("sex"), col("organism_part"), col("tolid"),
      col("country"), col("lifestage"), col("habitat"), col("tracking_system"))
  }

  /** Per-taxon rollup of the resolved DWH records (my_pipeline.py:95-100
    * CoGroupByKey over specimens/symbionts/metagenomes +
    * build_data_portal_record): group successes by resolved key, count
    * records per sample type, raise the Nagoya-protocol flag when any
    * record's country is in scope (map_functions.py:380-387 — the
    * reference tests "Spain"; the TPC-H nation dim has no Spain, so
    * FRANCE stands in), and derive the taxon's currentStatus as the MAX
    * over the tracking precedence Raw Data > Assemblies > Submitted. One
    * hash aggregate on the resolved key — the CoGroupByKey + per-group
    * assembly collapses into a single shuffle. Taxa on the reference's
    * static deny-list (tax_id 624 / 1773 / 2697049, the pathogen block in
    * build_dwh_record map_functions.py:796-798) are flagged `blocked`
    * (its error side output, flattened). */
  def taxonRollup(s: SparkSession, dir: String): DataFrame =
    dwhRecords(s, dir)
      .filter(col("error_message").isNull)
      .groupBy("dwh_key")
      .agg(
        count(lit(1)).as("n_records"),
        sum(when(col("sample_type") === "specimens", 1L).otherwise(0L)).as("n_specimens"),
        sum(when(col("sample_type") === "symbionts", 1L).otherwise(0L)).as("n_symbionts"),
        sum(when(col("sample_type") === "metagenomes", 1L).otherwise(0L)).as("n_metagenomes"),
        max(col("country") === "FRANCE").as("nagoya_protocol"),
        max(when(col("tracking_system") === "Raw Data - Submitted", 2)
          .when(col("tracking_system") === "Assemblies - Submitted", 1)
          .otherwise(0)).as("lvl"))
      .select(col("dwh_key"), col("n_records"), col("n_specimens"),
        col("n_symbionts"), col("n_metagenomes"), col("nagoya_protocol"),
        when(col("lvl") === 2, "Raw Data - Submitted")
          .when(col("lvl") === 1, "Assemblies - Submitted")
          .otherwise("Submitted to BioSamples").as("current_status"),
        col("dwh_key").isin("624", "1773", "2697049").as("blocked"))

  /** remove_duplicated_metadata_records (beam common_functions.py:78-94):
    * per accession keep the record whose trackingSystem rank is HIGHEST
    * (Submitted to BioSamples=1 < Raw Data=2 < Assemblies=3). The
    * reference's dict pass replaces only on strictly-greater rank, i.e.
    * keeps the FIRST record seen at the winning rank — over an ordered
    * feed that is the lowest record id, modeled as a deterministic
    * min-record-id tie-break. One max_by HASH aggregate (partials combine
    * map-side), not a row_number window, which would sort-shuffle every
    * record to rank the one survivor. Each order stands in for one
    * metadata record of its customer's accession (orderstatus →
    * trackingSystem, as in [[portalRecords]]). */
  def dedupRecords(s: SparkSession, dir: String): DataFrame = {
    val rnk = when(col("trackingSystem") === "Assemblies - Submitted", 3)
      .when(col("trackingSystem") === "Raw Data - Submitted", 2)
      .otherwise(1)
    t(s, dir, "orders")
      .select(concat(lit("ACC"), col("o_custkey").cast("string")).as("accession"),
        col("o_orderkey").as("record_id"),
        when(col("o_orderstatus") === "F", "Assemblies - Submitted")
          .when(col("o_orderstatus") === "O", "Raw Data - Submitted")
          .otherwise("Submitted to BioSamples").as("trackingSystem"))
      .groupBy("accession")
      .agg(
        max_by(struct(col("record_id"), col("trackingSystem")),
          struct(rnk.as("r"), (-col("record_id")).as("inv"))).as("best"),
        count(lit(1)).as("n_records"))
      .select(col("accession"), col("best.record_id").as("record_id"),
        col("best.trackingSystem").as("trackingSystem"), col("n_records"))
  }

  /** update_summary_index (airflow update_summary_index.py:20-63): the
    * portal's landing summary — for every aggregation facet, the top-20
    * value counts, routed into sections (tracking facets → "status",
    * taxonomy → "phylogeny", the rest → "projects") with "Waiting"
    * buckets excluded. The reference issues one server-side ES terms-agg
    * per facet; here ALL facets unpivot in a single scan (stack
    * generator), count in one hash aggregate, and take their top-20 via
    * row_number ≤ k — which Spark plans as WindowGroupLimit: each
    * partial pushes only k rows per facet into the window shuffle. */
  def summaryFacets(s: SparkSession, dir: String): DataFrame = {
    val pairs = dwhRecords(s, dir)
      .filter(col("error_message").isNull)
      .select(expr(
        "stack(6, 'sample_type', sample_type, 'tracking_system', tracking_system, " +
          "'lifestage', lifestage, 'habitat', habitat, 'country', country, " +
          "'organism', organism) AS (facet, bucket_key)"))
      .filter(col("bucket_key") =!= "Waiting")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("facet").orderBy(col("doc_count").desc, col("bucket_key"))
    pairs.groupBy("facet", "bucket_key").agg(count(lit(1)).as("doc_count"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .select(
        when(col("facet") === "tracking_system", "status")
          .when(col("facet") === "organism", "phylogeny")
          .otherwise("projects").as("section"),
        col("facet"), col("bucket_key"), col("doc_count"),
        col("rnk").cast("long").as("rnk"))
  }

  /** update_summary_index_dtol (airflow update_summary_index.py:65-101):
    * the DToL portal's landing tile — only the two dtol facets' "Done"
    * buckets survive, renamed through names_mapping ("Assemblies -
    * Submitted", "Annotation Complete"), plus the nested→reverse_nested
    * cardinality the sibling summary lacks: "Genome Notes" = DISTINCT
    * PARENT ORGANISMS having ≥1 genome note (the ES reverse_nested hop
    * from the genome_notes child back to the parent doc, then a
    * cardinality on organism.keyword). Relationally: both Done counts
    * are conditional sums in ONE pass over the records scan; the
    * genome-note leg semijoins the records against the (vocabulary-
    * sized, broadcast) [[genomeNotes]] tax rollup and counts distinct
    * organisms — a count-distinct-over-linked-children, never a
    * corpus-sized shuffle. The Ochlodes-sylvanus hard-pin key
    * ("876063_3126489") is non-numeric and is excluded from the note
    * link by the digits guard on both engines (no try_cast: DuckDB
    * parses underscore separators where Spark nulls, so a bare cast
    * would diverge). The two 1-row aggregate legs fold with the
    * whitelisted single-row crossJoin, then explode(array(struct..))
    * into the three summary rows (never stack() — CodegenFallback). */
  def summaryDtol(s: SparkSession, dir: String): DataFrame = {
    val docs = dwhRecords(s, dir).filter(col("error_message").isNull)
      .withColumn("k", expr("cast(substring(accession, 4) as bigint)"))
    val statusAgg = docs.agg(
      sum(when(col("tracking_system") =!= "Submitted to BioSamples", 1L)
        .otherwise(0L)).as("n_asm"),
      sum(when(col("k") % 4 === 0, 1L).otherwise(0L)).as("n_ann"))
    val noteTax = genomeNotes(s, dir).select(col("tax_id"))
    val gn = docs
      .withColumn("tax_id", expr(
        "case when dwh_key rlike '^[0-9]+$' " +
        "then cast(dwh_key as bigint) % 97 end"))
      .filter(col("tax_id").isNotNull)
      .join(broadcast(noteTax), Seq("tax_id"), "left_semi")
      .agg(countDistinct(col("organism")).as("n_gn"))
    statusAgg.crossJoin(gn)
      .select(explode(array(
        struct(lit("Assemblies - Submitted").as("summary_key"),
          col("n_asm").as("doc_count")),
        struct(lit("Annotation Complete").as("summary_key"),
          col("n_ann").as("doc_count")),
        struct(lit("Genome Notes").as("summary_key"),
          col("n_gn").as("doc_count")))).as("r"))
      .select(col("r.summary_key").as("summary_key"),
        col("r.doc_count").as("doc_count"))
  }

  /** End-to-end METADATA-DAG composition — the beam pipeline's actual
    * task order (my_pipeline.py:1-158, biodiversity_metadata_dag.py:
    * parse_data_records → classify_samples → portal/DWH record build →
    * related-data collection → summary index update) run as ONE query
    * per accession, the metadata sibling of
    * [[graft.operators.DomainQueries.bioIngestPipeline]]:
    *   1. classify + DWH resolve ([[dwhRecords]] — classify_samples'
    *      specimen/symbiont/metagenome fork plus the host-walk lookup
    *      joins; its error_message column IS the reference's
    *      TaggedOutput("Errors") dead-letter side output) — the one
    *      corpus-sized scan, checkpointed ONCE and consumed by both the
    *      record rows and the summary-facet leg;
    *   2. related-data collection (parse_data_records,
    *      common_functions.py:38-54: experiments/assemblies/analyses/
    *      images per sample) — ONE orders aggregate, the
    *      [[portalRecords]] experiments shuffle and the
    *      [[DomainQueries.metaCollectRelated]] rollup fused;
    *   3. summary contribution (update_summary_index.py:20-63): the
    *      top-20 phylogeny facet set recomputed from the resolved
    *      records (vocabulary-sized → broadcast back against the rows).
    * Each accession is classified by its FIRST failing DAG stage
    * (dead_letter > blocked > no_related_data > indexed — the
    * bioIngestPipeline / textCurationVerdict composition discipline;
    * `blocked` is [[taxonRollup]]'s pathogen deny-list,
    * map_functions.py:796-798), and the oracle nests the components'
    * own oracle SQL as CTEs (DWH_SQL twice → AS MATERIALIZED per the
    * CTE-inlining landmine). At 100 TB: one record scan + one orders
    * shuffle; the facet set is 50 rows and broadcasts. */
  def metaIngestPipeline(s: SparkSession, dir: String): DataFrame = {
    val dwh = dwhRecords(s, dir).transform(graft.Ckpt.capped)
    val rel = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_related"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("n_analyses"),
        max(col("o_orderpriority") === "1-URGENT").as("images_available"))
    val topPhy = dwh.filter(col("error_message").isNull)
      .groupBy("organism").agg(count(lit(1)).as("doc_count"))
      .orderBy(col("doc_count").desc, col("organism")).limit(20)
      .select(col("organism"), lit(true).as("in_top"))
    dwh
      .withColumn("k", expr("cast(substring(accession, 4) as bigint)"))
      .join(rel, Seq("k"), "left_outer")
      .join(broadcast(topPhy), Seq("organism"), "left_outer")
      .select(col("accession"), col("sample_type"), col("organism"),
        col("dwh_key"), col("tracking_system").as("tracking_status"),
        coalesce(col("n_related"), lit(0L)).as("n_related"),
        coalesce(col("n_analyses"), lit(0L)).as("n_analyses"),
        coalesce(col("images_available"), lit(false)).as("images_available"),
        coalesce(col("in_top"), lit(false)).as("in_top_phylogeny"),
        when(col("error_message").isNotNull, "dead_letter")
          .when(col("dwh_key").isin("624", "1773", "2697049"), "blocked")
          .when(coalesce(col("n_related"), lit(0L)) === 0, "no_related_data")
          .otherwise("indexed").as("status"))
  }

  /** Bitemporal AS-OF query — the lakehouse primitive [[metaScd2History]]
    * (valid time only) and [[dataSnapshotDiff]] (transaction time only)
    * both approximate: every order is a VERSION of its customer's
    * record with valid_from = the order date and txn_from = the date
    * the version was COMMITTED (synthesized late-arrival lag of
    * orderkey % 7 days — deterministic, so the oracle replays it).
    * "What did we believe on T about the state at V?" = per customer
    * the version with the greatest (valid_from, txn_from, orderkey)
    * among those with valid_from ≤ V and txn_from ≤ T — one max_by
    * HASH aggregate (the dedupRecords discipline: map-side combined,
    * never a row_number sort shuffle), plus the visible-version count.
    * Late-arriving versions are exactly the rows a naive valid-time
    * query would wrongly include: txn_from > T while valid_from ≤ V. */
  def metaBitemporalAsof(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("valid_from"),
        date_add(col("o_orderdate").cast("date"),
          (col("o_orderkey") % 7).cast("int")).as("txn_from"),
        col("o_totalprice"))
      .filter(col("valid_from") <= lit("1998-06-01").cast("date") &&
        col("txn_from") <= lit("1998-06-03").cast("date"))
      .groupBy("custkey")
      .agg(count(lit(1)).as("n_visible"),
        max_by(struct(col("o_orderkey"), col("valid_from"), col("txn_from"),
            col("o_totalprice")),
          struct(col("valid_from"), col("txn_from"), col("o_orderkey")))
          .as("b"))
      .select(col("custkey"), col("n_visible"),
        col("b.o_orderkey").as("version_key"),
        col("b.valid_from").as("valid_from"),
        col("b.txn_from").as("txn_from"),
        col("b.o_totalprice").as("totalprice"))

  private val BITEMPORAL_SQL =
    """WITH v AS (
      |  SELECT o_custkey AS custkey, o_orderkey,
      |    CAST(o_orderdate AS DATE) AS valid_from,
      |    CAST(o_orderdate AS DATE)
      |      + to_days(CAST(o_orderkey % 7 AS INTEGER)) AS txn_from,
      |    o_totalprice
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE) <= DATE '1998-06-01'
      |    AND CAST(o_orderdate AS DATE)
      |      + to_days(CAST(o_orderkey % 7 AS INTEGER)) <= DATE '1998-06-03'),
      |r AS (
      |  SELECT *, CAST(COUNT(*) OVER (PARTITION BY custkey) AS BIGINT)
      |      AS n_visible,
      |    ROW_NUMBER() OVER (PARTITION BY custkey
      |      ORDER BY valid_from DESC, txn_from DESC, o_orderkey DESC) AS rn
      |  FROM v)
      |SELECT custkey, n_visible, o_orderkey AS version_key,
      |  valid_from, txn_from, o_totalprice AS totalprice
      |FROM r WHERE rn = 1""".stripMargin

  /** Snapshot change-set — the incremental re-index primitive behind the
    * reference's periodic index refreshes: instead of republishing the
    * whole corpus (AliasPublish's full-rebuild path), diff the new
    * snapshot against the old by content hash and ship only
    * added/removed/changed keys. One full-outer hash join on the key;
    * payloads never leave their scan (only the md5 travels), so the
    * shuffle carries 16 bytes per row at any document size. */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame,
                    key: String, payload: String): DataFrame = {
    // presence markers, not hash nullability: md5(NULL) is NULL, so a
    // NULL payload would otherwise read as an absent ROW and misclassify
    // (a key present on both sides with NULL payloads is unchanged —
    // the null-safe <=> hash compare handles that)
    val o = oldDf.select(col(key),
      md5(col(payload).cast("binary")).as("oh"), lit(1).as("op"))
    val n = newDf.select(col(key),
      md5(col(payload).cast("binary")).as("nh"), lit(1).as("np"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("change", when(col("op").isNull, "added")
        .when(col("np").isNull, "removed")
        .when(!(col("oh") <=> col("nh")), "changed"))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** diffSnapshots demo on a deterministic edit of `documents`: drop
    * %13 ids, edit %7 texts, add %11 ids mirrored to -(id+1) — the
    * negative mirror cannot collide with a real doc_id at ANY corpus
    * size, unlike a fixed additive shift. */
  def dataSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val old = t(s, dir, "documents")
    val nw = old.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(old.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", -col("doc_id") - 1))
    diffSnapshots(old, nw, "doc_id", "text")
  }

  private val DIFF_SQL =
    """WITH oldt AS (SELECT doc_id, md5(text) AS oh, 1 AS op FROM documents),
      |newt AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS nh,
      |    1 AS np
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1, md5(text), 1 FROM documents WHERE doc_id % 11 = 0)
      |SELECT doc_id,
      |  CASE WHEN op IS NULL THEN 'added' WHEN np IS NULL THEN 'removed'
      |       WHEN oh IS DISTINCT FROM nh THEN 'changed' END AS change
      |FROM oldt FULL OUTER JOIN newt USING (doc_id)
      |WHERE (CASE WHEN op IS NULL THEN 'added' WHEN np IS NULL THEN 'removed'
      |            WHEN oh IS DISTINCT FROM nh THEN 'changed' END) IS NOT NULL""".stripMargin

  /** Referential-integrity audit over the star schema's foreign keys —
    * the data-quality gate an ingestion pipeline runs before publishing
    * a snapshot (the reference's dead-letter splits catch BROKEN rows;
    * this catches broken RELATIONSHIPS — an annotation pointing at a
    * taxon that never arrived): for each FK edge, total rows, orphan
    * rows (no parent), and distinct orphan keys. Each edge is one
    * left-anti count — small parents (customer/supplier/part) broadcast;
    * the lineitem→orders edge shuffles on the key as it must at scale.
    * All four audits union into one ≤4-row report; a healthy snapshot
    * reads zeros, and the spec proves the non-zero path on planted
    * orphans. */
  def metaFkAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(rel: String, fk: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String, bcast: Boolean): DataFrame = {
      val p = parent.select(col(pkey).as(key)).distinct()
      val orphans = child.select(col(key))
        .join(if (bcast) broadcast(p) else p, Seq(key), "left_anti")
      val totals = child.agg(count(lit(1)).as("n_rows"))
      orphans.agg(count(lit(1)).as("n_orphans"),
          countDistinct(col(key)).as("n_orphan_keys"))
        .crossJoin(totals)
        .select(lit(rel).as("relation"), lit(fk).as("fk"),
          col("n_rows"), col("n_orphans"), col("n_orphan_keys"))
    }
    val li = t(s, dir, "lineitem")
    audit("lineitem", "l_partkey", li, "l_partkey",
        t(s, dir, "part"), "p_partkey", bcast = true)
      .unionAll(audit("lineitem", "l_suppkey", li, "l_suppkey",
        t(s, dir, "supplier"), "s_suppkey", bcast = true))
      .unionAll(audit("lineitem", "l_orderkey", li, "l_orderkey",
        t(s, dir, "orders"), "o_orderkey", bcast = false))
      .unionAll(audit("orders", "o_custkey", t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer"), "c_custkey", bcast = true))
  }

  private val FK_SQL = {
    def one(rel: String, fk: String, child: String, parent: String, pkey: String) =
      s"""SELECT '$rel' AS relation, '$fk' AS fk,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_orphans,
         |  CAST(COUNT(DISTINCT $fk) AS BIGINT) AS n_orphan_keys
         |FROM $child c WHERE NOT EXISTS (
         |  SELECT 1 FROM $parent p WHERE p.$pkey = c.$fk)""".stripMargin
    Seq(
      one("lineitem", "l_partkey", "lineitem", "part", "p_partkey"),
      one("lineitem", "l_suppkey", "lineitem", "supplier", "s_suppkey"),
      one("lineitem", "l_orderkey", "lineitem", "orders", "o_orderkey"),
      one("orders", "o_custkey", "orders", "customer", "c_custkey")
    ).mkString("\nUNION ALL\n")
  }

  /** Per-column statistical profile of the orders snapshot — the
    * analyze-table / data-quality profiler every pipeline runs before
    * publishing (null density, distinct cardinality, value range per
    * column), deequ-shaped but exact. All six columns profile in ONE
    * scan: a single aggregate computes every (n_null, n_distinct,
    * min, max) tuple (the multi-count-distinct plans as one Expand —
    * 6× row replication in-place, still one pass and one exchange),
    * then explode(array(struct…)) unpivots the 1-row aggregate into
    * 6 rows — NOT Stack(), which is CodegenFallback and would drag
    * the whole aggregate output into interpreted eval. min/max render
    * through type-stable casts (bigint→string, double→DECIMAL(18,2)
    * →string, timestamp→date→string) so both engines print identical
    * text. */
  def metaColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def stats(c: String, render: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      render(min(col(c))).cast("string").as(s"mn_$c"),
      render(max(col(c))).cast("string").as(s"mx_$c"))
    val ident = (x: org.apache.spark.sql.Column) => x
    val money = (x: org.apache.spark.sql.Column) => x.cast("decimal(18,2)")
    val day = (x: org.apache.spark.sql.Column) => x.cast("date")
    val cols = Seq(
      "o_orderkey" -> ident, "o_custkey" -> ident, "o_orderstatus" -> ident,
      "o_totalprice" -> money, "o_orderdate" -> day, "o_orderpriority" -> ident)
    // One aggregate per column, unioned — NOT one fused aggregate: six
    // exact countDistincts in a single agg trigger the multi-distinct
    // Expand rewrite (every row × 7 groupings, wide keys), measured
    // 3.25 s at sf0.1; six independent 2-step distinct legs over the
    // cheap column-pruned scans run 0.67 s. Each leg reads ONE column.
    cols.map { case (c, r) =>
      o.select(col(c))
        .agg(count(lit(1)).as("n_rows"), stats(c, r): _*)
        .select(lit(c).as("col_name"), col("n_rows"),
          col(s"nn_$c").as("n_null"), col(s"nd_$c").as("n_distinct"),
          col(s"mn_$c").as("min_v"), col(s"mx_$c").as("max_v"))
    }.reduce(_ unionByName _)
  }

  private val PROFILE_SQL = {
    def leg(c: String, renderMin: String, renderMax: String) =
      s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST($renderMin AS VARCHAR) AS min_v,
         |  CAST($renderMax AS VARCHAR) AS max_v
         |FROM orders""".stripMargin
    Seq(
      leg("o_orderkey", "MIN(o_orderkey)", "MAX(o_orderkey)"),
      leg("o_custkey", "MIN(o_custkey)", "MAX(o_custkey)"),
      leg("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
      leg("o_totalprice", "MIN(CAST(o_totalprice AS DECIMAL(18,2)))",
        "MAX(CAST(o_totalprice AS DECIMAL(18,2)))"),
      leg("o_orderdate", "CAST(MIN(o_orderdate) AS DATE)", "CAST(MAX(o_orderdate) AS DATE)"),
      leg("o_orderpriority", "MIN(o_orderpriority)", "MAX(o_orderpriority)")
    ).mkString("\nUNION ALL\n")
  }

  /** CDC apply — collapse a keyed change log to final table state, the
    * incremental sibling of [[dataSnapshotDiff]] (models the reference's
    * periodic index re-upserts, update_summary_index.py shape, as
    * last-write-wins MERGE semantics). The events stream is read as the
    * change log: user_id is the record key, `error` events are deletes,
    * everything else upserts its payload; (ts, event_id) is the total
    * change order, so replays are idempotent. A key survives iff its
    * LATEST change is not a delete. Plan: ONE exchange on the key; the
    * latest-change rank and the per-key change count share its sort. */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val log = DomainQueries.events(s, dir).select(
      col("user_id").as("ukey"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      col("event_type"), col("value"), col("ts_ns"), col("event_id"))
    val byKey = org.apache.spark.sql.expressions.Window.partitionBy("ukey")
    val latest = byKey.orderBy(col("ts_ns").desc, col("event_id").desc)
    log
      .withColumn("rn", row_number().over(latest))
      .withColumn("n_changes", count(lit(1)).over(byKey))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("ukey"), col("event_type").as("last_type"),
        col("value").as("last_val"), col("ts_ns").as("last_ts_ns"),
        col("n_changes"))
  }

  /** k-anonymity audit over the documents corpus — the re-identification
    * risk readout next to [[metaPseudonymizeAudit]]'s hashing audit and
    * Analytics.dataDpCounts' noisy release: rows fall into equivalence
    * classes on the quasi-identifier tuple (source, lang,
    * floor-log2(n_chars) — the attributes a release inevitably keeps),
    * and for each standard threshold k ∈ {2, 5, 10, 20} the audit
    * reports how many classes and rows sit BELOW k (re-identifiable by
    * an adversary who knows the QI values) plus the suppression cost of
    * enforcing k. risk_milli = at-risk rows per thousand. A release is
    * k-anonymous iff n_classes_below = 0 at that k. Flags use
    * when/otherwise-0 (the NULL-poisoned conditional-sum landmine).
    * Plan: ONE data-sized (QI-tuple) aggregate, then a ×4 threshold
    * scatter over the class-size table and a 4-row fold — class count
    * is bounded by |sources|·|langs|·64, so everything after the first
    * exchange is dimension-sized at any corpus. */
  def dataKAnonymity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), col("lang"),
        expr("cast(length(bin(n_chars)) - 1 as bigint)").as("len_bits"))
      .groupBy("source", "lang", "len_bits").agg(count(lit(1)).as("sz"))
      .select(explode(expr("array(2L,5L,10L,20L)")).as("k"), col("sz"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"), sum("sz").as("n_rows"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L))
          .as("n_classes_below"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
          .as("n_rows_at_risk"),
        min("sz").as("min_class_size"))
      .select(col("k"), col("n_classes"), col("n_classes_below"),
        col("n_rows_at_risk"), col("min_class_size"),
        expr("n_rows_at_risk * 1000 div n_rows").as("risk_milli"),
        (col("n_classes_below") === 0L).as("is_k_anonymous"))

  /** l-diversity audit — the attribute-disclosure companion of
    * [[dataKAnonymity]]'s re-identification gate (k-anonymity bounds
    * WHO a row could be; l-diversity bounds WHAT the class leaks: a
    * class whose sensitive values are all equal discloses the
    * attribute even at k=1000): same quasi-identifier classes
    * (source, lang, len_bits), sensitive stand-in = the document's
    * leading token (deterministic, the diagnosis-column shape). Per
    * class: distinct-l, and ENTROPY-l on the exact lattice — H·1024 =
    * Σ c·Log2Fp(n, c) div n (the Log2Fp likelihood-lattice expression
    * again: 1024·log₂(n/c) in pure integers, one floor at the end; the
    * DuckDB twin replays the identical squaring fold). Flags at the
    * classic l = 3: distinct ≥ 3 and H ≥ log₂3 (1625/1024). Plan: one
    * (class, sensitive) agg, one class agg — two exchanges. */
  def dataLDiversity(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "documents")
      .select(col("source"), col("lang"),
        expr("cast(length(bin(n_chars)) - 1 as bigint)").as("len_bits"),
        expr("split(text, ' ')[0]").as("sensitive"))
      .groupBy("source", "lang", "len_bits", "sensitive")
      .agg(count(lit(1)).as("c"))
    val cls = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "lang", "len_bits")
    cells
      .withColumn("n", sum("c").over(cls))
      .withColumn("term", col("c") * graft.functions.Log2Fp(col("n"), col("c")))
      .groupBy("source", "lang", "len_bits")
      .agg(max("n").as("class_size"),
        count(lit(1)).as("l_distinct"),
        expr("sum(term) div max(n)").as("entropy_1024"))
      .select(col("source"), col("lang"), col("len_bits"),
        col("class_size"), col("l_distinct"), col("entropy_1024"),
        (col("l_distinct") >= 3L).as("meets_distinct_l3"),
        (col("entropy_1024") >= 1625L).as("meets_entropy_l3"))
  }

  private val L_DIV_SQL =
    """WITH cells AS (
      |  SELECT source, lang,
      |    CAST(LENGTH(bin(n_chars)) - 1 AS BIGINT) AS len_bits,
      |    string_split(text, ' ')[1] AS sensitive,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2, 3, 4),
      |wn AS (
      |  SELECT *, CAST(SUM(c) OVER (PARTITION BY source, lang, len_bits)
      |    AS BIGINT) AS n
      |  FROM cells),
      |tm AS (
      |  SELECT source, lang, len_bits, c, n,
      |    c * ((length(bin(n // c)) - 1) * 1024 + list_reduce(list_prepend(
      |      [(n // (c * (CAST(1 AS BIGINT) << (length(bin(n // c)) - 1))))
      |         * 1073741824
      |       + ((n % (c * (CAST(1 AS BIGINT) << (length(bin(n // c)) - 1))))
      |         * 1073741824)
      |         // (c * (CAST(1 AS BIGINT) << (length(bin(n // c)) - 1))),
      |       CAST(0 AS BIGINT)],
      |      list_transform(range(1, 11),
      |        i -> [CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
      |      (acc, x) ->
      |        CASE WHEN (acc[1] * acc[1]) // 1073741824 >= 2147483648
      |        THEN [((acc[1] * acc[1]) // 1073741824) // 2, acc[2] * 2 + 1]
      |        ELSE [(acc[1] * acc[1]) // 1073741824, acc[2] * 2]
      |        END)[2]) AS term
      |  FROM wn)
      |SELECT source, lang, len_bits,
      |  CAST(MAX(n) AS BIGINT) AS class_size,
      |  CAST(COUNT(*) AS BIGINT) AS l_distinct,
      |  CAST(SUM(term) AS BIGINT) // MAX(n) AS entropy_1024,
      |  COUNT(*) >= 3 AS meets_distinct_l3,
      |  CAST(SUM(term) AS BIGINT) // MAX(n) >= 1625 AS meets_entropy_l3
      |FROM tm GROUP BY 1, 2, 3""".stripMargin

  private val K_ANON_SQL =
    """WITH cls AS (
      |  SELECT source, lang,
      |    CAST(LENGTH(bin(n_chars)) - 1 AS BIGINT) AS len_bits,
      |    CAST(COUNT(*) AS BIGINT) AS sz
      |  FROM documents GROUP BY 1, 2, 3)
      |SELECT kk.k AS k, CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(CASE WHEN sz < kk.k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_classes_below,
      |  CAST(SUM(CASE WHEN sz < kk.k THEN sz ELSE 0 END) AS BIGINT)
      |    AS n_rows_at_risk,
      |  CAST(MIN(sz) AS BIGINT) AS min_class_size,
      |  CAST(SUM(CASE WHEN sz < kk.k THEN sz ELSE 0 END) * 1000
      |    // SUM(sz) AS BIGINT) AS risk_milli,
      |  SUM(CASE WHEN sz < kk.k THEN 1 ELSE 0 END) = 0 AS is_k_anonymous
      |FROM cls, (SELECT unnest([2, 5, 10, 20]) AS k) kk
      |GROUP BY 1""".stripMargin

  /** Deterministic key pseudonymization + the audit that licenses it —
    * the privacy-preserving ETL shape (share a dataset without raw
    * customer keys, keep it JOINABLE): every c_custkey maps to a salted
    * 48-bit md5-prefix token ('pseu:' salt — its OWN hash stream per
    * the one-salt-per-operator rule), and the single-row audit proves
    * the mapping is fit to publish: token count equals key count (no
    * collisions at this corpus; 48 bits ⇒ birthday ~2^24 keys — redo
    * with a longer prefix past that), and the orders⋈customer row count
    * on tokens equals the count on raw keys (referential integrity
    * survives the rewrite). Plan: tokenization is a codegen projection;
    * the audit costs one dual-distinct expand over the dim, two
    * broadcast joins (customer is a dim — the fact never shuffles), and
    * whitelisted 1×1 crossJoins where the single-row folds meet. */
  def metaPseudonymizeAudit(s: SparkSession, dir: String): DataFrame = {
    def tok(k: String): String =
      s"substring(md5(cast(concat('pseu:', cast($k as string)) as binary)), 1, 12)"
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), expr(tok("c_custkey")).as("token"))
    val keys = cust.agg(countDistinct(col("c_custkey")).as("n_keys"),
      countDistinct(col("token")).as("n_tokens"))
    val raw = t(s, dir, "orders")
      .join(broadcast(cust.select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("n_joined_raw"))
    val viaTok = t(s, dir, "orders")
      .select(expr(tok("o_custkey")).as("token"))
      .join(broadcast(cust.select("token")), Seq("token"))
      .agg(count(lit(1)).as("n_joined_tok"))
    keys.crossJoin(broadcast(raw)).crossJoin(broadcast(viaTok))
      .select(col("n_keys"), col("n_tokens"),
        expr("n_keys - n_tokens").as("collisions"),
        col("n_joined_raw"), col("n_joined_tok"),
        expr("cast(case when n_keys = n_tokens" +
          " and n_joined_raw = n_joined_tok then 1 else 0 end as bigint)")
          .as("publishable"))
  }

  /** Right-to-be-forgotten cascade audit — the OTHER half of the
    * privacy surface next to [[metaPseudonymizeAudit]]'s share path:
    * given an erasure list (customers with c_custkey ≡ 0 mod 97 — the
    * operationally-small forget-me set), the per-relation blast radius
    * of honoring it: customer rows erased directly, orders erased
    * because their customer is listed, lineitems erased because their
    * ORDER is — the two-hop cascade a flat predicate push cannot
    * express, resolved by MEMBERSHIP joins (the erase-list is a list,
    * not a predicate, in production). Plan: the list broadcasts into a
    * customer flag fold and an orders semi-join; the erased-orders key
    * set is fact-sized, so the lineitem leg is the one fact-fact
    * shuffle (the meta_fk_audit shape); three single-row reports union.
    */
  def metaErasureCascade(s: SparkSession, dir: String): DataFrame = {
    val victims = t(s, dir, "customer")
      .filter(col("c_custkey") % 97 === 0).select("c_custkey")
    val custRep = t(s, dir, "customer")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("c_custkey") % 97 === 0, 1L).otherwise(0L))
          .as("n_erased"))
      .select(lit("customer").as("rel"), col("n_rows"), col("n_erased"))
    val erasedOrders = t(s, dir, "orders")
      .join(broadcast(victims), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .select("o_orderkey")
    val orderRep = t(s, dir, "orders")
      .join(broadcast(victims), col("o_custkey") === col("c_custkey"),
        "left_outer")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L))
          .as("n_erased"))
      .select(lit("orders").as("rel"), col("n_rows"), col("n_erased"))
    val lineRep = t(s, dir, "lineitem")
      .join(erasedOrders.withColumn("hit", lit(1L)),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("hit"), lit(0L))).as("n_erased"))
      .select(lit("lineitem").as("rel"), col("n_rows"), col("n_erased"))
    custRep.union(orderRep).union(lineRep)
      .select(col("rel"), col("n_rows"), col("n_erased"),
        expr("n_erased * 1000 div n_rows").as("erased_milli"))
  }

  private val ERASURE_SQL =
    """WITH v AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |c AS (SELECT 'customer' AS rel, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |        CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
      |          AS BIGINT) AS n_erased
      |      FROM customer),
      |eo AS (SELECT o_orderkey FROM orders
      |       WHERE o_custkey IN (SELECT c_custkey FROM v)),
      |o AS (SELECT 'orders' AS rel, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |        CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM v)
      |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_erased
      |      FROM orders),
      |l AS (SELECT 'lineitem' AS rel, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |        CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM eo)
      |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_erased
      |      FROM lineitem),
      |u AS (SELECT * FROM c UNION ALL SELECT * FROM o
      |      UNION ALL SELECT * FROM l)
      |SELECT rel, n_rows, n_erased,
      |  n_erased * 1000 // n_rows AS erased_milli
      |FROM u""".stripMargin

  /** Merge-on-read deletion vectors — the Iceberg/Delta DV layout that
    * makes [[metaErasureCascade]]-style deletes cheap at 100 TB: instead
    * of rewriting a 64-row data file to drop its victims, the delete
    * ships as a per-file BITMAP the reader ANDs out at scan time. Files
    * are modeled as 64-row shards (shard = doc_id div 64, position =
    * doc_id % 64), the victim list is the doc_id ≡ 0 mod 53 erasure
    * set, and each shard's bitmap packs as two 32-bit words (sum of
    * distinct shiftleft(1, pos%32) — positions are unique within a
    * word, so the sum IS the bitwise-or, and a 32-bit word can never
    * hit DuckDB's BIGINT-overflow check the way bit 63 would). The
    * popcount audit column re-derives the deleted count from the bits —
    * a corrupt vector shows as bit_count ≠ n_deleted. Plan: ONE
    * (shard, word) partial-agg exchange; everything is a projection on
    * the scan. */
  def metaDeletionVectors(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(expr("doc_id div 64").as("shard"),
        expr("(doc_id % 64) div 32").as("word"),
        expr("cast(doc_id % 32 as int)").as("pos"),
        expr("case when doc_id % 53 = 0 then 1L else 0L end").as("victim"))
      .groupBy("shard", "word")
      .agg(count(lit(1)).as("n_rows"), sum("victim").as("n_deleted"),
        sum(expr("victim * shiftleft(1L, pos)")).as("dv_bits"))
      .select(col("shard"), col("word"), col("n_rows"), col("n_deleted"),
        col("dv_bits"),
        expr("cast(bit_count(dv_bits) as bigint)").as("popcount"))

  private val DV_SQL =
    """WITH d AS (
      |  SELECT doc_id // 64 AS shard, (doc_id % 64) // 32 AS word,
      |    doc_id % 32 AS pos,
      |    CASE WHEN doc_id % 53 = 0 THEN 1 ELSE 0 END AS victim
      |  FROM documents)
      |SELECT shard, word, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(victim) AS BIGINT) AS n_deleted,
      |  CAST(SUM(victim * (1::BIGINT << pos)) AS BIGINT) AS dv_bits,
      |  CAST(bit_count(CAST(SUM(victim * (1::BIGINT << pos)) AS BIGINT))
      |    AS BIGINT) AS popcount
      |FROM d GROUP BY 1, 2""".stripMargin

  /** Merkle-style shard checksum manifest — the cheap
    * change-detection layout replication and backup tools diff INSTEAD
    * of re-reading data: per 64-row shard, the row count and the
    * bit_xor of each row's 52-bit salted content hash ('ck:' salt);
    * the GROUPING SETS total row is the root digest, and xor's
    * associativity makes the invariant auditable — the root must equal
    * the xor of the shard digests (spec-checked), and any single-row
    * change flips exactly one shard digest AND the root. Plan: one
    * expand aggregate (shard + total grouping sets share the scan),
    * hashes only — text never shuffles. */
  def metaShardChecksums(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(expr("doc_id div 64").as("shard"),
        expr("cast(conv(substring(md5(cast(concat('ck:', text) as binary)), 1, 13), 16, 10) as bigint)").as("h"))
      .rollup("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))

  private val CHECKSUM_SQL =
    """WITH d AS (
      |  SELECT doc_id // 64 AS shard,
      |    ('0x' || substr(md5('ck:' || text), 1, 13))::BIGINT AS h
      |  FROM documents)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(bit_xor(h) AS BIGINT) AS digest
      |FROM d GROUP BY ROLLUP(shard)""".stripMargin

  /** Tamper-evident hash chain — the ORDER-SENSITIVE integrity layer
    * [[metaShardChecksums]]'s xor manifest deliberately isn't (xor is
    * commutative: a reordered or swapped-pair shard keeps its digest;
    * a chain h_i = md5(h_{i-1} ∥ md5('hc:'∥row_i)) breaks on ANY
    * reorder, insert or edit): each 64-row shard folds its doc_id-
    * ordered row hashes into one chain head, and the root row chains
    * the shard heads in shard order — the audit-log / ledger
    * checkpoint shape, sequential only WITHIN a 64-row shard (the
    * fold is a bounded interpreted HOF off the hot path; shards
    * parallelize freely, the lengthDeciles-class justification).
    * Plan: one shard aggregate + a single-row root fold union. */
  def metaHashChain(s: SparkSession, dir: String): DataFrame = {
    val rows = t(s, dir, "documents")
      .select(expr("doc_id div 64").as("shard"), col("doc_id"),
        expr("md5(cast(concat('hc:', text) as binary))").as("h"))
    val shards = rows.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sort_array(collect_list(struct(col("doc_id"), col("h")))).as("xs"))
      .select(col("shard"), col("n_rows"),
        expr("aggregate(xs, '', (acc, x) -> md5(cast(concat(acc, x.h) as binary)))")
          .as("chain"))
      .transform(graft.Ckpt.capped) // root fold + output both read it
    val root = shards
      .agg(sum("n_rows").as("n_rows"),
        sort_array(collect_list(struct(col("shard"), col("chain")))).as("xs"))
      .select(lit(null).cast("long").as("shard"), col("n_rows"),
        expr("aggregate(xs, '', (acc, x) -> md5(cast(concat(acc, x.chain) as binary)))")
          .as("chain"))
    shards.select("shard", "n_rows", "chain").unionByName(root)
  }

  /** Flat articles index build — the update_articles_index.py:20-45
    * shape: portal records carry a nested genome-notes list; each note is
    * exploded to its own article row, enriched by an external publication
    * lookup that can MISS (europepmc pub_year → NULL on no result,
    * update_articles_index.py:22-33), stamped with the constant
    * articleType/journalTitle the reference hardcodes, and denormalized
    * with the parent record's organism — keyed by study_id (the ES _id).
    * Modeled as: notes = orders under their customer parent; the
    * enrichment lookup = max returned-lineitem ship year per order (a
    * genuinely partial relation, so the left-join NULL path is real).
    * Plan: one pub-year aggregate + key joins; dims broadcast at gate
    * scale, equi-shuffles at 100 TB. */
  def articleEnrich(s: SparkSession, dir: String): DataFrame = {
    val pub = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(max(year(col("l_shipdate"))).cast("long").as("pub_year"))
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(pub, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .select(
        concat(lit("PRJ"), col("o_orderkey").cast("string")).as("study_id"),
        col("pub_year"),
        lit("Genome Note").as("article_type"),
        lit("Wellcome Open Res").as("journal_title"),
        concat(lit("sp_"), (col("c_custkey") % 50).cast("string"))
          .as("organism_name"),
        concat(lit("ACC"), col("c_custkey").cast("string")).as("accession"))
  }

  private val ARTICLE_SQL =
    """SELECT 'PRJ' || CAST(o_orderkey AS VARCHAR) AS study_id,
      |  p.pub_year,
      |  'Genome Note' AS article_type,
      |  'Wellcome Open Res' AS journal_title,
      |  'sp_' || CAST(c_custkey % 50 AS VARCHAR) AS organism_name,
      |  'ACC' || CAST(c_custkey AS VARCHAR) AS accession
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |LEFT JOIN (SELECT l_orderkey,
      |             CAST(MAX(year(l_shipdate)) AS BIGINT) AS pub_year
      |           FROM lineitem WHERE l_returnflag = 'R'
      |           GROUP BY l_orderkey) p ON o_orderkey = p.l_orderkey""".stripMargin

  /** Genome-notes assembly — the import_genome_notes.py:parse_genome_notes
    * shape: articles are scanned for study-id links with MULTIPLE
    * candidate parses tried in priority order (the reference's four
    * href-format splits with startswith('PRJ') precedence,
    * import_genome_notes.py:233-253), each study is claimed by the FIRST
    * article that mentions it (visited_studies first-seen dedup), studies
    * resolve through a tax lookup that can miss (parse_study_xml "Tax ID
    * not found" → note dropped), and surviving notes group per tax_id.
    * Modeled on documents: candidates = first 'sc-'/'st-'/'ba-'-prefixed
    * bigram in the text (priority coalesce); first-seen = min doc_id per
    * study; the tax lookup is md5-derived ('gn:' salt — its own stream)
    * with a 1-in-5 deterministic miss so the drop path is exercised.
    * Plan: narrow extraction scan → study agg → per-tax rollup. */
  def genomeNotes(s: SparkSession, dir: String): DataFrame = {
    val cand = t(s, dir, "documents").select(col("doc_id"),
      coalesce(
        expr("nullif(regexp_extract(text, '\\\\b(sc[a-z]+ [a-z]+)', 1), '')"),
        expr("nullif(regexp_extract(text, '\\\\b(st[a-z]+ [a-z]+)', 1), '')"),
        expr("nullif(regexp_extract(text, '\\\\b(ba[a-z]+ [a-z]+)', 1), '')"))
        .as("study_id"))
    cand.filter(col("study_id").isNotNull)
      .groupBy("study_id").agg(min("doc_id").as("first_doc"))
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(concat('gn:', study_id) as binary)), 1, 15), 16, 10) as bigint)"))
      .filter(col("h") % 5 =!= 0) // tax lookup miss drops the note
      .withColumn("tax_id", col("h") % 97)
      .groupBy("tax_id")
      .agg(count(lit(1)).as("n_notes"),
        countDistinct(col("first_doc")).as("n_articles"),
        expr("array_join(sort_array(collect_list(study_id)), ';')")
          .as("studies"))
  }

  private val GENOMENOTES_SQL =
    """WITH cand AS (
      |  SELECT doc_id,
      |    COALESCE(
      |      NULLIF(regexp_extract(text, '\b(sc[a-z]+ [a-z]+)', 1), ''),
      |      NULLIF(regexp_extract(text, '\b(st[a-z]+ [a-z]+)', 1), ''),
      |      NULLIF(regexp_extract(text, '\b(ba[a-z]+ [a-z]+)', 1), ''))
      |      AS study_id
      |  FROM documents),
      |first_seen AS (
      |  SELECT study_id, MIN(doc_id) AS first_doc FROM cand
      |  WHERE study_id IS NOT NULL GROUP BY study_id),
      |looked AS (
      |  SELECT *,
      |    ('0x' || substr(md5('gn:' || study_id), 1, 15))::BIGINT AS h
      |  FROM first_seen)
      |SELECT h % 97 AS tax_id, CAST(COUNT(*) AS BIGINT) AS n_notes,
      |  CAST(COUNT(DISTINCT first_doc) AS BIGINT) AS n_articles,
      |  string_agg(study_id, ';' ORDER BY study_id) AS studies
      |FROM looked WHERE h % 5 != 0
      |GROUP BY h % 97""".stripMargin

  private val HASHCHAIN_SQL =
    """WITH r AS (
      |  SELECT doc_id // 64 AS shard, doc_id,
      |    md5('hc:' || text) AS h
      |  FROM documents),
      |sh AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |         list_reduce(list_prepend('', list(h ORDER BY doc_id)),
      |           (acc, x) -> md5(acc || x)) AS chain
      |       FROM r GROUP BY 1),
      |rt AS (SELECT CAST(NULL AS BIGINT) AS shard,
      |         CAST(SUM(n_rows) AS BIGINT) AS n_rows,
      |         list_reduce(list_prepend('', list(chain ORDER BY shard)),
      |           (acc, x) -> md5(acc || x)) AS chain
      |       FROM sh)
      |SELECT shard, n_rows, chain FROM sh
      |UNION ALL SELECT shard, n_rows, chain FROM rt""".stripMargin

  /** Sketch-based join-size estimation audit — what a query planner does
    * before committing to a join strategy, made a first-class query:
    * the exact |orders ⋈ lineitem| on the date key costs only two
    * key-grain aggregates (Σ_d c_o(d)·c_l(d) — never materialize the
    * join to size it), and the operator compares it against the
    * BUCKETED-histogram estimate at 256 and 4096 md5 buckets
    * (Σ_b c_o(b)·c_l(b)) — the collision-inflated upper bound a
    * fixed-width histogram gives. inflation_milli says how much
    * resolution buys: planners reading 256-bucket stats overestimate
    * exactly this much. All integers; per-date sums fit BIGINT at any
    * scale because the date grain is calendar-bounded. */
  def metaJoinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    // md5 AFTER the count aggregate (r15): h is a pure function of k and
    // the date grain is ~2.4k distinct keys behind ~750k rows at sf0.1,
    // so hashing the aggregate output computes ~300× fewer md5s than
    // hashing per row — the phash dictionary discipline; groupBy(k)
    // ≡ groupBy(k, h) when h = f(k), rows bit-identical.
    def keyed(df: DataFrame, dcol: String): DataFrame = df
      .select(col(dcol).cast("string").as("k"))
      .groupBy("k").agg(count(lit(1)).as("c"))
      .select(col("k"),
        expr("cast(conv(substring(md5(cast(concat('jse:', k) as binary))," +
          " 1, 13), 16, 10) as bigint)").as("h"), col("c"))
    val o = keyed(t(s, dir, "orders"), "o_orderdate").transform(graft.Ckpt.capped)
    val l = keyed(t(s, dir, "lineitem"), "l_shipdate").transform(graft.Ckpt.capped)
    val exact = o.join(l.toDF("k", "h2", "c2"), Seq("k"))
      .agg(sum(expr("c * c2")).as("exact_pairs"),
        count(lit(1)).as("n_shared_keys"))
    def bucketEst(bits: Int): DataFrame = {
      val m = (1 << bits) - 1
      val ob = o.groupBy(expr(s"h & $m").as("b")).agg(sum("c").as("co"))
      val lb = l.groupBy(expr(s"h & $m").as("b")).agg(sum("c").as("cl"))
      ob.join(lb, Seq("b")).agg(sum(expr("co * cl")).as(s"est_b${1 << bits}"))
    }
    exact.crossJoin(broadcast(bucketEst(8)))
      .crossJoin(broadcast(bucketEst(12)))
      .select(col("n_shared_keys"), col("exact_pairs"),
        col("est_b256"), col("est_b4096"),
        expr("est_b256 * 1000 div exact_pairs").as("infl256_milli"),
        expr("est_b4096 * 1000 div exact_pairs").as("infl4096_milli"))
  }

  private val JOIN_EST_SQL =
    """WITH ok AS (
      |  SELECT CAST(o_orderdate AS VARCHAR) AS k,
      |    ('0x' || substr(md5('jse:' || CAST(o_orderdate AS VARCHAR)),
      |      1, 13))::BIGINT AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2),
      |lk AS (
      |  SELECT CAST(l_shipdate AS VARCHAR) AS k,
      |    ('0x' || substr(md5('jse:' || CAST(l_shipdate AS VARCHAR)),
      |      1, 13))::BIGINT AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |ex AS (
      |  SELECT CAST(SUM(ok.c * lk.c) AS BIGINT) AS exact_pairs,
      |    CAST(COUNT(*) AS BIGINT) AS n_shared_keys
      |  FROM ok JOIN lk ON lk.k = ok.k),
      |e256 AS (
      |  SELECT CAST(SUM(co * cl) AS BIGINT) AS est_b256 FROM
      |    (SELECT h & 255 AS b, SUM(c) AS co FROM ok GROUP BY 1) a
      |    JOIN (SELECT h & 255 AS b, SUM(c) AS cl FROM lk GROUP BY 1) b2
      |      ON b2.b = a.b),
      |e4096 AS (
      |  SELECT CAST(SUM(co * cl) AS BIGINT) AS est_b4096 FROM
      |    (SELECT h & 4095 AS b, SUM(c) AS co FROM ok GROUP BY 1) a
      |    JOIN (SELECT h & 4095 AS b, SUM(c) AS cl FROM lk GROUP BY 1) b2
      |      ON b2.b = a.b)
      |SELECT n_shared_keys, exact_pairs, est_b256, est_b4096,
      |  est_b256 * 1000 // exact_pairs AS infl256_milli,
      |  est_b4096 * 1000 // exact_pairs AS infl4096_milli
      |FROM ex, e256, e4096""".stripMargin

  /** Zone-map file pruning as a BOARD query — the end-to-end consumer of
    * [[graft.sources.Manifest]]'s Iceberg/Delta-style scan planning
    * (writeSharded's range layout + _manifest.json was spec-proven but
    * nothing on the board exercised planning-time pruning until now):
    * orders lands once as 16 range-sharded parquet files keyed on
    * o_orderkey under /tmp, then the [4000, 9000] revenue rollup reads
    * ONLY the overlapping shards — the driver touches one small JSON
    * instead of listing and footer-reading all 16 files (O(survivors)
    * planning; ~6 shards survive at sf0.01, ~2 at sf0.1 — the pruning
    * RATIO grows with scale, which is the point). The stale-cache guard
    * rebuilds unless ALL hold: a source fingerprint sidecar matches the
    * source parquet's (size, mtime) — an in-place testdata regen with
    * unchanged row count is a REAL precedent here (2026-08-13, events
    * ts type) and a row-count-only guard would serve stale payloads —
    * AND every manifest shard file still exists (a partially swept /tmp
    * must trigger a rebuild, not a mid-scan PATH_NOT_FOUND). The oracle
    * sees none of this: DuckDB filters the raw table, so the hash match
    * proves pruning loses no rows and admits no strays. SourcesSpec
    * pins the survivor count and the rebuild-vs-reuse transitions. */
  def metaManifestPrune(s: SparkSession, dir: String): DataFrame = {
    val shardDir = "/tmp/graft_zonemap_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + "/orders"
    val src = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val srcPath = java.nio.file.Paths.get(s"$dir/orders.parquet")
    val fingerprint = s"${java.nio.file.Files.size(srcPath)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(srcPath).toMillis}"
    val fpPath = java.nio.file.Paths.get(shardDir, "_source_fingerprint")
    val manifestOk =
      java.nio.file.Files.exists(java.nio.file.Paths.get(shardDir, "_manifest.json")) &&
        java.nio.file.Files.exists(fpPath) &&
        new String(java.nio.file.Files.readAllBytes(fpPath), "UTF-8") == fingerprint &&
        graft.sources.Manifest.readManifest(shardDir).forall(sh =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(
            new java.net.URI(sh.path).getPath)))
    if (!manifestOk) {
      graft.sources.Manifest.writeSharded(src, shardDir, "o_orderkey", 16)
      java.nio.file.Files.write(fpPath, fingerprint.getBytes("UTF-8"))
    }
    graft.sources.Manifest.prunedRead(s, shardDir, "o_orderkey", 4000L, 9000L)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.Determinism.dsum2(col("o_totalprice")).as("revenue"))
  }

  /** MGnify study-id enrichment — the import_mgnify_data.py:24-85 shape:
    * portal records carry a nested metagenomes_records list; each member's
    * biosample accession gets an external study-id lookup that can MISS
    * (get_mgnify_study_id returns None on any error, line 39-41), members
    * that resolve gain mgnify_study_ids, and the PARENT record's
    * update_flag/mgnify_status="true" is set only when ANY member resolved
    * (lines 47-80) — records with no metagenome members are never touched.
    * Modeled as: metagenome members = every third order under its customer
    * parent; the lookup is md5-derived ('mgy:' salt — its own stream) with
    * a deterministic 1-in-3 miss so both the None path and the
    * update-only-when-resolved rollup are exercised. Plan: one member
    * aggregate + a parent key join (AQE-broadcast at gate scale,
    * equi-shuffle at 100 TB); the lookup rides the member scan. */
  def mgnifyEnrich(s: SparkSession, dir: String): DataFrame = {
    val members = t(s, dir, "orders")
      .filter(col("o_orderkey") % 3 === 2)
      .select(col("o_custkey").as("k"),
        concat(lit("SAMEA"), col("o_orderkey").cast("string")).as("biosample_id"))
      .withColumn("h", expr("cast(conv(substring(md5(cast(concat('mgy:'," +
        " biosample_id) as binary)), 1, 15), 16, 10) as bigint)"))
      .withColumn("mgnify_id", when(col("h") % 3 =!= 0,
        concat(lit("MGYS"), (col("h") % 100000).cast("string"))))
    val agg = members.groupBy("k").agg(
      count(lit(1)).as("n_metagenomes"),
      sum(when(col("mgnify_id").isNotNull, 1L).otherwise(0L)).as("n_resolved"),
      expr("array_join(sort_array(collect_list(mgnify_id)), ';')")
        .as("mgnify_study_ids"))
    t(s, dir, "customer").join(agg, col("c_custkey") === col("k"))
      .select(
        concat(lit("ACC"), col("c_custkey").cast("string")).as("accession"),
        concat(lit("sp_"), (col("c_custkey") % 50).cast("string")).as("organism"),
        col("n_metagenomes"), col("n_resolved"), col("mgnify_study_ids"),
        when(col("n_resolved") > 0, "true").otherwise("").as("mgnify_status"))
  }

  private val MGNIFY_SQL =
    """WITH ch AS (
      |  SELECT o_custkey AS k,
      |    'SAMEA' || CAST(o_orderkey AS VARCHAR) AS biosample_id
      |  FROM orders WHERE o_orderkey % 3 = 2),
      |lk AS (
      |  SELECT k,
      |    ('0x' || substr(md5('mgy:' || biosample_id), 1, 15))::BIGINT AS h
      |  FROM ch),
      |r AS (
      |  SELECT k, CASE WHEN h % 3 != 0
      |    THEN 'MGYS' || CAST(h % 100000 AS VARCHAR) END AS mgnify_id
      |  FROM lk),
      |agg AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_metagenomes,
      |    CAST(SUM(CASE WHEN mgnify_id IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_resolved,
      |    COALESCE(string_agg(mgnify_id, ';' ORDER BY mgnify_id), '')
      |      AS mgnify_study_ids
      |  FROM r GROUP BY k)
      |SELECT 'ACC' || CAST(c_custkey AS VARCHAR) AS accession,
      |  'sp_' || CAST(c_custkey % 50 AS VARCHAR) AS organism,
      |  n_metagenomes, n_resolved, mgnify_study_ids,
      |  CASE WHEN n_resolved > 0 THEN 'true' ELSE '' END AS mgnify_status
      |FROM customer JOIN agg ON c_custkey = k""".stripMargin

  /** BioSamples relationship traversal — the
    * collect_metadata_experiments_assemblies.py:109-142 shape: specimens
    * carry "sample derived from" / "sample symbiont of" characteristics
    * (derived-from checked FIRST — the reference's if/elif precedence),
    * hosts are fetched by accession and can MISS (json decode error →
    * skipped, lines 123-125 / 137-139), and a fetched host may itself
    * carry a relationship — the walk here is bounded at 2 hops (each hop
    * a lookup join, the relational analogue of the per-sample HTTP GETs).
    * Synthesized links (derived host = k div 2, symbiont host = k−1,
    * per-type precedence when both flags hold) keep the oracle
    * arithmetic; fetch failure is md5-gated ('rel:' salt, 1-in-7).
    * Statuses: root (no relationship), attached (a root ancestor within
    * 2 hops, with depth), orphan (a hop's host missing or unfetchable),
    * unresolved (chain still non-root at the bound). */
  def sampleRelationships(s: SparkSession, dir: String): DataFrame = {
    def relType(kc: Column): Column =
      when(kc % 2 === 1, "derived_from")
        .when(kc % 3 === 2, "symbiont_of").otherwise("root")
    val base = t(s, dir, "customer").select(col("c_custkey").as("k"))
      .withColumn("rel_type", relType(col("k")))
      .withColumn("h1", expr(
        "CASE WHEN k % 2 = 1 THEN k div 2 WHEN k % 3 = 2 THEN k - 1 END"))
    def look(n: Int) = t(s, dir, "customer").select(col("c_custkey").as(s"hk$n"))
    def fetchOk(name: String): Column =
      expr(s"cast(conv(substring(md5(cast(concat('rel:', $name)" +
        " as binary)), 1, 15), 16, 10) as bigint)") % 7 =!= 0
    val j1 = base.join(look(1), col("h1") === col("hk1"), "left_outer")
      .withColumn("t1", when(col("hk1").isNull, lit(null).cast("string"))
        .otherwise(relType(col("hk1"))))
      .withColumn("h2", expr("CASE WHEN hk1 IS NULL THEN NULL" +
        " WHEN hk1 % 2 = 1 THEN hk1 div 2" +
        " WHEN hk1 % 3 = 2 THEN hk1 - 1 END"))
    val j2 = j1.join(look(2), col("h2") === col("hk2"), "left_outer")
      .withColumn("t2", when(col("hk2").isNull, lit(null).cast("string"))
        .otherwise(relType(col("hk2"))))
      .withColumn("f1", coalesce(fetchOk("h1"), lit(false)))
      .withColumn("f2", coalesce(fetchOk("h2"), lit(false)))
    val status = when(col("rel_type") === "root", "root")
      .when(col("hk1").isNull || !col("f1"), "orphan")
      .when(col("t1") === "root", "attached")
      .when(col("hk2").isNull || !col("f2"), "orphan")
      .when(col("t2") === "root", "attached")
      .otherwise("unresolved")
    val parent = when(col("rel_type") === "root", col("k"))
      .when(col("hk1").isNull || !col("f1"), lit(null).cast("long"))
      .when(col("t1") === "root", col("hk1"))
      .when(col("hk2").isNull || !col("f2"), lit(null).cast("long"))
      .when(col("t2") === "root", col("hk2"))
    val depth = when(col("rel_type") === "root", 0L)
      .when(col("hk1").isNull || !col("f1"), lit(null).cast("long"))
      .when(col("t1") === "root", 1L)
      .when(col("hk2").isNull || !col("f2"), lit(null).cast("long"))
      .when(col("t2") === "root", 2L)
    j2.select(
      concat(lit("ACC"), col("k").cast("string")).as("accession"),
      col("rel_type"), status.as("status"), depth.as("depth"),
      when(parent.isNotNull, concat(lit("ACC"), parent.cast("string")))
        .as("parent_accession"))
  }

  private val RELATIONSHIPS_SQL =
    """WITH c1 AS (SELECT c_custkey AS k FROM customer),
      |b AS (
      |  SELECT k,
      |    CASE WHEN k % 2 = 1 THEN 'derived_from'
      |         WHEN k % 3 = 2 THEN 'symbiont_of' ELSE 'root' END AS rel_type,
      |    CASE WHEN k % 2 = 1 THEN k // 2
      |         WHEN k % 3 = 2 THEN k - 1 END AS h1
      |  FROM c1),
      |j1 AS (
      |  SELECT b.*, x.k AS hk1,
      |    CASE WHEN x.k IS NULL THEN NULL
      |         WHEN x.k % 2 = 1 THEN 'derived_from'
      |         WHEN x.k % 3 = 2 THEN 'symbiont_of' ELSE 'root' END AS t1,
      |    CASE WHEN x.k IS NULL THEN NULL
      |         WHEN x.k % 2 = 1 THEN x.k // 2
      |         WHEN x.k % 3 = 2 THEN x.k - 1 END AS h2
      |  FROM b LEFT JOIN c1 x ON b.h1 = x.k),
      |j2 AS (
      |  SELECT j1.*, y.k AS hk2,
      |    CASE WHEN y.k IS NULL THEN NULL
      |         WHEN y.k % 2 = 1 THEN 'derived_from'
      |         WHEN y.k % 3 = 2 THEN 'symbiont_of' ELSE 'root' END AS t2
      |  FROM j1 LEFT JOIN c1 y ON j1.h2 = y.k),
      |f AS (
      |  SELECT *,
      |    COALESCE(('0x' || substr(md5('rel:' || CAST(h1 AS VARCHAR)), 1, 15))
      |      ::BIGINT % 7 != 0, FALSE) AS f1,
      |    COALESCE(('0x' || substr(md5('rel:' || CAST(h2 AS VARCHAR)), 1, 15))
      |      ::BIGINT % 7 != 0, FALSE) AS f2
      |  FROM j2)
      |SELECT 'ACC' || CAST(k AS VARCHAR) AS accession, rel_type,
      |  CASE WHEN rel_type = 'root' THEN 'root'
      |       WHEN hk1 IS NULL OR NOT f1 THEN 'orphan'
      |       WHEN t1 = 'root' THEN 'attached'
      |       WHEN hk2 IS NULL OR NOT f2 THEN 'orphan'
      |       WHEN t2 = 'root' THEN 'attached'
      |       ELSE 'unresolved' END AS status,
      |  CASE WHEN rel_type = 'root' THEN 0
      |       WHEN hk1 IS NULL OR NOT f1 THEN NULL
      |       WHEN t1 = 'root' THEN 1
      |       WHEN hk2 IS NULL OR NOT f2 THEN NULL
      |       WHEN t2 = 'root' THEN 2 END AS depth,
      |  CASE WHEN rel_type = 'root' THEN 'ACC' || CAST(k AS VARCHAR)
      |       WHEN hk1 IS NULL OR NOT f1 THEN NULL
      |       WHEN t1 = 'root' THEN 'ACC' || CAST(hk1 AS VARCHAR)
      |       WHEN hk2 IS NULL OR NOT f2 THEN NULL
      |       WHEN t2 = 'root' THEN 'ACC' || CAST(hk2 AS VARCHAR)
      |       END AS parent_accession
      |FROM f""".stripMargin

  /** Link-rollup upserts — the import_tol_qc.py:29-43 + import_images.py:
    * 28-41 shape run as ONE query: tolqc links (base/group/name) grouped
    * under tax_id, and BioImage archive file URLs grouped under the NHMUK
    * barcode attribute (only records carrying that attribute contribute,
    * import_images.py:32-34). Both rollups are collect_list-under-key
    * bodies of the ES bulk "index" actions; lists sort for hash
    * stability. Two key-grain aggregates + a union — each
    * partial-aggregates map-side, nothing data-sized crosses beyond its
    * own group key at 100 TB. */
  def linkRollups(s: SparkSession, dir: String): DataFrame = {
    val tolqc = t(s, dir, "part")
      .select((col("p_partkey") % 211).cast("string").as("doc_key"),
        concat(lit("https://tolqc.cog.sanger.ac.uk/"), col("p_brand"),
          lit("/p"), col("p_partkey").cast("string")).as("link"))
      .groupBy("doc_key")
      .agg(count(lit(1)).as("n_links"),
        expr("array_join(sort_array(collect_list(link)), ';')").as("links"))
      .withColumn("rollup_type", lit("tol_qc"))
    val images = t(s, dir, "orders")
      .filter(col("o_orderkey") % 5 === 0)
      .select(concat(lit("NHMUK"), (col("o_custkey") % 97).cast("string"))
          .as("doc_key"),
        concat(lit("https://www.ebi.ac.uk/biostudies/files/S-BIAD588/"),
          col("o_orderkey").cast("string"), lit(".tif")).as("link"))
      .groupBy("doc_key")
      .agg(count(lit(1)).as("n_links"),
        expr("array_join(sort_array(collect_list(link)), ';')").as("links"))
      .withColumn("rollup_type", lit("images"))
    tolqc.unionByName(images)
      .select("rollup_type", "doc_key", "n_links", "links")
  }

  private val LINKROLLUP_SQL =
    """SELECT 'tol_qc' AS rollup_type,
      |  CAST(p_partkey % 211 AS VARCHAR) AS doc_key,
      |  CAST(COUNT(*) AS BIGINT) AS n_links,
      |  string_agg('https://tolqc.cog.sanger.ac.uk/' || p_brand || '/p'
      |    || CAST(p_partkey AS VARCHAR), ';'
      |    ORDER BY 'https://tolqc.cog.sanger.ac.uk/' || p_brand || '/p'
      |    || CAST(p_partkey AS VARCHAR)) AS links
      |FROM part GROUP BY p_partkey % 211
      |UNION ALL
      |SELECT 'images' AS rollup_type,
      |  'NHMUK' || CAST(o_custkey % 97 AS VARCHAR) AS doc_key,
      |  CAST(COUNT(*) AS BIGINT) AS n_links,
      |  string_agg('https://www.ebi.ac.uk/biostudies/files/S-BIAD588/'
      |    || CAST(o_orderkey AS VARCHAR) || '.tif', ';'
      |    ORDER BY 'https://www.ebi.ac.uk/biostudies/files/S-BIAD588/'
      |    || CAST(o_orderkey AS VARCHAR) || '.tif') AS links
      |FROM orders WHERE o_orderkey % 5 = 0
      |GROUP BY 'NHMUK' || CAST(o_custkey % 97 AS VARCHAR)""".stripMargin

  /** Annotations species-file explode — the import_annotations.py:55-126
    * shape: a project is a LIST of species.yaml files, each file's records
    * explode to annotation rows (a record lands in every project whose
    * file list includes its file), each accession resolves a tax_id
    * through a lookup that can MISS (XMLSyntaxError → row skipped, lines
    * 68-72) with two HARD-PINNED accessions surviving the broken-XML path
    * (lines 75-79: GCF_902459465.1→7604, GCF_902652985.1→6579), optional
    * annotation/proteins/transcripts keys default absent (the KeyError
    * ladder, lines 81-105), and surviving rows group per (project,
    * tax_id) into the JSONL bodies. Modeled as: files = the 5 p_mfgr
    * values, project→file config = a 10-row literal dim (broadcast);
    * lookup = md5 ('ann:' salt, 1-in-7 miss); pins at p_partkey 42/99.
    * Plan: broadcast config join riding the part scan + ONE group
    * aggregate. */
  def annotationsExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val config = Seq(
      ("erga", "STANDARD"), ("erga", "LARGE"), ("erga", "MEDIUM"),
      ("dtol", "STANDARD"), ("asg", "PROMO"),
      ("gbdp", "STANDARD"), ("gbdp", "LARGE"), ("gbdp", "MEDIUM"),
      ("gbdp", "PROMO"), ("gbdp", "ECONOMY"), ("gbdp", "SMALL"))
      .toDF("project", "yaml_file")
    val sp = t(s, dir, "part").select(
      col("p_type"), col("p_partkey"), col("p_size"),
      concat(lit("GCA_"), col("p_partkey").cast("string")).as("accession"))
      .withColumn("h", expr("cast(conv(substring(md5(cast(concat('ann:'," +
        " accession) as binary)), 1, 15), 16, 10) as bigint)"))
      .withColumn("tax_id",
        when(col("p_partkey") === 42, 7604L)
          .when(col("p_partkey") === 99, 6579L)
          .when(col("h") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("h") % 9973))
      .filter(col("tax_id").isNotNull)
    sp.join(broadcast(config), col("p_type") === col("yaml_file"))
      .groupBy("project", "tax_id")
      .agg(count(lit(1)).as("n_annotations"),
        sum(when(col("p_size") % 2 === 0, 1L).otherwise(0L)).as("n_with_gtf"),
        sum(when(col("p_size") % 3 === 0, 1L).otherwise(0L)).as("n_with_proteins"),
        sum(when(col("p_size") % 11 === 0 || col("p_size") % 13 === 0, 1L)
          .otherwise(0L)).as("n_browser"),
        expr("array_join(sort_array(collect_list(accession)), ';')")
          .as("accessions"))
  }

  private val ANNOTATIONS_SQL =
    """WITH config(project, yaml_file) AS (VALUES
      |  ('erga', 'STANDARD'), ('erga', 'LARGE'), ('erga', 'MEDIUM'),
      |  ('dtol', 'STANDARD'), ('asg', 'PROMO'),
      |  ('gbdp', 'STANDARD'), ('gbdp', 'LARGE'), ('gbdp', 'MEDIUM'),
      |  ('gbdp', 'PROMO'), ('gbdp', 'ECONOMY'), ('gbdp', 'SMALL')),
      |sp AS (
      |  SELECT p_type, p_partkey, p_size,
      |    'GCA_' || CAST(p_partkey AS VARCHAR) AS accession,
      |    ('0x' || substr(md5('ann:GCA_' || CAST(p_partkey AS VARCHAR)),
      |      1, 15))::BIGINT AS h
      |  FROM part),
      |tx AS (
      |  SELECT *,
      |    CASE WHEN p_partkey = 42 THEN 7604
      |         WHEN p_partkey = 99 THEN 6579
      |         WHEN h % 7 = 0 THEN NULL
      |         ELSE h % 9973 END AS tax_id
      |  FROM sp)
      |SELECT project, tax_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_annotations,
      |  CAST(SUM(CASE WHEN p_size % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_with_gtf,
      |  CAST(SUM(CASE WHEN p_size % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_with_proteins,
      |  CAST(SUM(CASE WHEN p_size % 11 = 0 OR p_size % 13 = 0 THEN 1 ELSE 0
      |    END) AS BIGINT) AS n_browser,
      |  string_agg(accession, ';' ORDER BY accession) AS accessions
      |FROM tx JOIN config ON p_type = yaml_file
      |WHERE tax_id IS NOT NULL
      |GROUP BY project, tax_id""".stripMargin

  /** File-overlap clustering depth — the scan-amplification metric a
    * lakehouse compaction planner reads before rewriting (Delta's
    * clustering-depth / Iceberg's overlap statistics): orders model an
    * ingest-time layout (one file per half-year batch), the probe key is
    * the event day PLUS a ±15-day late-arrival jitter (md5 'ovl:' salt —
    * real streams never land cleanly inside their batch), and the depth
    * at key point p = how many files a point lookup at p must open.
    * Computed as the classic boundary sweep: each file contributes
    * (min, +1) and (max+1, −1), running sum over the sorted boundaries =
    * depth per segment, rolled up to (depth → covered key width). Depth-0
    * rows are coverage GAPS — kept, they are signal. Plan: ONE data-sized
    * (file) aggregate; the sweep windows ride boundary rows bounded by
    * 2×|files| (file count is a layout constant, not corpus-sized). */
  def metaOverlapDepth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = t(s, dir, "orders")
      .select(
        ((year(col("o_orderdate")) - 1995) * 2 +
          when(month(col("o_orderdate")) > 6, 1).otherwise(0))
          .cast("long").as("fid"),
        (expr("datediff(o_orderdate, date'1970-01-01')").cast("long") +
          expr("cast(conv(substring(md5(cast(concat('ovl:', cast(o_orderkey as string))" +
            " as binary)), 1, 15), 16, 10) as bigint) % 31") - 15).as("w"))
      .groupBy("fid").agg(min("w").as("lo"), max("w").as("hi"))
    val ev = files.select(
        explode(array(
          struct(col("lo").as("pos"), lit(1L).as("delta")),
          struct((col("hi") + 1).as("pos"), lit(-1L).as("delta")))).as("e"))
      .select(col("e.pos").as("pos"), col("e.delta").as("delta"))
      .groupBy("pos").agg(sum("delta").as("d"))
    val byPos = Window.orderBy("pos")
    ev.select(col("pos"),
        sum("d").over(byPos.rowsBetween(Window.unboundedPreceding, 0)).as("depth"),
        (lead("pos", 1).over(byPos) - col("pos")).as("width"))
      .filter(col("width").isNotNull)
      .groupBy("depth")
      .agg(sum("width").as("key_width"), count(lit(1)).as("n_segments"))
  }

  private val OVERLAP_SQL =
    """WITH f AS (
      |  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 2
      |      + CASE WHEN EXTRACT(month FROM o_orderdate) > 6 THEN 1 ELSE 0 END
      |      AS fid,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      + (('0x' || substr(md5('ovl:' || CAST(o_orderkey AS VARCHAR)),
      |          1, 15))::BIGINT % 31) - 15 AS w
      |  FROM orders),
      |b AS (SELECT fid, MIN(w) AS lo, MAX(w) AS hi FROM f GROUP BY fid),
      |ev AS (SELECT lo AS pos, CAST(1 AS BIGINT) AS delta FROM b
      |       UNION ALL SELECT hi + 1, -1 FROM b),
      |g AS (SELECT pos, CAST(SUM(delta) AS BIGINT) AS d FROM ev GROUP BY pos),
      |sw AS (SELECT pos,
      |    CAST(SUM(d) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS depth,
      |    LEAD(pos) OVER (ORDER BY pos) - pos AS width
      |  FROM g)
      |SELECT depth, CAST(SUM(width) AS BIGINT) AS key_width,
      |  CAST(COUNT(*) AS BIGINT) AS n_segments
      |FROM sw WHERE width IS NOT NULL
      |GROUP BY depth""".stripMargin

  /** Vacuum planning over the deletion-vector relation — the decision
    * layer on top of [[metaDeletionVectors]]'s bitmaps: per 64-row shard,
    * live/deleted row and byte accounting (n_chars as the byte proxy the
    * manifest carries) and the rewrite decision deleted_milli ≥ 30 (at
    * the modeled 1-in-53 victim rate a shard needs ≥ 2 victims to cross —
    * the threshold actually splits the fleet instead of flagging
    * everything or nothing). Per-shard grain only: a global priority rank
    * would be an unpartitioned window over corpus/64 rows — NOT
    * scale-safe, deliberately omitted. Plan: ONE (shard) partial
    * aggregate; the flags ride the scan. */
  def metaVacuumPlan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(expr("doc_id div 64").as("shard"),
        when(col("doc_id") % 53 === 0, 1L).otherwise(0L).as("victim"),
        col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum("victim").as("n_deleted"),
        sum(expr("case when victim = 1 then 0L else n_chars end")).as("live_chars"),
        sum(expr("case when victim = 1 then n_chars else 0L end")).as("reclaim_chars"))
      .select(col("shard"), col("n_rows"), col("n_deleted"),
        expr("n_deleted * 1000 div n_rows").as("deleted_milli"),
        col("live_chars"), col("reclaim_chars"),
        (expr("n_deleted * 1000 div n_rows") >= 30).as("do_vacuum"))

  private val VACUUM_SQL =
    """WITH d AS (
      |  SELECT doc_id // 64 AS shard,
      |    CASE WHEN doc_id % 53 = 0 THEN 1 ELSE 0 END AS victim, n_chars
      |  FROM documents),
      |sh AS (
      |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(victim) AS BIGINT) AS n_deleted,
      |    CAST(SUM(CASE WHEN victim = 1 THEN 0 ELSE n_chars END) AS BIGINT)
      |      AS live_chars,
      |    CAST(SUM(CASE WHEN victim = 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |      AS reclaim_chars
      |  FROM d GROUP BY shard)
      |SELECT shard, n_rows, n_deleted,
      |  n_deleted * 1000 // n_rows AS deleted_milli,
      |  live_chars, reclaim_chars,
      |  n_deleted * 1000 // n_rows >= 30 AS do_vacuum
      |FROM sh""".stripMargin

  /** GFS snapshot-retention planner — the expiry policy every
    * time-travel table needs next to [[metaVacuumPlan]]'s file sweep:
    * over the table's snapshot history (proxied by the distinct event
    * days), classify each snapshot into grandfather-father-son tiers on
    * the pure day lattice — daily (age < 7), weekly (the LATEST
    * snapshot of its 7-day bucket, age < 56), monthly (latest of its
    * 30-day bucket, age < 360), else expire. Deterministic integer
    * arithmetic only (bucket = day div 7 / div 30 — the policy a
    * catalog can replay idempotently); ships age, tier and the keep
    * flag per snapshot. Plan: one day-distinct exchange; the horizon
    * window and both latest-of-bucket windows ride the ≤|days|-row
    * relation. */
  def metaGfsRetention(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val DAY_NS = 86400000000000L
    val days = DomainQueries.events(s, dir)
      .select(expr(s"ts_ns div $DAY_NS").as("day")).distinct()
      .withColumn("age_days",
        max("day").over(Window.partitionBy()) - col("day"))
      .withColumn("wk_latest",
        row_number().over(Window.partitionBy(expr("day div 7"))
          .orderBy(col("day").desc)) === 1)
      .withColumn("mo_latest",
        row_number().over(Window.partitionBy(expr("day div 30"))
          .orderBy(col("day").desc)) === 1)
    days.select(col("day"), col("age_days"),
      when(col("age_days") < 7, "daily")
        .when(col("wk_latest") && col("age_days") < 56, "weekly")
        .when(col("mo_latest") && col("age_days") < 360, "monthly")
        .otherwise("expire").as("tier"))
      .withColumn("keep", col("tier") =!= "expire")
  }

  private val GFS_SQL =
    """WITH d AS (
      |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day FROM events),
      |g AS (
      |  SELECT day, MAX(day) OVER () - day AS age_days,
      |    ROW_NUMBER() OVER (PARTITION BY day // 7 ORDER BY day DESC) = 1
      |      AS wk_latest,
      |    ROW_NUMBER() OVER (PARTITION BY day // 30 ORDER BY day DESC) = 1
      |      AS mo_latest
      |  FROM d)
      |SELECT day, age_days,
      |  CASE WHEN age_days < 7 THEN 'daily'
      |       WHEN wk_latest AND age_days < 56 THEN 'weekly'
      |       WHEN mo_latest AND age_days < 360 THEN 'monthly'
      |       ELSE 'expire' END AS tier,
      |  CASE WHEN age_days < 7 THEN 'daily'
      |       WHEN wk_latest AND age_days < 56 THEN 'weekly'
      |       WHEN mo_latest AND age_days < 360 THEN 'monthly'
      |       ELSE 'expire' END <> 'expire' AS keep
      |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "meta_gfs_retention" -> (metaGfsRetention _),
    "meta_overlap_depth" -> (metaOverlapDepth _),
    "meta_vacuum_plan" -> (metaVacuumPlan _),
    "meta_mgnify_enrich" -> (mgnifyEnrich _),
    "meta_sample_relationships" -> (sampleRelationships _),
    "meta_link_rollups" -> (linkRollups _),
    "meta_annotations_explode" -> (annotationsExplode _),
    "meta_manifest_prune" -> (metaManifestPrune _),
    "meta_join_size_estimate" -> (metaJoinSizeEstimate _),
    "meta_deletion_vectors" -> (metaDeletionVectors _),
    "meta_hash_chain" -> (metaHashChain _),
    "meta_shard_checksums" -> (metaShardChecksums _),
    "meta_cdc_apply" -> (cdcApply _),
    "meta_column_profile" -> (metaColumnProfile _),
    "meta_fk_audit" -> (metaFkAudit _),
    "data_snapshot_diff" -> (dataSnapshotDiff _),
    "meta_portal_records" -> (portalRecordsFlat _),
    "meta_dwh_records" -> (dwhRecords _),
    "meta_taxon_rollup" -> (taxonRollup _),
    "meta_dedup_records" -> (dedupRecords _),
    "meta_summary_facets" -> (summaryFacets _),
    "meta_summary_dtol" -> (summaryDtol _),
    "meta_pseudonymize_audit" -> (metaPseudonymizeAudit _),
    "data_k_anonymity" -> (dataKAnonymity _),
    "data_l_diversity" -> (dataLDiversity _),
    "meta_erasure_cascade" -> (metaErasureCascade _),
    "meta_article_enrich" -> (articleEnrich _),
    "meta_genome_notes" -> (genomeNotes _),
    "meta_ingest_pipeline" -> (metaIngestPipeline _),
    "meta_bitemporal_asof" -> (metaBitemporalAsof _))

  private val DWH_SQL =
      """WITH e AS (
        |  SELECT o_custkey, COUNT(*) AS n_experiments,
        |    CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_assemblies
        |  FROM orders GROUP BY o_custkey),
        |b AS (
        |  SELECT c_custkey AS k,
        |    'ACC' || CAST(c_custkey AS VARCHAR) AS accession,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'specimens'
        |         WHEN c_custkey % 3 = 1 THEN 'symbionts'
        |         ELSE 'metagenomes' END AS sample_type,
        |    'sp_' || CAST(c_custkey % 50 AS VARCHAR) AS organism,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'female' ELSE 'male' END AS sex,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'leaf' WHEN c_custkey % 4 = 1 THEN 'blood'
        |         WHEN c_custkey % 4 = 2 THEN 'muscle' ELSE 'root' END AS organism_part,
        |    'tol' || CAST(c_custkey AS VARCHAR) AS tolid,
        |    n_name AS country,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'adult' WHEN c_custkey % 3 = 1 THEN 'juvenile'
        |         ELSE 'egg' END AS lifestage,
        |    'hab_' || CAST(c_custkey % 6 AS VARCHAR) AS habitat,
        |    CASE WHEN COALESCE(n_experiments, 0) > 0 THEN 'Raw Data - Submitted'
        |         WHEN COALESCE(n_assemblies, 0) > 0 THEN 'Assemblies - Submitted'
        |         ELSE 'Submitted to BioSamples' END AS tracking_system
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  LEFT JOIN e ON c_custkey = o_custkey),
        |err AS (
        |  SELECT *,
        |    CASE WHEN organism = 'sp_13' THEN NULL
        |         WHEN sample_type = 'symbionts' AND k % 7 = 0
        |           THEN 'missing ''sample symbiont of'' field for symbiont sample'
        |         WHEN sample_type = 'metagenomes' AND k % 11 = 0
        |           THEN 'missing ''sample derived from'' field for metagenome sample'
        |         WHEN sample_type = 'metagenomes' AND (k // 2) % 5 != 0
        |              AND (k // 4) % 5 != 0 AND (k // 8) % 5 != 0
        |           THEN 'Host sample doesn''t exist'
        |         END AS error_message
        |  FROM b)
        |SELECT accession, sample_type,
        |  CASE WHEN error_message IS NOT NULL THEN NULL
        |       WHEN organism = 'sp_13' THEN '876063_3126489'
        |       WHEN sample_type = 'specimens' THEN CAST(k AS VARCHAR)
        |       WHEN sample_type = 'symbionts' THEN CAST(k - 1 AS VARCHAR)
        |       ELSE CASE WHEN (k // 2) % 5 = 0 THEN CAST(k // 2 AS VARCHAR)
        |                 WHEN (k // 4) % 5 = 0 THEN CAST(k // 4 AS VARCHAR)
        |                 ELSE CAST(k // 8 AS VARCHAR) END END AS dwh_key,
        |  error_message, organism, sex, organism_part, tolid, country,
        |  lifestage, habitat, tracking_system
        |FROM err""".stripMargin

  private val PSEUDONYMIZE_SQL =
    """WITH c AS (SELECT c_custkey,
      |             substr(md5('pseu:' || CAST(c_custkey AS VARCHAR)), 1, 12)
      |               AS token
      |           FROM customer),
      |k AS (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
      |        CAST(COUNT(DISTINCT token) AS BIGINT) AS n_tokens FROM c),
      |r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_joined_raw
      |      FROM orders JOIN c ON o_custkey = c_custkey),
      |tk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_joined_tok
      |       FROM (SELECT substr(md5('pseu:' || CAST(o_custkey AS VARCHAR)),
      |                           1, 12) AS token
      |             FROM orders) o JOIN c ON o.token = c.token)
      |SELECT n_keys, n_tokens, n_keys - n_tokens AS collisions,
      |  n_joined_raw, n_joined_tok,
      |  CAST(CASE WHEN n_keys = n_tokens AND n_joined_raw = n_joined_tok
      |       THEN 1 ELSE 0 END AS BIGINT) AS publishable
      |FROM k, r, tk""".stripMargin

  private val SUMMARYDTOL_SQL =
    s"""WITH dwh AS ($DWH_SQL),
       |docs AS (
       |  SELECT *, CAST(substr(accession, 4) AS BIGINT) AS k
       |  FROM dwh WHERE error_message IS NULL),
       |st AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN tracking_system != 'Submitted to BioSamples'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_asm,
       |    CAST(SUM(CASE WHEN k % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_ann
       |  FROM docs),
       |cand AS (
       |  SELECT doc_id,
       |    COALESCE(
       |      NULLIF(regexp_extract(text, '\\b(sc[a-z]+ [a-z]+)', 1), ''),
       |      NULLIF(regexp_extract(text, '\\b(st[a-z]+ [a-z]+)', 1), ''),
       |      NULLIF(regexp_extract(text, '\\b(ba[a-z]+ [a-z]+)', 1), ''))
       |      AS study_id
       |  FROM documents),
       |gt AS (
       |  SELECT DISTINCT
       |    ('0x' || substr(md5('gn:' || study_id), 1, 15))::BIGINT % 97
       |      AS tax_id
       |  FROM (SELECT study_id FROM cand WHERE study_id IS NOT NULL
       |        GROUP BY study_id)
       |  WHERE ('0x' || substr(md5('gn:' || study_id), 1, 15))::BIGINT
       |    % 5 != 0),
       |gn AS (
       |  SELECT CAST(COUNT(DISTINCT organism) AS BIGINT) AS n_gn
       |  FROM (SELECT organism,
       |          CASE WHEN regexp_matches(dwh_key, '^[0-9]+$$')
       |            THEN CAST(dwh_key AS BIGINT) END % 97 AS tax_id
       |        FROM docs) d JOIN gt USING (tax_id))
       |SELECT 'Assemblies - Submitted' AS summary_key, n_asm AS doc_count
       |FROM st
       |UNION ALL
       |SELECT 'Annotation Complete', n_ann FROM st
       |UNION ALL
       |SELECT 'Genome Notes', n_gn FROM gn""".stripMargin

  private val INGEST_SQL =
    s"""WITH dwh AS MATERIALIZED ($DWH_SQL),
       |rel AS (
       |  SELECT o_custkey AS k, COUNT(*) AS n_related,
       |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_analyses,
       |    MAX(o_orderpriority = '1-URGENT') AS images_available
       |  FROM orders GROUP BY o_custkey),
       |phy AS (
       |  SELECT organism FROM (
       |    SELECT organism,
       |      ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, organism) AS rn
       |    FROM dwh WHERE error_message IS NULL GROUP BY organism)
       |  WHERE rn <= 20)
       |SELECT d.accession, d.sample_type, d.organism, d.dwh_key,
       |  d.tracking_system AS tracking_status,
       |  CAST(COALESCE(r.n_related, 0) AS BIGINT) AS n_related,
       |  COALESCE(r.n_analyses, 0) AS n_analyses,
       |  COALESCE(r.images_available, FALSE) AS images_available,
       |  COALESCE(d.organism IN (SELECT organism FROM phy), FALSE)
       |    AS in_top_phylogeny,
       |  CASE WHEN d.error_message IS NOT NULL THEN 'dead_letter'
       |       WHEN d.dwh_key IN ('624', '1773', '2697049') THEN 'blocked'
       |       WHEN COALESCE(r.n_related, 0) = 0 THEN 'no_related_data'
       |       ELSE 'indexed' END AS status
       |FROM dwh d
       |LEFT JOIN rel r ON CAST(substr(d.accession, 4) AS BIGINT) = r.k""".stripMargin

  val oracle: Map[String, String] = Map(
    "meta_bitemporal_asof" -> BITEMPORAL_SQL,
    "meta_ingest_pipeline" -> INGEST_SQL,
    "meta_summary_dtol" -> SUMMARYDTOL_SQL,
    "meta_gfs_retention" -> GFS_SQL,
    "meta_overlap_depth" -> OVERLAP_SQL,
    "meta_vacuum_plan" -> VACUUM_SQL,
    // the oracle filters the RAW table — a hash match proves the
    // manifest-pruned scan loses no rows and admits no strays
    "meta_manifest_prune" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_orderkey BETWEEN 4000 AND 9000
        |GROUP BY o_orderstatus""".stripMargin,
    "meta_join_size_estimate" -> JOIN_EST_SQL,
    "meta_mgnify_enrich" -> MGNIFY_SQL,
    "meta_sample_relationships" -> RELATIONSHIPS_SQL,
    "meta_link_rollups" -> LINKROLLUP_SQL,
    "meta_annotations_explode" -> ANNOTATIONS_SQL,
    "meta_article_enrich" -> ARTICLE_SQL,
    "meta_genome_notes" -> GENOMENOTES_SQL,
    "meta_pseudonymize_audit" -> PSEUDONYMIZE_SQL,
    "data_k_anonymity" -> K_ANON_SQL,
    "data_l_diversity" -> L_DIV_SQL,
    "meta_erasure_cascade" -> ERASURE_SQL,
    "meta_deletion_vectors" -> DV_SQL,
    "meta_shard_checksums" -> CHECKSUM_SQL,
    "meta_hash_chain" -> HASHCHAIN_SQL,
    "meta_cdc_apply" ->
      """WITH chg AS (
        |  SELECT user_id AS ukey,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    event_type, value, epoch_ns(ts) // 1000 * 1000 AS ts_ns, event_id
        |  FROM events),
        |ranked AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY ukey
        |      ORDER BY ts_ns DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY ukey) AS n_changes
        |  FROM chg)
        |SELECT ukey, event_type AS last_type, value AS last_val,
        |  ts_ns AS last_ts_ns, CAST(n_changes AS BIGINT) AS n_changes
        |FROM ranked WHERE rn = 1 AND op = 'U'""".stripMargin,
    "meta_column_profile" -> PROFILE_SQL,
    "meta_fk_audit" -> FK_SQL,
    "data_snapshot_diff" -> DIFF_SQL,
    "meta_dwh_records" -> DWH_SQL,
    "meta_taxon_rollup" ->
      s"""WITH dwh AS ($DWH_SQL)
         |SELECT dwh_key, COUNT(*) AS n_records,
         |  CAST(SUM(CASE WHEN sample_type = 'specimens' THEN 1 ELSE 0 END) AS BIGINT) AS n_specimens,
         |  CAST(SUM(CASE WHEN sample_type = 'symbionts' THEN 1 ELSE 0 END) AS BIGINT) AS n_symbionts,
         |  CAST(SUM(CASE WHEN sample_type = 'metagenomes' THEN 1 ELSE 0 END) AS BIGINT) AS n_metagenomes,
         |  MAX(country = 'FRANCE') AS nagoya_protocol,
         |  CASE MAX(CASE tracking_system WHEN 'Raw Data - Submitted' THEN 2
         |                WHEN 'Assemblies - Submitted' THEN 1 ELSE 0 END)
         |    WHEN 2 THEN 'Raw Data - Submitted'
         |    WHEN 1 THEN 'Assemblies - Submitted'
         |    ELSE 'Submitted to BioSamples' END AS current_status,
         |  dwh_key IN ('624', '1773', '2697049') AS blocked
         |FROM dwh WHERE error_message IS NULL
         |GROUP BY dwh_key""".stripMargin,
    "meta_portal_records" ->
      """SELECT 'ACC' || CAST(c_custkey AS VARCHAR) AS accession,
        |  CASE WHEN COALESCE(n_experiments, 0) > 0 THEN 'Raw Data - Submitted'
        |       WHEN COALESCE(n_assemblies, 0) > 0 THEN 'Assemblies - Submitted'
        |       ELSE 'Submitted to BioSamples' END AS tracking_status,
        |  c_custkey AS taxId,
        |  COALESCE(n_analyses, 0) AS n_analyses,
        |  COALESCE(images_available, FALSE) AS images_available,
        |  'mktsegment:' || c_mktsegment || '||;'
        |    || 'acctbal:' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) || '|USD|;'
        |    || 'geographic location:nation_' || CAST(c_nationkey AS VARCHAR)
        |    || '||GAZ:' || CAST(c_nationkey AS VARCHAR) AS custom_fields,
        |  'sp_' || CAST(c_custkey % 50 AS VARCHAR)
        |    || '|NCBITaxon:' || CAST(c_custkey AS VARCHAR) AS organism
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, COUNT(*) AS n_experiments,
        |    CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_assemblies,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_analyses,
        |    MAX(o_orderpriority = '1-URGENT') AS images_available
        |  FROM orders GROUP BY o_custkey) e ON c_custkey = o_custkey""".stripMargin,
    "meta_dedup_records" ->
      """SELECT accession, record_id, trackingSystem, n_records FROM (
        |  SELECT accession, record_id, trackingSystem,
        |    COUNT(*) OVER (PARTITION BY accession) AS n_records,
        |    ROW_NUMBER() OVER (PARTITION BY accession
        |      ORDER BY rnk DESC, record_id) AS rn
        |  FROM (SELECT 'ACC' || CAST(o_custkey AS VARCHAR) AS accession,
        |          o_orderkey AS record_id,
        |          CASE WHEN o_orderstatus = 'F' THEN 'Assemblies - Submitted'
        |               WHEN o_orderstatus = 'O' THEN 'Raw Data - Submitted'
        |               ELSE 'Submitted to BioSamples' END AS trackingSystem,
        |          CASE WHEN o_orderstatus = 'F' THEN 3
        |               WHEN o_orderstatus = 'O' THEN 2 ELSE 1 END AS rnk
        |        FROM orders))
        |WHERE rn = 1""".stripMargin,
    "meta_summary_facets" ->
      s"""WITH dwh AS ($DWH_SQL),
         |ok AS (SELECT * FROM dwh WHERE error_message IS NULL),
         |pairs AS (
         |  SELECT 'sample_type' AS facet, sample_type AS bucket_key FROM ok
         |  UNION ALL SELECT 'tracking_system', tracking_system FROM ok
         |  UNION ALL SELECT 'lifestage', lifestage FROM ok
         |  UNION ALL SELECT 'habitat', habitat FROM ok
         |  UNION ALL SELECT 'country', country FROM ok
         |  UNION ALL SELECT 'organism', organism FROM ok),
         |counts AS (
         |  SELECT facet, bucket_key, COUNT(*) AS doc_count FROM pairs
         |  WHERE bucket_key != 'Waiting' GROUP BY facet, bucket_key),
         |ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY facet
         |    ORDER BY doc_count DESC, bucket_key) AS BIGINT) AS rnk
         |  FROM counts)
         |SELECT CASE WHEN facet = 'tracking_system' THEN 'status'
         |            WHEN facet = 'organism' THEN 'phylogeny'
         |            ELSE 'projects' END AS section,
         |  facet, bucket_key, doc_count, rnk
         |FROM ranked WHERE rnk <= 20""".stripMargin)
}
