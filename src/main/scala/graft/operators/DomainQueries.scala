package graft.operators

import graft.Determinism._
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Biodiversity-domain operators (SURVEY.md §2b), re-expressed Spark-first.
  *
  * The reference's occurrence pipelines (cleaning_occs_pipeline.py,
  * spatial_annotation_pipeline.py, range_estimation_pipeline.py) operate on
  * GBIF occurrence records. Here the occurrence-like input is derived
  * deterministically from the `events` table (integer arithmetic only), so
  * the DuckDB oracle recomputes byte-identical inputs, while every operator
  * keeps the reference's semantics and a scale-ready Spark plan shape.
  *
  * Scale posture: the whole cleaning chain is narrow (fused by whole-stage
  * codegen); spatial membership uses integer grid-cell keys joined against
  * broadcast cell tables; dedup is a single shuffle on the dedup key;
  * centroid distance uses a broadcast nested-loop join against a tiny
  * centroid table (the reference holds centroids in memory per worker,
  * cleaning_occs.py:130-152 — broadcast is the Spark-native equivalent).
  */
object DomainQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- derived occurrence view -------------------------------------------

  /** events.parquet historically carried TIMESTAMP(NANOS) (read as raw
    * Long ns via nanosAsLong); current driver data is plain timestamp[us].
    * Normalize both to a BIGINT `ts_ns` of µs-truncated nanoseconds —
    * exactly DuckDB's `epoch_ns(ts) // 1000 * 1000` under a UTC session. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events").withColumnRenamed("ts", "ts_raw")
    val tsNs = raw.schema("ts_raw").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("ts_raw div 1000 * 1000") // ns file: truncate to µs ticks
      case _ => // timestamp[us] (NTZ or LTZ): UTC instant → ns
        expr("unix_micros(cast(ts_raw as timestamp)) * 1000")
    }
    raw.withColumn("ts_ns", tsNs).drop("ts_raw")
  }

  /** Occurrence-like view: species/accession from user_id, lat/lon/uncert
    * from event_id (with (0,0) and out-of-range coords injected so the
    * cleaning filters have work to do). Mirrored 1:1 in [[OCC_SQL]]. */
  def occ(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id").as("occ_id"),
      concat(lit("sp_"), (col("user_id") % 50).cast("string")).as("species"),
      concat(lit("ACC"), (col("user_id") % 50).cast("string")).as("accession"),
      when(col("event_id") % 97 === 0, 0.0)
        .otherwise((col("event_id") * 37 % 2200).cast("double") / 10.0 - 105.0).as("lat"),
      when(col("event_id") % 97 === 0, 0.0)
        .otherwise((col("event_id") * 61 % 4400).cast("double") / 10.0 - 210.0).as("lon"),
      (col("event_id") * 131 % 8000).cast("double").as("uncert"),
      col("ts_ns"), col("event_type"), col("value"))

  val OCC_SQL: String =
    """occ AS (
      |  SELECT event_id AS occ_id,
      |    'sp_' || CAST(user_id % 50 AS VARCHAR) AS species,
      |    'ACC' || CAST(user_id % 50 AS VARCHAR) AS accession,
      |    CASE WHEN event_id % 97 = 0 THEN 0.0
      |         ELSE CAST(event_id * 37 % 2200 AS DOUBLE) / 10.0 - 105.0 END AS lat,
      |    CASE WHEN event_id % 97 = 0 THEN 0.0
      |         ELSE CAST(event_id * 61 % 4400 AS DOUBLE) / 10.0 - 210.0 END AS lon,
      |    CAST(event_id * 131 % 8000 AS DOUBLE) AS uncert,
      |    epoch_ns(ts) // 1000 * 1000 AS ts_ns, event_type, value
      |  FROM events)""".stripMargin

  /** filter_zero_coords + filter_invalid_coords (cleaning_occs.py:9-52). */
  def valid(s: SparkSession, dir: String): DataFrame =
    occ(s, dir).filter(
      !(col("lat") === 0.0 && col("lon") === 0.0) &&
        col("lat").between(-90.0, 90.0) && col("lon").between(-180.0, 180.0))

  val VALID_SQL: String =
    """valid AS (
      |  SELECT * FROM occ
      |  WHERE NOT (lat = 0.0 AND lon = 0.0)
      |    AND lat BETWEEN -90.0 AND 90.0 AND lon BETWEEN -180.0 AND 180.0)""".stripMargin

  private def withSql(ctes: String*)(body: String): String =
    ctes.mkString("WITH ", ",\n", "\n") + body

  // ---- spatial helpers ----------------------------------------------------

  /** 10°-resolution grid cell id in [0, 648) — the land/sea index. */
  private def cell10(lat: Column, lon: Column): Column =
    (floor(lat / 10.0).cast("long") + 9) * 36 + floor(lon / 10.0).cast("long") + 18

  private val CELL10_SQL =
    "(CAST(FLOOR(lat / 10.0) AS BIGINT) + 9) * 36 + CAST(FLOOR(lon / 10.0) AS BIGINT) + 18"

  /** 1°-resolution cell id in [0, 64800) — the climate/biogeo raster index. */
  private def cell1(lat: Column, lon: Column): Column =
    (floor(lat).cast("long") + 90) * 360 + floor(lon).cast("long") + 180

  private val CELL1_SQL =
    "(CAST(FLOOR(lat) AS BIGINT) + 90) * 360 + CAST(FLOOR(lon) AS BIGINT) + 180"

  /** Synthetic climate raster sampled at a 1°-cell id: deci-Kelvin
    * temperature and deci-mm precipitation lattices. ONE definition
    * (Scala + SQL) shared by [[climAnnotate]]/CLIM_SQL and
    * [[occClimateEnvelope]] — the coupling the envelope's "samples the
    * climAnnotate lattice" claim depends on. */
  private def rasterT(cid: Column): Column = cid * 7919 % 4000
  private def rasterP(cid: Column): Column = cid * 104729 % 12000
  private val RASTER_T_SQL = "cid * 7919 % 4000"
  private val RASTER_P_SQL = "cid * 104729 % 12000"

  /** Pseudo-random land mask over the 10° grid (55% land). Stands in for
    * the Natural Earth polygon layer: point-in-polygon becomes an integer
    * cell semi-join against a broadcastable table. */
  def landCells(s: SparkSession): DataFrame =
    s.range(648).select(col("id").as("cellid"))
      .filter(col("cellid") * 2654435761L % 100 < 55)

  private val LAND_SQL =
    """land AS (
      |  SELECT cellid FROM (SELECT range AS cellid FROM range(648))
      |  WHERE cellid * 2654435761 % 100 < 55)""".stripMargin

  /** 20 synthetic admin centroids (cf. load_centroid_list). */
  def centroids(s: SparkSession): DataFrame =
    s.range(20).select(
      (col("id") * 53 % 171).cast("double").minus(85.0).as("clat"),
      (col("id") * 97 % 351).cast("double").minus(175.0).as("clon"))

  private val CENT_SQL =
    """cent AS (
      |  SELECT CAST(i * 53 % 171 AS DOUBLE) - 85.0 AS clat,
      |         CAST(i * 97 % 351 AS DOUBLE) - 175.0 AS clon
      |  FROM (SELECT range AS i FROM range(20)))""".stripMargin

  /** [[CENT_SQL]] with the centroid id carried (spatial_nearest argmin). */
  private val CENTID_SQL =
    """centid AS (
      |  SELECT i AS cid, CAST(i * 53 % 171 AS DOUBLE) - 85.0 AS clat,
      |         CAST(i * 97 % 351 AS DOUBLE) - 175.0 AS clon
      |  FROM (SELECT range AS i FROM range(20)))""".stripMargin

  /** Great-circle distance in meters (cleaning_occs.py:107 haversine). */
  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val a = pow(sin(radians(lat2 - lat1) / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
    lit(2 * 6371000.0) * asin(sqrt(a))
  }

  private def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2 * 6371000.0 * ASIN(SQRT(POW(SIN(RADIANS(($lat2) - ($lat1)) / 2), 2) + " +
      s"COS(RADIANS($lat1)) * COS(RADIANS($lat2)) * POW(SIN(RADIANS(($lon2) - ($lon1)) / 2), 2)))"

  private val CENTROID_DIST_M = 150000.0

  // ---- §2b queries ---------------------------------------------------------

  def occCleanCoords(s: SparkSession, dir: String): DataFrame =
    valid(s, dir).select("occ_id", "species", "lat", "lon")

  /** MAD-based spatial outlier flags per species — the robust-statistics
    * cleaning step (CoordinateCleaner's outlier test shape): a point is
    * flagged when its deviation from the species' median exceeds 5× the
    * median absolute deviation on EITHER axis. Medians are exact DISC
    * element picks via integer rank targets (cf. events_value_quantiles
    * — no interpolation, so the doubles are corpus values and the whole
    * query hash-oracles). mad = 0 (≥half the points identical on an
    * axis) flags nothing on that axis — degenerate clusters are not
    * outliers. The registered query uses the Tukey-style 1.5× fence:
    * the synthetic corpus is near-uniform (max deviation ≈ 2× the
    * median deviation by construction), so CoordinateCleaner's default
    * 5× would be vacuously empty here — the 5× semantics are
    * spec-proven on a planted cluster instead. Plan: two
    * species-partitioned window stages (median, then MAD over
    * deviations), each sharing one exchange. */
  def occOutlierMad(s: SparkSession, dir: String): DataFrame =
    occOutlierMad(s, dir, mult = 1.5)

  private[graft] def occOutlierMad(s: SparkSession, dir: String,
                                   mult: Double): DataFrame = {
    // both axes' medians from ONE species exchange (two sorts ride it) —
    // a per-axis helper would replay the base relation per call (was 8
    // planned shuffles, now 4)
    def medians2(df: DataFrame, c1: String, c2: String,
                 o1: String, o2: String): DataFrame = {
      val w1 = Window.partitionBy("species").orderBy(c1, "occ_id")
      val w2 = Window.partitionBy("species").orderBy(c2, "occ_id")
      df.withColumn("rn1", row_number().over(w1).cast("long"))
        .withColumn("rn2", row_number().over(w2).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("species")))
        .groupBy("species")
        .agg(max(when(col("rn1") === expr("(n + 1) div 2"), col(c1))).as(o1),
          max(when(col("rn2") === expr("(n + 1) div 2"), col(c2))).as(o2))
    }
    val d = valid(s, dir).select("occ_id", "species", "lat", "lon")
    val meds = medians2(d, "lat", "lon", "med_lat", "med_lon")
    val devs = d.join(meds, Seq("species"))
      .withColumn("dev_lat", abs(col("lat") - col("med_lat")))
      .withColumn("dev_lon", abs(col("lon") - col("med_lon")))
    val mads = medians2(devs, "dev_lat", "dev_lon", "mad_lat", "mad_lon")
    devs.join(mads, Seq("species"))
      .filter((col("mad_lat") > 0 && col("dev_lat") > col("mad_lat") * mult) ||
        (col("mad_lon") > 0 && col("dev_lon") > col("mad_lon") * mult))
      .select("occ_id", "species", "lat", "lon")
  }

  /** Per-species temporal trend from yearly occurrence counts — the
    * population-trajectory signal occurrence archives exist to answer
    * (is this species' recorded presence growing or collapsing?).
    * Least-squares over the OBSERVED (year, count) points, kept entirely
    * in exact integers: only the slope's SIGN is reported, and
    * sign(slope) = sign(n·Σxy − Σx·Σy) — the denominator is positive, so
    * the classification needs no division, no floats, no ties beyond
    * exact zero (reported as 'stable'). Absent years are absent points
    * (observed-years regression), documented and mirrored in the oracle.
    * Plan: (species, year) count partial-aggregates map-side, the
    * per-species fold reuses nothing heavier than BIGINT sums. */
  def occTemporalTrend(s: SparkSession, dir: String): DataFrame = {
    val yearly = valid(s, dir)
      .select(col("species"),
        year(timestamp_micros(expr("ts_ns div 1000"))).cast("long").as("yr"))
      .groupBy("species", "yr").agg(count(lit(1)).as("n"))
    yearly.groupBy("species")
      .agg(count(lit(1)).as("n_years"), sum("n").as("n_total"),
        (count(lit(1)) * sum(col("yr") * col("n")) -
          sum("yr") * sum("n")).as("trend_num"))
      .select(col("species"), col("n_years"), col("n_total"), col("trend_num"),
        when(col("trend_num") > 0, "increasing")
          .when(col("trend_num") < 0, "declining")
          .otherwise("stable").as("trend"))
  }

  def occUncertaintyBand(s: SparkSession, dir: String): DataFrame =
    valid(s, dir).filter(col("uncert").between(1000.0, 5000.0))
      .select("occ_id", "species", "uncert")

  def occLandFilter(s: SparkSession, dir: String): DataFrame =
    valid(s, dir).withColumn("cellid", cell10(col("lat"), col("lon")))
      .join(broadcast(landCells(s)), Seq("cellid"), "left_semi")
      .select("occ_id", "species", "lat", "lon", "cellid")

  def occCentroidFilter(s: SparkSession, dir: String): DataFrame =
    valid(s, dir).join(broadcast(centroids(s)),
        haversineM(col("lat"), col("lon"), col("clat"), col("clon")) <= CENTROID_DIST_M,
        "left_anti")
      .select("occ_id", "species", "lat", "lon")

  /** Nearest-reference-site assignment: every valid occurrence labeled
    * with its closest of the 20 broadcast centroids — the
    * assign-to-station step before per-site rollups (the argmin twin of
    * [[occCentroidFilter]]'s radius test). Ranking uses a PLANAR squared
    * distance with antimeridian wrap — only IEEE +,−,×,abs,min, no
    * transcendentals — because the emitted measure must hash-match:
    * haversine's sin/cos are not correctly-rounded cross-engine (fine
    * under a ≤ threshold, not as output). argmin = MIN over a
    * (d2, cid) struct — a hash aggregate with a deterministic id
    * tie-break, never a when-chain over 20 distance columns (the
    * ivfTopk max_by lesson). Plan: one broadcast nested-loop expand
    * (20 rows) + one partial-aggregated shuffle. */
  def spatialNearest(s: SparkSession, dir: String): DataFrame = {
    val cents = s.range(20).select(col("id").as("cid"),
      (col("id") * 53 % 171).cast("double").minus(85.0).as("clat"),
      (col("id") * 97 % 351).cast("double").minus(175.0).as("clon"))
    val dlat = col("lat") - col("clat")
    val dlonRaw = abs(col("lon") - col("clon"))
    val dlon = least(dlonRaw, lit(360.0) - dlonRaw)
    val d2 = dlat * dlat + dlon * dlon
    valid(s, dir).select("occ_id", "lat", "lon")
      .crossJoin(broadcast(cents))
      .select(col("occ_id"), struct(d2.as("d2"), col("cid")).as("dc"))
      .groupBy("occ_id").agg(min("dc").as("m"))
      .select(col("occ_id"), col("m.cid").as("centroid_id"), col("m.d2").as("d2"))
  }

  /** Grid density map: per 1°-cell occurrence count, species richness and
    * dominant species — the range-map rasterization step downstream of
    * the cleaning pipeline (the raster twin of range_bbox's vector
    * summary). Plan: the (cell, species) count partial-aggregates
    * map-side, then the dominant-class rank and the final per-cell
    * aggregate share the cellid partitioning; tie-break (n desc, species
    * asc) is deterministic on both engines. */
  def spatialGridDensity(s: SparkSession, dir: String): DataFrame = {
    val byCell = Window.partitionBy("cellid").orderBy(col("n").desc, col("species"))
    valid(s, dir)
      .withColumn("cellid", cell1(col("lat"), col("lon")))
      .groupBy("cellid", "species").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(byCell))
      .groupBy("cellid")
      .agg(sum("n").as("n_occ"), count(lit(1)).as("n_species"),
        max(when(col("rn") === 1, col("species"))).as("dominant"),
        max(when(col("rn") === 1, col("n"))).as("dom_n"))
  }

  /** Per-cell Shannon-style diversity in exact integers — the evenness
    * signal spatial_grid_density's richness count misses (a cell with
    * 99 records of one species and 1 of another is "2 species" but has
    * near-zero diversity): per species in a 1°-cell, surprisal bits =
    * floor(log₂(n_cell / n_s)) computed exactly as
    * length(bin(n_cell div n_s)) − 1 (the text_surprisal lattice), and
    * the cell's bits_sum = Σ n_s·b_s — a coarse integer Shannon index
    * ships alongside as exact milli-bits per occurrence. Plan: the
    * (cell, species) count partial-aggregates map-side; the cell-total
    * window and the final per-cell aggregate ride the SAME cellid
    * exchange (the grid-density shape). */
  def occCellDiversity(s: SparkSession, dir: String): DataFrame = {
    val wCell = Window.partitionBy("cellid")
    valid(s, dir)
      .withColumn("cellid", cell1(col("lat"), col("lon")))
      .groupBy("cellid", "species").agg(count(lit(1)).as("ns"))
      .withColumn("n_cell", sum("ns").over(wCell))
      .withColumn("b", expr("cast(length(bin(n_cell div ns)) - 1 as bigint)"))
      .groupBy("cellid")
      .agg(max("n_cell").as("n_occ"), count(lit(1)).as("n_species"),
        sum(col("ns") * col("b")).as("bits_sum"))
      .withColumn("milli_bits_per_occ", expr("bits_sum * 1000 div n_occ"))
  }

  /** Z-order (Morton) spatial layout summary — the file-clustering
    * primitive behind OPTIMIZE ZORDER-style layouts: interleaving the
    * 1°-cell x/y bits gives a single sort key whose ranges are compact
    * lat/lon rectangles, so range-partitioned files prune spatial
    * predicates at 100 TB. The z-code is 9+9 unrolled bit terms (pure
    * integer arithmetic, codegen'd, byte-identical in DuckDB); the
    * summary buckets the code space uniformly (bucket = z·32 div 2^18 —
    * no global sort, unlike ntile) and reports each bucket's occupancy
    * and geographic extent, which the spec asserts is LOCAL (bounded
    * lat span) — the property the layout exists for. */
  /** The 9+9-bit Morton interleave, ONE definition consumed by both the
    * Spark plan and the DuckDB oracle — identical `>>`/`&`/`<<` syntax in
    * both engines, so the two sides cannot drift. */
  private val MORTON18 = (0 until 9).map { b =>
    s"(((cx >> $b) & 1) << ${2 * b}) + (((cy >> $b) & 1) << ${2 * b + 1})"
  }.mkString(" + ")

  def spatialZorderLayout(s: SparkSession, dir: String): DataFrame = {
    valid(s, dir)
      .select(col("species"), col("lat"), col("lon"),
        (floor(col("lon")).cast("long") + 180).as("cx"),
        (floor(col("lat")).cast("long") + 90).as("cy"))
      .withColumn("z", expr(MORTON18))
      .withColumn("bucket", expr("z * 32 div 262144"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("species")).as("n_species"),
        min("z").as("z_min"), max("z").as("z_max"),
        min("lat").as("lat_min"), max("lat").as("lat_max"),
        min("lon").as("lon_min"), max("lon").as("lon_max"))
  }

  /** Whittaker rank-abundance curve — the community-structure readout
    * every survey publishes next to the richness number: species ranked
    * by occurrence count (count desc, species — total order), each with
    * its exact milli share, CUMULATIVE milli share and floor-log2
    * abundance (the bin-length lattice). A steep curve = few dominants
    * (geometric series); a flat one = high evenness. The species
    * dimension is a bounded vocabulary (it does not grow with the
    * corpus), so the rank window rides the ≤\|species\|-row aggregate —
    * never row-level data. */
  def occRankAbundance(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("n_occ").desc, col("species"))
    valid(s, dir)
      .groupBy("species").agg(count(lit(1)).as("n_occ"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("total", sum("n_occ").over(Window.partitionBy()))
      .withColumn("cum", sum("n_occ").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("species"), col("n_occ"),
        expr("n_occ * 1000 div total").as("share_milli"),
        expr("cum * 1000 div total").as("cum_share_milli"),
        expr("cast(length(bin(n_occ)) - 1 as bigint)").as("log2_abund"))
  }

  /** Zone-map pruning audit of the z-order layout — the measurement that
    * justifies [[spatialZorderLayout]] at 100 TB: for each of the 16
    * disjoint 45°×90° query boxes, how many of the 32 z-range files does
    * a min/max zone map FAIL to prune (file hit ⇔ its box-id envelope
    * intersects the query box), how many rows get scanned vs actually
    * matched, and the read amplification in exact milli. Amplification
    * ≈ 1000 means the layout answers box queries at near-perfect
    * selectivity; ≫ 1000 quantifies the curse of linearizing 2-D. Plan:
    * TWO aggregates of the same codegen'd scan (32-row file stats +
    * 16-row match counts) joined by a whitelisted 16×32 envelope BNLJ —
    * both sides layout constants at any corpus size. */
  def spatialZonePruningAudit(s: SparkSession, dir: String): DataFrame = {
    val rows = valid(s, dir)
      .select((floor(col("lon")).cast("long") + 180).as("cx"),
        (floor(col("lat")).cast("long") + 90).as("cy"))
      .withColumn("z", expr(MORTON18))
      .withColumn("bucket", expr("z * 32 div 262144"))
      .withColumn("qy", expr("least(cy div 45, 3)"))
      .withColumn("qx", expr("least(cx div 90, 3)"))
    val files = rows.groupBy("bucket")
      .agg(count(lit(1)).as("n_occ"),
        min("qy").as("qy_min"), max("qy").as("qy_max"),
        min("qx").as("qx_min"), max("qx").as("qx_max"))
    rows.groupBy("qy", "qx").agg(count(lit(1)).as("n_rows_matched"))
      .join(broadcast(files),
        col("qy").between(col("qy_min"), col("qy_max")) &&
          col("qx").between(col("qx_min"), col("qx_max")))
      .groupBy("qy", "qx", "n_rows_matched")
      .agg(count(lit(1)).as("n_files_hit"), sum("n_occ").as("n_rows_scanned"))
      .select(col("qy").as("box_y"), col("qx").as("box_x"),
        col("n_rows_matched"), col("n_files_hit"), col("n_rows_scanned"),
        expr("n_rows_scanned * 1000 div n_rows_matched")
          .as("read_amplification_milli"))
  }

  /** Species-accumulation (rarefaction) curve — the survey-completeness
    * question behind every occurrence archive: after the first k records
    * in an unbiased order, how many distinct species has the survey
    * seen? A curve still climbing at k = N means the region is
    * under-sampled. "Unbiased order" = 52-bit md5('acc:'||occ_id) order
    * (own salt, deterministic, content-independent); checkpoints are
    * log-spaced (k = 2^j capped at N) so the output is ≤ 64 rows at ANY
    * corpus size. Exact integers: a new-species record at global
    * position p first counts at checkpoint j = ceil(log₂ p) =
    * length(bin(p−1)) (0 for p = 1 — the bin()-length lattice), and the
    * curve is a cumulative sum over the ≤ 64-row checkpoint table.
    *
    * The global position is the compact_files two-level rank, never a
    * single-partition corpus window: 256 hash-range buckets (top 8 bits
    * — bucket order ≡ hash order), per-bucket row_number + exclusive
    * bucket offsets from a ≤ 256-row window; bucket counts come from
    * their own column-pruned scan (cheaper than checkpointing the
    * corpus-size flagged relation for reuse), and the corpus total
    * folds from those 256 rows, never a third scan. */
  def occAccumulationCurve(s: SparkSession, dir: String): DataFrame = {
    val hExpr = expr(
      "cast(conv(substring(md5(cast(concat('acc:', occ_id) as binary)), 1, 13), 16, 10) as bigint)")
    val base = valid(s, dir).select(col("occ_id"), col("species"))
      .withColumn("h", hExpr).withColumn("bkt", expr("h >> 44"))
    val wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    // ≤256 rows, referenced by the position join AND the total fold —
    // checkpoint so neither path replays the corpus count
    val offsets = base.groupBy("bkt").agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(sum("bn").over(wb), lit(0L)))
      .transform(graft.Ckpt.capped)
    val total = offsets.agg(sum("bn").as("n")) // folds from ≤256 rows
    val bySp = Window.partitionBy("species").orderBy("h", "occ_id")
    val wl = Window.partitionBy("bkt").orderBy("h", "occ_id")
    val jm = base
      .withColumn("is_new", row_number().over(bySp) === 1)
      .join(broadcast(offsets.select("bkt", "boff")), Seq("bkt"))
      .withColumn("pos", row_number().over(wl).cast("long") + col("boff"))
      .filter(col("is_new"))
      .withColumn("j", when(col("pos") === 1, 0L)
        .otherwise(expr("cast(length(bin(pos - 1)) as bigint)")))
      .groupBy("j").agg(count(lit(1)).as("nn"))
    val wj = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    val js = total.select(explode(expr("sequence(0L, 63L)")).as("j"), col("n"))
      .filter(col("j") === 0 ||
        (col("n") >= 2 && col("j") <= expr("length(bin(n - 1))")))
    js.join(broadcast(jm), Seq("j"), "left_outer")
      .withColumn("n_species", sum(coalesce(col("nn"), lit(0L))).over(wj))
      .select(col("j"),
        least(expr("shiftleft(1L, cast(j as int))"), col("n")).as("k"),
        col("n_species"))
  }

  /** Pairwise range-overlap matrix — the co-occurrence question range
    * estimation feeds (which species pairs COULD interact?): per
    * species the bbox in exact deci-degree integers (floor(x·10) —
    * min/max are order-free, so the aggregate is engine-exact without
    * the decimal-cast machinery sums need), then every pair with a
    * positive bbox intersection, its lat/lon overlap spans and overlap
    * area in deci-degree² BIGINTs. Plan: ONE partial-aggregated
    * exchange builds the ≤|species|-row bbox table; the pair generator
    * is a broadcast self-join over that tiny relation with the a < b
    * triangle predicate — the corpus itself never joins. */
  def occRangeOverlap(s: SparkSession, dir: String): DataFrame = {
    val bbox = valid(s, dir)
      .select(col("species"),
        expr("cast(floor(lat * 10.0) as bigint)").as("lat10"),
        expr("cast(floor(lon * 10.0) as bigint)").as("lon10"))
      .groupBy("species")
      .agg(min("lat10").as("lat_lo"), max("lat10").as("lat_hi"),
        min("lon10").as("lon_lo"), max("lon10").as("lon_hi"))
    val a = bbox.select(bbox.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = bbox.select(bbox.columns.map(c => col(c).as(s"b_$c")): _*)
    val dlat = least(col("a_lat_hi"), col("b_lat_hi")) -
      greatest(col("a_lat_lo"), col("b_lat_lo"))
    val dlon = least(col("a_lon_hi"), col("b_lon_hi")) -
      greatest(col("a_lon_lo"), col("b_lon_lo"))
    a.join(broadcast(b), col("a_species") < col("b_species"))
      .select(col("a_species").as("sp1"), col("b_species").as("sp2"),
        dlat.as("overlap_lat_deci"), dlon.as("overlap_lon_deci"))
      .filter(col("overlap_lat_deci") > 0 && col("overlap_lon_deci") > 0)
      .withColumn("overlap_deci2",
        col("overlap_lat_deci") * col("overlap_lon_deci"))
  }

  /** Raster-true range overlap — the cell-SET Jaccard that refines
    * occ_range_overlap's bbox intersection (two species whose boxes
    * overlap may share zero actual cells): per species-pair, shared
    * 1°-cells / union cells in exact milli. Plan: the distinct
    * (cell, species) relation is localCheckpoint'd (it feeds the
    * self-join twice AND the per-species richness — the multi-reference
    * replay trap); pair generation is the co-occurrence self-join on
    * cellid (bounded by Σ_cell rich² — richness per cell is species-
    * scale, not corpus-scale), and the ≤|species|-row richness table
    * broadcasts into both ends. All-positive integer div, so Spark
    * `div` and DuckDB `//` agree. */
  def occRangeJaccard(s: SparkSession, dir: String): DataFrame = {
    val sp = valid(s, dir)
      .select(cell1(col("lat"), col("lon")).as("cellid"), col("species"))
      .distinct().transform(graft.Ckpt.capped)
    val rich = sp.groupBy("species").agg(count(lit(1)).as("n_cells"))
      .transform(graft.Ckpt.capped) // referenced twice below — don't replay the agg
    val inter = sp.toDF("cellid", "sp1")
      .join(sp.toDF("cellid2", "sp2"),
        col("cellid") === col("cellid2") && col("sp1") < col("sp2"))
      .groupBy("sp1", "sp2").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(rich.toDF("sp1", "cells_1")), "sp1")
      .join(broadcast(rich.toDF("sp2", "cells_2")), "sp2")
      .select(col("sp1"), col("sp2"), col("inter"), col("cells_1"), col("cells_2"),
        expr("inter * 1000 div (cells_1 + cells_2 - inter)").as("jaccard_milli"))
  }

  /** Sampling-effort bias curve — the per-cell effort-vs-richness read
    * that tells you whether apparent richness is a collection artifact:
    * cells bucket by floor-log2 occurrence count (≤64 bins at any
    * scale), each bin reports cell count, occurrence mass, and exact
    * richness min/max/milli-mean. Division only at the end, on
    * positive integers (mean BEFORE any scaling product — the
    * arrival_regularity overflow lesson doesn't bite because rich_sum
    * ×1000 is ≤ 1000·cells·species, nowhere near 2^63). Plan: the
    * (cell, species) partial agg, the per-cell fold, and the ≤64-row
    * bin agg — two real exchanges. */
  def occEffortCurve(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(cell1(col("lat"), col("lon")).as("cellid"), col("species"))
      .groupBy("cellid", "species").agg(count(lit(1)).as("n"))
      .groupBy("cellid").agg(sum("n").as("ns"), count(lit(1)).as("rich"))
      .select(expr("cast(length(bin(ns)) - 1 as bigint)").as("effort_bits"),
        col("ns"), col("rich"))
      .groupBy("effort_bits")
      .agg(count(lit(1)).as("n_cells"), sum("ns").as("n_occ"),
        sum("rich").as("rich_sum"), min("rich").as("rich_min"),
        max("rich").as("rich_max"))
      .withColumn("rich_milli_mean", expr("rich_sum * 1000 div n_cells"))

  /** IUCN-style range metrics next to the hull area (range_convex_hull,
    * cf. range_estimation_pipeline, reference transforms.py:889-934):
    * AOO — area of occupancy — as the count of DISTINCT occupied
    * 0.02°-grid cells, and the EOO proxy as the bounding-box spans, all
    * in exact integers (floor of a scaled coordinate; min/max/count are
    * order-free, so no decimal machinery is needed). Plan: one
    * partial-aggregated exchange of |species| rows — the distinct-cell
    * count partial-aggregates on (species, cell) map-side first. */
  def occEooAoo(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(col("species"),
        expr("cast(floor(lat * 50.0) as bigint)").as("lat50"),
        expr("cast(floor(lon * 50.0) as bigint)").as("lon50"),
        expr("cast(floor(lat * 10.0) as bigint)").as("lat10"),
        expr("cast(floor(lon * 10.0) as bigint)").as("lon10"))
      .groupBy("species")
      .agg(count(lit(1)).as("n_pts"),
        countDistinct(col("lat50") * 20000 + col("lon50")).as("aoo_cells"),
        (max("lat10") - min("lat10")).as("lat_span_deci"),
        (max("lon10") - min("lon10")).as("lon_span_deci"))

  /** Phenology profile — the seasonality question occurrence archives
    * answer next to the where of range maps: per species the month
    * histogram collapsed to peak month (argmax = min over
    * (−count, month) structs: hash aggregate, integer-only,
    * deterministic tie to the EARLIEST month — the ivfTopk lesson, no
    * window skew), month breadth, and the peak's exact integer
    * milli-share. Plan: two partial-aggregated exchanges —
    * (species, month) then species — both tiny. */
  def occSeasonality(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(col("species"),
        month(expr("timestamp_micros(ts_ns div 1000)")).cast("long").as("m"))
      .groupBy("species", "m").agg(count(lit(1)).as("n"))
      .groupBy("species")
      .agg(sum("n").as("n_total"),
        count(lit(1)).as("n_months"),
        min(struct((-col("n")).as("nn"), col("m").as("mm"))).as("pk"))
      .select(col("species"), col("n_total"), col("n_months"),
        col("pk.mm").as("peak_month"), (-col("pk.nn")).as("peak_n"),
        expr("(-pk.nn) * 1000 div n_total").as("peak_millis"))

  /** Month-over-month range-centroid displacement per species — the
    * MOVEMENT readout next to occ_seasonality's WHEN histogram (is the
    * population's center of mass drifting — migration/shift signal over
    * range_estimation_pipeline's cleaned points): coordinates quantize
    * to OFFSET milli-degrees (floor((lat+90)·1000) — the +90/+180 shift
    * keeps every sum non-negative, so the centroid's integer division
    * truncates identically on both engines; the CLAUDE.md negative-div
    * landmine never arises), centroids fold per (species, year-month),
    * and displacement is the exact L1 milli-degree distance to the
    * previous month's centroid (no sqrt — nothing irrational). Plan:
    * one partial-aggregated (species, ym) exchange; the lag window
    * rides the aggregate-sized relation. */
  def occCentroidShift(s: SparkSession, dir: String): DataFrame = {
    val ts = "timestamp_micros(ts_ns div 1000)"
    val cent = valid(s, dir)
      .select(col("species"),
        (year(expr(ts)) * 100 + month(expr(ts))).cast("long").as("ym"),
        expr("cast(floor((lat + 90.0) * 1000) as bigint)").as("latq"),
        expr("cast(floor((lon + 180.0) * 1000) as bigint)").as("lonq"))
      .groupBy("species", "ym")
      .agg(count(lit(1)).as("n"),
        expr("sum(latq) div count(1)").as("clat_q"),
        expr("sum(lonq) div count(1)").as("clon_q"))
    val w = Window.partitionBy("species").orderBy("ym")
    cent
      .withColumn("plat", lag("clat_q", 1).over(w))
      .withColumn("plon", lag("clon_q", 1).over(w))
      .select(col("species"), col("ym"), col("n"), col("clat_q"),
        col("clon_q"),
        (abs(col("clat_q") - col("plat")) + abs(col("clon_q") - col("plon")))
          .as("l1_shift_mdeg"))
  }

  /** Survey-gap analysis per species — the WHERE-haven't-we-looked
    * readout conservation planning runs over occurrence archives: at
    * the 0.1° grid, the species' bounding box spans
    * (lat_span+1)·(lon_span+1) cells but only `occupied` are sampled;
    * the unsampled remainder's exact milli fraction is the gap.
    * A high gap on a wide-bbox species flags under-surveyed range (or
    * a fragmented one — read next to occ_eoo_aoo). All floor-grid
    * integers, one partial-aggregated |species|-row exchange. */
  def occGapAnalysis(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(col("species"),
        expr("cast(floor(lat * 10.0) as bigint)").as("lat10"),
        expr("cast(floor(lon * 10.0) as bigint)").as("lon10"))
      .groupBy("species")
      .agg(count(lit(1)).as("n_pts"),
        countDistinct(col("lat10") * 4000 + col("lon10")).as("occupied"),
        ((max("lat10") - min("lat10") + 1) *
          (max("lon10") - min("lon10") + 1)).as("bbox_cells"))
      .withColumn("gap_milli",
        expr("(bbox_cells - occupied) * 1000 div bbox_cells"))

  /** Per-species climatic-niche ENVELOPE — the temperature/precipitation
    * tolerance box species-distribution models start from (the niche
    * question clim_summary's per-accession stats stop short of): each
    * occurrence samples the synthetic climate raster at its 1°-cell
    * (the [[climAnnotate]] lattice, point sample — no buffer), and the
    * species folds to min/max per variable plus the envelope breadth,
    * ALL in the raster's exact deci-unit integers (deci-Kelvin ×
    * deci-mm — no unit conversion, no floats, nothing to diverge).
    * Plan: one partial-aggregated |species|-row exchange. */
  def occClimateEnvelope(s: SparkSession, dir: String): DataFrame = {
    val cid = cell1(col("lat"), col("lon"))
    valid(s, dir)
      .filter(cid >= 0 && cid <= 64799)
      .select(col("species"),
        rasterT(cid).as("t_deci"),
        rasterP(cid).as("p_deci"))
      .groupBy("species")
      .agg(count(lit(1)).as("n_pts"),
        min("t_deci").as("t_lo"), max("t_deci").as("t_hi"),
        min("p_deci").as("p_lo"), max("p_deci").as("p_hi"))
      .withColumn("breadth", expr("(t_hi - t_lo) * (p_hi - p_lo)"))
  }

  /** Latitudinal diversity gradient — the first-order macroecology
    * readout (richness should peak somewhere and decay poleward; a flat
    * profile on real data is a sampling-bias alarm): per 10° latitude
    * band the occurrence mass, observed species richness, occupied
    * 1°-cell count, and the band's exact milli share of occurrences.
    * Plan: one (band, species) partial agg + one (band, cell) distinct
    * leg + the band rollup — the total window rides ≤ 18 band rows. */
  def occLatitudeGradient(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    val base = valid(s, dir)
      .select(floor(col("lat") / 10.0).cast("long").as("band"),
        col("species"), cell1(col("lat"), col("lon")).as("cid"))
    val sp = base.select("band", "species").distinct()
      .groupBy("band").agg(count(lit(1)).as("n_species"))
    val cl = base.select("band", "cid").distinct()
      .groupBy("band").agg(count(lit(1)).as("n_cells"))
    base.groupBy("band").agg(count(lit(1)).as("n_occ"))
      .join(sp, Seq("band")).join(cl, Seq("band"))
      .withColumn("occ_share_milli",
        expr("n_occ * 1000 div greatest(sum(n_occ) over (), 1L)"))
  }

  /** Envelope projection — the SDM-lite "potential range" readout the
    * range-estimation pipeline publishes next to the observed map: for
    * each species, how many of the 64 800 raster cells fall INSIDE its
    * observed (t, p) climate box ([[occClimateEnvelope]]'s min/max), vs
    * how many distinct cells it actually occupies. occupancy_milli ≤ 1000
    * by construction (every observed cell's climate is inside its own
    * envelope — spec-pinned); a tiny ratio = a wide-niche species that
    * has barely been surveyed. Plan: the raster is a GENERATED 64 800-row
    * range (never a table scan), the ≤|species|-row envelope boxes
    * broadcast against it (the documented BNLJ class — both sides
    * layout constants), and the corpus contributes only the two
    * species-grain aggregates. */
  def occEnvelopeProjection(s: SparkSession, dir: String): DataFrame = {
    val cid = cell1(col("lat"), col("lon"))
    val boxes = occClimateEnvelope(s, dir)
      .select(col("species"), col("n_pts"), col("t_lo"), col("t_hi"),
        col("p_lo"), col("p_hi"))
    val obs = valid(s, dir)
      .filter(cid >= 0 && cid <= 64799)
      .select(col("species"), cid.as("cid")).distinct()
      .groupBy("species").agg(count(lit(1)).as("observed_cells"))
    val cells = s.range(0, 64800).toDF("cid")
      .select(col("cid"), rasterT(col("cid")).as("t"), rasterP(col("cid")).as("p"))
    val suit = cells
      .join(broadcast(boxes),
        col("t").between(col("t_lo"), col("t_hi")) &&
          col("p").between(col("p_lo"), col("p_hi")))
      .groupBy("species").agg(count(lit(1)).as("suitable_cells"))
    boxes.select("species", "n_pts")
      .join(obs, Seq("species"))
      .join(suit, Seq("species"))
      .withColumn("occupancy_milli",
        expr("observed_cells * 1000 div greatest(suitable_cells, 1L)"))
  }

  /** Levins niche breadth per species — the inverse-Simpson B = 1/Σp²
    * over 10 temperature bins of the shared climate lattice (the
    * envelope's t_hi−t_lo range can't tell a generalist from a species
    * with two extreme outposts; B can): shares floored to milli FIRST
    * (divide-first — Σp_milli ≤ 1000 keeps Σp² ≤ 1e6, so B_milli =
    * 1e9 div Σp²_micro ≥ 1000 and the standardized Levins
    * (B−1)/(B_max−1) is a nonnegative division on both engines).
    * Samples the SAME rasterT lattice as climAnnotate/occClimateEnvelope.
    * Plan: one (species, bin) partial agg; the species-total window and
    * both rollups ride ≤ |species|×10 rows. */
  def occNicheBreadth(s: SparkSession, dir: String): DataFrame = {
    val cid = cell1(col("lat"), col("lon"))
    val bySp = Window.partitionBy("species")
    valid(s, dir)
      .filter(cid >= 0 && cid <= 64799)
      .select(col("species"), rasterT(cid).as("t_deci"))
      .withColumn("bin", expr("t_deci div 400"))
      .groupBy("species", "bin").agg(count(lit(1)).as("nb"))
      .withColumn("n", sum("nb").over(bySp))
      .groupBy("species")
      .agg(min("n").as("n_pts"), count(lit(1)).as("n_bins"),
        sum(expr("(nb * 1000 div n) * (nb * 1000 div n)")).as("sum_p2_micro"))
      .select(col("species"), col("n_pts"), col("n_bins"), col("sum_p2_micro"),
        expr("1000000000 div greatest(sum_p2_micro, 1L)").as("b_milli"),
        expr("(1000000000 div greatest(sum_p2_micro, 1L) - 1000) * 1000 div 9000")
          .as("ba_milli"))
  }

  /** Chao1 species-richness estimate per 1°-cell — the "how many species
    * are we MISSING here" question next to occ_cell_diversity's observed
    * counts (the richness readout over range_estimation_pipeline's
    * cleaned occurrences, cf. reference transforms.py:889-934): S_obs
    * plus the bias-corrected singleton/doubleton term
    * f1·(f1−1) / (2·(f2+1)), kept exact — counts are integers and the
    * single floor division happens once at the end in milli units.
    * Plan: two partial-aggregated exchanges — (cell, species) then
    * cell — both map-side combined; |cells| rows out. */
  def occChao1Richness(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(floor(col("lat")).cast("long").as("cell_lat"),
        floor(col("lon")).cast("long").as("cell_lon"), col("species"))
      .groupBy("cell_lat", "cell_lon", "species")
      .agg(count(lit(1)).as("n"))
      .groupBy("cell_lat", "cell_lon")
      .agg(count(lit(1)).as("s_obs"),
        sum("n").as("n_occ"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("n") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_millis",
        expr("s_obs * 1000 + (1000 * f1 * (f1 - 1)) div (2 * (f2 + 1))"))

  /** Chao2 incidence-based richness — the SAMPLING-UNIT sibling of
    * [[occChao1Richness]]'s abundance estimator (Chao1 reads per-cell
    * abundance singletons/doubletons; Chao2 reads species' INCIDENCE
    * across cells — how many 10° sampling units each species occurs in
    * — the right estimator when detection within a unit is
    * presence-only): q₁/q₂ = species in exactly 1/2 units,
    * bias-corrected Ŝ = S_obs + ((m−1)/m)·q₁(q₁−1)/(2(q₂+1)) on the
    * chao1 milli lattice (divide once at the end; (q₂+1) keeps the
    * q₂ = 0 corpus finite). One incidence distinct + two tiny
    * rollups, single-row output. */
  def occChao2Richness(s: SparkSession, dir: String): DataFrame = {
    val inc = valid(s, dir)
      .withColumn("cellid", cell10(col("lat"), col("lon")))
      .select("species", "cellid").distinct()
      .transform(graft.Ckpt.capped) // m fold + the species rollup both read it
    val m1 = inc.select("cellid").distinct()
      .agg(count(lit(1)).as("m"))
    inc.groupBy("species").agg(count(lit(1)).as("u"))
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("u") === 1, 1L).otherwise(0L)).as("q1"),
        sum(when(col("u") === 2, 1L).otherwise(0L)).as("q2"))
      .crossJoin(broadcast(m1))
      .select(col("m"), col("s_obs"), col("q1"), col("q2"),
        expr("s_obs * 1000 + ((m - 1) * q1 * (q1 - 1) * 1000) " +
          "div (m * 2 * (q2 + 1))").as("chao2_milli"))
  }

  private val CHAO2_SQL = withSql(OCC_SQL, VALID_SQL,
    """inc AS (
      |  SELECT DISTINCT species,
      |    (CAST(FLOOR(lat / 10.0) AS BIGINT) + 9) * 36
      |      + CAST(FLOOR(lon / 10.0) AS BIGINT) + 18 AS cellid
      |  FROM valid),
      |mm AS (SELECT CAST(COUNT(DISTINCT cellid) AS BIGINT) AS m FROM inc),
      |sq AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
      |    CAST(SUM(CASE WHEN u = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
      |    CAST(SUM(CASE WHEN u = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2
      |  FROM (SELECT species, CAST(COUNT(*) AS BIGINT) AS u
      |        FROM inc GROUP BY 1))""".stripMargin)(
    """SELECT m, s_obs, q1, q2,
      |  s_obs * 1000 + ((m - 1) * q1 * (q1 - 1) * 1000)
      |    // (m * 2 * (q2 + 1)) AS chao2_milli
      |FROM sq, mm""".stripMargin)

  /** select_best_record per (species, 1°-cell): min uncertainty wins. */
  def occDedupeBest(s: SparkSession, dir: String): DataFrame = {
    val d = valid(s, dir)
      .withColumn("cell_lat", floor(col("lat")).cast("long"))
      .withColumn("cell_lon", floor(col("lon")).cast("long"))
    val w = Window.partitionBy("species", "cell_lat", "cell_lon")
      .orderBy(col("uncert"), col("occ_id"))
    d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("species", "cell_lat", "cell_lon", "occ_id", "uncert")
  }

  /** The full cleaning chain of cleaning_occs_pipeline.py: coord filters →
    * uncertainty band → land semi-join → centroid anti-join → keep-best
    * dedup. One narrow fused stage, then one shuffle for the window. */
  def occCleanPipeline(s: SparkSession, dir: String): DataFrame =
    cleanFrom(occ(s, dir), s)

  /** The full cleaning chain over any occurrence-shaped frame (coord
    * validity, uncertainty band, land semi-join, centroid anti-join,
    * keep-best dedup) — factored so instrumented/streaming variants reuse
    * the exact same plan. */
  def cleanFrom(occDf: DataFrame, s: SparkSession): DataFrame = {
    val banded = occDf.filter(
        !(col("lat") === 0.0 && col("lon") === 0.0) &&
          col("lat").between(-90.0, 90.0) && col("lon").between(-180.0, 180.0))
      .filter(col("uncert").between(1000.0, 5000.0))
      .withColumn("cellid", cell10(col("lat"), col("lon")))
      .join(broadcast(landCells(s)), Seq("cellid"), "left_semi")
      .join(broadcast(centroids(s)),
        haversineM(col("lat"), col("lon"), col("clat"), col("clon")) <= CENTROID_DIST_M,
        "left_anti")
      .withColumn("cell_lat", floor(col("lat")).cast("long"))
      .withColumn("cell_lon", floor(col("lon")).cast("long"))
    val w = Window.partitionBy("species", "cell_lat", "cell_lon")
      .orderBy(col("uncert"), col("occ_id"))
    banded.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("occ_id", "species", "lat", "lon", "uncert")
  }

  private val CLEANED_SQL: String =
    s"""cleaned AS (
       |  SELECT occ_id, species, lat, lon, uncert FROM (
       |    SELECT v.*,
       |      ROW_NUMBER() OVER (
       |        PARTITION BY species, CAST(FLOOR(lat) AS BIGINT), CAST(FLOOR(lon) AS BIGINT)
       |        ORDER BY uncert, occ_id) AS rn
       |    FROM valid v
       |    WHERE uncert BETWEEN 1000.0 AND 5000.0
       |      AND $CELL10_SQL IN (SELECT cellid FROM land)
       |      AND NOT EXISTS (SELECT 1 FROM cent c
       |            WHERE ${haversineSql("v.lat", "v.lon", "c.clat", "c.clon")} <= $CENTROID_DIST_M))
       |  WHERE rn = 1)""".stripMargin

  /** GenerateUncertaintyAreaFn: metric radius → degree bbox. The reference
    * buffers in a local AEQD projection (transforms.py:428); the degree
    * half-widths below are the same first-order math. Trig-derived lon
    * bounds are rounded (libm may differ by 1 ulp across engines). */
  def uncertaintyBuffer(s: SparkSession, dir: String): DataFrame = {
    val radius = greatest(col("uncert"), lit(100.0))
    val dlat = radius / 111320.0
    // Near the poles cos(lat)→0 blows the longitude half-width up to
    // ~1e13 — where rounding to 6 decimals is below the double's ulp and
    // cross-engine rounding diverges. A buffer that wraps the pole spans
    // all longitudes, so 360° is the physical bound.
    val dlon = least(radius / (lit(111320.0) * cos(radians(col("lat")))), lit(360.0))
    valid(s, dir).select(col("occ_id"),
      (col("lat") - dlat).as("lat_min"), (col("lat") + dlat).as("lat_max"),
      round(col("lon") - dlon, 6).as("lon_min"),
      round(col("lon") + dlon, 6).as("lon_max"))
  }

  /** AnnotateWithCHELSAFn with buffer ZONAL semantics (transforms.py:
    * 546-630: the raster is masked to the uncertainty polygon and the
    * unmasked cells averaged). The buffer here is the uncertainty bbox
    * (same degree half-widths as [[uncertaintyBuffer]]) and the raster a
    * deterministic function of the 1° cell. Cells intersecting the bbox
    * are enumerated by a BOUNDED explode (≤2 lat rows × antimeridian-
    * wrapped lon range, capped at one globe), then averaged per
    * occurrence — map-side partial aggregation, one shuffle of narrow
    * (keys, raw-sum) rows; a real raster becomes a broadcast cell→value
    * table joined on cellid. Unit conversions follow transforms.py:
    * 599-603 — temp mean*0.1-273.15 (UNrounded: the mean is pure-rational
    * and cross-engine ROUND diverges on shortest-repr near-ties, SURVEY
    * §4); precip mean*0.1 rounded to 0 decimals (integer-adjacent x.5
    * ties are exactly representable, so HALF_UP agrees everywhere). The
    * trig-derived lon half-width is rounded to 6 dp before flooring so a
    * 1-ulp libm difference cannot flip the cell range (same guard as
    * uncertainty_buffer). */
  def climAnnotate(s: SparkSession, dir: String): DataFrame =
    climAnnotateFrom(valid(s, dir))

  /** [[climAnnotate]]'s zonal lattice over ANY occurrence-shaped frame
    * (occ_id, accession, species, lat, lon, uncert) — factored so the
    * composed ingest DAG can annotate the CLEANED occurrences (the
    * reference wires spatial_annotation after cleaning_occs). */
  private def climAnnotateFrom(src: DataFrame): DataFrame = {
    val c = cell1(col("lat"), col("lon"))
    val radius = greatest(col("uncert"), lit(100.0))
    val dlat = radius / 111320.0
    val dlon = round(
      least(radius / (lit(111320.0) * cos(radians(col("lat")))), lit(360.0)), 6)
    val la0 = greatest(floor(col("lat") - dlat).cast("long"), lit(-90L))
    val la1 = least(floor(col("lat") + dlat).cast("long"), lit(89L))
    val lo0 = floor(col("lon") - dlon).cast("long")
    val lo1 = least(floor(col("lon") + dlon).cast("long"), lo0 + 359L)
    val cid = (col("la") + 90L) * 360L + pmod(col("lo") + 180L, lit(360L))
    src
      .filter(c >= 0 && c <= 64799)
      .select(col("occ_id"), col("accession"), col("species"),
        explode(sequence(la0, la1)).as("la"), lo0.as("lo0"), lo1.as("lo1"))
      .select(col("occ_id"), col("accession"), col("species"), col("la"),
        explode(sequence(col("lo0"), col("lo1"))).as("lo"))
      .select(col("occ_id"), col("accession"), col("species"), cid.as("cid"))
      .groupBy("occ_id", "accession", "species")
      .agg(count(lit(1)).as("n_cells"),
        sum(rasterT(col("cid"))).as("s1"),
        sum(rasterP(col("cid"))).as("s12"))
      .select(col("occ_id"), col("accession"), col("species"), col("n_cells"),
        (col("s1").cast("double") / (col("n_cells") * 10.0) - 273.15).as("bio1"),
        round(col("s12").cast("double") / (col("n_cells") * 10.0), 0).as("bio12"))
  }

  private val CLIM_SQL: String = climSqlOver("valid")

  /** [[CLIM_SQL]] parameterized on the source relation — the composed
    * ingest oracle runs the identical lattice over the cleaned CTE. */
  private def climSqlOver(rel: String): String =
    s"""clim AS (
       |  SELECT occ_id, accession, species, n_cells,
       |    CAST(s1 AS DOUBLE) / (n_cells * 10.0) - 273.15 AS bio1,
       |    ROUND(CAST(s12 AS DOUBLE) / (n_cells * 10.0), 0) AS bio12
       |  FROM (
       |    SELECT occ_id, accession, species, COUNT(*) AS n_cells,
       |      CAST(SUM($RASTER_T_SQL) AS BIGINT) AS s1,
       |      CAST(SUM($RASTER_P_SQL) AS BIGINT) AS s12
       |    FROM (
       |      SELECT occ_id, accession, species,
       |        (la + 90) * 360 + ((lo + 180) % 360 + 360) % 360 AS cid
       |      FROM (
       |        SELECT occ_id, accession, species, la,
       |          unnest(generate_series(lo0, lo1)) AS lo
       |        FROM (
       |          SELECT occ_id, accession, species,
       |            unnest(generate_series(la0, la1)) AS la, lo0, lo1
       |          FROM (
       |            SELECT occ_id, accession, species,
       |              GREATEST(CAST(FLOOR(lat - dlat) AS BIGINT), -90) AS la0,
       |              LEAST(CAST(FLOOR(lat + dlat) AS BIGINT), 89) AS la1,
       |              CAST(FLOOR(lon - dlon) AS BIGINT) AS lo0,
       |              LEAST(CAST(FLOOR(lon + dlon) AS BIGINT),
       |                    CAST(FLOOR(lon - dlon) AS BIGINT) + 359) AS lo1
       |            FROM (
       |              SELECT occ_id, accession, species, lat, lon,
       |                GREATEST(uncert, 100.0) / 111320.0 AS dlat,
       |                ROUND(LEAST(GREATEST(uncert, 100.0)
       |                        / (111320.0 * COS(RADIANS(lat))),
       |                      CAST(360.0 AS DOUBLE)), 6) AS dlon
       |              FROM $rel
       |              WHERE ($CELL1_SQL) BETWEEN 0 AND 64799)))))
       |    GROUP BY occ_id, accession, species))""".stripMargin

  /** Exact linear-interpolation percentile over a collected group — the
    * same formula as numpy/DuckDB quantile_cont. Groups are bounded
    * (occurrences per accession), so collect_list is safe at scale. */
  private def pctile(arr: Column, p: Double): Column = {
    val n = size(arr)
    val h = (n - 1).cast("double") * lit(p)
    val lo = floor(h).cast("int")
    val a = element_at(arr, lo + 1)
    val b = element_at(arr, least(lo + 2, n))
    a + (b - a) * (h - floor(h))
  }

  /** ClimateSummaryFn (transforms.py:646): per-accession stats. Mean/sd via
    * exact decimal sums; sd is population sd (numpy default). Mean and
    * percentiles are pure-rational → left unrounded (see cleaningSummary
    * note); sd passes through sqrt (irrational) → rounding is safe. */
  def climSummary(s: SparkSession, dir: String): DataFrame = {
    val d6 = col("bio1").cast(DecimalType(18, 6))
    val n = count(lit(1))
    val sx = sum(d6).cast("double")
    val sx2 = sum(d6 * d6).cast("double")
    val mean = sx / n
    val sd = sqrt(greatest(sx2 / n - pow(sx / n, 2), lit(0.0)))
    val arr = sort_array(collect_list(col("bio1")))
    climAnnotate(s, dir).groupBy("accession")
      .agg(
        min(col("species")).as("species"),
        n.as("n"),
        mean.as("bio1_mean"),
        round(sd, 2).as("bio1_sd"),
        pctile(arr, 0.5).as("bio1_med"),
        pctile(arr, 0.05).as("bio1_p5"),
        pctile(arr, 0.95).as("bio1_p95"),
        min(col("bio1")).as("bio1_min"),
        max(col("bio1")).as("bio1_max"),
        (sum(col("bio12").cast(DecimalType(18, 6))).cast("double") / n).as("bio12_mean"),
        min(col("bio12")).as("bio12_min"),
        max(col("bio12")).as("bio12_max"))
  }

  /** DuckDB-side mirror of [[pctile]] over a pre-aggregated sorted list
    * column `arr` with group size `n` — identical double arithmetic. */
  private def pctSql(p: String): String = {
    // NB: a bare 0.05 literal is DECIMAL in DuckDB (exact arithmetic) but
    // double in Spark — cast to DOUBLE so both interpolate identically.
    val h = s"(n - 1) * CAST($p AS DOUBLE)"
    val lo = s"CAST(FLOOR($h) AS BIGINT)"
    s"(arr[$lo + 1] + (arr[LEAST($lo + 2, n)] - arr[$lo + 1]) * (($h) - FLOOR($h)))"
  }

  /** Pseudo-random cell→region multimap over the 1° grid (0-3 regions per
    * cell; ~10% of cells have none, so no-match outer-join paths carry
    * real data) standing in for the Ecoregions2017 layer. Carries the
    * reference's keep_fields map — {"realm": "REALM", "biome":
    * "BIOME_NAME"}, transforms.py:747-755 — as two attribute columns
    * (8 realms, 14 biomes, Ecoregions2017's cardinalities). */
  def regions(s: SparkSession): DataFrame =
    s.range(64800L * 3).select(
        expr("id div 3").as("cellid"), (col("id") % 3).as("k"))
      .filter((col("cellid") * 13 + col("k") * 2) % 10 < 5)
      .select(col("cellid"),
        concat(lit("realm_"), ((col("cellid") * 31 + col("k") * 17) % 8).cast("string")).as("realm"),
        concat(lit("biome_"), ((col("cellid") * 47 + col("k") * 29) % 14).cast("string")).as("biome"))

  private val REGIONS_SQL: String =
    """regions AS (
      |  SELECT cellid,
      |    'realm_' || CAST((cellid * 31 + k * 17) % 8 AS VARCHAR) AS realm,
      |    'biome_' || CAST((cellid * 47 + k * 29) % 14 AS VARCHAR) AS biome
      |  FROM (SELECT range AS cellid FROM range(64800)),
      |       (SELECT range AS k FROM range(3))
      |  WHERE (cellid * 13 + k * 2) % 10 < 5)""".stripMargin

  /** AnnotateWithBiogeoFn: per-occurrence sorted distinct values for EVERY
    * keep_fields entry — realm and biome (transforms.py:747-801) — via a
    * broadcast cell→region join. collect_set dedups each field inside ONE
    * aggregation — a single shuffle carries both fields, instead of a
    * distinct + groupBy pair per field. */
  def biogeoAnnotate(s: SparkSession, dir: String): DataFrame =
    biogeoAgg(s, dir, Seq("occ_id", "accession", "species"))

  /** BiogeoSummaryNestedFn: distinct count + sorted values per field per
    * accession (transforms.py:804-886). */
  def biogeoSummary(s: SparkSession, dir: String): DataFrame =
    biogeoAgg(s, dir, Seq("accession", "species"))

  private def biogeoAgg(s: SparkSession, dir: String, keys: Seq[String]): DataFrame =
    biogeoAggFrom(valid(s, dir), s, keys)

  /** [[biogeoAgg]] over ANY occurrence-shaped frame — see
    * [[climAnnotateFrom]] for why the source is a parameter. */
  private def biogeoAggFrom(src: DataFrame, s: SparkSession, keys: Seq[String]): DataFrame = {
    val c = cell1(col("lat"), col("lon"))
    val realms = array_sort(collect_set(col("realm")))
    val biomes = array_sort(collect_set(col("biome")))
    src.filter(c >= 0 && c <= 64799)
      .withColumn("cellid", c)
      .join(broadcast(regions(s)), Seq("cellid"))
      .groupBy(keys.map(col): _*)
      .agg(size(realms).cast("long").as("n_realms"),
        array_join(realms, ",").as("realms"),
        size(biomes).cast("long").as("n_biomes"),
        array_join(biomes, ",").as("biomes"))
  }

  /** merge_summary_annotations (data_ingestion helpers.py:58-68): the last
    * step of spatial_annotation_pipeline merges the per-accession climate
    * summary and biogeo summary. The reference CoGroupByKeys the two
    * summary streams and dict-merges `{**climate, **biogeo}` with an
    * empty dict for an absent side — i.e. a FULL OUTER join on accession
    * with the shared `species` key coalesced biogeo-first (later dict
    * wins). Both subtrees already end in an accession-keyed hash
    * aggregate, so at scale the merge co-partitions on the same key and
    * AQE broadcast-joins the (accession-grain, tiny) frames. */
  def spatialSummaryJoin(s: SparkSession, dir: String): DataFrame = {
    val c = climSummary(s, dir).withColumnRenamed("species", "c_species")
    val b = biogeoSummary(s, dir).withColumnRenamed("species", "b_species")
    c.join(b, Seq("accession"), "full_outer")
      .select(col("accession"),
        coalesce(col("b_species"), col("c_species")).as("species"),
        col("n"), col("bio1_mean"), col("bio1_sd"), col("bio1_med"),
        col("bio1_p5"), col("bio1_p95"), col("bio1_min"), col("bio1_max"),
        col("bio12_mean"), col("bio12_min"), col("bio12_max"),
        col("n_realms"), col("realms"), col("n_biomes"), col("biomes"))
  }

  private val BIOGEO_PAIRS_SQL: String =
    s"""pairs AS (
       |  SELECT DISTINCT occ_id, accession, species, realm
       |  FROM (SELECT occ_id, accession, species, $CELL1_SQL AS cellid FROM valid
       |        WHERE ($CELL1_SQL) BETWEEN 0 AND 64799) v
       |  JOIN regions USING (cellid))""".stripMargin

  /** Un-deduplicated (occ, realm, biome) join rows for the widened biogeo
    * oracles — per-field dedup happens in the aggregate (DISTINCT inside
    * COUNT / string_agg), mirroring the per-field collect_set. */
  private val BIOGEO_JOINED_SQL: String =
    s"""bg AS (
       |  SELECT occ_id, accession, species, realm, biome
       |  FROM (SELECT occ_id, accession, species, $CELL1_SQL AS cellid FROM valid
       |        WHERE ($CELL1_SQL) BETWEEN 0 AND 64799) v
       |  JOIN regions USING (cellid))""".stripMargin

  /** EstimateRangeFn, bbox variant: per-species equal-area-ish km² from the
    * lat/lon envelope; <3 points → NULL area plus the reference's
    * explanatory note (transforms.py:915-921). The exact convex-hull
    * variant is a custom Aggregator (rows-only oracle). */
  def rangeBbox(s: SparkSession, dir: String): DataFrame =
    valid(s, dir).groupBy("species")
      .agg(count(lit(1)).as("n_points"),
        when(count(lit(1)) >= 3,
          round((max(col("lat")) - min(col("lat"))) * 111.32 *
            (max(col("lon")) - min(col("lon"))) * 111.32 *
            cos(radians((max(col("lat")) + min(col("lat"))) / 2)), 2))
          .as("area_km2"),
        when(count(lit(1)) < 3, lit("Insufficient points for convex hull"))
          .as("note"))

  /** ValidateNamesFn match rules (transforms.py:182-211): records missing
    * a scientificName go straight to to_check carrying the upstream
    * ena_error (ENATaxonomyFn, transforms.py:160-164); otherwise the GBIF
    * backbone fields are attached and EXACT or high-confidence FUZZY →
    * validated, else to_check — with acceptedUsageKey / alternatives
    * enrichment only on the to_check branch (transforms.py:203-207). */
  def taxValidateSplit(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val hasName = k % 23 =!= 0
    val mt = (k % 5).cast("int")
    val matchType = when(!hasName, lit(null).cast("string"))
      .when(mt === 0, "EXACT").when(mt === 1 || mt === 2, "FUZZY")
      .when(mt === 3, "HIGHERRANK").otherwise("NONE")
    val conf = when(hasName, k * 13 % 101)
    t(s, dir, "customer").select(
        k.as("tax_id"),
        matchType.as("match_type"),
        conf.as("confidence"),
        when(hasName, concat(lit("sp_"), (k % 50).cast("string"))).as("gbif_scientific_name"),
        when(hasName, k * 7 % 100000).as("gbif_usage_key"),
        when(hasName,
          when(k % 4 === 0, "ACCEPTED").when(k % 4 === 1, "SYNONYM").otherwise("DOUBTFUL"))
          .as("gbif_status"),
        when(hasName, lit("SPECIES")).as("gbif_rank"),
        when(!hasName, lit("Missing scientificName")).as("ena_error"))
      .withColumn("status",
        when(col("match_type") === "EXACT" ||
          (col("match_type") === "FUZZY" && col("confidence") >= 95), "validated")
          .otherwise("to_check"))
      // to_check-branch-only enrichment (transforms.py:203-207).
      .withColumn("gbif_accepted_usage_key",
        when(col("status") === "to_check" && col("match_type").isNotNull &&
          col("tax_id") % 2 === 0, col("tax_id") * 11 % 100000))
      .withColumn("gbif_alternatives",
        when(col("status") === "to_check" && col("match_type").isNotNull &&
          col("tax_id") % 3 === 0,
          concat(lit("alt_"), (col("tax_id") * 3 % 50).cast("string"),
            lit(";alt_"), (col("tax_id") * 5 % 50).cast("string"))))
  }

  /** occurrences_pipeline.py:31-78 — the reference's most distinctive
    * pipeline shape: the fetch step forks into success / dead-letter
    * outputs (`with_outputs("dead", main="success")`), dead records land
    * in a JSONL sink (sources/Jsonl.deadLetters — exercised in
    * SourcesSpec), and BOTH branches Flatten into one CombineGlobally
    * summary {species_succeeded, species_failed, occurrences_written}.
    * The HTTP fetch is modeled deterministically: input = the validated
    * branch of [[taxValidateSplit]]; a pseudo-random predicate stands in
    * for fetch failures; each success contributes its species' REAL
    * occurrence count as n_occurrences. Beam's CombineGlobally is Spark's
    * two-stage global aggregate — map-side partials, then one final row —
    * so nothing wide ever converges on a single task. */
  def occFetchSummary(s: SparkSession, dir: String): DataFrame = {
    val sp = taxValidateSplit(s, dir)
      .filter(col("status") === "validated")
      .select(col("tax_id"), col("gbif_scientific_name").as("species"))
    val counts = occ(s, dir).groupBy("species").agg(count(lit(1)).as("n_occ"))
    val isDead = col("tax_id") % 13 === 0
    sp.join(broadcast(counts), Seq("species"), "left_outer")
      .agg(
        sum(when(!isDead, 1L).otherwise(0L)).as("species_succeeded"),
        sum(when(isDead, 1L).otherwise(0L)).as("species_failed"),
        sum(when(!isDead, coalesce(col("n_occ"), lit(0L))).otherwise(0L))
          .as("occurrences_written"))
  }

  /** keep_new_tax_ids (helpers.py:237): set difference vs the gate table,
    * as one left-anti join instead of CoGroupByKey + filter. */
  def taxGateNew(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("user_id").as("tax_id")).distinct()
      .join(t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("tax_id")),
        Seq("tax_id"), "left_anti")

  /** FetchProvenanceByTaxIdBatchFn URL building (transforms.py:1048-1055):
    * the full provenance record — accession from the LATEST annotation
    * (ann_list[-1]; modeled as max-orderkey per taxon, a max_by hash
    * aggregate), GTF + Ensembl browser paths off that annotation, the
    * portal URL, and gbif_url NULL when the taxon has no usageKey
    * (transforms.py:1054 conditional). Taxa with no annotation at all are
    * dropped (the reference's missing_annotation skip = inner join). */
  def provenanceUrls(s: SparkSession, dir: String): DataFrame = {
    val latest = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderkey")).as("ann_key"))
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(latest, col("c_custkey") === col("o_custkey"))
      .select(
        col("c_custkey").as("tax_id"),
        concat(lit("ANN"), col("ann_key").cast("string")).as("accession"),
        concat(lit("https://www.ebi.ac.uk/biodiversity/data_portal/"),
          col("c_custkey").cast("string")).as("portal_url"),
        concat(lit("https://ftp.ensembl.org/annotations/ANN"),
          col("ann_key").cast("string"), lit(".gtf.gz")).as("gtf_url"),
        concat(lit("https://www.ensembl.org/view?annotation=ANN"),
          col("ann_key").cast("string")).as("browser_url"),
        when(col("c_custkey") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("https://www.gbif.org/species/"),
            (col("c_custkey") * 7 % 100000).cast("string"))).as("gbif_url"),
        col("n_name").as("nation"))
  }

  /** sanitize_species_name (helpers.py:8-20): extract genus + species
    * epithet (first two words) and sanitize for file paths — non-alnum →
    * '_', runs collapsed, ends trimmed. The filename convention every
    * per-species output file uses (write_species_file, helpers.py:31).
    * Pure narrow projection; messy inputs synthesized from brand#part
    * names so the '#' and the third-word cut are both exercised. */
  def taxSanitizeNames(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("p_brand"), lit(" "), col("p_name"))
    val firstTwo = array_join(slice(split(trim(raw), "\\s+"), 1, 2), "_")
    val safe = regexp_replace(
      regexp_replace(
        regexp_replace(firstTwo, "[^A-Za-z0-9_]", "_"), "_+", "_"),
      "^_+|_+$", "")
    t(s, dir, "part").select(col("p_partkey").as("tax_id"),
      raw.as("raw_name"), safe.as("safe_name"))
  }

  /** ENATaxonomyFn lineage enrichment (transforms.py:167-177): attach ALL
    * SIX lineage ranks — kingdom, phylum, class, order, family, genus —
    * to each taxon. The region→nation hierarchy plays the upper lineage
    * tree (kingdom = region, family = nation via chained broadcast joins,
    * replacing the per-record API fetch); the intermediate/lower ranks
    * nest deterministically inside it: 5 phyla per kingdom, classes per
    * phylum, 2 orders per class, and a genus grouping every 2 species. */
  def taxLineage(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("tax_id"),
        concat(lit("sp_"), (col("c_custkey") % 50).cast("string")).as("species"),
        col("r_name").as("kingdom"),
        concat(lit("phy_"),
          (col("r_regionkey") * 5 + col("n_nationkey") % 5).cast("string")).as("phylum"),
        concat(lit("cls_"), col("n_nationkey").cast("string")).as("class"),
        concat(lit("ord_"),
          (col("n_nationkey") * 2 + col("c_custkey") % 2).cast("string")).as("order"),
        col("n_name").as("family"),
        concat(lit("gen_"), expr("(c_custkey % 50) div 2").cast("string")).as("genus"))

  /** spatial_annotation_pipeline's merge step: climate and biogeo
    * annotations co-grouped by occurrenceID (helpers.py:44
    * merge_annotations) — a full-outer join with coalesced keys. */
  def spatialJoin(s: SparkSession, dir: String): DataFrame = {
    val clim = climAnnotate(s, dir)
    val bio = biogeoAnnotate(s, dir)
      .select(col("occ_id").as("b_occ_id"), col("n_realms"), col("realms"))
    clim.join(bio, col("occ_id") === col("b_occ_id"), "full_outer")
      .select(
        coalesce(col("occ_id"), col("b_occ_id")).as("occ_id"),
        col("accession"), col("species"), col("bio1"), col("bio12"),
        coalesce(col("n_realms"), lit(0L)).as("n_realms"),
        coalesce(col("realms"), lit("")).as("realms"))
  }

  /** collect_metadata_experiments_assemblies (airflow dependencies) +
    * parse_data_records (beam common_functions.py:38-54): gather each
    * sample's related records into one ordered list, plus the two fields
    * the reference also collects — the `analyses` sub-list (orders in
    * final status stand in for analysis records) and the
    * `images_available` flag (true if ANY related record carries it; the
    * reference's last-assignment over feed order is equivalent because
    * records only set it when true). All four outputs come from ONE
    * aggregation — a single shuffle, no per-field regroup. */
  def metaCollectRelated(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey").as("sample_id"))
      .agg(count(lit(1)).as("n_related"),
        array_join(array_sort(collect_list(col("o_orderkey"))), ",").as("related_ids"),
        // collect_list skips nulls: only final-status orders enter the list
        array_join(array_sort(collect_list(
          when(col("o_orderstatus") === "F", col("o_orderkey")))), ",").as("analyses"),
        max(col("o_orderpriority") === "1-URGENT").as("images_available"))

  /** classify_samples (beam map_functions.py:31): multi-way classification
    * with per-class tallies; the symbiont test reads a field out of the
    * JSON payload (here via regexp, identical on both engines). */
  def metaClassify(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("category",
        when(col("event_type") === "purchase", "specimens")
          .when(col("event_type") === "signup", "symbionts")
          .when(col("event_type") === "error", "errors")
          .otherwise("metagenomes"))
      .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("long"))
      .groupBy("category")
      .agg(count(lit(1)).as("n_samples"), sum(col("k")).as("sum_k"))

  /** cleaning_summary_pipeline: retained vs total per species. percent is
    * pure-rational double math — deliberately NOT rounded (rational values
    * can sit exactly on a .xx5 boundary where Spark and DuckDB round
    * differently; unrounded doubles from identical arithmetic match). */
  def cleaningSummary(s: SparkSession, dir: String): DataFrame = {
    val tot = occ(s, dir).groupBy("species").agg(count(lit(1)).as("total_records"))
    val ret = occCleanPipeline(s, dir).groupBy("species")
      .agg(count(lit(1)).as("retained_records"))
    tot.join(ret, Seq("species"), "left_outer")
      .select(col("species"), col("total_records"),
        coalesce(col("retained_records"), lit(0L)).as("retained_records"),
        (coalesce(col("retained_records"), lit(0L)) * 100.0 / col("total_records"))
          .as("percent_retained"))
  }

  /** End-to-end reference-DAG composition — the launcher's actual
    * execution order (launcher.py:21-32: taxonomy → occurrences →
    * cleaning_occs → spatial_annotation → range_estimation →
    * data_provenance) run as ONE query, per species (species ↔ accession
    * are 1:1 in the occ derive):
    *   1. taxonomy gates ([[taxValidateSplit]]): per-species validated /
    *      fetch-eligible counts (the occurrences fork's dead-letter
    *      predicate, occurrences_pipeline.py:31-78);
    *   2. the full cleaning chain ([[cleanFrom]]) — checkpointed ONCE and
    *      consumed by FOUR downstream branches so the plan scans/cleans a
    *      single time instead of replaying the chain per reference;
    *   3. climate zonal means + biogeo realms over the CLEANED points
    *      ([[climAnnotateFrom]]/[[biogeoAggFrom]] — the reference
    *      annotates post-cleaning, not the raw feed);
    *   4. range bbox area over the cleaned points;
    *   5. provenance URL rollup ([[provenanceUrls]]) per species.
    * Each species is classified by its FIRST failing pipeline stage
    * (not_validated > fetch_failed > no_clean_occurrences > ingested) —
    * the textCurationVerdict composition discipline, and the oracle nests
    * the components' own oracle SQL as CTEs. All post-clean joins are
    * species-grain (≤ |species| rows) → AQE broadcasts them; the only
    * corpus-sized work is the shared cleaned scan. */
  def bioIngestPipeline(s: SparkSession, dir: String): DataFrame = {
    val taxsp = taxValidateSplit(s, dir)
      .filter(col("gbif_scientific_name").isNotNull)
      .groupBy(col("gbif_scientific_name").as("species"))
      .agg(count(lit(1)).as("n_tax"),
        sum(when(col("status") === "validated", 1L).otherwise(0L))
          .as("n_validated"),
        sum(when(col("status") === "validated" && col("tax_id") % 13 =!= 0, 1L)
          .otherwise(0L)).as("n_fetch_ok"))
    val raw = occ(s, dir).groupBy("species").agg(count(lit(1)).as("n_raw"))
    val cleaned = cleanFrom(occ(s, dir), s)
      .withColumn("accession", expr("replace(species, 'sp_', 'ACC')"))
      .transform(graft.Ckpt.capped)
    val ncl = cleaned.groupBy("species").agg(count(lit(1)).as("n_clean"))
    val climsp = climAnnotateFrom(cleaned)
      .groupBy("species")
      .agg(count(lit(1)).as("n_clim"),
        (sum(col("bio1").cast(DecimalType(18, 6))).cast("double") / count(lit(1)))
          .as("bio1_mean"),
        (sum(col("bio12").cast(DecimalType(18, 6))).cast("double") / count(lit(1)))
          .as("bio12_mean"))
    val biosp = biogeoAggFrom(cleaned, s, Seq("species"))
    val rng = cleaned.groupBy("species")
      .agg(count(lit(1)).as("n_points"),
        when(count(lit(1)) >= 3,
          round((max(col("lat")) - min(col("lat"))) * 111.32 *
            (max(col("lon")) - min(col("lon"))) * 111.32 *
            cos(radians((max(col("lat")) + min(col("lat"))) / 2)), 2))
          .as("area_km2"),
        when(count(lit(1)) < 3, lit("Insufficient points for convex hull"))
          .as("note"))
    val provsp = provenanceUrls(s, dir)
      .select(concat(lit("sp_"), (col("tax_id") % 50).cast("string")).as("species"),
        col("gbif_url"))
      .groupBy("species")
      .agg(count(lit(1)).as("n_prov"),
        sum(when(col("gbif_url").isNotNull, 1L).otherwise(0L)).as("n_gbif"))
    taxsp
      .join(raw, Seq("species"), "left_outer")
      .join(ncl, Seq("species"), "left_outer")
      .join(climsp, Seq("species"), "left_outer")
      .join(biosp, Seq("species"), "left_outer")
      .join(rng, Seq("species"), "left_outer")
      .join(provsp, Seq("species"), "left_outer")
      .select(col("species"), col("n_tax"), col("n_validated"), col("n_fetch_ok"),
        coalesce(col("n_raw"), lit(0L)).as("n_raw"),
        coalesce(col("n_clean"), lit(0L)).as("n_clean"),
        when(coalesce(col("n_raw"), lit(0L)) > 0,
          coalesce(col("n_clean"), lit(0L)) * 100.0 / col("n_raw"))
          .as("percent_retained"),
        col("n_clim"), col("bio1_mean"), col("bio12_mean"),
        col("n_realms"), col("realms"), col("n_biomes"), col("biomes"),
        col("n_points"), col("area_km2"), col("note"),
        coalesce(col("n_prov"), lit(0L)).as("n_prov"),
        coalesce(col("n_gbif"), lit(0L)).as("n_gbif"),
        when(col("n_validated") === 0, "not_validated")
          .when(col("n_fetch_ok") === 0, "fetch_failed")
          .when(coalesce(col("n_clean"), lit(0L)) === 0, "no_clean_occurrences")
          .otherwise("ingested").as("status"))
  }

  /** Event-time tumbling window aggregate (batch analogue of the streaming
    * path; integer-ns bucketing is exactly reproducible in the oracle). */
  def eventsTumbling(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(expr("ts_ns div 3600000000000").as("hour_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))

  /** Hopping (sliding) window aggregate — 2 h windows every 1 h, so each
    * event lands in exactly TWO windows. Spark's `window(ts, '2 hours',
    * '1 hour')` does the same two-replica explode internally; the explicit
    * integer-ns formulation keeps the oracle byte-exact. One explode(×2) +
    * one partial-aggregated shuffle. */
  def eventsHopping(s: SparkSession, dir: String): DataFrame = {
    val H = 3600000000000L
    events(s, dir)
      .select(col("event_type"), col("value"),
        explode(array(expr(s"ts_ns div $H - 1"), expr(s"ts_ns div $H")))
          .as("window_id"))
      .groupBy("window_id", "event_type")
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
  }

  /** Native `session_window` sessionization (6 h gap) — the built-in
    * operator equivalent of [[eventsSessionize]]'s lag/running-sum plan;
    * the session start (min event time) and event count must agree with
    * the windowed formulation, which the shared oracle recomputes. */
  def eventsSessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"))

  /** Gap-based sessionization (6 h gap): lag → new-session flag → running
    * sum → per-session aggregate. Batch analogue of the
    * flatMapGroupsWithState streaming sessionizer. */
  /** The 6h-gap sessionization convention — ONE definition for every
    * session-derived operator (sessionize, funnel, peak concurrency):
    * a new session opens when the per-user inter-event gap exceeds
    * [[SESSION_GAP_NS]]. */
  private[operators] val SESSION_GAP_NS = 21600000000000L // 6h

  /** events plus the per-user running `session_id` under the shared gap
    * rule — all event columns pass through, so callers aggregate or
    * window further without re-deriving the fold. */
  private[operators] def withSessionIds(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    events(s, dir)
      .withColumn("is_new",
        when(col("ts_ns") - lag(col("ts_ns"), 1).over(byUser) > SESSION_GAP_NS,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-gap threshold sweep — the dial-tuning readout run BEFORE
    * committing to [[SESSION_GAP_NS]] (the sim_threshold_sweep discipline
    * applied to sessionization): at each candidate gap g, the session
    * count needs NO per-gap sessionization — n_sessions(g) = n_users +
    * #{consecutive same-user pairs with Δ > g}, so ONE lag window
    * computes every user's inter-event gaps and a 6-way explode over the
    * candidate thresholds folds to six rows (gap, n_sessions,
    * events/session in milli, share of gaps split). The elbow in this
    * table is how 6h was picked. */
  def eventsSessionGapSweep(s: SparkSession, dir: String): DataFrame = {
    val H = 3600000000000L
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val gaps = events(s, dir)
      .select(col("user_id"), col("ts_ns"), col("event_id"))
      .withColumn("delta",
        col("ts_ns") - lag(col("ts_ns"), 1).over(byUser))
    val totals = gaps.agg(count(lit(1)).as("n_events"),
      sum(when(col("delta").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
      sum(when(col("delta").isNull, 1L).otherwise(0L)).as("n_users"))
    gaps.filter(col("delta").isNotNull)
      .select(explode(expr(
        s"array(${H}L, ${2 * H}L, ${6 * H}L, ${12 * H}L, ${24 * H}L, ${72 * H}L)"))
        .as("gap_ns"), col("delta"))
      .groupBy("gap_ns")
      .agg(sum(when(col("delta") > col("gap_ns"), 1L).otherwise(0L))
        .as("n_splits"))
      .crossJoin(broadcast(totals))
      .select(col("gap_ns"), expr("gap_ns div $H".replace("$H", H.toString))
          .as("gap_hours"),
        (col("n_users") + col("n_splits")).as("n_sessions"),
        expr("n_events * 1000 div (n_users + n_splits)")
          .as("events_per_session_milli"),
        expr("n_splits * 1000 div n_pairs").as("split_share_milli"))
  }

  private val GAP_SWEEP_SQL =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 * 1000 AS ts_ns, event_id
      |  FROM events),
      |g AS (
      |  SELECT user_id,
      |    ts_ns - LAG(ts_ns, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts_ns, event_id) AS delta
      |  FROM e),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
      |        CAST(SUM(CASE WHEN delta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
      |        CAST(SUM(CASE WHEN delta IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_users
      |      FROM g),
      |sw AS (
      |  SELECT gap_ns, CAST(SUM(CASE WHEN delta > gap_ns THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_splits
      |  FROM (SELECT delta FROM g WHERE delta IS NOT NULL),
      |       (SELECT unnest([3600000000000, 7200000000000, 21600000000000,
      |                       43200000000000, 86400000000000, 259200000000000]) AS gap_ns)
      |  GROUP BY gap_ns)
      |SELECT gap_ns, gap_ns // 3600000000000 AS gap_hours,
      |  n_users + n_splits AS n_sessions,
      |  n_events * 1000 // (n_users + n_splits) AS events_per_session_milli,
      |  n_splits * 1000 // n_pairs AS split_share_milli
      |FROM sw, t""".stripMargin

  /** Sequence data-contract validation — the NEGATIVE-space check
    * [[eventsFunnel]]'s happy path never runs: the contract "a purchase
    * requires a PRIOR view in the same session" audited per user, with
    * orphan purchases (no view yet when the purchase fired) counted
    * against total purchases. This is how a pipeline detects
    * instrumentation regressions (a client shipping purchases without
    * view events) — the sequence sibling of meta_fk_audit's referential
    * checks. Plan: the 6h-gap session ids and the per-session first-view
    * window both ride the ONE user_id exchange; the user rollup is a
    * second, partial-aggregated one. */
  def eventsSequenceContract(s: SparkSession, dir: String): DataFrame = {
    val bySes = Window.partitionBy("user_id", "session_id")
    withSessionIds(s, dir)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_ns"))).over(bySes))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        when(col("t_view").isNull || col("ts_ns") < col("t_view"), 1L)
          .otherwise(0L).as("orphan"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), sum("orphan").as("n_orphans"))
      .withColumn("orphan_milli", expr("n_orphans * 1000 div n_purchases"))
  }

  def eventsSessionize(s: SparkSession, dir: String): DataFrame =
    withSessionIds(s, dir)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max(col("ts_ns")) - min(col("ts_ns"))).as("dur_ns"))

  /** Good–Turing sample coverage per 1°-cell — the "how much of this
    * cell's community have we actually SEEN" estimate next to
    * occ_chao1_richness's missing-species count: coverage ≈ 1 − f₁/n
    * (f₁ = species observed exactly once), shipped as exact milli
    * (1000 − f₁·1000 div n, positive floor division both engines
    * replay). A cell at 990 is well-surveyed; one at 500 says half its
    * next samples will be new species. Plan: the (cell, species) count
    * partial-aggregates map-side, then ONE cell-grain rollup — the
    * chao1 plan shape. */
  def occSampleCoverage(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(cell1(col("lat"), col("lon")).as("cellid"), col("species"))
      .groupBy("cellid", "species").agg(count(lit(1)).as("ns"))
      .groupBy("cellid")
      .agg(sum("ns").as("n_occ"), count(lit(1)).as("n_species"),
        sum(when(col("ns") === 1, 1L).otherwise(0L)).as("f1"))
      .select(col("cellid"), col("n_occ"), col("n_species"), col("f1"),
        expr("1000 - f1 * 1000 div n_occ").as("coverage_milli"))

  /** Session-shape spectrum — the (duration × size) matrix over
    * [[eventsSessionize]]'s per-session aggregates in floor-log2 bins
    * (the freq_spectrum/degree_stats discipline: ≤ 13×13 cells at ANY
    * corpus size): separates long-lazy sessions from short-busy bursts,
    * the capacity-planning shape a mean session length hides. Exact
    * integers only — minutes by floor division, bits via
    * length(bin(x)) (both engines count leading bits identically).
    * Plan: the session fold and per-session aggregate ride ONE user_id
    * exchange; the bin rollup is a second, cell-bounded one. */
  def eventsSessionStats(s: SparkSession, dir: String): DataFrame =
    eventsSessionize(s, dir)
      .select(
        expr("cast(length(bin(dur_ns div 60000000000 + 1)) - 1 as bigint)")
          .as("dur_bits"),
        expr("cast(length(bin(n_events)) - 1 as bigint)").as("ev_bits"),
        col("n_events"), expr("dur_ns div 60000000000").as("dur_min"))
      .groupBy("dur_bits", "ev_bits")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("sum_events"),
        min("dur_min").as("min_dur_min"), max("dur_min").as("max_dur_min"))

  /** Hotspot adjacency (join-count spatial autocorrelation) over the
    * 10°-grid — the clustering question density maps only imply: do
    * above-mean cells NEIGHBOR each other more than chance? 10° (the
    * land/sea index resolution), because the synthetic coordinate
    * lattice never occupies ADJACENT 1°-cells (the rank-1-lattice
    * degeneracy class CLAUDE.md documents). Hot is division-free
    * (n_occ · n_cells > total), adjacency is the 8-cell planar
    * neighborhood generated by an 8-offset explode (never a cell×cell
    * join — the pair count is ≤ 8·|cells| at any scale; no
    * antimeridian wrap, both engines agree), and the single output row
    * carries observed hot-hot/cold-cold pair counts next to the hot
    * share. Plan: one cell aggregate (checkpointed — both join sides
    * and the global folds reuse it), tiny unpartitioned windows on the
    * ≤649-row cell relation, one bounded neighbor join. */
  def occHotspotAdjacency(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
      (1, 0), (1, 1))
      .map { case (dr, dc) => s"named_struct('dr', $dr, 'dc', $dc)" }
      .mkString("explode(array(", ", ", "))")
    val cells = valid(s, dir)
      .select(cell10(col("lat"), col("lon")).as("cellid"))
      .groupBy("cellid").agg(count(lit(1)).as("n_occ"))
      .withColumn("total", sum("n_occ").over(wAll))
      .withColumn("n_cells", count(lit(1)).over(wAll))
      .withColumn("hot", (col("n_occ") * col("n_cells") > col("total"))
        .cast("long"))
      .withColumn("n_hot", sum("hot").over(wAll))
      .select("cellid", "hot", "n_hot", "n_cells")
      .transform(graft.Ckpt.capped) // feeds both adjacency sides + the global counts
    cells
      .select(col("cellid"), col("hot").as("hot_a"), col("n_hot"),
        col("n_cells"), expr(offs).as("o"))
      .withColumn("nr", expr("cellid div 36 + o.dr"))
      .withColumn("nc", expr("cellid % 36 + o.dc"))
      .filter(col("nr").between(0, 18) && col("nc").between(0, 35))
      .withColumn("ncell", expr("nr * 36 + nc"))
      .filter(col("ncell") > col("cellid"))
      .join(cells.select(col("cellid").as("ncell"), col("hot").as("hot_b")),
        Seq("ncell"))
      .agg(count(lit(1)).as("n_pairs"), sum(expr("hot_a * hot_b")).as("hh"),
        sum(expr("(1 - hot_a) * (1 - hot_b)")).as("cc"),
        max("n_hot").as("n_hot"), max("n_cells").as("n_cells"))
      .select(col("n_pairs"), col("hh"), col("cc"),
        expr("n_pairs - hh - cc").as("hc"), col("n_hot"), col("n_cells"),
        expr("n_hot * 1000 div n_cells").as("hot_share_milli"),
        // n_pairs = 0 (no two occupied cells adjacent) must not throw
        // under ANSI — same guard as occMoransI's den/n_pairs case
        expr("case when n_pairs > 0 then hh * 1000 div n_pairs" +
          " else 0 end").as("hh_share_milli"))
  }

  /** Two fixed test polygons in exact deci-degree (lon, lat) vertices:
    * A is deliberately NON-convex (an "M" notch — the case a bbox or
    * convex-hull containment test gets wrong), B a plain rectangle. */
  private[graft] val polyA =
    Seq((-600, -300), (0, 500), (600, -300), (200, -300), (0, 100), (-200, -300))
  private val polyB = Seq((900, -800), (1800, -800), (1800, 300), (900, 300))

  /** Unrolled ray-casting crossing terms for one polygon — a SHARED
    * SQL fragment (Spark and DuckDB parse it identically: only integer
    * literals, comparisons, + and *). One term per non-horizontal edge:
    * the eastward ray from (px, py) crosses edge (x1,y1)→(x2,y2) iff
    * the edge straddles py (half-open, so a ray through a vertex counts
    * once) and the crossing point lies strictly east of px — the usual
    * px < x1 + (x2−x1)(py−y1)/(y2−y1) test cross-multiplied into pure
    * integers, sign-corrected by dy's sign, so no division ever runs. */
  private[graft] def pipTerms(poly: Seq[(Int, Int)]): String =
    poly.indices.flatMap { i =>
      val (x1, y1) = poly(i); val (x2, y2) = poly((i + 1) % poly.size)
      val dy = y2 - y1
      if (dy == 0) None
      else Some(
        s"(case when ($y1 > py) != ($y2 > py) and " +
          s"(($x1 - px) * $dy + ${x2 - x1} * (py - $y1)) * ${if (dy > 0) 1 else -1} > 0 " +
          "then 1 else 0 end)")
    }.mkString("(", " + ", ")")

  /** Point-in-polygon classification by ray casting — the REAL-geometry
    * annotation the 10°/1° grid joins approximate: each occurrence is
    * tested against two literal polygons (one non-convex — the shape a
    * bbox or hull containment cannot express) via an UNROLLED
    * per-edge crossing sum, pure integer arithmetic on floor'd
    * deci-degree coordinates (floor once, identically, in both
    * engines; the cross-multiplied east-of test never divides).
    * Parity of the crossing count = containment. Plan: the whole test
    * is a narrow whole-stage-codegen projection (edge terms are
    * literal-folded — no join, no explode, no HOF lambda), so the only
    * exchange is the ≤|species|-row partial aggregate; at 100 TB the
    * polygon count scales as extra codegen terms, never as rows. */
  def spatialPointInPolygon(s: SparkSession, dir: String): DataFrame =
    valid(s, dir)
      .select(col("species"),
        expr("cast(floor(lon * 10) as bigint)").as("px"),
        expr("cast(floor(lat * 10) as bigint)").as("py"))
      .select(col("species"),
        expr(s"${pipTerms(polyA)} % 2").as("in_a"),
        expr(s"${pipTerms(polyB)} % 2").as("in_b"))
      .groupBy("species")
      .agg(count(lit(1)).as("n_occ"),
        sum("in_a").cast("long").as("n_in_a"),
        sum("in_b").cast("long").as("n_in_b"))
      .select(col("species"), col("n_occ"), col("n_in_a"), col("n_in_b"),
        expr("n_in_a * 1000 div n_occ").as("share_a_milli"),
        expr("n_in_b * 1000 div n_occ").as("share_b_milli"))

  // ---- polygon-TABLE region join ------------------------------------------
  // Deci-degree star-polygon lattice (12 regions × 8 vertices): center,
  // radii and per-vertex offsets are closed forms over the region id using
  // only %, * and + — shared VERBATIM between Spark expr and the DuckDB
  // oracle (the pipTerms discipline), so both engines materialize the
  // identical polygon relation. Alternating big/small radii make every
  // region NON-convex (the case bbox/hull containment gets wrong).
  private val starCx = "((rid * 67 % 300 - 150) * 10)"
  private val starCy = "((rid * 37 % 100 - 50) * 10)"
  private val starRb = "(40 + (rid * 11 % 5) * 20)"
  private val starRs = "(16 + (rid * 11 % 5) * 8)" // = rb·2/5, division-free
  private def starDx(k: String) =
    s"(case ($k) % 8 when 0 then 2 when 1 then 1 when 2 then 0 when 3 then -1 " +
      s"when 4 then -2 when 5 then -1 when 6 then 0 else 1 end)"
  private def starDy(k: String) =
    s"(case ($k) % 8 when 0 then 0 when 1 then 1 when 2 then 2 when 3 then 1 " +
      s"when 4 then 0 when 5 then -1 when 6 then -2 else -1 end)"
  private def starRad(k: String) =
    s"(case when ($k) % 2 = 0 then $starRb else $starRs end)"
  private[graft] def starVx(k: String) = s"($starCx + ${starDx(k)} * ${starRad(k)})"
  private[graft] def starVy(k: String) = s"($starCy + ${starDy(k)} * ${starRad(k)})"

  /** Ray-casting crossing term over edge COLUMNS (x1,y1,x2,y2) vs point
    * (px,py) — [[pipTerms]]' cross-multiplied integer test, but with the
    * polygon coming from a RELATION instead of unrolled literals. */
  private[graft] val edgeCrossTerm =
    "(case when (y1 > py) != (y2 > py) and " +
      "((x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)) * " +
      "(case when y2 > y1 then 1 else -1 end) > 0 then 1 else 0 end)"

  /** Point-in-polygon against a polygon TABLE — the reference's real
    * shapefile join (AnnotateWithBiogeoFn, transforms.py:747-801) that
    * [[spatialPointInPolygon]]'s literal polygons only sketch: polygons
    * arrive as a RELATION (12 non-convex deci-degree stars, generated by
    * the shared closed-form lattice above; a real deployment reads vertex
    * rows from parquet), edges are derived rows, and containment is the
    * exact integer ray cast summed over the edge join. Scale shape: a
    * 10°-cell PREFILTER (regions explode to their covered cells — bounded
    * by bbox/10°, ≤ ~40 cells/region; points equi-join on cellkey against
    * the broadcast cell map) plus an exact bbox filter cut the candidate
    * set BEFORE any edge work, so the edge join multiplies only prefilter
    * survivors by the 8 broadcast edge rows; the parity aggregate is
    * map-side-combined on (rid, occ_id). Polygon count scales the
    * broadcast dims, never the corpus shuffle. Output: per-region
    * candidate/containment counts + distinct contained species. */
  def spatialRegionJoin(s: SparkSession, dir: String): DataFrame = {
    val rg = s.range(12).select(col("id").as("rid"))
    val edges = rg
      .select(col("rid"), explode(expr("sequence(0, 7)")).as("k"))
      .select(col("rid"),
        expr(starVx("k")).as("x1"), expr(starVy("k")).as("y1"),
        expr(starVx("k + 1")).as("x2"), expr(starVy("k + 1")).as("y2"))
    val rcells = rg
      .select(col("rid"), expr(starCx).as("cx"), expr(starCy).as("cy"),
        expr(starRb).as("rb"))
      .select(col("rid"), col("cx"), col("cy"), col("rb"),
        explode(expr(
          "sequence((cy - 2*rb + 9000) div 100, (cy + 2*rb + 9000) div 100)"))
          .as("rowc"))
      .select(col("rid"), col("cx"), col("cy"), col("rb"), col("rowc"),
        explode(expr(
          "sequence((cx - 2*rb + 18000) div 100, (cx + 2*rb + 18000) div 100)"))
          .as("colc"))
      .select(col("rid"), col("cx"), col("cy"), col("rb"),
        (col("rowc") * 1000 + col("colc")).as("cellkey"))
    val cand = valid(s, dir)
      .select(col("occ_id"), col("species"),
        expr("cast(floor(lon * 10) as bigint)").as("px"),
        expr("cast(floor(lat * 10) as bigint)").as("py"))
      .withColumn("cellkey",
        expr("((py + 9000) div 100) * 1000 + (px + 18000) div 100"))
      .join(broadcast(rcells), Seq("cellkey"))
      .filter(expr("px between cx - 2*rb and cx + 2*rb " +
        "and py between cy - 2*rb and cy + 2*rb"))
      .select("occ_id", "species", "px", "py", "rid")
    cand.join(broadcast(edges), Seq("rid"))
      .withColumn("t", expr(edgeCrossTerm))
      .groupBy("rid", "occ_id", "species")
      .agg(sum("t").as("crossings"))
      .withColumn("inside", expr("crossings % 2"))
      .groupBy("rid")
      .agg(count(lit(1)).as("n_candidates"),
        sum("inside").as("n_inside"),
        countDistinct(when(col("inside") === 1, col("species")))
          .as("n_species_inside"))
      .withColumn("inside_milli", expr("n_inside * 1000 div n_candidates"))
  }

  private val REGION_JOIN_SQL: String = withSql(OCC_SQL, VALID_SQL,
    "rg AS (SELECT range AS rid FROM range(12))",
    s"""edk AS (SELECT rid, unnest(generate_series(0, 7)) AS k FROM rg),
       |ed AS (
       |  SELECT rid, ${starVx("k")} AS x1, ${starVy("k")} AS y1,
       |    ${starVx("k + 1")} AS x2, ${starVy("k + 1")} AS y2
       |  FROM edk)""".stripMargin,
    s"""rc0 AS (SELECT rid, $starCx AS cx, $starCy AS cy, $starRb AS rb FROM rg),
       |rc1 AS (
       |  SELECT rid, cx, cy, rb,
       |    unnest(generate_series((cy - 2*rb + 9000) // 100,
       |                           (cy + 2*rb + 9000) // 100)) AS rowc
       |  FROM rc0),
       |rc2 AS (
       |  SELECT rid, cx, cy, rb, rowc,
       |    unnest(generate_series((cx - 2*rb + 18000) // 100,
       |                           (cx + 2*rb + 18000) // 100)) AS colc
       |  FROM rc1),
       |rc AS (SELECT rid, cx, cy, rb, rowc * 1000 + colc AS cellkey FROM rc2)""".stripMargin,
    """cand AS (
      |  SELECT p.occ_id, p.species, p.px, p.py, r.rid,
      |    r.cx, r.cy, r.rb
      |  FROM (
      |    SELECT occ_id, species,
      |      CAST(FLOOR(lon * 10) AS BIGINT) AS px,
      |      CAST(FLOOR(lat * 10) AS BIGINT) AS py,
      |      ((CAST(FLOOR(lat * 10) AS BIGINT) + 9000) // 100) * 1000
      |        + (CAST(FLOOR(lon * 10) AS BIGINT) + 18000) // 100 AS cellkey
      |    FROM valid) p
      |  JOIN rc r USING (cellkey)
      |  WHERE px BETWEEN cx - 2*rb AND cx + 2*rb
      |    AND py BETWEEN cy - 2*rb AND cy + 2*rb)""".stripMargin,
    s"""per AS (
       |  SELECT rid, occ_id, species,
       |    CAST(SUM($edgeCrossTerm) AS BIGINT) AS crossings
       |  FROM cand JOIN ed USING (rid)
       |  GROUP BY rid, occ_id, species)""".stripMargin)(
    """SELECT rid, CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |  CAST(SUM(crossings % 2) AS BIGINT) AS n_inside,
      |  CAST(COUNT(DISTINCT CASE WHEN crossings % 2 = 1 THEN species END) AS BIGINT)
      |    AS n_species_inside,
      |  CAST(SUM(crossings % 2) AS BIGINT) * 1000 // COUNT(*) AS inside_milli
      |FROM per GROUP BY rid""".stripMargin)

  // ---- geodesic uncertainty-buffer polygon × region intersection ----------
  // The reference intersects the occurrence's AEQD uncertainty BUFFER with
  // the ecoregions, not the point (transforms.py:364-460 + 747-801).
  // Scale-4 lattice (1e-4 degree ≈ 11 m): region star vertices ×1000 are
  // exact integers; buffer vertices floor once from the SAME double
  // formula in both engines (products/divisions are IEEE-exact and
  // deterministic; only the trig-derived dlo is rounded to 6 dp first —
  // the uncertaintyBuffer/climAnnotate guard). The 8-vertex buffer is the
  // star direction table at half-step, so its axis extent is exactly the
  // first-order AEQD degree half-widths (dlo in lon, dla in lat — a
  // metric CIRCLE of radius `uncert` in the local projection).
  private def crossTermSql(x1: String, y1: String, x2: String, y2: String,
                           px: String, py: String): String =
    s"(case when ($y1 > $py) != ($y2 > $py) and " +
      s"(($x1 - $px) * ($y2 - $y1) + ($x2 - $x1) * ($py - $y1)) * " +
      s"(case when $y2 > $y1 then 1 else -1 end) > 0 then 1 else 0 end)"

  private def crossProdSql(ax: String, ay: String, bx: String, by: String,
                           cx: String, cy: String): String =
    s"(($bx - $ax) * ($cy - $ay) - ($by - $ay) * ($cx - $ax))"

  /** Proper segment crossing (strict: endpoints on the other segment's
    * line don't count — those cases are caught by the vertex-containment
    * parities, and strictness keeps the integer test branch-exact). */
  private val properCrossSql: String = {
    val c1 = crossProdSql("x1", "y1", "x2", "y2", "bx1", "by1")
    val c2 = crossProdSql("x1", "y1", "x2", "y2", "bx2", "by2")
    val c3 = crossProdSql("bx1", "by1", "bx2", "by2", "x1", "y1")
    val c4 = crossProdSql("bx1", "by1", "bx2", "by2", "x2", "y2")
    s"(case when (($c1 > 0 and $c2 < 0) or ($c1 < 0 and $c2 > 0)) " +
      s"and (($c3 > 0 and $c4 < 0) or ($c3 < 0 and $c4 > 0)) " +
      "then 1 else 0 end)"
  }

  private def bvxSql(k: String): String =
    s"cast(floor((lon + ${starDx(k)} * dlo / 2) * 10000) as bigint)"
  private def bvySql(k: String): String =
    s"cast(floor((lat + ${starDy(k)} * dla / 2) * 10000) as bigint)"

  private val bufferHitSql: String =
    "case when " +
      ((0 to 7).map(i =>
        s"cast(sum(case when k = $i then bv else 0 end) as bigint) % 2 = 1") ++
       (0 to 7).map(i =>
        s"cast(sum(case when ek = $i then rv else 0 end) as bigint) % 2 = 1") ++
       Seq("max(pp) = 1")).mkString(" or ") +
      " then 1 else 0 end"

  /** Per-candidate (region, occurrence) classification: does the
    * occurrence's geodesic uncertainty-buffer POLYGON intersect the
    * region polygon (exact integer polygon-polygon test: any buffer
    * vertex inside the region, any region vertex inside the buffer, or
    * any proper edge crossing — the standard completeness triple), next
    * to the bare point-in-region parity for comparison. Factored over
    * any occurrence-shaped frame so the boundary-straddler spec can
    * plant points. */
  private[graft] def bufferRegionHits(src: DataFrame, s: SparkSession): DataFrame = {
    val rg = s.range(12).select(col("id").as("rid"))
    val edges4 = rg
      .select(col("rid"), explode(expr("sequence(0, 7)")).as("ek"))
      .select(col("rid"), col("ek"),
        expr(s"${starVx("ek")} * 1000").as("x1"),
        expr(s"${starVy("ek")} * 1000").as("y1"),
        expr(s"${starVx("ek + 1")} * 1000").as("x2"),
        expr(s"${starVy("ek + 1")} * 1000").as("y2"))
    // region→cell map widened by one 10° cell, and the exact bbox cut by
    // 10 deci-degrees — covers any buffer extent that can still
    // intersect (a region tops out at |lat| ≈ 73°, where an 8 km buffer
    // spans ≤ 2.5 deci of longitude; see the margin proof in the spec)
    val rcells = rg
      .select(col("rid"), expr(starCx).as("cx"), expr(starCy).as("cy"),
        expr(starRb).as("rb"))
      .select(col("rid"), col("cx"), col("cy"), col("rb"),
        explode(expr("sequence((cy - 2*rb + 9000) div 100 - 1, " +
          "(cy + 2*rb + 9000) div 100 + 1)")).as("rowc"))
      .select(col("rid"), col("cx"), col("cy"), col("rb"), col("rowc"),
        explode(expr("sequence((cx - 2*rb + 18000) div 100 - 1, " +
          "(cx + 2*rb + 18000) div 100 + 1)")).as("colc"))
      .select(col("rid"), col("cx"), col("cy"), col("rb"),
        (col("rowc") * 1000 + col("colc")).as("cellkey"))
    val cand = src
      .select(col("occ_id"), col("species"), col("lat"), col("lon"),
        col("uncert"),
        expr("cast(floor(lon * 10) as bigint)").as("px"),
        expr("cast(floor(lat * 10) as bigint)").as("py"))
      .withColumn("cellkey",
        expr("((py + 9000) div 100) * 1000 + (px + 18000) div 100"))
      .join(broadcast(rcells), Seq("cellkey"))
      .filter(expr("px between cx - 2*rb - 10 and cx + 2*rb + 10 " +
        "and py between cy - 2*rb - 10 and cy + 2*rb + 10"))
      .select(col("occ_id"), col("species"), col("lat"), col("lon"),
        col("uncert"), col("rid"))
      .withColumn("dla", expr("greatest(uncert, 100.0) / 111320.0"))
      .withColumn("dlo", expr("round(least(greatest(uncert, 100.0) / " +
        "(111320.0 * cos(radians(lat))), 360.0), 6)"))
      .withColumn("px4", expr("cast(floor(lon * 10000) as bigint)"))
      .withColumn("py4", expr("cast(floor(lat * 10000) as bigint)"))
    val cand8 = cand
      .select(col("*"), explode(expr("sequence(0, 7)")).as("k"))
      .withColumn("bx1", expr(bvxSql("k")))
      .withColumn("by1", expr(bvySql("k")))
      .withColumn("bx2", expr(bvxSql("k + 1")))
      .withColumn("by2", expr(bvySql("k + 1")))
    val terms = cand8.join(broadcast(edges4), Seq("rid"))
      .select(col("rid"), col("occ_id"), col("species"), col("k"), col("ek"),
        expr(crossTermSql("x1", "y1", "x2", "y2", "bx1", "by1")).as("bv"),
        expr(crossTermSql("bx1", "by1", "bx2", "by2", "x1", "y1")).as("rv"),
        expr(crossTermSql("x1", "y1", "x2", "y2", "px4", "py4")).as("cc"),
        expr(properCrossSql).as("pp"))
    terms.groupBy("rid", "occ_id", "species")
      .agg(expr("cast(sum(case when k = 0 then cc else 0 end) as bigint) % 2")
          .as("point_inside"),
        expr(bufferHitSql).as("buffer_hit"))
  }

  /** The buffer-aware region join the reference actually runs — per
    * region: candidates, bare point containment, buffer-polygon
    * intersection, and the boundary STRADDLERS the point test misses
    * (buffer intersects, point outside — exactly the records the
    * reference's buffered annotation admits and a point join drops).
    * Plan shape: [[spatialRegionJoin]]'s broadcast prefilter, one
    * corpus scan exploded ×8 buffer vertices × 8 broadcast edges, both
    * aggregates map-side combined; polygon and vertex counts scale the
    * broadcast dims and the codegen width, never the corpus shuffle. */
  def spatialBufferRegionJoin(s: SparkSession, dir: String): DataFrame =
    bufferRegionHits(valid(s, dir), s)
      .groupBy("rid")
      .agg(count(lit(1)).as("n_candidates"),
        sum("point_inside").as("n_point_inside"),
        sum("buffer_hit").as("n_buffer_hit"),
        sum(expr("case when buffer_hit = 1 and point_inside = 0 " +
          "then 1 else 0 end")).as("n_straddlers"),
        countDistinct(when(col("buffer_hit") === 1, col("species")))
          .as("n_species_hit"))
      .withColumn("hit_milli", expr("n_buffer_hit * 1000 div n_candidates"))

  private val BUFFER_REGION_SQL: String = withSql(OCC_SQL, VALID_SQL,
    "brg AS (SELECT range AS rid FROM range(12))",
    s"""bedk AS (SELECT rid, unnest(generate_series(0, 7)) AS ek FROM brg),
       |bed AS (
       |  SELECT rid, ek,
       |    ${starVx("ek")} * 1000 AS x1, ${starVy("ek")} * 1000 AS y1,
       |    ${starVx("ek + 1")} * 1000 AS x2, ${starVy("ek + 1")} * 1000 AS y2
       |  FROM bedk)""".stripMargin,
    s"""brc0 AS (SELECT rid, $starCx AS cx, $starCy AS cy, $starRb AS rb FROM brg),
       |brc1 AS (
       |  SELECT rid, cx, cy, rb,
       |    unnest(generate_series((cy - 2*rb + 9000) // 100 - 1,
       |                           (cy + 2*rb + 9000) // 100 + 1)) AS rowc
       |  FROM brc0),
       |brc2 AS (
       |  SELECT rid, cx, cy, rb, rowc,
       |    unnest(generate_series((cx - 2*rb + 18000) // 100 - 1,
       |                           (cx + 2*rb + 18000) // 100 + 1)) AS colc
       |  FROM brc1),
       |brc AS (SELECT rid, cx, cy, rb, rowc * 1000 + colc AS cellkey FROM brc2)""".stripMargin,
    """bcand AS (
      |  SELECT p.occ_id, p.species, p.lat, p.lon, p.uncert, r.rid,
      |    greatest(p.uncert, 100.0) / 111320.0 AS dla,
      |    round(least(greatest(p.uncert, 100.0) /
      |      (111320.0 * cos(radians(p.lat))), 360.0), 6) AS dlo,
      |    CAST(FLOOR(p.lon * 10000) AS BIGINT) AS px4,
      |    CAST(FLOOR(p.lat * 10000) AS BIGINT) AS py4
      |  FROM (
      |    SELECT occ_id, species, lat, lon, uncert,
      |      CAST(FLOOR(lon * 10) AS BIGINT) AS px,
      |      CAST(FLOOR(lat * 10) AS BIGINT) AS py,
      |      ((CAST(FLOOR(lat * 10) AS BIGINT) + 9000) // 100) * 1000
      |        + (CAST(FLOOR(lon * 10) AS BIGINT) + 18000) // 100 AS cellkey
      |    FROM valid) p
      |  JOIN brc r USING (cellkey)
      |  WHERE px BETWEEN cx - 2*rb - 10 AND cx + 2*rb + 10
      |    AND py BETWEEN cy - 2*rb - 10 AND cy + 2*rb + 10)""".stripMargin,
    s"""bverts AS (
       |  SELECT c.*, kk.k,
       |    ${bvxSql("k")} AS bx1, ${bvySql("k")} AS by1,
       |    ${bvxSql("k + 1")} AS bx2, ${bvySql("k + 1")} AS by2
       |  FROM bcand c, (SELECT unnest(generate_series(0, 7)) AS k) kk)""".stripMargin,
    s"""bterms AS (
       |  SELECT b.rid, b.occ_id, b.species, b.k, e.ek,
       |    ${crossTermSql("x1", "y1", "x2", "y2", "bx1", "by1")} AS bv,
       |    ${crossTermSql("bx1", "by1", "bx2", "by2", "x1", "y1")} AS rv,
       |    ${crossTermSql("x1", "y1", "x2", "y2", "px4", "py4")} AS cc,
       |    $properCrossSql AS pp
       |  FROM bverts b JOIN bed e USING (rid))""".stripMargin,
    s"""bper AS (
       |  SELECT rid, occ_id, species,
       |    CAST(SUM(CASE WHEN k = 0 THEN cc ELSE 0 END) AS BIGINT) % 2
       |      AS point_inside,
       |    $bufferHitSql AS buffer_hit
       |  FROM bterms GROUP BY rid, occ_id, species)""".stripMargin)(
    """SELECT rid, CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |  CAST(SUM(point_inside) AS BIGINT) AS n_point_inside,
      |  CAST(SUM(buffer_hit) AS BIGINT) AS n_buffer_hit,
      |  CAST(SUM(CASE WHEN buffer_hit = 1 AND point_inside = 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
      |  CAST(COUNT(DISTINCT CASE WHEN buffer_hit = 1 THEN species END)
      |    AS BIGINT) AS n_species_hit,
      |  CAST(SUM(buffer_hit) AS BIGINT) * 1000 // COUNT(*) AS hit_milli
      |FROM bper GROUP BY rid""".stripMargin)

  /** Global Moran's I spatial autocorrelation of log-abundance over the
    * 10°-grid — the CONTINUOUS-surface clustering statistic next to
    * [[occHotspotAdjacency]]'s binary join counts: do cells with
    * similar abundance MAGNITUDE neighbor each other? Computed on
    * floor-log2 bit lengths (z = length(bin(n_occ)) ≤ 63 — the
    * events_rate_autocorr lattice, BIGINT-safe at ANY corpus size where
    * raw-count deviation products overflow past ~4e7 occ/cell), with
    * deviations pre-scaled by n_cells (d = z·N − Σz — exact, no mean
    * rounding; the N² factors cancel in the ratio). I = (N/W)·Σdᵢdⱼ/Σd²
    * over the undirected 8-neighbor pairs; the possibly-negative
    * numerator ships as sign + abs-milli (div/floor-div only ever see
    * non-negative operands). Plan: one cell aggregate (checkpointed —
    * the denominator fold and both neighbor-join sides reuse it), tiny
    * unpartitioned windows on the ≤649-row relation, one bounded
    * 8-offset neighbor join, and a whitelisted 1×1 crossJoin where the
    * two single-row folds meet. */
  def occMoransI(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    val offs = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1),
      (1, 0), (1, 1))
      .map { case (dr, dc) => s"named_struct('dr', $dr, 'dc', $dc)" }
      .mkString("explode(array(", ", ", "))")
    val cells = valid(s, dir)
      .select(cell10(col("lat"), col("lon")).as("cellid"))
      .groupBy("cellid").agg(count(lit(1)).as("n_occ"))
      .select(col("cellid"), expr("cast(length(bin(n_occ)) as bigint)").as("z"))
      .withColumn("n_cells", count(lit(1)).over(wAll))
      .withColumn("zsum", sum("z").over(wAll))
      .select(col("cellid"), expr("z * n_cells - zsum").as("d"),
        col("n_cells"))
      .transform(graft.Ckpt.capped) // feeds the denominator fold + both pair sides
    val den = cells.agg(sum(expr("d * d")).as("den"),
      max("n_cells").as("n_cells"))
    val num = cells
      .select(col("cellid"), col("d").as("d_a"), expr(offs).as("o"))
      .withColumn("nr", expr("cellid div 36 + o.dr"))
      .withColumn("nc", expr("cellid % 36 + o.dc"))
      .filter(col("nr").between(0, 18) && col("nc").between(0, 35))
      .withColumn("ncell", expr("nr * 36 + nc"))
      .filter(col("ncell") > col("cellid"))
      .join(cells.select(col("cellid").as("ncell"), col("d").as("d_b")),
        Seq("ncell"))
      .agg(count(lit(1)).as("n_pairs"), sum(expr("d_a * d_b")).as("num"))
    den.crossJoin(broadcast(num))
      .select(col("n_cells"), col("n_pairs"), col("den"), col("num"),
        expr("cast(case when num > 0 then 1 when num < 0 then -1" +
          " else 0 end as bigint)").as("morans_sign"),
        expr("case when den > 0 and n_pairs > 0" +
          " then n_cells * abs(num) * 1000 div (n_pairs * den)" +
          " else 0 end").as("morans_abs_milli"))
  }

  /** Range fragmentation — per species, the number of CONNECTED patches
    * its occupied 10°-cells form under 8-neighbor adjacency: one
    * contiguous range vs an archipelago of fragments, the structural
    * read [[occEooAoo]]'s extent/occupancy pair cannot give (same AOO,
    * wildly different connectivity). Each species' cell set is BOUNDED
    * (≤649 cells at any corpus size — the grid, not the data, is the
    * limit), so the component count resolves in a per-group union-find
    * over typed flatMapGroups — one (species) exchange, O(cells·α)
    * per group. The first cut ran the shared synchronous-CC operator
    * over all species packed in one node space: correct, but ~55
    * one-hop min-label rounds (grid diameter) × per-round checkpoint
    * cost 8.5 s at sf0.1 where this shape is 0.4 s — iterative
    * whole-graph machinery is the wrong tool for a grid-bounded
    * per-group problem. Oracle: recursive-CTE closure, the
    * dedup_cluster pattern. */
  def occRangeFragmentation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    valid(s, dir)
      .select(col("species"), cell10(col("lat"), col("lon")).as("cellid"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (species: String, it: Iterator[(String, Long)]) =>
        // dedupe inside the group (a pre-shuffle .distinct() costs a
        // second full exchange for the same ≤649-value result)
        val cells = it.map(_._2.toInt).toArray.distinct
        val present = cells.toSet
        val idx = cells.zipWithIndex.toMap
        val parent = Array.tabulate(cells.length)(identity)
        def find(x: Int): Int = {
          var r = x; while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        for (c <- cells; dr <- -1 to 1; dc <- -1 to 1 if dr != 0 || dc != 0) {
          val nr = c / 36 + dr; val nc = c % 36 + dc
          val n = nr * 36 + nc
          if (nr >= 0 && nr <= 18 && nc >= 0 && nc <= 35 && present(n)) {
            val (ra, rb) = (find(idx(c)), find(idx(n)))
            if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
          }
        }
        val nFrag = cells.indices.count(i => find(i) == i).toLong
        val n = cells.length.toLong
        (species, n, nFrag, nFrag * 1000 / n)
      }
      .toDF("species", "n_cells", "n_fragments", "frag_milli")
  }

  /** Whittaker beta diversity per 10° latitude band — the TURNOVER
    * statistic [[occCellDiversity]]'s per-cell alpha and
    * [[occRangeJaccard]]'s pairwise overlaps bracket but never compute:
    * β = γ / ᾱ, the band-wide species pool over the mean per-cell
    * richness. β ≈ 1 means every cell holds the whole pool (no
    * turnover); large β means composition changes cell to cell — the
    * single number that says whether a band's diversity lives WITHIN
    * cells or BETWEEN them. Exact integers throughout: whittaker_milli
    * = γ·n_cells·1000 div Σα (positive operands, both engines floor).
    * Plan: one distinct (cell, species) aggregate (checkpointed — the
    * alpha and gamma legs both read it), a per-cell fold riding a
    * second exchange, band-grain rollups, and an AQE-broadcast join of
    * two ≤19-row sides. */
  /** Temporal range turnover per species — [[occBetaDiversity]]'s TIME
    * axis: each species' occupied 10°-cell set in the record's early
    * half vs late half (split at the global (min+max)/2 timestamp — one
    * broadcast single-row fold, the watermark-frame class) and the
    * exact-milli Jaccard between them. Low turnover = stable recorded
    * range; the early/late flags fold in ONE (species, cell) aggregate,
    * so the whole query is two exchanges. Sums stay BIGINT-safe:
    * min+max ts_ns ≈ 3.5e18 < 2^63. */
  def occTemporalTurnover(s: SparkSession, dir: String): DataFrame = {
    val v = valid(s, dir).select(col("species"),
      cell10(col("lat"), col("lon")).as("cellid"), col("ts_ns"))
    val mid = v.agg(expr("(min(ts_ns) + max(ts_ns)) div 2").as("mid"))
    v.crossJoin(broadcast(mid))
      .groupBy("species", "cellid")
      .agg(max((col("ts_ns") < col("mid")).cast("long")).as("e"),
        max((col("ts_ns") >= col("mid")).cast("long")).as("l"))
      .groupBy("species")
      .agg(sum("e").as("n_early_cells"), sum("l").as("n_late_cells"),
        sum(expr("e * l")).as("n_common"))
      .select(col("species"), col("n_early_cells"), col("n_late_cells"),
        col("n_common"),
        expr("n_common * 1000 div (n_early_cells + n_late_cells - n_common)")
          .as("turnover_jaccard_milli"))
  }

  /** Schoener's D temporal-activity overlap between species pairs — the
    * niche-overlap statistic ecologists run on activity budgets: each
    * species' occurrence stream becomes a DAILY activity profile in
    * exact milli shares (n·1000 div total — floored identically on both
    * engines), and D = Σ_d min(p_a, p_b) — the Σmin form needs no abs,
    * no halving, and only the INNER day join (a day one species sits
    * out contributes min(p, 0) = 0). The profile relation is
    * localCheckpoint'd — it feeds both sides of the pair self-join (the
    * multi-reference replay trap) — and every relation after the first
    * aggregate is (species × calendar)-bounded: 50 species × |days|
    * profiles, ≤ C(50,2) pairs. Scale-safe: the only event-volume-sized
    * step is the (species, day) count. */
  def occActivityOverlap(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    val prof = valid(s, dir)
      .select(col("species"), expr(s"ts_ns div $dayNs").as("day_id"))
      .groupBy("species", "day_id").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over(Window.partitionBy("species")))
      .select(col("species"), col("day_id"),
        expr("n * 1000 div tot").as("pm"))
      .transform(graft.Ckpt.capped) // both self-join sides read it
    prof.toDF("species_a", "day_id", "pa")
      .join(prof.toDF("species_b", "day_id", "pb"), Seq("day_id"))
      .filter(col("species_a") < col("species_b"))
      .groupBy("species_a", "species_b")
      .agg(count(lit(1)).as("n_shared_days"),
        sum(least(col("pa"), col("pb"))).as("overlap_milli"))
  }

  /** Single-linkage clustering BACKBONE of the species range-similarity
    * graph — the textbook MST application (an MST under a dissimilarity
    * is exactly the single-linkage dendrogram's edge set): nodes are
    * species, edges connect range-overlapping pairs
    * ([[occRangeJaccard]]'s relation), weight = range dissimilarity
    * (1000 − jaccard_milli) with the numeric species pair packed in as
    * tiebreak (d·4096 + u·64 + v — strictly unique, so the forest is
    * unique and DuckDB's Kruskal replay hash-matches the distributed
    * Borůvka run edge for edge). Runs [[Graphs.boruvkaMsf]] — per-round
    * min-edge grab + pointer-jump contraction, O(log n) rounds. */
  /** Adaptive QUADTREE index over cleaned occurrences — the spatial
    * indexing shape the fixed 10°/1° grids can't express (dense regions
    * need deep cells, empty oceans shouldn't pay for them): each point
    * lands at the SHALLOWEST depth 0–4 whose quadtree cell holds ≤ 1024
    * points, so the tessellation refines exactly where the data is.
    * Closed form, not iterative: per-depth cell counts are ONE
    * aggregate over the ×5 depth-exploded keys (output bounded by
    * Σ4^k = 341 cells), the per-point depth decision is five BROADCAST
    * joins — the corpus never shuffles — and only the final
    * (depth, cell) rollup exchanges at data size. Cell ids are exact
    * integer floors of double arithmetic written identically on both
    * engines (the cell10 discipline); the 2^k edge (lon = 180) clamps. */
  /** Distance decay of community similarity — the first law of
    * geography made a query ("near cells share species; far cells
    * don't"): every pair of occupied 10°-cells sharing ≥ 1 species gets
    * an exact-milli Jaccard over species sets, then pairs bin by
    * CHEBYSHEV grid distance and each ring reports its mean similarity.
    * A flat curve says the spatial signal is gone (shuffled data,
    * broken coordinates) — the canary biogeographers run first. Pair
    * generation is via the species posting join, so the candidate count
    * is GRID-bounded: Σ_s C(cells_s, 2) ≤ |species|·C(648, 2),
    * independent of event volume. The (cell, species) distinct relation
    * localCheckpoints — it feeds both self-join sides; the cell
    * richness dim broadcasts twice. */
  def occDistanceDecay(s: SparkSession, dir: String): DataFrame = {
    // r14: the occ_nestedness treatment — species-aligned stamped
    // checkpoint (the posting self-join goes exchange-free AND keeps the
    // checkpoint width; the bare ckpt ran the whole 211k-pair fan-out in
    // ONE task, 3.0 s of the sealed 2.3 s), shuffle_hash so the planner
    // doesn't route the stream side over a tiny AQE-coalesced exchange,
    // packed single-long pair key with an explicit-width merge.
    val csBase = valid(s, dir)
      .select(cell10(col("lat"), col("lon")).as("cellid"), col("species"))
    val par = graft.Ckpt.wide(csBase) // volume-aware, floor = defaultParallelism
    val cs = graft.Ckpt.stamp(csBase
      .repartition(par, col("species"))
      .dropDuplicates("cellid", "species"), par, "species")
    val rich = cs.groupBy("cellid").agg(count(lit(1)).as("nsp"))
    val pairs = cs.toDF("c1", "species")
      .join(cs.toDF("c2", "species").hint("shuffle_hash"), Seq("species"))
      .filter(col("c1") < col("c2"))
      .select((col("c1") * 1024L + col("c2")).as("pk"))
      .repartition(par, col("pk"))
      .groupBy("pk").agg(count(lit(1)).as("shared"))
      .select(expr("pk div 1024").as("c1"), expr("pk % 1024").as("c2"),
        col("shared"))
    pairs
      .join(broadcast(rich.toDF("c1", "n1")), Seq("c1"))
      .join(broadcast(rich.toDF("c2", "n2")), Seq("c2"))
      .select(
        greatest(abs(expr("c1 div 36") - expr("c2 div 36")),
          abs(expr("c1 % 36") - expr("c2 % 36"))).as("dist_cells"),
        expr("shared * 1000 div (n1 + n2 - shared)").as("j"))
      .groupBy("dist_cells")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(j) div count(1)").as("mean_jaccard_milli"))
  }

  /** Binned Ripley's K — the MULTI-SCALE clustering statistic next to
    * [[occDistanceDecay]]'s similarity rings and occ_morans_i's single-
    * lag autocorrelation: for radii r = 1..4 (10°-cell units; the 1°
    * grid is degenerate here — the synthetic coordinate lattice never
    * co-occupies neighboring 1° cells at gate SFs), the mean
    * number of other points within EUCLIDEAN cell-center distance r of
    * a point, against the CSR expectation λ·πr² (literal milli-π per
    * radius, embedded identically in both engines). Clustered data
    * exceeds CSR at small r; regular/dispersed data undershoots.
    * Semantics: binned (distances between 10°-cell centers, same-cell
    * pairs at distance 0), no edge correction, no torus wrap (a column
    * guard stops the 81-offset scatter from wrapping the ±180°
    * meridian; rows can't wrap — out-of-range ids simply miss the
    * occupied-cell join). Pair generation is GRID-bounded, never
    * point-bounded: per-cell counts aggregate first (the only
    * data-sized shuffle), then each OCCUPIED cell scatters into its 81
    * Chebyshev-4 neighbors and joins back on occupied cells — candidate
    * rows ≤ 81·|occupied cells| ≤ 81·~650 regardless of corpus size.
    * Ordered-pair algebra: distinct cells contribute n1·n2 once per
    * direction, the self-offset contributes n·(n−1) — together the
    * exact ordered pair count at each squared distance (≤ 26 distinct
    * d² values), which one radius-scatter folds cumulatively (no
    * theta-join). All-integer lattice: mean_neighbors_milli =
    * pairs·1000 div n (safe while pairs·1000 < 2^63), csr via n·⌊1000πr²⌋
    * div A (safe to ~1.8e14 points). The 1×4-row totals crossJoin is
    * the whitelisted single-row-fold BNLJ. */
  def occRipleyK(s: SparkSession, dir: String): DataFrame = {
    val nc = valid(s, dir)
      .select(cell10(col("lat"), col("lon")).as("cellid"))
      .groupBy("cellid").agg(count(lit(1)).as("n"))
      .transform(graft.Ckpt.capped) // scatter side + join side + totals fold
    // only offsets reachable by the max radius (d2 <= 16) — the 32
    // corner offsets of the 9x9 square can never pass a radius filter
    val offs = for { dy <- -4 to 4; dx <- -4 to 4
                     if dy * dy + dx * dx <= 16 } yield (dy, dx)
    val scat = nc.select(col("cellid"), col("n").as("n1"),
        explode(array(offs.map { case (dy, dx) =>
          struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx"))
        }: _*)).as("o"))
      .filter(col("cellid") % 36 + col("o.dx") >= 0 &&
        col("cellid") % 36 + col("o.dx") <= 35)
      .select((col("cellid") + col("o.dy") * 36 + col("o.dx")).as("cellid"),
        col("n1"),
        (col("o.dy") * col("o.dy") + col("o.dx") * col("o.dx")).as("d2"))
    val byD2 = scat.join(nc.toDF("cellid", "n2"), Seq("cellid"))
      .select(col("d2"), when(col("d2") === 0, col("n1") * (col("n1") - 1))
        .otherwise(col("n1") * col("n2")).as("op"))
      .groupBy("d2").agg(sum("op").as("pairs"))
    val tot = nc.agg(sum("n").as("n_pts"), count(lit(1)).as("a_cells"))
    val csr = "case radius when 1 then 3141L when 2 then 12566L " +
      "when 3 then 28274L else 50265L end"
    byD2
      .select(explode(expr("array(1L,2L,3L,4L)")).as("radius"),
        col("d2"), col("pairs"))
      .filter(col("d2") <= col("radius") * col("radius"))
      .groupBy("radius").agg(sum("pairs").as("n_pairs"))
      .crossJoin(broadcast(tot))
      .select(col("radius"), col("n_pairs"), col("n_pts"), col("a_cells"),
        expr("n_pairs * 1000 div n_pts").as("mean_neighbors_milli"),
        expr(s"n_pts * ($csr) div a_cells").as("csr_neighbors_milli"),
        when(expr("n_pairs * 1000 div n_pts") >
            expr(s"n_pts * ($csr) div a_cells"), "clustered")
          .otherwise("dispersed").as("flag"))
  }

  def spatialQuadtreeCells(s: SparkSession, dir: String): DataFrame = {
    def qcell(k: Int): Column = {
      val side = (1 << k).toDouble
      val qy = expr(s"least(cast(floor((lat + 90.0) * $side / 180.0) as bigint), ${(1 << k) - 1}L)")
      val qx = expr(s"least(cast(floor((lon + 180.0) * $side / 360.0) as bigint), ${(1 << k) - 1}L)")
      (qy * (1 << k) + qx).as(s"q$k")
    }
    val pts = valid(s, dir)
      .select(Seq(col("occ_id")) ++ (0 to 4).map(qcell): _*)
      .transform(graft.Ckpt.capped) // feeds the count agg AND the five joins
    val cnts = pts
      .select(explode(array((0 to 4).map(k =>
        struct(lit(k.toLong).as("k"), col(s"q$k").as("cid"))): _*)).as("e"))
      .groupBy(col("e.k").as("k"), col("e.cid").as("cid"))
      .agg(count(lit(1)).as("n"))
      .transform(graft.Ckpt.capped)
    val joined = (0 to 4).foldLeft(pts) { (acc, k) =>
      acc.join(broadcast(cnts.filter(col("k") === k)
          .select(col("cid").as(s"q$k"), col("n").as(s"n$k"))),
        Seq(s"q$k"))
    }
    joined
      .withColumn("depth",
        expr("case when n0 <= 1024 then 0L when n1 <= 1024 then 1L " +
          "when n2 <= 1024 then 2L when n3 <= 1024 then 3L else 4L end"))
      .withColumn("cellid",
        expr("case when depth = 0 then q0 when depth = 1 then q1 " +
          "when depth = 2 then q2 when depth = 3 then q3 else q4 end"))
      .groupBy("depth", "cellid")
      .agg(count(lit(1)).as("n_points"))
  }

  def graphMstBackbone(s: SparkSession, dir: String): DataFrame = {
    val ed = occRangeJaccard(s, dir)
      .select(expr("cast(substring(sp1, 4) as bigint)").as("n1"),
        expr("cast(substring(sp2, 4) as bigint)").as("n2"),
        (lit(1000) - col("jaccard_milli")).as("d"))
      .select(least(col("n1"), col("n2")).as("u"),
        greatest(col("n1"), col("n2")).as("v"), col("d"))
      .select(col("u"), col("v"),
        (col("d") * 4096 + col("u") * 64 + col("v")).as("w"))
    Graphs.boruvkaMsf(ed, maxRounds = 16)
      .select(expr("concat('sp_', cast(u as string))").as("species_a"),
        expr("concat('sp_', cast(v as string))").as("species_b"),
        expr("w div 4096").as("dist_milli"))
  }

  def occBetaDiversity(s: SparkSession, dir: String): DataFrame = {
    val cs = valid(s, dir)
      .select(cell10(col("lat"), col("lon")).as("cellid"), col("species"))
      .distinct()
      .transform(graft.Ckpt.capped) // feeds the alpha and gamma legs
    val alpha = cs.groupBy("cellid").agg(count(lit(1)).as("n_sp"))
      .groupBy(expr("cellid div 36").as("band"))
      .agg(count(lit(1)).as("n_cells"), sum("n_sp").as("sum_alpha"))
    val gamma = cs.select(expr("cellid div 36").as("band"), col("species"))
      .distinct().groupBy("band").agg(count(lit(1)).as("gamma"))
    alpha.join(gamma, Seq("band"))
      .select(col("band"), col("n_cells"), col("sum_alpha"), col("gamma"),
        expr("sum_alpha * 1000 div n_cells").as("mean_alpha_milli"),
        expr("gamma * n_cells * 1000 div sum_alpha").as("whittaker_milli"))
  }

  /** Sequence-pattern match within sessions — the MATCH_RECOGNIZE /
    * funnel-analysis shape: first view → first LATER click → first LATER
    * purchase per 6h-gap session, with conversion latency. Plan: the
    * ordered per-user window derives session ids (exchange #1), then
    * three chained unordered min-if windows over (user, session) resolve
    * the ordered pattern without any self-join (exchange #2 — each stage
    * references the previous stage's window output as a per-session
    * constant), and the final aggregate reuses that partitioning, so the
    * whole pattern match is two shuffles regardless of pattern length. */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val bySes = Window.partitionBy("user_id", "session_id")
    withSessionIds(s, dir)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_ns"))).over(bySes))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts_ns") > col("t_view"),
          col("ts_ns"))).over(bySes))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts_ns") > col("t_click"),
          col("ts_ns"))).over(bySes))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("t_view")).as("t_view"),
        min(col("t_click")).as("t_click"),
        min(col("t_purchase")).as("t_purchase"))
      .withColumn("conv_ns",
        when(col("t_purchase").isNotNull, col("t_purchase") - col("t_view")))
  }

  /** Stone–Roberts checkerboard score per species — the co-occurrence
    * structure read next to [[occBetaDiversity]]'s turnover and
    * [[occHotspotAdjacency]]'s cell graph: for every species pair with
    * 10°-cell occupancy r_a, r_b and S shared cells, the checkerboard
    * unit count C = (r_a − S)(r_b − S) — high C = the pair avoids each
    * other (segregation), C = 0 = one range nests in the other. Rolled
    * up per species: pair count, total/mean/max C and how many partners
    * it NEVER co-occurs with. Everything is exact BIGINT (r ≤ 648
    * cells ⇒ C ≤ 648²). Plan: one distinct (species, cell) relation
    * checkpointed (three consumers), the shared-cell self-join keyed on
    * cellid, and the full pair grid is a broadcast ≤|species|-row
    * triangle crossJoin (the occ_range_overlap whitelist class) — the
    * pair table is species²-bounded at ANY corpus size. */
  def occCheckerboard(s: SparkSession, dir: String): DataFrame = {
    val o = valid(s, dir)
      .withColumn("cellid", cell10(col("lat"), col("lon")))
      .select("species", "cellid").distinct()
      .transform(graft.Ckpt.capped)
    val sz = o.groupBy("species").agg(count(lit(1)).as("r"))
    val shared = o.select(col("species").as("sp_a"), col("cellid"))
      .join(o.select(col("species").as("sp_b"), col("cellid")), Seq("cellid"))
      .filter(col("sp_a") < col("sp_b"))
      .groupBy("sp_a", "sp_b").agg(count(lit(1)).as("s"))
    val pairs = sz.select(col("species").as("sp_a"), col("r").as("r_a"))
      .crossJoin(broadcast(
        sz.select(col("species").as("sp_b"), col("r").as("r_b"))))
      .filter(col("sp_a") < col("sp_b"))
      .join(shared, Seq("sp_a", "sp_b"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("c", expr("(r_a - s) * (r_b - s)"))
      // species²-bounded and referenced by BOTH union legs — checkpoint
      // so the sz/shared pipeline plans once (triangles precedent)
      .transform(graft.Ckpt.capped)
    pairs.select(col("sp_a").as("species"), col("r_a").as("r"),
        col("c"), col("s"))
      .unionByName(pairs.select(col("sp_b").as("species"),
        col("r_b").as("r"), col("c"), col("s")))
      .groupBy("species")
      .agg(max("r").as("n_cells"), count(lit(1)).as("n_pairs"),
        sum("c").as("c_total"),
        expr("sum(c) div count(1)").as("mean_c"),
        sum(when(col("s") === 0, 1L).otherwise(0L)).as("n_segregated"),
        max("c").as("max_c"))
  }

  /** NODF nestedness of the species × 10°-cell presence matrix — the
    * ARE-RANGES-SUBSETS read that completes the co-occurrence pair with
    * [[occCheckerboard]]'s segregation score: per ordered pair with
    * strictly decreasing fill (r_a > r_b on the species axis, n_c > n_d
    * on the cell axis) the paired overlap S·1000 div r_b; equal-fill
    * pairs contribute 0 (the Almeida-Neto convention) and the
    * denominator is ALL C(n,2) pairs per axis, closed-form from the
    * axis cardinalities — no pair-count query at all. High NODF = poor
    * ranges nest inside rich ones; ≈0 = checkerboard world. The
    * cell-axis overlap join fans out per species as r² ≤ 648² cell
    * pairs — bounded by the GRID, never the corpus. Plan: the distinct
    * presence relation checkpoints once; four 1-row folds crossJoin
    * (the whitelisted 1×1 class). */
  def occNestedness(s: SparkSession, dir: String): DataFrame = {
    // Presence relation kept in TWO key-aligned checkpoints, one per
    // self-join axis. repartition(P, key) before the dedup means the one
    // exchange serves dedup (hash(cellid) ⊆ {species,cellid} satisfies
    // the distinct's clustering), the self-join (both sides co-partitioned
    // — zero join exchange) AND parallelism: a bare checkpoint inherits
    // the AQE-coalesced partition count of the tiny distinct shuffle, and
    // the r²-fan-out join legs then run single-task (3.9 s of the sealed
    // 4.15 s was ONE task; guide §2.5 — partition for the fan-out, not
    // the input bytes). P from defaultParallelism, never a constant.
    val ocBase = valid(s, dir)
      .withColumn("cellid", cell10(col("lat"), col("lon")))
      .select("species", "cellid")
    val par = graft.Ckpt.wide(ocBase) // volume-aware, floor = defaultParallelism
    val oByCell = graft.Ckpt.stamp(ocBase
      .repartition(par, col("cellid"))
      .dropDuplicates("species", "cellid"), par, "cellid")
    val oBySp = graft.Ckpt.hashed(oByCell, par, "species")
    val szs = oBySp.groupBy("species").agg(count(lit(1)).as("r"))
      .transform(graft.Ckpt.capped)
    val szc = oByCell.groupBy("cellid").agg(count(lit(1)).as("nc"))
      .transform(graft.Ckpt.capped)
    // Fill counts attach BEFORE pair generation (broadcast dims onto the
    // aligned checkpoints — partitioning survives a broadcast join), so
    // the strictly-decreasing-fill test runs inside the self-join: the
    // r²/n² fan-out and its partial-agg input HALVE, and the post-agg
    // dim joins disappear (the divisor rides the groupBy as max() — it
    // is constant per key). Pairs with r_a ≤ r_b contributed nothing
    // downstream, so the sums are bit-identical.
    val spA = oByCell.join(broadcast(szs.select(col("species").as("a"),
        col("r").as("r_a"))), col("species") === col("a"))
      .select(col("a"), col("cellid"), col("r_a"))
    val spB = oByCell.join(broadcast(szs.select(col("species").as("b"),
        col("r").as("r_b"))), col("species") === col("b"))
      .select(col("b"), col("cellid"), col("r_b"))
    // The fan-out tasks' partial aggs overlap heavily on the pair keys
    // (every task sees most cell pairs), so the merge input is ~tasks ×
    // |pairs|; an explicit-width repartition keeps AQE from coalescing
    // that merge into ONE task (it sizes by bytes, blind to merge cost).
    // shuffle_hash (not broadcast): both sides are the SAME key-aligned
    // checkpoint, so the join is exchange-free and the fan-out runs at
    // the checkpoint width; a broadcast join here makes the stream side
    // ride a tiny reused exchange that AQE coalesces to ONE task, and
    // the whole r² enumeration + pair shuffle write serializes.
    val spSum = spA.join(spB.hint("shuffle_hash"), Seq("cellid"))
      .filter(col("r_a") > col("r_b"))
      .repartition(par, col("a"), col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s"), max("r_b").as("r_b"))
      .agg(coalesce(sum(expr("s * 1000 div r_b")), lit(0L)).as("sp_sum"))
    val cA = oBySp.join(broadcast(szc.select(col("cellid").as("ca"),
        col("nc").as("n_a"))), col("cellid") === col("ca"))
      .select(col("ca"), col("species"), col("n_a"))
    val cB = oBySp.join(broadcast(szc.select(col("cellid").as("cb"),
        col("nc").as("n_b"))), col("cellid") === col("cb"))
      .select(col("cb"), col("species"), col("n_b"))
    // cell pairs pack into ONE long key (cellid < 648 < 1024) and the
    // divisor re-attaches from the broadcast dim AFTER the pair count —
    // the 7M-row pair exchange carries 8 bytes/row instead of 24.
    val cellSum = cA.join(cB.hint("shuffle_hash"), Seq("species"))
      .filter(col("n_a") > col("n_b"))
      .select((col("ca") * 1024L + col("cb")).as("pk"))
      .repartition(par, col("pk"))
      .groupBy("pk").agg(count(lit(1)).as("s"))
      .join(broadcast(szc.select(col("cellid").as("cb"),
        col("nc").as("n_b"))), expr("pk % 1024") === col("cb"))
      .agg(coalesce(sum(expr("s * 1000 div n_b")), lit(0L)).as("cell_sum"))
    val dims = szs.agg(count(lit(1)).as("n_species"))
      .crossJoin(szc.agg(count(lit(1)).as("n_cells")))
    dims.crossJoin(spSum).crossJoin(cellSum)
      .select(col("n_species"), col("n_cells"),
        expr("sp_sum div greatest(n_species * (n_species - 1) div 2, 1L)")
          .as("nodf_sp_milli"),
        expr("cell_sum div greatest(n_cells * (n_cells - 1) div 2, 1L)")
          .as("nodf_cell_milli"),
        expr("(sp_sum + cell_sum) div greatest(" +
          "n_species * (n_species - 1) div 2 + " +
          "n_cells * (n_cells - 1) div 2, 1L)").as("nodf_milli"))
  }

  /** SDM pseudo-absence (background) sampling — the step every species
    * distribution model runs between the occurrence pipeline and the
    * climate envelope: for each species, pick k=8 BACKGROUND cells from
    * the observed 10° grid EXCLUDING the species' own presences,
    * effort-weighted toward the overall sampling distribution (the
    * target-group-background correction for collection bias). Weighted
    * sampling-without-replacement on the exact lattice: key = h div
    * effort with h a 52-bit 'sdm:' md5 (its own salt; 52 bits so ties
    * through any downstream Double never reorder) — the integer form of
    * bottom-k weighted sampling (h/w ~ Exp(w)), deterministic on both
    * engines. Plan: one cell-effort aggregate (≤648 rows, broadcast),
    * species-dim × cell-dim candidate grid (both layout constants —
    * the envelope-projection BNLJ class), anti-join the presence set,
    * one species-partitioned rank window. */
  def occSdmBackground(s: SparkSession, dir: String): DataFrame = {
    val o = valid(s, dir).withColumn("cellid", cell10(col("lat"), col("lon")))
    val presence = o.select("species", "cellid").distinct()
      .transform(graft.Ckpt.capped)
    val effort = o.groupBy("cellid").agg(count(lit(1)).as("effort"))
    val spDim = presence.groupBy("species")
      .agg(count(lit(1)).as("n_presence_cells"))
    val cand = spDim.crossJoin(broadcast(effort))
      .join(presence, Seq("species", "cellid"), "left_anti")
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(concat('sdm:', species, ':', " +
          "cast(cellid as string)) as binary)), 1, 13), 16, 10) as bigint)"))
      .withColumn("key", expr("h div effort"))
    val w = Window.partitionBy("species")
      .orderBy(col("key"), col("cellid"))
    cand.withColumn("bg_rank", row_number().over(w).cast("long"))
      .filter(col("bg_rank") <= 8)
      .select("species", "bg_rank", "cellid", "effort", "n_presence_cells")
  }

  private val SDM_CTES =
    """oc AS (
      |  SELECT *, (CAST(FLOOR(lat / 10.0) AS BIGINT) + 9) * 36
      |    + CAST(FLOOR(lon / 10.0) AS BIGINT) + 18 AS cellid
      |  FROM valid),
      |pres AS (SELECT DISTINCT species, cellid FROM oc),
      |eff AS (SELECT cellid, CAST(COUNT(*) AS BIGINT) AS effort
      |        FROM oc GROUP BY 1),
      |sp AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS n_presence_cells
      |       FROM pres GROUP BY 1),
      |cand AS (
      |  SELECT sp.species, sp.n_presence_cells, eff.cellid, eff.effort,
      |    ('0x' || substr(md5('sdm:' || sp.species || ':'
      |      || CAST(eff.cellid AS VARCHAR)), 1, 13))::BIGINT // eff.effort
      |      AS key
      |  FROM sp CROSS JOIN eff
      |  WHERE NOT EXISTS (SELECT 1 FROM pres
      |    WHERE pres.species = sp.species AND pres.cellid = eff.cellid)),
      |rk AS (
      |  SELECT species, cellid, effort, n_presence_cells,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY species
      |      ORDER BY key, cellid) AS BIGINT) AS bg_rank
      |  FROM cand)""".stripMargin

  private val SDM_SQL = withSql(OCC_SQL, VALID_SQL, SDM_CTES)(
    """SELECT species, bg_rank, cellid, effort, n_presence_cells
      |FROM rk WHERE bg_rank <= 8""".stripMargin)

  /** SDM evaluation — the exact Mann–Whitney AUC of a climate
    * suitability score separating each species' PRESENCE cells from its
    * [[occSdmBackground]] pseudo-absences (the background → model →
    * AUC chain every distribution modeler runs): suitability of a 10°
    * cell = −|T₁₀(cell) − T̄_sp| with T₁₀ the cell·7919 % 4000 lattice
    * (the 10° projection of the climAnnotate raster family) and T̄_sp
    * the integer mean over the species' presences. AUC needs no ranks
    * and no midrank halves: the background is k ≤ 8 cells, so the
    * presence × background pair join is n₁·8 rows per species and
    * AUC·1000 = Σ(2·[s_p > s_b] + [s_p = s_b])·1000 div (2·n₁·n₀) —
    * the tie-safe doubled lattice, exact on both engines. On the driver
    * corpus species ⊥ location (documented), so AUC correctly reads
    * ≈ 0.5 — the null an honest evaluator MUST return here; the
    * operator's value is the exact evaluation machinery, which a real
    * occurrence corpus feeds unchanged. */
  def occSdmAuc(s: SparkSession, dir: String): DataFrame = {
    val bg = occSdmBackground(s, dir)
      .select(col("species"), col("cellid").as("bcell"))
    val pres = valid(s, dir)
      .withColumn("cellid", cell10(col("lat"), col("lon")))
      .select("species", "cellid").distinct()
      .transform(graft.Ckpt.capped)
    val tbar = pres.groupBy("species")
      .agg(count(lit(1)).as("n1"),
        expr("sum(cellid * 7919 % 4000) div count(1)").as("tbar"))
    val ps = pres.join(broadcast(tbar), Seq("species"))
      .select(col("species"), col("n1"),
        expr("-abs(cellid * 7919 % 4000 - tbar)").as("sc"))
    val bs = bg.join(broadcast(tbar), Seq("species"))
      .select(col("species"), expr("-abs(bcell * 7919 % 4000 - tbar)").as("sb"))
    ps.join(bs, Seq("species"))
      .groupBy("species")
      .agg(max("n1").as("n_presence"),
        (count(lit(1)) / max("n1")).cast("long").as("n_background"),
        sum(expr("case when sc > sb then 2L when sc = sb then 1L " +
          "else 0L end")).as("wins2"))
      .withColumn("auc_milli",
        expr("wins2 * 1000 div (2 * n_presence * n_background)"))
  }

  private val SDMAUC_SQL = withSql(OCC_SQL, VALID_SQL, SDM_CTES,
    """bgc AS (SELECT species, cellid AS bcell FROM rk WHERE bg_rank <= 8),
      |tb AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS n1,
      |         CAST(SUM(cellid * 7919 % 4000) AS BIGINT)
      |           // CAST(COUNT(*) AS BIGINT) AS tbar
      |       FROM pres GROUP BY 1),
      |psc AS (SELECT p.species, n1,
      |          -abs(p.cellid * 7919 % 4000 - tbar) AS sc
      |        FROM pres p JOIN tb USING (species)),
      |bsc AS (SELECT b.species, -abs(b.bcell * 7919 % 4000 - tbar) AS sb
      |        FROM bgc b JOIN tb USING (species)),
      |au AS (
      |  SELECT p.species, MAX(n1) AS n_presence,
      |    CAST(COUNT(*) AS BIGINT) // MAX(n1) AS n_background,
      |    CAST(SUM(CASE WHEN sc > sb THEN 2 WHEN sc = sb THEN 1
      |      ELSE 0 END) AS BIGINT) AS wins2
      |  FROM psc p JOIN bsc b ON p.species = b.species
      |  GROUP BY 1)""".stripMargin)(
    """SELECT species, n_presence, n_background, wins2,
      |  wins2 * 1000 // (2 * n_presence * n_background) AS auc_milli
      |FROM au""".stripMargin)

  /** SDM reliability diagram — the calibration table next to
    * [[occSdmAuc]]'s discrimination number (a model can rank perfectly
    * and still be miscalibrated; the reliability curve is what says
    * whether score 0.8 MEANS 80%): presences and the [[occSdmBackground]]
    * pseudo-absences pooled, suitability scores (the AUC lattice,
    * −|T₁₀ − T̄_sp| ∈ [−4000, 0]) quantized into 5 fixed bins by pure
    * integer arithmetic, then per bin the pooled count, presence count
    * and observed presence rate. On the species⊥location driver corpus
    * the curve correctly reads FLAT at the pooled base rate — the null
    * an honest calibration must show; real data feeds the same lattice.
    * Tiny relation sizes throughout (≤ |species|·(n₁+8) rows). */
  def occSdmCalibration(s: SparkSession, dir: String): DataFrame = {
    val bg = occSdmBackground(s, dir)
      .select(col("species"), col("cellid").as("bcell"))
    val pres = valid(s, dir)
      .withColumn("cellid", cell10(col("lat"), col("lon")))
      .select("species", "cellid").distinct()
      .transform(graft.Ckpt.capped)
    val tbar = pres.groupBy("species")
      .agg(expr("sum(cellid * 7919 % 4000) div count(1)").as("tbar"))
    val scored = pres.join(broadcast(tbar), Seq("species"))
      .select(expr("-abs(cellid * 7919 % 4000 - tbar)").as("sc"),
        lit(1L).as("is_pres"))
      .unionByName(bg.join(broadcast(tbar), Seq("species"))
        .select(expr("-abs(bcell * 7919 % 4000 - tbar)").as("sc"),
          lit(0L).as("is_pres")))
    scored
      .groupBy(expr("(sc + 4000) * 5 div 4001").as("score_bin"))
      .agg(count(lit(1)).as("n_pooled"), sum("is_pres").as("n_presence"))
      .withColumn("presence_rate_milli",
        expr("n_presence * 1000 div n_pooled"))
  }

  private val SDM_CAL_SQL = withSql(OCC_SQL, VALID_SQL, SDM_CTES,
    """bgc2 AS (SELECT species, cellid AS bcell FROM rk WHERE bg_rank <= 8),
      |tb2 AS (SELECT species,
      |          CAST(SUM(cellid * 7919 % 4000) AS BIGINT)
      |            // CAST(COUNT(*) AS BIGINT) AS tbar
      |        FROM pres GROUP BY 1),
      |sc2 AS (
      |  SELECT -abs(p.cellid * 7919 % 4000 - tbar) AS sc,
      |    CAST(1 AS BIGINT) AS is_pres
      |  FROM pres p JOIN tb2 USING (species)
      |  UNION ALL
      |  SELECT -abs(b.bcell * 7919 % 4000 - tbar) AS sc,
      |    CAST(0 AS BIGINT) AS is_pres
      |  FROM bgc2 b JOIN tb2 USING (species))""".stripMargin)(
    """SELECT (sc + 4000) * 5 // 4001 AS score_bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_pooled,
      |  CAST(SUM(is_pres) AS BIGINT) AS n_presence,
      |  CAST(SUM(is_pres) AS BIGINT) * 1000 // COUNT(*)
      |    AS presence_rate_milli
      |FROM sc2 GROUP BY 1""".stripMargin)

  /** The buffered biogeo ANNOTATION rollup — the reference's actual
    * output shape for AnnotateWithBiogeoFn (buffer ∩ ecoregions →
    * sorted distinct region list per record, rolled to the species/
    * accession grain like biogeo_summary): per species, occurrences
    * with any buffer-region intersection and the NUMERICALLY sorted
    * distinct region-id list their buffers touch. Rides
    * [[bufferRegionHits]] (exact polygon-polygon machinery); the list
    * aggregation shuffles ≤ |species × regions| rows. */
  def spatialBufferBiogeo(s: SparkSession, dir: String): DataFrame =
    bufferRegionHits(valid(s, dir), s)
      .filter(col("buffer_hit") === 1)
      .groupBy("species")
      .agg(countDistinct("occ_id").as("n_occ_hit"),
        countDistinct("rid").as("n_regions"),
        array_join(expr("transform(array_sort(collect_set(rid)), " +
          "x -> cast(x as string))"), ",").as("regions"))

  private val BUFFER_BIOGEO_SQL: String = {
    // reuse the full BUFFER_REGION_SQL CTE chain up to bper
    val upto = BUFFER_REGION_SQL.substring(0,
      BUFFER_REGION_SQL.lastIndexOf("SELECT rid, CAST(COUNT(*)"))
    upto +
      """SELECT species,
        |  CAST(COUNT(DISTINCT occ_id) AS BIGINT) AS n_occ_hit,
        |  CAST(COUNT(DISTINCT rid) AS BIGINT) AS n_regions,
        |  array_to_string(list_sort(list(DISTINCT rid)), ',') AS regions
        |FROM bper WHERE buffer_hit = 1
        |GROUP BY species""".stripMargin
  }

  /** Species–area curve — the scale-based sibling of the effort-based
    * [[occAccumulationCurve]]: mean distinct species per OCCUPIED cell
    * at nested grid scales g ∈ {1°, 2°, 4°, 8°} (powers of two so
    * lat/g is an EXACT binary division — no rounding guard needed
    * before the floor), and the Arrhenius z slope between consecutive
    * scales, z = log₂(S̄₂g/S̄g)/2 because each step quadruples cell
    * area — through the exact [[graft.functions.Log2Fp]] lattice with
    * a sign split (a patchy corpus can floor-dip a step). Corpus note
    * (probed): the synthetic occ lattice couples lat and lon through
    * event_id (Chinese-remainder structure), so 1°→2° coarsening is
    * MERGE-FREE (z = 0 exactly — occupied cells map 1:1); the honest
    * area signal appears at 4°/8° (z_1024 ≈ 89/384). A real corpus
    * feeds the same lattice. One distinct (g, species, cell) aggregate
    * is the only corpus shuffle; the 4-row scale table folds in a
    * trivial window. */
  def occSpeciesArea(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Log2Fp
    val scales = valid(s, dir)
      .select(col("species"), col("lat"), col("lon"))
      .select(col("species"), explode(expr("array(1L, 2L, 4L, 8L)")).as("g"),
        col("lat"), col("lon"))
      .select(col("g"), col("species"),
        expr("(cast(floor(lat / g) as bigint) + 200) * 1000 + " +
          "cast(floor(lon / g) as bigint) + 200").as("cell"))
      .distinct()
      .groupBy("g")
      .agg(count(lit(1)).as("n_pairs"), countDistinct("cell").as("n_cells"))
      .withColumn("mean_species_milli", expr("n_pairs * 1000 div n_cells"))
    val w = Window.orderBy("g")
    scales
      .withColumn("prev_m", lag("mean_species_milli", 1).over(w))
      .select(col("g"), col("n_cells"), col("n_pairs"),
        col("mean_species_milli"),
        when(col("prev_m").isNull, lit(null).cast("long"))
          .when(col("mean_species_milli") >= col("prev_m"),
            Log2Fp(col("mean_species_milli"), col("prev_m")))
          .otherwise(-Log2Fp(col("prev_m"), col("mean_species_milli")))
          .as("slope_1024x2"))
      .withColumn("z_1024",
        expr("case when slope_1024x2 is null then null " +
          "when slope_1024x2 >= 0 then slope_1024x2 div 2 " +
          "else -((-slope_1024x2) div 2) end"))
  }

  private val SPECIES_AREA_SQL: String = withSql(OCC_SQL, VALID_SQL,
    s"""sa_p AS (
       |  SELECT DISTINCT g, species,
       |    (CAST(FLOOR(lat / g) AS BIGINT) + 200) * 1000
       |      + CAST(FLOOR(lon / g) AS BIGINT) + 200 AS cell
       |  FROM valid, (SELECT unnest([CAST(1 AS BIGINT), CAST(2 AS BIGINT),
       |    CAST(4 AS BIGINT), CAST(8 AS BIGINT)]) AS g) gs),
       |sa_s AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells
       |  FROM sa_p GROUP BY 1),
       |sa_m AS (
       |  SELECT g, n_cells, n_pairs,
       |    n_pairs * 1000 // n_cells AS mean_species_milli,
       |    LAG(n_pairs * 1000 // n_cells) OVER (ORDER BY g) AS prev_m
       |  FROM sa_s),
       |sa_z AS (
       |  SELECT g, n_cells, n_pairs, mean_species_milli,
       |    CASE WHEN prev_m IS NULL THEN NULL
       |      WHEN mean_species_milli >= prev_m
       |        THEN ${graft.operators.TextPrep.lfpSql("mean_species_milli", "prev_m")}
       |      ELSE -${graft.operators.TextPrep.lfpSql("prev_m", "mean_species_milli")}
       |    END AS slope_1024x2
       |  FROM sa_m)""".stripMargin)(
    """SELECT g, n_cells, n_pairs, mean_species_milli, slope_1024x2,
      |  CASE WHEN slope_1024x2 IS NULL THEN NULL
      |       WHEN slope_1024x2 >= 0 THEN slope_1024x2 // 2
      |       ELSE -((-slope_1024x2) // 2) END AS z_1024
      |FROM sa_z""".stripMargin)

  // -------------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "occ_species_area" -> (occSpeciesArea _),
    "occ_sdm_calibration" -> (occSdmCalibration _),
    "spatial_buffer_biogeo" -> (spatialBufferBiogeo _),
    "occ_sdm_background" -> (occSdmBackground _),
    "occ_sdm_auc" -> (occSdmAuc _),
    "occ_chao2_richness" -> (occChao2Richness _),
    "occ_nestedness" -> (occNestedness _),
    "occ_checkerboard" -> (occCheckerboard _),
    "events_funnel" -> (eventsFunnel _),
    "events_sequence_contract" -> (eventsSequenceContract _),
    "occ_clean_coords" -> (occCleanCoords _),
    "occ_uncertainty_band" -> (occUncertaintyBand _),
    "occ_land_filter" -> (occLandFilter _),
    "occ_centroid_filter" -> (occCentroidFilter _),
    "occ_dedupe_best" -> (occDedupeBest _),
    "occ_clean_pipeline" -> (occCleanPipeline _),
    "occ_fetch_summary" -> (occFetchSummary _),
    "uncertainty_buffer" -> (uncertaintyBuffer _),
    "clim_annotate" -> (climAnnotate _),
    "clim_summary" -> (climSummary _),
    "biogeo_annotate" -> (biogeoAnnotate _),
    "biogeo_summary" -> (biogeoSummary _),
    "spatial_summary_join" -> (spatialSummaryJoin _),
    "range_bbox" -> (rangeBbox _),
    "tax_validate_split" -> (taxValidateSplit _),
    "tax_lineage" -> (taxLineage _),
    "spatial_join" -> (spatialJoin _),
    "tax_gate_new" -> (taxGateNew _),
    "provenance_urls" -> (provenanceUrls _),
    "tax_sanitize_names" -> (taxSanitizeNames _),
    "meta_classify" -> (metaClassify _),
    "meta_collect_related" -> (metaCollectRelated _),
    "cleaning_summary" -> (cleaningSummary _),
    "bio_ingest_pipeline" -> (bioIngestPipeline _),
    "spatial_region_join" -> (spatialRegionJoin _),
    "spatial_buffer_region_join" -> (spatialBufferRegionJoin _),
    "events_tumbling" -> (eventsTumbling _),
    "events_hopping" -> (eventsHopping _),
    "events_session_window" -> (eventsSessionWindow _),
    "events_session_gap_sweep" -> (eventsSessionGapSweep _),
    "events_sessionize" -> (eventsSessionize _),
    "events_session_stats" -> (eventsSessionStats _),
    "occ_hotspot_adjacency" -> (occHotspotAdjacency _),
    "occ_morans_i" -> (occMoransI _),
    "occ_beta_diversity" -> (occBetaDiversity _),
    "occ_temporal_turnover" -> (occTemporalTurnover _),
    "occ_activity_overlap" -> (occActivityOverlap _),
    "graph_mst_backbone" -> (graphMstBackbone _),
    "spatial_quadtree_cells" -> (spatialQuadtreeCells _),
    "occ_distance_decay" -> (occDistanceDecay _),
    "occ_ripley_k" -> (occRipleyK _),
    "occ_range_fragmentation" -> (occRangeFragmentation _),
    "spatial_point_in_polygon" -> (spatialPointInPolygon _),
    "occ_sample_coverage" -> (occSampleCoverage _),
    "spatial_grid_density" -> (spatialGridDensity _),
    "occ_cell_diversity" -> (occCellDiversity _),
    "occ_accumulation_curve" -> (occAccumulationCurve _),
    "occ_range_overlap" -> (occRangeOverlap _),
    "occ_range_jaccard" -> (occRangeJaccard _),
    "occ_effort_curve" -> (occEffortCurve _),
    "occ_eoo_aoo" -> (occEooAoo _),
    "occ_seasonality" -> (occSeasonality _),
    "occ_centroid_shift" -> (occCentroidShift _),
    "occ_gap_analysis" -> (occGapAnalysis _),
    "occ_chao1_richness" -> (occChao1Richness _),
    "occ_climate_envelope" -> (occClimateEnvelope _),
    "occ_niche_breadth" -> (occNicheBreadth _),
    "occ_envelope_projection" -> (occEnvelopeProjection _),
    "occ_latitude_gradient" -> (occLatitudeGradient _),
    "spatial_zorder_layout" -> (spatialZorderLayout _),
    "spatial_zone_pruning_audit" -> (spatialZonePruningAudit _),
    "occ_rank_abundance" -> (occRankAbundance _),
    "spatial_nearest" -> (spatialNearest _),
    "occ_temporal_trend" -> (occTemporalTrend _),
    "occ_outlier_mad" -> (occOutlierMad _))

  /** Oracle bodies shared between the standalone summary queries and the
    * [[spatialSummaryJoin]] composition. */
  /** tax_validate_split's oracle body, factored out so the composed
    * ingest-DAG oracle can nest it as a CTE. */
  private lazy val TAX_SPLIT_SELECT: String =
    """SELECT tax_id, match_type, confidence, gbif_scientific_name,
      |  gbif_usage_key, gbif_status, gbif_rank, ena_error, status,
      |  CASE WHEN status = 'to_check' AND match_type IS NOT NULL AND tax_id % 2 = 0
      |       THEN tax_id * 11 % 100000 END AS gbif_accepted_usage_key,
      |  CASE WHEN status = 'to_check' AND match_type IS NOT NULL AND tax_id % 3 = 0
      |       THEN 'alt_' || CAST(tax_id * 3 % 50 AS VARCHAR)
      |         || ';alt_' || CAST(tax_id * 5 % 50 AS VARCHAR)
      |  END AS gbif_alternatives
      |FROM (
      |  SELECT *,
      |    CASE WHEN match_type = 'EXACT' OR (match_type = 'FUZZY' AND confidence >= 95)
      |         THEN 'validated' ELSE 'to_check' END AS status
      |  FROM (SELECT c_custkey AS tax_id,
      |          CASE WHEN c_custkey % 23 = 0 THEN NULL
      |            ELSE CASE CAST(c_custkey % 5 AS INTEGER)
      |              WHEN 0 THEN 'EXACT' WHEN 1 THEN 'FUZZY' WHEN 2 THEN 'FUZZY'
      |              WHEN 3 THEN 'HIGHERRANK' ELSE 'NONE' END END AS match_type,
      |          CASE WHEN c_custkey % 23 = 0 THEN NULL
      |            ELSE c_custkey * 13 % 101 END AS confidence,
      |          CASE WHEN c_custkey % 23 = 0 THEN NULL
      |            ELSE 'sp_' || CAST(c_custkey % 50 AS VARCHAR) END AS gbif_scientific_name,
      |          CASE WHEN c_custkey % 23 = 0 THEN NULL
      |            ELSE c_custkey * 7 % 100000 END AS gbif_usage_key,
      |          CASE WHEN c_custkey % 23 = 0 THEN NULL
      |            ELSE CASE CAST(c_custkey % 4 AS INTEGER)
      |              WHEN 0 THEN 'ACCEPTED' WHEN 1 THEN 'SYNONYM'
      |              ELSE 'DOUBTFUL' END END AS gbif_status,
      |          CASE WHEN c_custkey % 23 = 0 THEN NULL ELSE 'SPECIES' END AS gbif_rank,
      |          CASE WHEN c_custkey % 23 = 0 THEN 'Missing scientificName' END AS ena_error
      |        FROM customer))""".stripMargin

  /** provenance_urls' oracle body — same nesting rationale. */
  private lazy val PROV_SELECT: String =
    """SELECT c_custkey AS tax_id,
      |  'ANN' || CAST(ann_key AS VARCHAR) AS accession,
      |  'https://www.ebi.ac.uk/biodiversity/data_portal/' || CAST(c_custkey AS VARCHAR) AS portal_url,
      |  'https://ftp.ensembl.org/annotations/ANN' || CAST(ann_key AS VARCHAR) || '.gtf.gz' AS gtf_url,
      |  'https://www.ensembl.org/view?annotation=ANN' || CAST(ann_key AS VARCHAR) AS browser_url,
      |  CASE WHEN c_custkey % 10 = 0 THEN NULL
      |       ELSE 'https://www.gbif.org/species/' || CAST(c_custkey * 7 % 100000 AS VARCHAR)
      |       END AS gbif_url,
      |  n_name AS nation
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN (SELECT o_custkey, MAX(o_orderkey) AS ann_key
      |      FROM orders GROUP BY o_custkey) a ON c_custkey = o_custkey""".stripMargin

  private lazy val CLIM_SUMMARY_SELECT: String =
    s"""SELECT accession, species, n,
       |  CAST(sx AS DOUBLE) / n AS bio1_mean,
       |  ROUND(SQRT(GREATEST(CAST(sx2 AS DOUBLE) / n
       |    - POW(CAST(sx AS DOUBLE) / n, 2), 0.0)), 2) AS bio1_sd,
       |  ${pctSql("0.5")} AS bio1_med,
       |  ${pctSql("0.05")} AS bio1_p5,
       |  ${pctSql("0.95")} AS bio1_p95,
       |  bio1_min, bio1_max,
       |  CAST(s12 AS DOUBLE) / n AS bio12_mean,
       |  bio12_min, bio12_max
       |FROM (SELECT accession, MIN(species) AS species, COUNT(*) AS n,
       |    SUM(CAST(bio1 AS DECIMAL(18,6))) AS sx,
       |    SUM(CAST(bio1 AS DECIMAL(18,6)) * CAST(bio1 AS DECIMAL(18,6))) AS sx2,
       |    list_sort(list(bio1)) AS arr,
       |    MIN(bio1) AS bio1_min, MAX(bio1) AS bio1_max,
       |    SUM(CAST(bio12 AS DECIMAL(18,6))) AS s12,
       |    MIN(bio12) AS bio12_min, MAX(bio12) AS bio12_max
       |  FROM clim GROUP BY accession)""".stripMargin

  private lazy val BIOGEO_SUMMARY_SELECT: String =
    """SELECT accession, species,
      |  CAST(COUNT(DISTINCT realm) AS BIGINT) AS n_realms,
      |  string_agg(DISTINCT realm, ',' ORDER BY realm) AS realms,
      |  CAST(COUNT(DISTINCT biome) AS BIGINT) AS n_biomes,
      |  string_agg(DISTINCT biome, ',' ORDER BY biome) AS biomes
      |FROM bg GROUP BY accession, species""".stripMargin

  val oracle: Map[String, String] = Map(
    "occ_sdm_background" -> SDM_SQL,
    "occ_sdm_auc" -> SDMAUC_SQL,
    "occ_chao2_richness" -> CHAO2_SQL,
    "occ_nestedness" -> withSql(OCC_SQL, VALID_SQL,
      s"""o AS (SELECT DISTINCT species, $CELL10_SQL AS cellid FROM valid),
         |szs AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS r
         |        FROM o GROUP BY 1),
         |szc AS (SELECT cellid, CAST(COUNT(*) AS BIGINT) AS nc
         |        FROM o GROUP BY 1),
         |sps AS (SELECT COALESCE(CAST(SUM(s * 1000 // r_b) AS BIGINT), 0)
         |          AS sp_sum FROM (
         |        SELECT a.species AS sa, b.species AS sb,
         |          CAST(COUNT(*) AS BIGINT) AS s
         |        FROM o a JOIN o b ON a.cellid = b.cellid
         |          AND a.species <> b.species
         |        GROUP BY 1, 2) sh
         |        JOIN (SELECT species AS sa, r AS r_a FROM szs) x USING (sa)
         |        JOIN (SELECT species AS sb, r AS r_b FROM szs) y USING (sb)
         |        WHERE r_a > r_b),
         |cls AS (SELECT COALESCE(CAST(SUM(s * 1000 // n_b) AS BIGINT), 0)
         |          AS cell_sum FROM (
         |        SELECT a.cellid AS ca, b.cellid AS cb,
         |          CAST(COUNT(*) AS BIGINT) AS s
         |        FROM o a JOIN o b ON a.species = b.species
         |          AND a.cellid <> b.cellid
         |        GROUP BY 1, 2) sh
         |        JOIN (SELECT cellid AS ca, nc AS n_a FROM szc) x USING (ca)
         |        JOIN (SELECT cellid AS cb, nc AS n_b FROM szc) y USING (cb)
         |        WHERE n_a > n_b),
         |dims AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM szs)
         |           AS n_species,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM szc) AS n_cells)"""
        .stripMargin)(
      """SELECT n_species, n_cells,
        |  sp_sum // GREATEST(n_species * (n_species - 1) // 2, 1)
        |    AS nodf_sp_milli,
        |  cell_sum // GREATEST(n_cells * (n_cells - 1) // 2, 1)
        |    AS nodf_cell_milli,
        |  (sp_sum + cell_sum) // GREATEST(
        |    n_species * (n_species - 1) // 2
        |    + n_cells * (n_cells - 1) // 2, 1) AS nodf_milli
        |FROM dims CROSS JOIN sps CROSS JOIN cls""".stripMargin),
    "occ_checkerboard" -> withSql(OCC_SQL, VALID_SQL,
      s"""o AS (SELECT DISTINCT species, $CELL10_SQL AS cellid FROM valid),
         |sz AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS r
         |       FROM o GROUP BY 1),
         |sh AS (SELECT a.species AS sp_a, b.species AS sp_b,
         |         CAST(COUNT(*) AS BIGINT) AS s
         |       FROM o a JOIN o b ON a.cellid = b.cellid
         |         AND a.species < b.species
         |       GROUP BY 1, 2),
         |p AS (SELECT a.species AS sp_a, b.species AS sp_b,
         |        a.r AS r_a, b.r AS r_b, COALESCE(sh.s, 0) AS s
         |      FROM sz a JOIN sz b ON a.species < b.species
         |      LEFT JOIN sh ON sh.sp_a = a.species AND sh.sp_b = b.species),
         |cc AS (SELECT sp_a, sp_b, r_a, r_b, s,
         |         (r_a - s) * (r_b - s) AS c FROM p),
         |u AS (SELECT sp_a AS species, r_a AS r, c, s FROM cc
         |      UNION ALL
         |      SELECT sp_b AS species, r_b AS r, c, s FROM cc)""".stripMargin)(
      """SELECT species, CAST(MAX(r) AS BIGINT) AS n_cells,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(c) AS BIGINT) AS c_total,
        |  CAST(SUM(c) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS mean_c,
        |  CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_segregated,
        |  CAST(MAX(c) AS BIGINT) AS max_c
        |FROM u GROUP BY species""".stripMargin),
    "occ_rank_abundance" -> withSql(OCC_SQL, VALID_SQL,
      """g AS (
        |  SELECT species, CAST(COUNT(*) AS BIGINT) AS n_occ
        |  FROM valid GROUP BY species),
        |r AS (
        |  SELECT species, n_occ,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, species) AS BIGINT)
        |      AS rank,
        |    CAST(SUM(n_occ) OVER () AS BIGINT) AS total,
        |    CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, species
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM g)""".stripMargin)(
      """SELECT rank, species, n_occ,
        |  n_occ * 1000 // total AS share_milli,
        |  cum * 1000 // total AS cum_share_milli,
        |  CAST(length(bin(n_occ)) - 1 AS BIGINT) AS log2_abund
        |FROM r""".stripMargin),
    "spatial_zone_pruning_audit" -> withSql(OCC_SQL, VALID_SQL,
      s"""r AS (
        |  SELECT $MORTON18 AS z,
        |    LEAST(cy // 45, 3) AS qy, LEAST(cx // 90, 3) AS qx
        |  FROM (SELECT CAST(FLOOR(lon) AS BIGINT) + 180 AS cx,
        |          CAST(FLOOR(lat) AS BIGINT) + 90 AS cy FROM valid)),
        |f AS (
        |  SELECT z * 32 // 262144 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |    MIN(qy) AS qy_min, MAX(qy) AS qy_max,
        |    MIN(qx) AS qx_min, MAX(qx) AS qx_max
        |  FROM r GROUP BY 1),
        |m AS (SELECT qy, qx, CAST(COUNT(*) AS BIGINT) AS n_rows_matched
        |      FROM r GROUP BY 1, 2)""".stripMargin)(
      """SELECT m.qy AS box_y, m.qx AS box_x, n_rows_matched,
        |  CAST(COUNT(*) AS BIGINT) AS n_files_hit,
        |  CAST(SUM(n_occ) AS BIGINT) AS n_rows_scanned,
        |  CAST(SUM(n_occ) AS BIGINT) * 1000 // n_rows_matched
        |    AS read_amplification_milli
        |FROM m JOIN f ON m.qy BETWEEN f.qy_min AND f.qy_max
        |             AND m.qx BETWEEN f.qx_min AND f.qx_max
        |GROUP BY m.qy, m.qx, n_rows_matched""".stripMargin),
    "spatial_zorder_layout" -> withSql(OCC_SQL, VALID_SQL)({
      s"""SELECT z * 32 // 262144 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(COUNT(DISTINCT species) AS BIGINT) AS n_species,
         |  MIN(z) AS z_min, MAX(z) AS z_max,
         |  MIN(lat) AS lat_min, MAX(lat) AS lat_max,
         |  MIN(lon) AS lon_min, MAX(lon) AS lon_max
         |FROM (
         |  SELECT species, lat, lon, $MORTON18 AS z
         |  FROM (SELECT species, lat, lon,
         |          CAST(FLOOR(lon) AS BIGINT) + 180 AS cx,
         |          CAST(FLOOR(lat) AS BIGINT) + 90 AS cy
         |        FROM valid))
         |GROUP BY 1""".stripMargin
    }),
    "occ_outlier_mad" -> withSql(OCC_SQL, VALID_SQL)(
      """SELECT occ_id, species, lat, lon FROM (
        |  SELECT d.occ_id, d.species, d.lat, d.lon, dev_lat, dev_lon,
        |    mad_lat, mad_lon
        |  FROM (
        |    SELECT v.occ_id, v.species, v.lat, v.lon,
        |      ABS(v.lat - med_lat) AS dev_lat, ABS(v.lon - med_lon) AS dev_lon
        |    FROM valid v
        |    JOIN (SELECT species,
        |            MAX(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS med_lat
        |          FROM (SELECT species, lat,
        |                  ROW_NUMBER() OVER (PARTITION BY species
        |                    ORDER BY lat, occ_id) AS rn,
        |                  COUNT(*) OVER (PARTITION BY species) AS n FROM valid)
        |          GROUP BY species) USING (species)
        |    JOIN (SELECT species,
        |            MAX(CASE WHEN rn = (n + 1) // 2 THEN lon END) AS med_lon
        |          FROM (SELECT species, lon,
        |                  ROW_NUMBER() OVER (PARTITION BY species
        |                    ORDER BY lon, occ_id) AS rn,
        |                  COUNT(*) OVER (PARTITION BY species) AS n FROM valid)
        |          GROUP BY species) USING (species)) d
        |  JOIN (SELECT species,
        |          MAX(CASE WHEN rn = (n + 1) // 2 THEN dev_lat END) AS mad_lat,
        |          MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dev_lon END) AS mad_lon
        |        FROM (
        |          SELECT v.species,
        |            ABS(v.lat - med_lat) AS dev_lat, ABS(v.lon - med_lon) AS dev_lon,
        |            ROW_NUMBER() OVER (PARTITION BY v.species
        |              ORDER BY ABS(v.lat - med_lat), occ_id) AS rn,
        |            ROW_NUMBER() OVER (PARTITION BY v.species
        |              ORDER BY ABS(v.lon - med_lon), occ_id) AS rn2,
        |            COUNT(*) OVER (PARTITION BY v.species) AS n
        |          FROM valid v
        |          JOIN (SELECT species,
        |                  MAX(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS med_lat
        |                FROM (SELECT species, lat,
        |                        ROW_NUMBER() OVER (PARTITION BY species
        |                          ORDER BY lat, occ_id) AS rn,
        |                        COUNT(*) OVER (PARTITION BY species) AS n FROM valid)
        |                GROUP BY species) USING (species)
        |          JOIN (SELECT species,
        |                  MAX(CASE WHEN rn = (n + 1) // 2 THEN lon END) AS med_lon
        |                FROM (SELECT species, lon,
        |                        ROW_NUMBER() OVER (PARTITION BY species
        |                          ORDER BY lon, occ_id) AS rn,
        |                        COUNT(*) OVER (PARTITION BY species) AS n FROM valid)
        |                GROUP BY species) USING (species))
        |        GROUP BY species) USING (species))
        |WHERE (mad_lat > 0 AND dev_lat > mad_lat * CAST(1.5 AS DOUBLE))
        |   OR (mad_lon > 0 AND dev_lon > mad_lon * CAST(1.5 AS DOUBLE))""".stripMargin),
    "occ_gap_analysis" -> withSql(OCC_SQL, VALID_SQL,
      """g AS (
        |  SELECT species,
        |    CAST(FLOOR(lat * 10.0) AS BIGINT) AS lat10,
        |    CAST(FLOOR(lon * 10.0) AS BIGINT) AS lon10
        |  FROM valid),
        |a AS (
        |  SELECT species, CAST(COUNT(*) AS BIGINT) AS n_pts,
        |    CAST(COUNT(DISTINCT lat10 * 4000 + lon10) AS BIGINT) AS occupied,
        |    CAST((MAX(lat10) - MIN(lat10) + 1) *
        |         (MAX(lon10) - MIN(lon10) + 1) AS BIGINT) AS bbox_cells
        |  FROM g GROUP BY species)""".stripMargin)(
      """SELECT species, n_pts, occupied, bbox_cells,
        |  (bbox_cells - occupied) * 1000 // bbox_cells AS gap_milli
        |FROM a""".stripMargin),
    "occ_centroid_shift" -> withSql(OCC_SQL, VALID_SQL,
      """cm AS (
        |  SELECT species,
        |    CAST(YEAR(make_timestamp(ts_ns // 1000)) * 100 +
        |         MONTH(make_timestamp(ts_ns // 1000)) AS BIGINT) AS ym,
        |    CAST(FLOOR((lat + 90.0) * 1000) AS BIGINT) AS latq,
        |    CAST(FLOOR((lon + 180.0) * 1000) AS BIGINT) AS lonq
        |  FROM valid),
        |cent AS (
        |  SELECT species, ym, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(latq) // COUNT(*) AS BIGINT) AS clat_q,
        |    CAST(SUM(lonq) // COUNT(*) AS BIGINT) AS clon_q
        |  FROM cm GROUP BY 1, 2)""".stripMargin)(
      """SELECT species, ym, n, clat_q, clon_q,
        |  ABS(clat_q - LAG(clat_q) OVER w) + ABS(clon_q - LAG(clon_q) OVER w)
        |    AS l1_shift_mdeg
        |FROM cent
        |WINDOW w AS (PARTITION BY species ORDER BY ym)""".stripMargin),
    "occ_seasonality" -> withSql(OCC_SQL, VALID_SQL,
      """bym AS (
        |  SELECT species,
        |    CAST(MONTH(make_timestamp(ts_ns // 1000)) AS BIGINT) AS m,
        |    COUNT(*) AS n
        |  FROM valid GROUP BY species, m)""".stripMargin)(
      """SELECT species, CAST(n_total AS BIGINT) AS n_total,
        |  CAST(n_months AS BIGINT) AS n_months,
        |  m AS peak_month, CAST(n AS BIGINT) AS peak_n,
        |  CAST(n * 1000 // n_total AS BIGINT) AS peak_millis
        |FROM (
        |  SELECT species, m, n,
        |    ROW_NUMBER() OVER (PARTITION BY species ORDER BY n DESC, m) AS rn,
        |    SUM(n) OVER (PARTITION BY species) AS n_total,
        |    COUNT(*) OVER (PARTITION BY species) AS n_months
        |  FROM bym)
        |WHERE rn = 1""".stripMargin),
    "occ_climate_envelope" -> withSql(OCC_SQL, VALID_SQL,
      s"""cv AS (
        |  SELECT species, $CELL1_SQL AS cid FROM valid
        |  WHERE $CELL1_SQL BETWEEN 0 AND 64799)""".stripMargin)(
      s"""SELECT species, CAST(COUNT(*) AS BIGINT) AS n_pts,
        |  MIN($RASTER_T_SQL) AS t_lo, MAX($RASTER_T_SQL) AS t_hi,
        |  MIN($RASTER_P_SQL) AS p_lo, MAX($RASTER_P_SQL) AS p_hi,
        |  (MAX($RASTER_T_SQL) - MIN($RASTER_T_SQL))
        |    * (MAX($RASTER_P_SQL) - MIN($RASTER_P_SQL)) AS breadth
        |FROM cv GROUP BY species""".stripMargin),
    "occ_latitude_gradient" -> withSql(OCC_SQL, VALID_SQL,
      s"""b AS (
        |  SELECT CAST(FLOOR(lat / 10.0) AS BIGINT) AS band, species,
        |    $CELL1_SQL AS cid
        |  FROM valid),
        |oc AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_occ FROM b
        |       GROUP BY band),
        |sp AS (SELECT band, CAST(COUNT(DISTINCT species) AS BIGINT)
        |         AS n_species FROM b GROUP BY band),
        |cl AS (SELECT band, CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_cells
        |       FROM b GROUP BY band)""".stripMargin)(
      """SELECT oc.band, n_occ, n_species, n_cells,
        |  n_occ * 1000 // GREATEST(CAST(SUM(n_occ) OVER () AS BIGINT), 1)
        |    AS occ_share_milli
        |FROM oc JOIN sp ON sp.band = oc.band
        |JOIN cl ON cl.band = oc.band""".stripMargin),
    "occ_envelope_projection" -> withSql(OCC_SQL, VALID_SQL,
      s"""cv AS (
        |  SELECT species, $CELL1_SQL AS cid FROM valid
        |  WHERE $CELL1_SQL BETWEEN 0 AND 64799),
        |env AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS n_pts,
        |          MIN($RASTER_T_SQL) AS t_lo, MAX($RASTER_T_SQL) AS t_hi,
        |          MIN($RASTER_P_SQL) AS p_lo, MAX($RASTER_P_SQL) AS p_hi
        |        FROM cv GROUP BY species),
        |obs AS (SELECT species, CAST(COUNT(DISTINCT cid) AS BIGINT)
        |          AS observed_cells
        |        FROM cv GROUP BY species),
        |cells AS (SELECT g AS cid, (g * 7919) % 4000 AS t,
        |            (g * 104729) % 12000 AS p
        |          FROM generate_series(0, 64799) tg(g)),
        |su AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS suitable_cells
        |       FROM env JOIN cells
        |         ON t BETWEEN t_lo AND t_hi AND p BETWEEN p_lo AND p_hi
        |       GROUP BY species)""".stripMargin)(
      """SELECT env.species, n_pts, observed_cells, suitable_cells,
        |  observed_cells * 1000 // GREATEST(suitable_cells, 1)
        |    AS occupancy_milli
        |FROM env JOIN obs ON obs.species = env.species
        |JOIN su ON su.species = env.species""".stripMargin),
    "occ_niche_breadth" -> withSql(OCC_SQL, VALID_SQL,
      s"""cv AS (
        |  SELECT species, $CELL1_SQL AS cid FROM valid
        |  WHERE $CELL1_SQL BETWEEN 0 AND 64799),
        |tb AS (SELECT species, ($RASTER_T_SQL) // 400 AS bin FROM cv),
        |bc AS (SELECT species, bin, CAST(COUNT(*) AS BIGINT) AS nb
        |       FROM tb GROUP BY 1, 2),
        |wn AS (SELECT species, bin, nb,
        |         CAST(SUM(nb) OVER (PARTITION BY species) AS BIGINT) AS n
        |       FROM bc),
        |ag AS (SELECT species, MIN(n) AS n_pts,
        |         CAST(COUNT(*) AS BIGINT) AS n_bins,
        |         CAST(SUM((nb * 1000 // n) * (nb * 1000 // n)) AS BIGINT)
        |           AS sum_p2_micro
        |       FROM wn GROUP BY species)""".stripMargin)(
      """SELECT species, n_pts, n_bins, sum_p2_micro,
        |  1000000000 // GREATEST(sum_p2_micro, 1) AS b_milli,
        |  (1000000000 // GREATEST(sum_p2_micro, 1) - 1000) * 1000 // 9000
        |    AS ba_milli
        |FROM ag""".stripMargin),
    "occ_chao1_richness" -> withSql(OCC_SQL, VALID_SQL,
      """csp AS (
        |  SELECT CAST(FLOOR(lat) AS BIGINT) AS cell_lat,
        |    CAST(FLOOR(lon) AS BIGINT) AS cell_lon, species,
        |    COUNT(*) AS n
        |  FROM valid GROUP BY 1, 2, 3)""".stripMargin)(
      """SELECT cell_lat, cell_lon, s_obs, n_occ, f1, f2,
        |  s_obs * 1000 + (1000 * f1 * (f1 - 1)) // (2 * (f2 + 1)) AS chao1_millis
        |FROM (
        |  SELECT cell_lat, cell_lon,
        |    CAST(COUNT(*) AS BIGINT) AS s_obs,
        |    CAST(SUM(n) AS BIGINT) AS n_occ,
        |    CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM csp GROUP BY cell_lat, cell_lon)""".stripMargin),
    "occ_eoo_aoo" -> withSql(OCC_SQL, VALID_SQL)(
      """SELECT species, CAST(COUNT(*) AS BIGINT) AS n_pts,
        |  CAST(COUNT(DISTINCT CAST(FLOOR(lat * 50.0) AS BIGINT) * 20000
        |    + CAST(FLOOR(lon * 50.0) AS BIGINT)) AS BIGINT) AS aoo_cells,
        |  MAX(CAST(FLOOR(lat * 10.0) AS BIGINT))
        |    - MIN(CAST(FLOOR(lat * 10.0) AS BIGINT)) AS lat_span_deci,
        |  MAX(CAST(FLOOR(lon * 10.0) AS BIGINT))
        |    - MIN(CAST(FLOOR(lon * 10.0) AS BIGINT)) AS lon_span_deci
        |FROM valid GROUP BY species""".stripMargin),
    "occ_range_overlap" -> withSql(OCC_SQL, VALID_SQL,
      """bbox AS (
        |  SELECT species,
        |    MIN(CAST(FLOOR(lat * 10.0) AS BIGINT)) AS lat_lo,
        |    MAX(CAST(FLOOR(lat * 10.0) AS BIGINT)) AS lat_hi,
        |    MIN(CAST(FLOOR(lon * 10.0) AS BIGINT)) AS lon_lo,
        |    MAX(CAST(FLOOR(lon * 10.0) AS BIGINT)) AS lon_hi
        |  FROM valid GROUP BY species)""".stripMargin)(
      """SELECT a.species AS sp1, b.species AS sp2,
        |  LEAST(a.lat_hi, b.lat_hi) - GREATEST(a.lat_lo, b.lat_lo) AS overlap_lat_deci,
        |  LEAST(a.lon_hi, b.lon_hi) - GREATEST(a.lon_lo, b.lon_lo) AS overlap_lon_deci,
        |  (LEAST(a.lat_hi, b.lat_hi) - GREATEST(a.lat_lo, b.lat_lo))
        |    * (LEAST(a.lon_hi, b.lon_hi) - GREATEST(a.lon_lo, b.lon_lo)) AS overlap_deci2
        |FROM bbox a JOIN bbox b ON a.species < b.species
        |WHERE LEAST(a.lat_hi, b.lat_hi) - GREATEST(a.lat_lo, b.lat_lo) > 0
        |  AND LEAST(a.lon_hi, b.lon_hi) - GREATEST(a.lon_lo, b.lon_lo) > 0""".stripMargin),
    "occ_range_jaccard" -> withSql(OCC_SQL, VALID_SQL,
      s"""sp AS (
         |  SELECT DISTINCT $CELL1_SQL AS cellid, species FROM valid),
         |rich AS (
         |  SELECT species, CAST(COUNT(*) AS BIGINT) AS n_cells
         |  FROM sp GROUP BY 1),
         |ipair AS (
         |  SELECT a.species AS sp1, b.species AS sp2,
         |    CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM sp a JOIN sp b
         |    ON a.cellid = b.cellid AND a.species < b.species
         |  GROUP BY 1, 2)""".stripMargin)(
      """SELECT sp1, sp2, inter,
        |  ra.n_cells AS cells_1, rb.n_cells AS cells_2,
        |  inter * 1000 // (ra.n_cells + rb.n_cells - inter) AS jaccard_milli
        |FROM ipair
        |JOIN rich ra ON ra.species = sp1
        |JOIN rich rb ON rb.species = sp2""".stripMargin),
    "occ_effort_curve" -> withSql(OCC_SQL, VALID_SQL,
      s"""csp AS (
         |  SELECT $CELL1_SQL AS cellid, species, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM valid GROUP BY 1, 2),
         |cs AS (
         |  SELECT cellid, CAST(SUM(n) AS BIGINT) AS ns,
         |    CAST(COUNT(*) AS BIGINT) AS rich
         |  FROM csp GROUP BY 1)""".stripMargin)(
      """SELECT CAST(length(bin(ns)) - 1 AS BIGINT) AS effort_bits,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(ns) AS BIGINT) AS n_occ,
        |  CAST(SUM(rich) AS BIGINT) AS rich_sum,
        |  MIN(rich) AS rich_min, MAX(rich) AS rich_max,
        |  CAST(SUM(rich) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
        |    AS rich_milli_mean
        |FROM cs GROUP BY 1""".stripMargin),
    "occ_accumulation_curve" -> withSql(OCC_SQL, VALID_SQL,
      """acc AS (
        |  SELECT occ_id, species,
        |    ('0x' || substr(md5('acc:' || CAST(occ_id AS VARCHAR)), 1, 13))::BIGINT AS h
        |  FROM valid)""".stripMargin,
      """facc AS (
        |  SELECT occ_id, species, h,
        |    ROW_NUMBER() OVER (PARTITION BY species ORDER BY h, occ_id) = 1 AS is_new,
        |    CAST(ROW_NUMBER() OVER (ORDER BY h, occ_id) AS BIGINT) AS pos
        |  FROM acc)""".stripMargin,
      """nacc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM acc)""",
      """jmacc AS (
        |  SELECT CASE WHEN pos = 1 THEN 0
        |              ELSE CAST(length(bin(pos - 1)) AS BIGINT) END AS j,
        |    CAST(COUNT(*) AS BIGINT) AS nn
        |  FROM facc WHERE is_new GROUP BY 1)""".stripMargin,
      """jsacc AS (
        |  SELECT CAST(t.j AS BIGINT) AS j, (SELECT n FROM nacc) AS n
        |  FROM generate_series(0, 63) AS t(j)
        |  WHERE t.j = 0 OR ((SELECT n FROM nacc) >= 2
        |    AND t.j <= length(bin((SELECT n FROM nacc) - 1))))""".stripMargin)(
      """SELECT js.j, LEAST(CAST(1 AS BIGINT) << js.j, js.n) AS k,
        |  CAST(SUM(COALESCE(jm.nn, 0)) OVER (ORDER BY js.j
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_species
        |FROM jsacc js LEFT JOIN jmacc jm USING (j)""".stripMargin),
    "occ_cell_diversity" -> withSql(OCC_SQL, VALID_SQL,
      s"""cdiv AS (
         |  SELECT $CELL1_SQL AS cellid, species, CAST(COUNT(*) AS BIGINT) AS ns
         |  FROM valid GROUP BY 1, 2)""".stripMargin,
      """wdiv AS (SELECT cellid, species, ns,
        |    CAST(SUM(ns) OVER (PARTITION BY cellid) AS BIGINT) AS n_cell
        |  FROM cdiv)""".stripMargin,
      """bdiv AS (SELECT cellid, ns, n_cell,
        |    CAST(length(bin(n_cell // ns)) - 1 AS BIGINT) AS b
        |  FROM wdiv)""".stripMargin)(
      """SELECT cellid, MAX(n_cell) AS n_occ,
        |  CAST(COUNT(*) AS BIGINT) AS n_species,
        |  CAST(SUM(ns * b) AS BIGINT) AS bits_sum,
        |  CAST(SUM(ns * b) * 1000 // MAX(n_cell) AS BIGINT) AS milli_bits_per_occ
        |FROM bdiv GROUP BY cellid""".stripMargin),
    "spatial_grid_density" -> withSql(OCC_SQL, VALID_SQL)(
      s"""SELECT cellid, CAST(SUM(n) AS BIGINT) AS n_occ,
         |  CAST(COUNT(*) AS BIGINT) AS n_species,
         |  MAX(CASE WHEN rn = 1 THEN species END) AS dominant,
         |  MAX(CASE WHEN rn = 1 THEN n END) AS dom_n
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cellid
         |      ORDER BY n DESC, species) AS rn
         |  FROM (SELECT $CELL1_SQL AS cellid, species,
         |          CAST(COUNT(*) AS BIGINT) AS n
         |        FROM valid GROUP BY 1, 2))
         |GROUP BY cellid""".stripMargin),
    "occ_clean_coords" -> withSql(OCC_SQL, VALID_SQL)(
      "SELECT occ_id, species, lat, lon FROM valid"),
    "occ_uncertainty_band" -> withSql(OCC_SQL, VALID_SQL)(
      "SELECT occ_id, species, uncert FROM valid WHERE uncert BETWEEN 1000.0 AND 5000.0"),
    "occ_land_filter" -> withSql(OCC_SQL, VALID_SQL, LAND_SQL)(
      s"""SELECT occ_id, species, lat, lon, cellid FROM
         |  (SELECT *, $CELL10_SQL AS cellid FROM valid)
         |WHERE cellid IN (SELECT cellid FROM land)""".stripMargin),
    "occ_temporal_trend" -> withSql(OCC_SQL, VALID_SQL)(
      """SELECT species, n_years, n_total, trend_num,
        |  CASE WHEN trend_num > 0 THEN 'increasing'
        |       WHEN trend_num < 0 THEN 'declining'
        |       ELSE 'stable' END AS trend
        |FROM (
        |  SELECT species, CAST(COUNT(*) AS BIGINT) AS n_years,
        |    CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(COUNT(*) * SUM(yr * n) - SUM(yr) * SUM(n) AS BIGINT) AS trend_num
        |  FROM (SELECT species,
        |          CAST(year(make_timestamp(ts_ns // 1000)) AS BIGINT) AS yr,
        |          CAST(COUNT(*) AS BIGINT) AS n
        |        FROM valid GROUP BY 1, 2)
        |  GROUP BY species)""".stripMargin),
    "spatial_nearest" -> withSql(OCC_SQL, VALID_SQL, CENTID_SQL)(
      """SELECT occ_id, cid AS centroid_id, d2 FROM (
        |  SELECT occ_id, cid, d2,
        |    ROW_NUMBER() OVER (PARTITION BY occ_id ORDER BY d2, cid) AS rn
        |  FROM (SELECT v.occ_id, c.cid,
        |          (v.lat - c.clat) * (v.lat - c.clat) +
        |          LEAST(ABS(v.lon - c.clon), 360.0 - ABS(v.lon - c.clon)) *
        |          LEAST(ABS(v.lon - c.clon), 360.0 - ABS(v.lon - c.clon)) AS d2
        |        FROM valid v CROSS JOIN centid c))
        |WHERE rn = 1""".stripMargin),
    "occ_centroid_filter" -> withSql(OCC_SQL, VALID_SQL, CENT_SQL)(
      s"""SELECT occ_id, species, lat, lon FROM valid v
         |WHERE NOT EXISTS (SELECT 1 FROM cent c
         |  WHERE ${haversineSql("v.lat", "v.lon", "c.clat", "c.clon")} <= $CENTROID_DIST_M)""".stripMargin),
    "occ_dedupe_best" -> withSql(OCC_SQL, VALID_SQL)(
      """SELECT species, cell_lat, cell_lon, occ_id, uncert FROM (
        |  SELECT species, CAST(FLOOR(lat) AS BIGINT) AS cell_lat,
        |    CAST(FLOOR(lon) AS BIGINT) AS cell_lon, occ_id, uncert,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY species, CAST(FLOOR(lat) AS BIGINT), CAST(FLOOR(lon) AS BIGINT)
        |      ORDER BY uncert, occ_id) AS rn
        |  FROM valid) WHERE rn = 1""".stripMargin),
    "occ_clean_pipeline" -> withSql(OCC_SQL, VALID_SQL, LAND_SQL, CENT_SQL, CLEANED_SQL)(
      "SELECT occ_id, species, lat, lon, uncert FROM cleaned"),
    "occ_fetch_summary" -> withSql(OCC_SQL,
      """sp AS (
        |  SELECT c_custkey AS tax_id,
        |    'sp_' || CAST(c_custkey % 50 AS VARCHAR) AS species
        |  FROM customer
        |  WHERE c_custkey % 23 <> 0
        |    AND (c_custkey % 5 = 0
        |         OR (c_custkey % 5 IN (1, 2) AND c_custkey * 13 % 101 >= 95)))""".stripMargin,
      "counts AS (SELECT species, COUNT(*) AS n_occ FROM occ GROUP BY species)")(
      """SELECT
        |  CAST(SUM(CASE WHEN tax_id % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS species_succeeded,
        |  CAST(SUM(CASE WHEN tax_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS species_failed,
        |  CAST(SUM(CASE WHEN tax_id % 13 <> 0 THEN COALESCE(n_occ, 0) ELSE 0 END) AS BIGINT)
        |    AS occurrences_written
        |FROM sp LEFT JOIN counts USING (species)""".stripMargin),
    "uncertainty_buffer" -> withSql(OCC_SQL, VALID_SQL)(
      """SELECT occ_id,
        |  lat - GREATEST(uncert, 100.0) / 111320.0 AS lat_min,
        |  lat + GREATEST(uncert, 100.0) / 111320.0 AS lat_max,
        |  ROUND(lon - LEAST(GREATEST(uncert, 100.0) / (111320.0 * COS(RADIANS(lat))),
        |                    CAST(360.0 AS DOUBLE)), 6) AS lon_min,
        |  ROUND(lon + LEAST(GREATEST(uncert, 100.0) / (111320.0 * COS(RADIANS(lat))),
        |                    CAST(360.0 AS DOUBLE)), 6) AS lon_max
        |FROM valid""".stripMargin),
    "clim_annotate" -> withSql(OCC_SQL, VALID_SQL, CLIM_SQL)(
      "SELECT occ_id, accession, species, n_cells, bio1, bio12 FROM clim"),
    "clim_summary" -> withSql(OCC_SQL, VALID_SQL, CLIM_SQL)(CLIM_SUMMARY_SELECT),
    "biogeo_annotate" -> withSql(OCC_SQL, VALID_SQL, REGIONS_SQL, BIOGEO_JOINED_SQL)(
      """SELECT occ_id, accession, species,
        |  CAST(COUNT(DISTINCT realm) AS BIGINT) AS n_realms,
        |  string_agg(DISTINCT realm, ',' ORDER BY realm) AS realms,
        |  CAST(COUNT(DISTINCT biome) AS BIGINT) AS n_biomes,
        |  string_agg(DISTINCT biome, ',' ORDER BY biome) AS biomes
        |FROM bg GROUP BY occ_id, accession, species""".stripMargin),
    "biogeo_summary" -> withSql(OCC_SQL, VALID_SQL, REGIONS_SQL, BIOGEO_JOINED_SQL)(
      BIOGEO_SUMMARY_SELECT),
    "spatial_summary_join" -> withSql(OCC_SQL, VALID_SQL, CLIM_SQL, REGIONS_SQL,
        BIOGEO_JOINED_SQL)(
      s"""SELECT COALESCE(c.accession, b.accession) AS accession,
         |  COALESCE(b.species, c.species) AS species,
         |  n, bio1_mean, bio1_sd, bio1_med, bio1_p5, bio1_p95,
         |  bio1_min, bio1_max, bio12_mean, bio12_min, bio12_max,
         |  n_realms, realms, n_biomes, biomes
         |FROM ($CLIM_SUMMARY_SELECT) c
         |FULL JOIN ($BIOGEO_SUMMARY_SELECT) b ON c.accession = b.accession""".stripMargin),
    "range_bbox" -> withSql(OCC_SQL, VALID_SQL)(
      """SELECT species, COUNT(*) AS n_points,
        |  CASE WHEN COUNT(*) >= 3 THEN
        |    ROUND((MAX(lat) - MIN(lat)) * 111.32 * (MAX(lon) - MIN(lon)) * 111.32 *
        |          COS(RADIANS((MAX(lat) + MIN(lat)) / 2)), 2)
        |  ELSE NULL END AS area_km2,
        |  CASE WHEN COUNT(*) < 3 THEN 'Insufficient points for convex hull'
        |  END AS note
        |FROM valid GROUP BY species""".stripMargin),
    "tax_validate_split" -> TAX_SPLIT_SELECT,
    "tax_lineage" ->
      """SELECT c_custkey AS tax_id,
        |  'sp_' || CAST(c_custkey % 50 AS VARCHAR) AS species,
        |  r_name AS kingdom,
        |  'phy_' || CAST(r_regionkey * 5 + n_nationkey % 5 AS VARCHAR) AS phylum,
        |  'cls_' || CAST(n_nationkey AS VARCHAR) AS class,
        |  'ord_' || CAST(n_nationkey * 2 + c_custkey % 2 AS VARCHAR) AS "order",
        |  n_name AS family,
        |  'gen_' || CAST((c_custkey % 50) // 2 AS VARCHAR) AS genus
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "spatial_join" -> withSql(OCC_SQL, VALID_SQL, CLIM_SQL, REGIONS_SQL,
      BIOGEO_PAIRS_SQL,
      """bio AS (
        |  SELECT occ_id AS b_occ_id, COUNT(*) AS n_realms,
        |    string_agg(realm, ',' ORDER BY realm) AS realms
        |  FROM pairs GROUP BY occ_id)""".stripMargin)(
      """SELECT COALESCE(occ_id, b_occ_id) AS occ_id,
        |  accession, species, bio1, bio12,
        |  COALESCE(n_realms, 0) AS n_realms,
        |  COALESCE(realms, '') AS realms
        |FROM clim FULL OUTER JOIN bio ON occ_id = b_occ_id""".stripMargin),
    "tax_gate_new" ->
      """SELECT DISTINCT user_id AS tax_id FROM events
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = user_id AND c_custkey % 3 = 0)""".stripMargin,
    "tax_sanitize_names" ->
      """SELECT p_partkey AS tax_id,
        |  p_brand || ' ' || p_name AS raw_name,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    array_to_string((regexp_split_to_array(trim(p_brand || ' ' || p_name), '\s+'))[1:2], '_'),
        |    '[^A-Za-z0-9_]', '_', 'g'), '_+', '_', 'g'), '^_+|_+$', '', 'g') AS safe_name
        |FROM part""".stripMargin,
    "provenance_urls" -> PROV_SELECT,
    "meta_classify" ->
      """SELECT CASE event_type WHEN 'purchase' THEN 'specimens'
        |         WHEN 'signup' THEN 'symbionts' WHEN 'error' THEN 'errors'
        |         ELSE 'metagenomes' END AS category,
        |  COUNT(*) AS n_samples,
        |  CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "meta_collect_related" ->
      """SELECT o_custkey AS sample_id, COUNT(*) AS n_related,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS related_ids,
        |  COALESCE(string_agg(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_orderkey AS VARCHAR) END, ',' ORDER BY o_orderkey), '')
        |    AS analyses,
        |  MAX(o_orderpriority = '1-URGENT') AS images_available
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "bio_ingest_pipeline" -> withSql(OCC_SQL, VALID_SQL, LAND_SQL, CENT_SQL,
      CLEANED_SQL, REGIONS_SQL,
      """cleana AS (
        |  SELECT occ_id, replace(species, 'sp_', 'ACC') AS accession,
        |    species, lat, lon, uncert
        |  FROM cleaned)""".stripMargin,
      climSqlOver("cleana"),
      // NB: concatenation, not interpolation-then-stripMargin — the nested
      // SELECT contains continuation lines starting with '||' whose first
      // pipe an outer stripMargin would eat (the r12 binder-error class).
      """taxsp AS (
        |  SELECT gbif_scientific_name AS species,
        |    CAST(COUNT(*) AS BIGINT) AS n_tax,
        |    CAST(SUM(CASE WHEN status = 'validated' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_validated,
        |    CAST(SUM(CASE WHEN status = 'validated' AND tax_id % 13 <> 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_fetch_ok
        |  FROM (""".stripMargin + TAX_SPLIT_SELECT + """)
        |  WHERE gbif_scientific_name IS NOT NULL
        |  GROUP BY gbif_scientific_name)""".stripMargin,
      "raw AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS n_raw FROM occ GROUP BY species)",
      "ncl AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS n_clean FROM cleana GROUP BY species)",
      """climsp AS (
        |  SELECT species, CAST(COUNT(*) AS BIGINT) AS n_clim,
        |    CAST(SUM(CAST(bio1 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS bio1_mean,
        |    CAST(SUM(CAST(bio12 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS bio12_mean
        |  FROM clim GROUP BY species)""".stripMargin,
      s"""biosp AS (
         |  SELECT species, CAST(COUNT(DISTINCT realm) AS BIGINT) AS n_realms,
         |    string_agg(DISTINCT realm, ',' ORDER BY realm) AS realms,
         |    CAST(COUNT(DISTINCT biome) AS BIGINT) AS n_biomes,
         |    string_agg(DISTINCT biome, ',' ORDER BY biome) AS biomes
         |  FROM (SELECT species, $CELL1_SQL AS cellid FROM cleana
         |        WHERE ($CELL1_SQL) BETWEEN 0 AND 64799) c
         |  JOIN regions USING (cellid)
         |  GROUP BY species)""".stripMargin,
      """rng AS (
        |  SELECT species, CAST(COUNT(*) AS BIGINT) AS n_points,
        |    CASE WHEN COUNT(*) >= 3 THEN
        |      ROUND((MAX(lat) - MIN(lat)) * 111.32 * (MAX(lon) - MIN(lon)) * 111.32 *
        |            COS(RADIANS((MAX(lat) + MIN(lat)) / 2)), 2)
        |    END AS area_km2,
        |    CASE WHEN COUNT(*) < 3 THEN 'Insufficient points for convex hull'
        |    END AS note
        |  FROM cleana GROUP BY species)""".stripMargin,
      """provsp AS (
        |  SELECT 'sp_' || CAST(tax_id % 50 AS VARCHAR) AS species,
        |    CAST(COUNT(*) AS BIGINT) AS n_prov,
        |    CAST(SUM(CASE WHEN gbif_url IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_gbif
        |  FROM (""".stripMargin + PROV_SELECT + """)
        |  GROUP BY 1)""".stripMargin)(
      """SELECT t.species, n_tax, n_validated, n_fetch_ok,
        |  COALESCE(n_raw, 0) AS n_raw,
        |  COALESCE(n_clean, 0) AS n_clean,
        |  CASE WHEN COALESCE(n_raw, 0) > 0
        |       THEN COALESCE(n_clean, 0) * 100.0 / n_raw END AS percent_retained,
        |  n_clim, bio1_mean, bio12_mean,
        |  n_realms, realms, n_biomes, biomes,
        |  n_points, area_km2, note,
        |  COALESCE(n_prov, 0) AS n_prov,
        |  COALESCE(n_gbif, 0) AS n_gbif,
        |  CASE WHEN n_validated = 0 THEN 'not_validated'
        |       WHEN n_fetch_ok = 0 THEN 'fetch_failed'
        |       WHEN COALESCE(n_clean, 0) = 0 THEN 'no_clean_occurrences'
        |       ELSE 'ingested' END AS status
        |FROM taxsp t
        |LEFT JOIN raw USING (species)
        |LEFT JOIN ncl USING (species)
        |LEFT JOIN climsp USING (species)
        |LEFT JOIN biosp USING (species)
        |LEFT JOIN rng USING (species)
        |LEFT JOIN provsp USING (species)""".stripMargin),
    "spatial_region_join" -> REGION_JOIN_SQL,
    "spatial_buffer_region_join" -> BUFFER_REGION_SQL,
    "spatial_buffer_biogeo" -> BUFFER_BIOGEO_SQL,
    "occ_sdm_calibration" -> SDM_CAL_SQL,
    "occ_species_area" -> SPECIES_AREA_SQL,
    "events_session_gap_sweep" -> GAP_SWEEP_SQL,
    "cleaning_summary" -> withSql(OCC_SQL, VALID_SQL, LAND_SQL, CENT_SQL, CLEANED_SQL)(
      """SELECT t.species, total_records,
        |  COALESCE(retained_records, 0) AS retained_records,
        |  COALESCE(retained_records, 0) * 100.0 / total_records AS percent_retained
        |FROM (SELECT species, COUNT(*) AS total_records FROM occ GROUP BY species) t
        |LEFT JOIN (SELECT species, COUNT(*) AS retained_records
        |           FROM cleaned GROUP BY species) r ON t.species = r.species""".stripMargin),
    "events_hopping" ->
      """WITH e AS (SELECT event_type, value,
        |             epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events)
        |SELECT w AS window_id, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type, value,
        |        unnest([ts_ns // 3600000000000 - 1, ts_ns // 3600000000000]) AS w
        |      FROM e)
        |GROUP BY 1, 2""".stripMargin,
    "events_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 * 1000 AS ts_ns,
        |             event_id FROM events),
        |seq AS (
        |  SELECT user_id, ts_ns,
        |    CASE WHEN ts_ns - LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |              > 21600000000000 THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM e),
        |ses AS (
        |  SELECT user_id, ts_ns,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM seq)
        |SELECT user_id, MIN(ts_ns) // 1000 AS start_us, COUNT(*) AS n_events
        |FROM ses GROUP BY user_id, sid""".stripMargin,
    "events_tumbling" ->
      """SELECT epoch_ns(ts) // 1000 * 1000 // 3600000000000 AS hour_id, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sequence_contract" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events),
        |seq AS (
        |  SELECT user_id, event_type, ts_ns,
        |    CASE WHEN ts_ns - LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |              > 21600000000000 THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM e),
        |ses AS (
        |  SELECT user_id, event_type, ts_ns,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM seq),
        |s1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_ns END)
        |              OVER (PARTITION BY user_id, session_id) AS t_view
        |  FROM ses),
        |p AS (SELECT user_id,
        |        CASE WHEN t_view IS NULL OR ts_ns < t_view THEN 1 ELSE 0 END
        |          AS orphan
        |      FROM s1 WHERE event_type = 'purchase')
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(orphan) AS BIGINT) AS n_orphans,
        |  CAST(SUM(orphan) AS BIGINT) * 1000 // COUNT(*) AS orphan_milli
        |FROM p GROUP BY user_id""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events),
        |seq AS (
        |  SELECT user_id, event_type, ts_ns,
        |    CASE WHEN ts_ns - LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |              > 21600000000000 THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM e),
        |ses AS (
        |  SELECT user_id, event_type, ts_ns,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM seq),
        |s1 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_ns END)
        |              OVER (PARTITION BY user_id, session_id) AS t_view
        |  FROM ses),
        |s2 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_ns > t_view THEN ts_ns END)
        |              OVER (PARTITION BY user_id, session_id) AS t_click
        |  FROM s1),
        |s3 AS (
        |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_ns > t_click THEN ts_ns END)
        |              OVER (PARTITION BY user_id, session_id) AS t_purchase
        |  FROM s2)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(t_view) AS t_view, MIN(t_click) AS t_click,
        |  MIN(t_purchase) AS t_purchase,
        |  CASE WHEN MIN(t_purchase) IS NOT NULL
        |       THEN MIN(t_purchase) - MIN(t_view) END AS conv_ns
        |FROM s3 GROUP BY user_id, session_id""".stripMargin,
    "events_session_stats" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events),
        |seq AS (
        |  SELECT user_id, ts_ns,
        |    CASE WHEN ts_ns - LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |              > 21600000000000 THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM e),
        |ses AS (
        |  SELECT user_id, ts_ns,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM seq),
        |s2 AS (SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |         MAX(ts_ns) - MIN(ts_ns) AS dur_ns
        |       FROM ses GROUP BY 1, 2)
        |SELECT CAST(length(bin(dur_ns // 60000000000 + 1)) - 1 AS BIGINT) AS dur_bits,
        |  CAST(length(bin(n_events)) - 1 AS BIGINT) AS ev_bits,
        |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS sum_events,
        |  MIN(dur_ns // 60000000000) AS min_dur_min,
        |  MAX(dur_ns // 60000000000) AS max_dur_min
        |FROM s2 GROUP BY 1, 2""".stripMargin,
    "occ_sample_coverage" -> withSql(OCC_SQL, VALID_SQL,
      s"""cs AS (SELECT $CELL1_SQL AS cellid, species,
         |         CAST(COUNT(*) AS BIGINT) AS ns
         |       FROM valid GROUP BY 1, 2)""".stripMargin)(
      """SELECT cellid, CAST(SUM(ns) AS BIGINT) AS n_occ,
        |  CAST(COUNT(*) AS BIGINT) AS n_species,
        |  CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  1000 - CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000 // CAST(SUM(ns) AS BIGINT) AS coverage_milli
        |FROM cs GROUP BY cellid""".stripMargin),
    "occ_hotspot_adjacency" -> withSql(OCC_SQL, VALID_SQL,
      s"""cl AS (SELECT $CELL10_SQL AS cellid, CAST(COUNT(*) AS BIGINT) AS n_occ
         |       FROM valid GROUP BY 1)""".stripMargin,
      """g AS (SELECT CAST(SUM(n_occ) AS BIGINT) AS total,
        |        CAST(COUNT(*) AS BIGINT) AS n_cells FROM cl)""".stripMargin,
      """h AS (SELECT cellid,
        |        CASE WHEN n_occ * n_cells > total THEN 1 ELSE 0 END AS hot
        |      FROM cl, g)""".stripMargin,
      """nh AS (SELECT CAST(SUM(hot) AS BIGINT) AS n_hot FROM h)""",
      """offs(dr, dc) AS (
        |  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
        |                        (1,-1),(1,0),(1,1)) v(dr, dc))""".stripMargin,
      """nbr AS (SELECT h.cellid AS ca, h.hot AS hot_a,
        |          (h.cellid // 36 + dr) * 36 + (h.cellid % 36 + dc) AS cb
        |        FROM h CROSS JOIN offs
        |        WHERE h.cellid // 36 + dr BETWEEN 0 AND 18
        |          AND h.cellid % 36 + dc BETWEEN 0 AND 35
        |          AND (h.cellid // 36 + dr) * 36 + (h.cellid % 36 + dc)
        |            > h.cellid)""".stripMargin,
      """pr AS (SELECT hot_a, b.hot AS hot_b
        |       FROM nbr JOIN h b ON b.cellid = nbr.cb)""".stripMargin,
      """agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |          CAST(SUM(hot_a * hot_b) AS BIGINT) AS hh,
        |          CAST(SUM((1 - hot_a) * (1 - hot_b)) AS BIGINT) AS cc
        |        FROM pr)""".stripMargin)(
      """SELECT n_pairs, hh, cc, n_pairs - hh - cc AS hc, n_hot,
        |  (SELECT n_cells FROM g) AS n_cells,
        |  n_hot * 1000 // (SELECT n_cells FROM g) AS hot_share_milli,
        |  CASE WHEN n_pairs > 0 THEN hh * 1000 // n_pairs
        |       ELSE 0 END AS hh_share_milli
        |FROM agg, nh""".stripMargin),
    "occ_morans_i" -> withSql(OCC_SQL, VALID_SQL,
      s"""cl AS (SELECT $CELL10_SQL AS cellid, CAST(COUNT(*) AS BIGINT) AS n_occ
         |       FROM valid GROUP BY 1)""".stripMargin,
      """zc AS (SELECT cellid, CAST(length(bin(n_occ)) AS BIGINT) AS z
        |       FROM cl)""".stripMargin,
      """g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |        CAST(SUM(z) AS BIGINT) AS zsum FROM zc)""".stripMargin,
      """dv AS (SELECT cellid, z * n_cells - zsum AS d FROM zc, g)""",
      """dn AS (SELECT CAST(SUM(d * d) AS BIGINT) AS den FROM dv)""",
      """offs(dr, dc) AS (
        |  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
        |                        (1,-1),(1,0),(1,1)) v(dr, dc))""".stripMargin,
      """nbr AS (SELECT dv.cellid AS ca, dv.d AS d_a,
        |          (dv.cellid // 36 + dr) * 36 + (dv.cellid % 36 + dc) AS cb
        |        FROM dv CROSS JOIN offs
        |        WHERE dv.cellid // 36 + dr BETWEEN 0 AND 18
        |          AND dv.cellid % 36 + dc BETWEEN 0 AND 35
        |          AND (dv.cellid // 36 + dr) * 36 + (dv.cellid % 36 + dc)
        |            > dv.cellid)""".stripMargin,
      """nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |          CAST(SUM(d_a * b.d) AS BIGINT) AS num
        |        FROM nbr JOIN dv b ON b.cellid = nbr.cb)""".stripMargin)(
      """SELECT n_cells, n_pairs, den, num,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
        |    AS BIGINT) AS morans_sign,
        |  CASE WHEN den > 0 AND n_pairs > 0
        |       THEN n_cells * abs(num) * 1000 // (n_pairs * den)
        |       ELSE 0 END AS morans_abs_milli
        |FROM g, dn, nm""".stripMargin),
    "spatial_point_in_polygon" -> withSql(OCC_SQL, VALID_SQL,
      """pt AS (SELECT species,
        |         CAST(FLOOR(lon * 10) AS BIGINT) AS px,
        |         CAST(FLOOR(lat * 10) AS BIGINT) AS py
        |       FROM valid)""".stripMargin,
      s"""ind AS (SELECT species,
         |          ${pipTerms(polyA)} % 2 AS in_a,
         |          ${pipTerms(polyB)} % 2 AS in_b
         |        FROM pt)""".stripMargin,
      """ag AS (SELECT species, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |         CAST(SUM(in_a) AS BIGINT) AS n_in_a,
        |         CAST(SUM(in_b) AS BIGINT) AS n_in_b
        |       FROM ind GROUP BY 1)""".stripMargin)(
      """SELECT species, n_occ, n_in_a, n_in_b,
        |  n_in_a * 1000 // n_occ AS share_a_milli,
        |  n_in_b * 1000 // n_occ AS share_b_milli
        |FROM ag""".stripMargin),
    "occ_range_fragmentation" -> {
      // recursive closure needs RECURSIVE on the outer WITH, so this one
      // assembles its CTE chain by hand instead of via withSql
      s"""WITH RECURSIVE $OCC_SQL,
         |$VALID_SQL,
         |cs AS (SELECT DISTINCT species,
         |         CAST(substr(species, 4) AS BIGINT) AS sp,
         |         $CELL10_SQL AS cellid
         |       FROM valid),
         |offs(dr, dc) AS (
         |  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
         |                        (1,-1),(1,0),(1,1)) v(dr, dc)),
         |eg AS (SELECT c.sp * 1024 + c.cellid AS a,
         |         c.sp * 1024 + n.cellid AS b
         |       FROM cs c CROSS JOIN offs
         |       JOIN cs n ON n.sp = c.sp
         |         AND n.cellid = (c.cellid // 36 + dr) * 36
         |                        + (c.cellid % 36 + dc)
         |       WHERE c.cellid // 36 + dr BETWEEN 0 AND 18
         |         AND c.cellid % 36 + dc BETWEEN 0 AND 35
         |         AND n.cellid > c.cellid),
         |e AS (SELECT a, b FROM eg UNION SELECT b, a FROM eg),
         |r(a, b) AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
         |clus AS (SELECT a AS node, LEAST(a, MIN(b)) AS cluster_id
         |         FROM r GROUP BY a),
         |fe AS (SELECT node // 1024 AS sp,
         |         CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_conn,
         |         CAST(COUNT(DISTINCT node) AS BIGINT) AS n_edge_cells
         |       FROM clus GROUP BY 1),
         |ct AS (SELECT species, sp, CAST(COUNT(*) AS BIGINT) AS n_cells
         |       FROM cs GROUP BY 1, 2)
         |SELECT species, n_cells,
         |  COALESCE(n_conn, 0) + n_cells - COALESCE(n_edge_cells, 0)
         |    AS n_fragments,
         |  (COALESCE(n_conn, 0) + n_cells - COALESCE(n_edge_cells, 0))
         |    * 1000 // n_cells AS frag_milli
         |FROM ct LEFT JOIN fe ON fe.sp = ct.sp""".stripMargin
    },
    "occ_temporal_turnover" -> withSql(OCC_SQL, VALID_SQL,
      s"""v AS (SELECT species, $CELL10_SQL AS cellid, ts_ns FROM valid)""",
      """mid AS (SELECT (MIN(ts_ns) + MAX(ts_ns)) // 2 AS mid FROM v)""",
      s"""cf AS (SELECT species, cellid,
         |         MAX(CASE WHEN ts_ns < mid THEN 1 ELSE 0 END) AS e,
         |         MAX(CASE WHEN ts_ns >= mid THEN 1 ELSE 0 END) AS l
         |       FROM v, mid GROUP BY 1, 2)""".stripMargin)(
      """SELECT species, CAST(SUM(e) AS BIGINT) AS n_early_cells,
        |  CAST(SUM(l) AS BIGINT) AS n_late_cells,
        |  CAST(SUM(e * l) AS BIGINT) AS n_common,
        |  CAST(SUM(e * l) * 1000 // (SUM(e) + SUM(l) - SUM(e * l)) AS BIGINT)
        |    AS turnover_jaccard_milli
        |FROM cf GROUP BY species""".stripMargin),
    "occ_activity_overlap" -> withSql(OCC_SQL, VALID_SQL,
      """prof AS (
        |  SELECT species, ts_ns // 86400000000000 AS day_id,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM valid GROUP BY 1, 2)""".stripMargin,
      """p AS (
        |  SELECT species, day_id,
        |    CAST(n * 1000 // SUM(n) OVER (PARTITION BY species) AS BIGINT)
        |      AS pm
        |  FROM prof)""".stripMargin)(
      """SELECT a.species AS species_a, b.species AS species_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared_days,
        |  CAST(SUM(LEAST(a.pm, b.pm)) AS BIGINT) AS overlap_milli
        |FROM p a JOIN p b ON b.day_id = a.day_id AND a.species < b.species
        |GROUP BY 1, 2""".stripMargin),
    "occ_distance_decay" -> withSql(OCC_SQL, VALID_SQL,
      s"""cs AS (
         |  SELECT DISTINCT $CELL10_SQL AS cellid, species FROM valid)""".stripMargin,
      """rich AS (
        |  SELECT cellid, CAST(COUNT(*) AS BIGINT) AS nsp
        |  FROM cs GROUP BY 1)""".stripMargin,
      """pr AS (
        |  SELECT a.cellid AS c1, b.cellid AS c2,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM cs a JOIN cs b
        |    ON b.species = a.species AND a.cellid < b.cellid
        |  GROUP BY 1, 2)""".stripMargin)(
      """SELECT GREATEST(abs(c1 // 36 - c2 // 36), abs(c1 % 36 - c2 % 36))
        |    AS dist_cells,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(shared * 1000 // (r1.nsp + r2.nsp - shared))
        |    // COUNT(*) AS BIGINT) AS mean_jaccard_milli
        |FROM pr
        |JOIN rich r1 ON r1.cellid = pr.c1
        |JOIN rich r2 ON r2.cellid = pr.c2
        |GROUP BY 1""".stripMargin),
    "occ_ripley_k" -> withSql(OCC_SQL, VALID_SQL,
      s"""nc AS (
         |  SELECT $CELL10_SQL AS cellid, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM valid GROUP BY 1)""".stripMargin,
      """scat AS (
        |  SELECT nc.cellid + dy.x * 36 + dx.x AS cellid, n AS n1,
        |    dy.x * dy.x + dx.x * dx.x AS d2
        |  FROM nc,
        |    (SELECT unnest(range(-4, 5)) AS x) dy,
        |    (SELECT unnest(range(-4, 5)) AS x) dx
        |  WHERE dy.x * dy.x + dx.x * dx.x <= 16
        |    AND nc.cellid % 36 + dx.x BETWEEN 0 AND 35)""".stripMargin,
      """byd AS (
        |  SELECT d2, CAST(SUM(CASE WHEN d2 = 0 THEN s.n1 * (s.n1 - 1)
        |    ELSE s.n1 * nc.n END) AS BIGINT) AS pairs
        |  FROM scat s JOIN nc ON nc.cellid = s.cellid GROUP BY 1)""".stripMargin,
      """tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_pts,
        |  CAST(COUNT(*) AS BIGINT) AS a_cells FROM nc)""".stripMargin,
      """perr AS (
        |  SELECT rr.r AS radius, CAST(SUM(pairs) AS BIGINT) AS n_pairs
        |  FROM byd, (SELECT unnest(range(1, 5)) AS r) rr
        |  WHERE d2 <= rr.r * rr.r GROUP BY 1)""".stripMargin)(
      """SELECT radius, n_pairs, n_pts, a_cells,
        |  n_pairs * 1000 // n_pts AS mean_neighbors_milli,
        |  n_pts * (CASE radius WHEN 1 THEN 3141 WHEN 2 THEN 12566
        |    WHEN 3 THEN 28274 ELSE 50265 END) // a_cells
        |    AS csr_neighbors_milli,
        |  CASE WHEN n_pairs * 1000 // n_pts > n_pts * (CASE radius
        |      WHEN 1 THEN 3141 WHEN 2 THEN 12566 WHEN 3 THEN 28274
        |      ELSE 50265 END) // a_cells
        |    THEN 'clustered' ELSE 'dispersed' END AS flag
        |FROM perr, tot""".stripMargin),
    "spatial_quadtree_cells" -> {
      val qcols = (0 to 4).map { k =>
        val side = (1 << k).toDouble
        val m = (1 << k) - 1
        s"LEAST(CAST(FLOOR((lat + 90.0) * $side / 180.0) AS BIGINT), $m)" +
          s" * ${1 << k} + " +
          s"LEAST(CAST(FLOOR((lon + 180.0) * $side / 360.0) AS BIGINT), $m)" +
          s" AS q$k"
      }.mkString(",\n    ")
      val cntCtes = (0 to 4).map(k =>
        s"c$k AS (SELECT q$k AS cid, COUNT(*) AS n FROM pts GROUP BY 1)")
        .mkString(",\n")
      val joins = (0 to 4).map(k => s"JOIN c$k ON c$k.cid = pts.q$k")
        .mkString("\n")
      withSql(OCC_SQL, VALID_SQL,
        s"""pts AS (
           |  SELECT occ_id,
           |    $qcols
           |  FROM valid)""".stripMargin,
        cntCtes)(
        s"""SELECT depth, cellid, CAST(COUNT(*) AS BIGINT) AS n_points
           |FROM (
           |  SELECT CAST(CASE WHEN c0.n <= 1024 THEN 0
           |      WHEN c1.n <= 1024 THEN 1 WHEN c2.n <= 1024 THEN 2
           |      WHEN c3.n <= 1024 THEN 3 ELSE 4 END AS BIGINT) AS depth,
           |    CASE WHEN c0.n <= 1024 THEN q0 WHEN c1.n <= 1024 THEN q1
           |      WHEN c2.n <= 1024 THEN q2 WHEN c3.n <= 1024 THEN q3
           |      ELSE q4 END AS cellid
           |  FROM pts
           |  $joins)
           |GROUP BY 1, 2""".stripMargin)
    },
    // Kruskal replay over the sorted edge list with a flat 64-slot label
    // array carried through a recursive CTE (the dedup_cluster
    // WITH-RECURSIVE precedent): each step merges the two endpoint
    // labels iff they differ and records the edge index. Unique weights
    // (pair id packed into w) make this the SAME forest Borůvka picks.
    "graph_mst_backbone" ->
      (s"""WITH RECURSIVE $OCC_SQL,
         |$VALID_SQL,
         |sp AS (
         |  SELECT DISTINCT $CELL1_SQL AS cellid, species FROM valid),
         |rich AS (
         |  SELECT species, CAST(COUNT(*) AS BIGINT) AS nc
         |  FROM sp GROUP BY 1),
         |ipair AS (
         |  SELECT a.species AS s1, b.species AS s2,
         |    CAST(COUNT(*) AS BIGINT) AS i
         |  FROM sp a JOIN sp b
         |    ON a.cellid = b.cellid AND a.species < b.species
         |  GROUP BY 1, 2),
         |ed AS (
         |  SELECT LEAST(CAST(substring(s1, 4) AS BIGINT),
         |           CAST(substring(s2, 4) AS BIGINT)) AS u,
         |    GREATEST(CAST(substring(s1, 4) AS BIGINT),
         |           CAST(substring(s2, 4) AS BIGINT)) AS v,
         |    1000 - i * 1000 // (ra.nc + rb.nc - i) AS d
         |  FROM ipair
         |  JOIN rich ra ON ra.species = s1
         |  JOIN rich rb ON rb.species = s2),
         |el AS (
         |  SELECT list(struct_pack(u := u, v := v,
         |    w := d * 4096 + u * 64 + v) ORDER BY d * 4096 + u * 64 + v)
         |    AS es
         |  FROM ed),
         |kr AS (
         |  SELECT 0 AS i,
         |    list_transform(generate_series(0, 63),
         |      x -> CAST(x AS BIGINT)) AS lab,
         |    CAST([] AS BIGINT[]) AS acc
         |  UNION ALL
         |  SELECT i + 1,
         |    CASE WHEN lab[CAST(es[i + 1].u AS BIGINT) + 1]
         |           <> lab[CAST(es[i + 1].v AS BIGINT) + 1]
         |      THEN list_transform(lab, l -> CASE
         |        WHEN l = lab[CAST(es[i + 1].u AS BIGINT) + 1]
         |        THEN lab[CAST(es[i + 1].v AS BIGINT) + 1] ELSE l END)
         |      ELSE lab END,
         |    CASE WHEN lab[CAST(es[i + 1].u AS BIGINT) + 1]
         |           <> lab[CAST(es[i + 1].v AS BIGINT) + 1]
         |      THEN list_append(acc, CAST(i + 1 AS BIGINT)) ELSE acc END
         |  FROM kr, el WHERE i < len(es))
         |SELECT 'sp_' || CAST(es[j].u AS VARCHAR) AS species_a,
         |  'sp_' || CAST(es[j].v AS VARCHAR) AS species_b,
         |  CAST(es[j].w // 4096 AS BIGINT) AS dist_milli
         |FROM (SELECT UNNEST(acc) AS j FROM kr, el
         |      WHERE i = len(es)) picks, el""".stripMargin),
    "occ_beta_diversity" -> withSql(OCC_SQL, VALID_SQL,
      s"""cs AS (SELECT DISTINCT $CELL10_SQL AS cellid, species
         |       FROM valid)""".stripMargin,
      """al AS (SELECT cellid // 36 AS band,
        |         CAST(COUNT(*) AS BIGINT) AS n_cells,
        |         CAST(SUM(n_sp) AS BIGINT) AS sum_alpha
        |       FROM (SELECT cellid, CAST(COUNT(*) AS BIGINT) AS n_sp
        |             FROM cs GROUP BY 1)
        |       GROUP BY 1)""".stripMargin,
      """gm AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS gamma
        |       FROM (SELECT DISTINCT cellid // 36 AS band, species FROM cs)
        |       GROUP BY 1)""".stripMargin)(
      """SELECT al.band, n_cells, sum_alpha, gamma,
        |  sum_alpha * 1000 // n_cells AS mean_alpha_milli,
        |  gamma * n_cells * 1000 // sum_alpha AS whittaker_milli
        |FROM al JOIN gm ON gm.band = al.band""".stripMargin),
    "events_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events),
        |seq AS (
        |  SELECT user_id, ts_ns,
        |    CASE WHEN ts_ns - LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id)
        |              > 21600000000000 THEN 1 ELSE 0 END AS is_new,
        |    event_id
        |  FROM e),
        |ses AS (
        |  SELECT user_id, ts_ns,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM seq)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MAX(ts_ns) - MIN(ts_ns) AS dur_ns
        |FROM ses GROUP BY user_id, session_id""".stripMargin)
}
