package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/behavioral analytics over the event stream plus embedding-
  * pipeline preprocessing — the operators a training-data platform runs
  * NEXT to curation: cohort retention (did the pipeline's users/sources
  * persist), sequence mining (which event paths dominate), and
  * deterministic dimensionality reduction (the cheap projection before
  * ANN indexing). Mirrors the reference's per-entity rollup habit
  * (cf. `collect_metadata_experiments_assemblies.py` grouping per study)
  * re-expressed as Spark aggregates with exact DuckDB oracles.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  private val DAY_NS = 86400000000000L

  /** Cohort retention matrix: users bucketed by first-active day, counted
    * on every (cohort, day-offset) cell they were active in. ONE exchange
    * on user_id builds both the cohort and the active-day set (collect_set
    * state is bounded by the CALENDAR — distinct days per user — never by
    * event volume; map-side partial aggregation dedups days early), and
    * the cell count is a second tiny exchange on (cohort, offset). No
    * join, no second scan. */
  def eventsRetention(s: SparkSession, dir: String): DataFrame =
    DomainQueries.events(s, dir)
      .select(col("user_id"), expr(s"ts_ns div $DAY_NS").as("day"))
      .groupBy("user_id")
      .agg(min("day").as("cohort_day"), collect_set("day").as("days"))
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))

  private val RETENTION_SQL =
    s"""WITH d AS (
       |  SELECT DISTINCT user_id, epoch_ns(ts) // $DAY_NS AS day FROM events),
       |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
       |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
       |  CAST(COUNT(*) AS BIGINT) AS n_active
       |FROM d JOIN c USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  /** Top-25 consecutive event-type trigram paths — sequence mining for
    * the dominant user journeys. The per-user lead window rides ONE
    * user_id exchange; the path universe is ≤ |event_types|³ rows, so the
    * global rank window runs over the aggregate (WindowGroupLimit prunes
    * each partition to its local top-25 before the single-partition
    * rank), never over the corpus. */
  def eventsTopPaths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val ranked = Window.orderBy(col("n").desc, col("path"))
    DomainQueries.events(s, dir)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type").as("e1"))
      .select(col("e1"),
        lead("e1", 1).over(byUser).as("e2"),
        lead("e1", 2).over(byUser).as("e3"))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(ranked).cast("long"))
      .filter(col("rn") <= 25)
  }

  private val PATHS_SQL =
    """WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |    epoch_ns(ts) // 1000 * 1000 AS ts_ns
      |  FROM events),
      |o AS (SELECT event_type AS e1,
      |        LEAD(event_type, 1) OVER w AS e2,
      |        LEAD(event_type, 2) OVER w AS e3
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
      |p AS (SELECT e1 || '>' || e2 || '>' || e3 AS path FROM o WHERE e3 IS NOT NULL),
      |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY path)
      |SELECT path, n, rn FROM (
      |  SELECT path, n,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS BIGINT) AS rn
      |  FROM c)
      |WHERE rn <= 25""".stripMargin

  /** Deterministic random-projection reduction 64 → 8 dims — the cheap
    * Johnson–Lindenstrauss step before ANN indexing (sim_lsh_topk keeps
    * only the SIGN of such projections; this keeps the values). Exactly
    * cross-engine: inputs are floored to 2^-20 fixed-point BIGINTs and
    * the dot products fold in EXACT integer arithmetic (≤ 2^29, no float
    * sum-order sensitivity), so the final power-of-two division is the
    * only — exact — float op. Integer pseudo-random weights
    * w(p,j) = (p·73 + j·37) mod 17 − 8, same discipline as lshBuckets.
    * Plan: codegen'd SUM aggregates over exploded dims, one
    * partial-aggregated exchange. */
  def simRandomProjection(s: SparkSession, dir: String): DataFrame = {
    val projCols = (0 until 8).map { p =>
      (sum(col("q") * ((lit(p) * 73 + col("j") * 37) % 17 - 8)).cast("double")
        / 1048576.0).as(s"p$p")
    }
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("j", "xf")))
      .withColumn("q", expr("cast(floor(cast(xf as double) * 1048576) as bigint)"))
      .groupBy("vec_id")
      .agg(projCols.head, projCols.tail: _*)
  }

  private val RP_SQL = {
    val cols = (0 until 8).map { p =>
      s"""  CAST(list_sum(list_transform(generate_series(1, 64),
         |    j -> CAST(FLOOR(CAST(embedding[j] AS DOUBLE) * 1048576) AS BIGINT)
         |         * (($p * 73 + (j - 1) * 37) % 17 - 8))) AS DOUBLE)
         |    / 1048576 AS p$p""".stripMargin
    }.mkString(",\n")
    s"SELECT vec_id,\n$cols\nFROM embeddings"
  }

  val queries: Map[String, Q] = Map(
    "events_retention" -> (eventsRetention _),
    "events_top_paths" -> (eventsTopPaths _),
    "sim_random_projection" -> (simRandomProjection _))

  val oracle: Map[String, String] = Map(
    "events_retention" -> RETENTION_SQL,
    "events_top_paths" -> PATHS_SQL,
    "sim_random_projection" -> RP_SQL)
}
