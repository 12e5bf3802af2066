package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline instrumentation — the reference peppers its DoFns with Beam
  * `Metrics.counter`s (records emitted, pages fetched, species failed,
  * retries; transforms.py:37-38, 245-258) that surface in the job's
  * metrics without a second pass over the data. Spark's native analogue
  * is `observe()`: named aggregates evaluated INSIDE the existing plan as
  * rows stream through, collected driver-side after any action — zero
  * extra scans, zero shuffles, exactly the Beam counter contract
  * (per-run totals, available after the pipeline finishes).
  */
object Instrumented {

  /** The cleaning chain with its record-flow counters observed at the two
    * ends: raw inputs (with how many carry the injected bad coordinates)
    * and survivors (with the retained uncertainty mass). Returns the
    * result frame plus the two Observations — call `.get` on them after
    * the caller's action to read the counters. */
  def cleanPipelineObserved(s: SparkSession, dir: String)
      : (DataFrame, Observation, Observation) = {
    val inObs = new Observation("occ_in")
    val outObs = new Observation("occ_out")
    val raw = DomainQueries.occ(s, dir).observe(inObs,
      count(lit(1)).as("records_in"),
      sum(when(col("lat") === 0.0 && col("lon") === 0.0, 1L).otherwise(0L))
        .as("zero_coord_records"))
    val cleaned = DomainQueries.cleanFrom(raw, s)
      .observe(outObs,
        count(lit(1)).as("records_out"),
        sum(col("uncert").cast("decimal(18,2)")).cast("double").as("uncert_mass"))
    (cleaned, inObs, outObs)
  }
}
