package graft

/** Plan-quality regression gate: every SparkEntry query is PLANNED (not
  * executed) and its physical plan scanned for the two shapes that do not
  * survive scale — nested-loop joins and cartesian products — outside a
  * documented whitelist. A new query (or a Catalyst behavior change) that
  * silently plans a BNLJ fails here instead of surfacing as a bench
  * regression three rounds later.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries ALLOWED to contain a nested-loop/cartesian shape, each with
    * the reason it is safe at scale. */
  private val whitelist: Map[String, String] = Map(
    "occ_centroid_filter" -> "BNLJ against a broadcast 20-row centroid dim",
    "occ_clean_pipeline" -> "same centroid BNLJ inside the composed chain",
    "cleaning_summary" -> "same centroid BNLJ inside the composed chain",
    "sim_cosine_topk" -> "documented brute-force baseline: query side is 5 broadcast rows",
    "sim_ivf_topk" -> "codebook assignment crossJoin against 8 broadcast centroid rows",
    "text_bm25_topk" -> "crossJoin against two single-row broadcast stats frames")

  test("no query plans a nested-loop or cartesian join outside the whitelist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sf).queryExecution.executedPlan.toString
        val bad = plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")
        if (bad && !whitelist.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"un-whitelisted nested-loop/cartesian plans in: ${offenders.mkString(", ")}")
  }

  test("whitelisted entries still exist as queries") {
    val stale = whitelist.keys.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"whitelist entries for unknown queries: ${stale.mkString(", ")}")
  }
}
