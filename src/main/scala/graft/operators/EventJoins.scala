package graft.operators

import graft.Determinism.dsum2
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) and interval (range) joins — two join shapes the
  * reference's event-correlation queries need but Spark has no native
  * operator for. Both are composed from existing relational ops so the
  * plans stay declarative (SURVEY §5 preference (a)): the naive
  * formulations compile to BroadcastNestedLoopJoin with an interpreted
  * range predicate — O(|L|·|R|) comparisons and a driver-sized broadcast —
  * while these run in one hash-partitioned shuffle each.
  */
object EventJoins {
  type Q = (SparkSession, String) => DataFrame

  /** As-of join: for each left row, attach the LATEST right row of the
    * same `key` with `rightTime <= leftTime` (inclusive), or nulls when
    * none precedes it — the click→last-preceding-purchase attribution
    * shape, equivalent to DuckDB/kdb `ASOF LEFT JOIN`.
    *
    * Planned as union-tag + running `last(ignoreNulls)` window instead of
    * a join at all: tag right rows side=0 and left rows side=1, sort each
    * `key` partition by (time, side) — so at equal timestamps the right
    * row sorts first and IS visible, matching the inclusive bound — and
    * carry the most recent right payload forward. ONE shuffle on `key`,
    * state = one struct per partition row, no range-candidate blow-up:
    * at 100 TB this is a plain repartition + linear scan, where the join
    * formulation (`t2.ts = max t2.ts <= t1.ts` correlated or BNLJ) is
    * quadratic per key. The right payload travels as ONE nullable struct
    * so genuinely-null right payload fields do not break the
    * ignoreNulls carry-forward.
    *
    * Ties: among right rows sharing (key, rightTime), the row greatest
    * under `tiebreak` (right-payload column names, compared in order)
    * wins — resolved by the SAME window sort, so tie-dedup costs no
    * extra shuffle (a pre-`groupBy(key, time)` would add a second
    * exchange: its (key, time) hash partitioning cannot be reused by the
    * (key)-partitioned window). Leave `tiebreak` empty only when rights
    * are already unique per (key, rightTime), else the carried row among
    * equal-time rights is partition-order-arbitrary. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               tiebreak: Seq[String] = Nil): DataFrame = {
    val lPay = left.columns.filterNot(_ == key).toSeq // includes leftTime
    val rPay = right.columns.filterNot(_ == key).toSeq // includes rightTime
    val r = right.select((col(key) +: col(rightTime).as("_t") +:
      lit(0).as("_side") +:
      lPay.map(c => lit(null).cast(left.schema(c).dataType).as(c))) :+
      struct(rPay.map(col): _*).as("_r"): _*)
    val rType = r.schema("_r").dataType
    val l = left.select((col(key) +: col(leftTime).as("_t") +:
      lit(1).as("_side") +: lPay.map(col)) :+ lit(null).cast(rType).as("_r"): _*)
    // tiebreak fields read through the struct: null on left rows, which
    // only tie among themselves (side differs), so order stays total
    val w = Window.partitionBy(key)
      .orderBy(col("_t") +: col("_side") +: tiebreak.map(c => col(s"_r.$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col(key) +: lPay.map(col) ++: rPay.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Interval (range) join: points ⋈ intervals on `lo <= pt <= hi`,
    * banded. Naively this is a pure non-equi join → BNLJ. Instead both
    * sides get an integer bin key (`time div binWidth`; an interval
    * explodes over every bin it touches), the join becomes an EQUI join
    * on the bin — hash-partitioned, AQE-skew-splittable — and the exact
    * range predicate verifies per candidate. Candidate fan-out per
    * interval is `width/binWidth + 1` bins, so pick binWidth near the
    * typical interval width. [[graft.plans.RangeJoinRule]] applies this
    * same rewrite transparently inside the optimizer.
    *
    * A malformed interval (`lo > hi`, dirty data) must DROP — the naive
    * BNLJ plan would simply match nothing — so the bin generator is
    * guarded: `sequence` on a descending range would otherwise throw and
    * fail the whole job. */
  def intervalJoin(points: DataFrame, ptTime: String, intervals: DataFrame,
                   lo: String, hi: String, binWidth: Long): DataFrame = {
    val p = points.withColumn("_bin", expr(s"$ptTime div $binWidth"))
    val iv = intervals.withColumn("_bin",
      explode(expr(
        s"""CASE WHEN $lo <= $hi THEN sequence($lo div $binWidth, $hi div $binWidth)
           |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin)))
    p.join(iv, Seq("_bin"))
      .filter(col(ptTime) >= col(lo) && col(ptTime) <= col(hi))
      .drop("_bin")
  }

  // ---- queries -------------------------------------------------------------

  private val H = 3600000000000L // 1 h in ns
  private val EPOCH_2024 = 1704067200000000000L // 2024-01-01T00:00Z in ns

  /** Click → most recent at-or-before purchase per user (attribution). */
  def eventsAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = DomainQueries.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("a_event_id"),
        col("ts_ns").as("a_ts_ns"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns").as("b_ts_ns"),
        col("event_id").as("b_event_id"))
    asofJoin(clicks, purchases, "user_id", "a_ts_ns", "b_ts_ns",
        tiebreak = Seq("b_event_id"))
      .withColumn("lag_ns", col("a_ts_ns") - col("b_ts_ns"))
  }

  /** Events ⋈ promo windows (25 deterministic intervals off `nation`,
    * staggered 30 h apart, 6-30 h wide) → per-promo traffic stats. */
  def eventsIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "nation").select(
      col("n_nationkey").cast("long").as("promo_id"),
      (lit(EPOCH_2024) + col("n_nationkey") * (30 * H)).as("lo_ns"),
      (lit(EPOCH_2024) + col("n_nationkey") * (30 * H) +
        (col("n_nationkey") % 5 + 1) * (6 * H)).as("hi_ns"))
    intervalJoin(DomainQueries.events(s, dir), "ts_ns", iv, "lo_ns", "hi_ns",
        binWidth = 30 * H)
      .groupBy("promo_id", "lo_ns", "hi_ns")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum2(col("value")).as("sum_value"))
  }

  val queries: Map[String, Q] = Map(
    "events_asof" -> (eventsAsof _),
    "events_interval_join" -> (eventsIntervalJoin _))

  val oracle: Map[String, String] = Map(
    // DuckDB's native ASOF LEFT JOIN — an independent implementation of
    // the same semantics, so this checks more than a re-derivation would.
    "events_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events),
        |a AS (SELECT user_id, event_id AS a_event_id, ts_ns AS a_ts_ns
        |      FROM e WHERE event_type = 'click'),
        |b AS (SELECT user_id, ts_ns AS b_ts_ns, MAX(event_id) AS b_event_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT a.user_id, a.a_event_id, a.a_ts_ns, b.b_ts_ns, b.b_event_id,
        |  a.a_ts_ns - b.b_ts_ns AS lag_ns
        |FROM a ASOF LEFT JOIN b
        |  ON a.user_id = b.user_id AND a.a_ts_ns >= b.b_ts_ns""".stripMargin,
    "events_interval_join" ->
      """WITH e AS (SELECT user_id, value,
        |             epoch_ns(ts) // 1000 * 1000 AS ts_ns FROM events),
        |iv AS (SELECT CAST(n_nationkey AS BIGINT) AS promo_id,
        |         1704067200000000000 + n_nationkey * 108000000000000 AS lo_ns,
        |         1704067200000000000 + n_nationkey * 108000000000000
        |           + (n_nationkey % 5 + 1) * 21600000000000 AS hi_ns
        |       FROM nation)
        |SELECT promo_id, lo_ns, hi_ns, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e JOIN iv ON e.ts_ns BETWEEN iv.lo_ns AND iv.hi_ns
        |GROUP BY 1, 2, 3""".stripMargin)
}
