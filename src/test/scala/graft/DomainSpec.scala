package graft

import graft.operators.{CoreQueries, DomainQueries}
import org.apache.spark.sql.functions._

class DomainSpec extends SparkSpec {
  import spark.implicits._

  test("entry/flagship query returns the 6 expected groups") {
    assert(SparkEntry.entry(spark).count() === 6)
  }

  test("events reader exposes µs-truncated ns timestamps") {
    val ts = DomainQueries.events(spark, sf).select("ts_ns").as[Long].collect()
    assert(ts.nonEmpty)
    assert(ts.forall(_ % 1000 == 0))
  }

  test("occ_clean_coords removes (0,0) and out-of-range coordinates") {
    val rows = DomainQueries.occCleanCoords(spark, sf)
      .select("lat", "lon").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (la, lo) =>
      !(la == 0.0 && lo == 0.0) && la >= -90 && la <= 90 && lo >= -180 && lo <= 180
    })
  }

  test("occ_dedupe_best keeps the minimum-uncertainty record per key") {
    val valid = DomainQueries.valid(spark, sf)
      .withColumn("cell_lat", floor(col("lat")).cast("long"))
      .withColumn("cell_lon", floor(col("lon")).cast("long"))
    val mins = valid.groupBy("species", "cell_lat", "cell_lon")
      .agg(min("uncert").as("min_u"))
    val got = DomainQueries.occDedupeBest(spark, sf)
    val joined = got.join(mins, Seq("species", "cell_lat", "cell_lon"))
    assert(joined.count() === got.count())
    assert(joined.filter(col("uncert") =!= col("min_u")).count() === 0)
  }

  test("cleaning pipeline is monotone: retained <= banded <= valid <= total") {
    val total = DomainQueries.occ(spark, sf).count()
    val valid = DomainQueries.valid(spark, sf).count()
    val cleaned = DomainQueries.occCleanPipeline(spark, sf).count()
    assert(cleaned > 0 && cleaned <= valid && valid <= total)
  }

  test("cleaning_summary percentages are consistent") {
    val rows = DomainQueries.cleaningSummary(spark, sf)
      .select("total_records", "retained_records", "percent_retained")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (t, r, p) =>
      r <= t && math.abs(p - r * 100.0 / t) < 1e-9 && p >= 0 && p <= 100
    })
  }

  test("tax_validate_split applies the GBIF match rules") {
    val rows = DomainQueries.taxValidateSplit(spark, sf)
      .select("match_type", "confidence", "status", "ena_error")
      .as[(Option[String], Option[Long], String, Option[String])].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (mt, conf, st, err) =>
      mt match {
        case None => st == "to_check" && err.contains("Missing scientificName")
        case Some(m) =>
          val expectValid = m == "EXACT" || (m == "FUZZY" && conf.exists(_ >= 95))
          err.isEmpty && st == (if (expectValid) "validated" else "to_check")
      }
    })
    // both branches of the ENA-error split are exercised
    assert(rows.exists(_._1.isEmpty) && rows.exists(_._1.nonEmpty))
  }

  test("tax_validate_split enriches only the to_check branch") {
    val rows = DomainQueries.taxValidateSplit(spark, sf)
      .select("status", "gbif_accepted_usage_key", "gbif_alternatives")
      .as[(String, Option[Long], Option[String])].collect()
    assert(rows.filter(_._1 == "validated")
      .forall(r => r._2.isEmpty && r._3.isEmpty))
    assert(rows.exists(r => r._1 == "to_check" && r._2.nonEmpty))
    assert(rows.exists(r => r._1 == "to_check" && r._3.nonEmpty))
  }

  test("sessionize: durations are non-negative and bounded by the window") {
    val rows = DomainQueries.eventsSessionize(spark, sf)
      .select("n_events", "dur_ns").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, d) => n >= 1 && d >= 0 })
    assert(rows.filter(_._1 > 1).forall(_._2 > 0))
  }

  test("pivot row sums equal per-user event counts") {
    val wide = CoreQueries.q13(spark, sf)
    val total = wide.select(
      (col("n_click") + col("n_error") + col("n_purchase") + col("n_signup") + col("n_view"))
        .as("sum")).agg(sum("sum")).as[Long].head()
    assert(total === DomainQueries.events(spark, sf).count())
  }

  test("approx_count_distinct lands within 10% of exact") {
    val approx = CoreQueries.q14(spark, sf)
      .select("l_returnflag", "approx_orders").as[(String, Long)].collect().toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    for ((k, a) <- approx) {
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.10, s"$k: approx $a vs exact $e")
    }
  }

  test("core topk returns exactly 10 descending rows") {
    val v = CoreQueries.q04(spark, sf).select("total_spent").as[Double].collect()
    assert(v.length === 10)
    assert(v.sameElements(v.sorted(Ordering[Double].reverse)))
  }
}
