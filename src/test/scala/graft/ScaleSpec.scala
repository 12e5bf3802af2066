package graft

import graft.operators.{DomainQueries, GeoJoin, Scale}
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("grid-banded distance join matches the nested-loop join exactly") {
    val occ = DomainQueries.valid(spark, sf).select("occ_id", "lat", "lon")
    val cents = DomainQueries.centroids(spark)
    val r = 150000.0
    val banded = GeoJoin.withinRadius(occ, "lat", "lon", cents, "clat", "clon", r)
      .select("occ_id", "clat", "clon").as[(Long, Double, Double)].collect().toSet
    val bnlj = occ.join(cents,
        DomainQueries.haversineM(col("lat"), col("lon"), col("clat"), col("clon")) <= r)
      .select("occ_id", "clat", "clon").as[(Long, Double, Double)].collect().toSet
    assert(banded === bnlj)
    assert(banded.nonEmpty)
  }

  test("grid-banded anti distance join matches the centroid filter") {
    val occ = DomainQueries.valid(spark, sf).select("occ_id", "lat", "lon")
    val cents = DomainQueries.centroids(spark)
    val got = GeoJoin.antiWithinRadius(occ, "lat", "lon", cents, "clat", "clon", 150000.0)
      .select("occ_id").as[Long].collect().toSet
    val want = DomainQueries.occCentroidFilter(spark, sf)
      .select("occ_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("banded distance join finds pairs straddling the antimeridian") {
    // Two points 0.2° of longitude apart but on opposite sides of ±180°,
    // at high latitude (≈ 2.3 km apart) — naive lon flooring puts them in
    // the first and last cells and never pairs them.
    val l = Seq((1L, 84.0, -179.9), (2L, 0.0, 0.0)).toDF("lid", "llat", "llon")
    val r = Seq((10L, 84.0, 179.9), (20L, 0.0, 10.0)).toDF("rid", "rlat", "rlon")
    val got = GeoJoin.withinRadius(l, "llat", "llon", r, "rlat", "rlon", 5000.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = l.join(r,
        DomainQueries.haversineM(col("llat"), col("llon"), col("rlat"), col("rlon")) <= 5000.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(want === Set((1L, 10L))) // sanity: they really are within 5 km
    assert(got === want)
  }

  test("banded distance join finds pairs inside the polar caps") {
    // (89.9, 0) and (89.9, 180) are ~22 km apart across the pole but ~139
    // longitude cells apart at radius 25 km — neighbor expansion ±1 can
    // never bridge them; only the polar-cap collapse co-locates them.
    // (79.5, 0) vs (80.3, 0) crosses the cap boundary (~89 km apart).
    val l = Seq((1L, 89.9, 0.0), (2L, 79.5, 0.0), (3L, 0.0, 0.0))
      .toDF("lid", "llat", "llon")
    val r = Seq((10L, 89.9, 180.0), (20L, 80.3, 0.0), (30L, 0.0, 0.5))
      .toDF("rid", "rlat", "rlon")
    val radius = 100000.0
    val got = GeoJoin.withinRadius(l, "llat", "llon", r, "rlat", "rlon", radius)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = l.join(r,
        DomainQueries.haversineM(col("llat"), col("llon"), col("rlat"), col("rlon")) <= radius)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(want === Set((1L, 10L), (2L, 20L), (3L, 30L))) // sanity
    assert(got === want)
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (tbl <- Seq("orders_b", "lineitem_b")) {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new java.io.File(s"spark-warehouse/$tbl")
        if (loc.exists()) {
          loc.listFiles().foreach(_.delete()); loc.delete()
        }
      }
      Scale.writeBucketed(Tables.t(spark, sf, "orders"), "orders_b", "o_orderkey", 4)
      Scale.writeBucketed(
        Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() ===
        Tables.t(spark, sf, "lineitem").count()) // FK: every lineitem matches
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted count equals plain count per key") {
    val df = Tables.t(spark, sf, "orders")
    val salted = Scale.saltedCount(df, "o_custkey", 8)
      .as[(Long, Long)].collect().toMap
    val plain = df.groupBy("o_custkey").count().as[(Long, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val big = Tables.t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val small = Tables.t(spark, sf, "customer").select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val got = Scale.saltedJoin(big, small, "o_custkey", 4)
      .select("o_orderkey", "c_mktsegment").as[(Long, String)].collect().toSet
    val want = big.join(small, Seq("o_custkey"))
      .select("o_orderkey", "c_mktsegment").as[(Long, String)].collect().toSet
    assert(got === want)
  }
}
