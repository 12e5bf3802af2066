package graft

import graft.operators.{CoreQueries, DomainQueries}
import org.apache.spark.sql.functions._

class DomainSpec extends SparkSpec {

  test("observed cleaning pipeline reports flow counters without extra scans") {
    import graft.operators.{DomainQueries, Instrumented}
    import org.apache.spark.sql.functions._
    val (cleaned, inObs, outObs) = Instrumented.cleanPipelineObserved(spark, sf)
    val n = cleaned.count() // one action materializes BOTH observations
    val in = inObs.get
    val out = outObs.get
    assert(in("records_in") === DomainQueries.occ(spark, sf).count())
    assert(in("zero_coord_records").asInstanceOf[Long] > 0) // injected bad coords seen
    assert(out("records_out") === n)
    assert(out("uncert_mass").asInstanceOf[Double] > 0.0)
    // observed result identical to the uninstrumented pipeline
    assert(n === DomainQueries.occCleanPipeline(spark, sf).count())
  }
  import spark.implicits._

  test("bio_ingest_pipeline composes its components consistently") {
    val pipe = DomainQueries.bioIngestPipeline(spark, sf)
      .select("species", "n_clean", "n_validated", "n_fetch_ok", "status")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(pipe.nonEmpty)
    // gate order: the status is the FIRST failing stage
    pipe.foreach { case (sp, nClean, nVal, nFetch, status) =>
      val expected =
        if (nVal == 0) "not_validated"
        else if (nFetch == 0) "fetch_failed"
        else if (nClean == 0) "no_clean_occurrences"
        else "ingested"
      assert(status === expected, s"species $sp")
    }
    // cleaning branch must agree with the standalone cleaning_summary
    val retained = DomainQueries.cleaningSummary(spark, sf)
      .select(col("species"), col("retained_records"))
      .as[(String, Long)].collect().toMap
    pipe.foreach { case (sp, nClean, _, _, _) =>
      assert(nClean === retained.getOrElse(sp, 0L), s"species $sp")
    }
    // taxonomy branch must agree with the standalone split
    val validated = DomainQueries.taxValidateSplit(spark, sf)
      .filter(col("status") === "validated" && col("gbif_scientific_name").isNotNull)
      .groupBy("gbif_scientific_name").count()
      .as[(String, Long)].collect().toMap
    pipe.foreach { case (sp, _, nVal, _, _) =>
      assert(nVal === validated.getOrElse(sp, 0L), s"species $sp")
    }
  }

  test("spatial_region_join matches a driver-side ray cast over the same star lattice") {
    // independent reimplementation: same closed forms, plain Scala
    def cx(r: Long) = (r * 67 % 300 - 150) * 10
    def cy(r: Long) = (r * 37 % 100 - 50) * 10
    def rb(r: Long) = 40 + (r * 11 % 5) * 20
    def rs(r: Long) = 16 + (r * 11 % 5) * 8
    val dxs = Array(2, 1, 0, -1, -2, -1, 0, 1)
    val dys = Array(0, 1, 2, 1, 0, -1, -2, -1)
    def vert(r: Long, k: Int): (Long, Long) = {
      val rad = if (k % 2 == 0) rb(r) else rs(r)
      (cx(r) + dxs(k % 8) * rad, cy(r) + dys(k % 8) * rad)
    }
    def contains(r: Long, px: Long, py: Long): Boolean = {
      var crossings = 0
      for (k <- 0 until 8) {
        val (x1, y1) = vert(r, k); val (x2, y2) = vert(r, k + 1)
        if ((y1 > py) != (y2 > py) &&
          ((x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)) *
            (if (y2 > y1) 1 else -1) > 0) crossings += 1
      }
      crossings % 2 == 1
    }
    val pts = DomainQueries.valid(spark, sf)
      .select(col("species"),
        expr("cast(floor(lon * 10) as bigint)").as("px"),
        expr("cast(floor(lat * 10) as bigint)").as("py"))
      .as[(String, Long, Long)].collect()
    val expected = (0L until 12L).map { r =>
      val inBbox = pts.filter { case (_, px, py) =>
        math.abs(px - cx(r)) <= 2 * rb(r) && math.abs(py - cy(r)) <= 2 * rb(r)
      }
      val in = inBbox.filter { case (_, px, py) => contains(r, px, py) }
      (r, inBbox.length.toLong, in.length.toLong,
        in.map(_._1).distinct.length.toLong)
    }.filter(_._2 > 0).toSet
    val got = DomainQueries.spatialRegionJoin(spark, sf)
      .select("rid", "n_candidates", "n_inside", "n_species_inside")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the star is genuinely non-convex: some bbox candidates are outside
    assert(got.exists { case (_, cand, inside, _) => inside > 0 && inside < cand })
  }

  test("entry/flagship query returns the 6 expected groups") {
    assert(SparkEntry.entry(spark).count() === 6)
  }

  test("events reader exposes µs-truncated ns timestamps") {
    val ts = DomainQueries.events(spark, sf).select("ts_ns").as[Long].collect()
    assert(ts.nonEmpty)
    assert(ts.forall(_ % 1000 == 0))
  }

  test("point-in-polygon: ray casting handles the non-convex notch and the boundary of polyA") {
    import spark.implicits._
    // (px, py) deci-degree probes against the M-shaped polyA:
    // center-top in, notch interior OUT (the case a bbox/hull gets
    // wrong), left leg in, far east out, west of all edges out
    val probes = Seq(
      (0L, 300L, 1L),     // upper center: inside
      (0L, -200L, 0L),    // inside the notch cut: outside
      (-300L, -200L, 1L), // left leg: inside
      (300L, -200L, 1L),  // right leg: inside
      (700L, 0L, 0L),     // east of everything
      (-700L, 0L, 0L),    // west of everything
      (0L, 600L, 0L))     // above the apex
    val got = probes.toDF("px", "py", "want")
      .withColumn("in_a",
        expr(s"${DomainQueries.pipTerms(DomainQueries.polyA)} % 2").cast("long"))
      .select("px", "py", "want", "in_a")
      .collect()
    for (r <- got)
      assert(r.getLong(3) === r.getLong(2),
        s"(${r.getLong(0)}, ${r.getLong(1)}) classified ${r.getLong(3)}")
  }

  test("shard checksums: root digest equals the xor of shard digests; dv popcounts reconcile") {
    import spark.implicits._
    val rows = operators.Records.metaShardChecksums(spark, sf)
      .as[(Option[Long], Long, Long)].collect()
    val (roots, shards) = rows.partition(_._1.isEmpty)
    assert(roots.length === 1 && shards.nonEmpty)
    assert(roots.head._2 === shards.map(_._2).sum) // row counts roll up
    assert(roots.head._3 === shards.map(_._3).reduce(_ ^ _)) // xor assoc
    val dv = operators.Records.metaDeletionVectors(spark, sf)
      .select("n_deleted", "popcount").as[(Long, Long)].collect()
    assert(dv.nonEmpty && dv.forall(r => r._1 === r._2))
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

  test("deterministic 64-register HLL lands within 3 sigma of exact") {
    // m=64 ⇒ standard error ≈ 1.04/√64 = 13%; gate at 3σ so the spec
    // pins accuracy without flaking on an unlucky hash draw.
    val approx = CoreQueries.q14(spark, sf)
      .select("l_returnflag", "approx_orders", "approx_parts")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(
        countDistinct("l_orderkey").as("no"), countDistinct("l_partkey").as("np"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (ao, ap)) <- approx) {
      val (eo, ep) = exact(k)
      assert(math.abs(ao - eo) / eo < 0.39, s"$k orders: approx $ao vs exact $eo")
      assert(math.abs(ap - ep) / ep < 0.39, s"$k parts: approx $ap vs exact $ep")
    }
  }

  test("q14 production path (engine HLL++) within rsd bounds, no md5 in plan") {
    // rsd 5% ⇒ gate at 3σ = 15%. The production twin must also be free of
    // the comparator's md5-per-row cost: no md5/conv in the executed plan.
    val prod = CoreQueries.q14Production(spark, sf)
    val plan = prod.queryExecution.executedPlan.toString
    assert(!plan.contains("md5("), s"production path must not hash via md5:\n$plan")
    val approx = prod.select("l_returnflag", "approx_orders", "approx_parts")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(
        countDistinct("l_orderkey").as("no"), countDistinct("l_partkey").as("np"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (ao, ap)) <- approx) {
      val (eo, ep) = exact(k)
      assert(math.abs(ao - eo).toDouble / eo < 0.15, s"$k orders: approx $ao vs exact $eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.15, s"$k parts: approx $ap vs exact $ep")
    }
  }

  test("temporal trend equals an exact least-squares-sign replay per species") {
    val got = DomainQueries.occTemporalTrend(spark, sf)
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    val src = DomainQueries.valid(spark, sf)
      .select(col("species"),
        year(timestamp_micros(expr("ts_ns div 1000"))).cast("long").as("yr"))
      .as[(String, Long)].collect()
    val bySpecies = src.groupBy(_._1)
    assert(got.length === bySpecies.size)
    for ((sp, nYears, nTotal, num, trend) <- got) {
      val counts = bySpecies(sp).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(nYears === counts.size.toLong && nTotal === counts.values.sum)
      val k = counts.size.toLong
      val want = k * counts.map { case (y, n) => y * n }.sum -
        counts.keys.sum * counts.values.sum
      assert(num === want, sp)
      val wantTrend =
        if (num > 0) "increasing" else if (num < 0) "declining" else "stable"
      assert(trend === wantTrend, sp)
    }
  }

  test("spatial_nearest picks the true planar argmin for every occurrence") {
    val got = DomainQueries.spatialNearest(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val cents = (0 until 20).map(i =>
      (i.toLong, (i * 53 % 171).toDouble - 85.0, (i * 97 % 351).toDouble - 175.0))
    val pts = DomainQueries.valid(spark, sf).select("occ_id", "lat", "lon")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.length === pts.size) // exactly one assignment per occurrence
    for ((occ, cid, d2) <- got) {
      val (lat, lon) = pts(occ)
      val best = cents.map { case (c, clat, clon) =>
        val dlat = lat - clat
        val dlonRaw = math.abs(lon - clon)
        val dlon = math.min(dlonRaw, 360.0 - dlonRaw)
        (dlat * dlat + dlon * dlon, c)
      }.min
      assert((d2, cid) === best, s"occ $occ: got ($d2,$cid), brute force $best")
    }
  }

  test("grid density: totals reconcile and dominant species is the cell mode") {
    val cells = DomainQueries.spatialGridDensity(spark, sf)
      .as[(Long, Long, Long, String, Long)].collect()
    assert(cells.nonEmpty)
    // occurrence mass is conserved: cell totals sum to the cleaned count
    assert(cells.map(_._2).sum === DomainQueries.occCleanCoords(spark, sf).count())
    for ((_, nOcc, nSpecies, _, domN) <- cells) {
      assert(nSpecies >= 1 && domN >= 1 && domN <= nOcc)
      // the dominant class can never hold less than an equal share
      assert(domN * nSpecies >= nOcc)
    }
  }

  test("MAD outliers match a plain-Scala robust-statistics reference") {
    val d = DomainQueries.occCleanCoords(spark, sf)
      .as[(Long, String, Double, Double)].collect()
    def discMedian(vs: Seq[(Double, Long)]): Double =
      vs.sorted.apply((vs.length + 1) / 2 - 1)._1
    val expected = d.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val medLat = discMedian(g.map(r => (r._3, r._1)).toSeq)
      val medLon = discMedian(g.map(r => (r._4, r._1)).toSeq)
      val madLat = discMedian(g.map(r => (math.abs(r._3 - medLat), r._1)).toSeq)
      val madLon = discMedian(g.map(r => (math.abs(r._4 - medLon), r._1)).toSeq)
      g.filter(r => (madLat > 0 && math.abs(r._3 - medLat) > madLat * 1.5) ||
        (madLon > 0 && math.abs(r._4 - medLon) > madLon * 1.5))
    }.map(_._1).toSet
    val got = DomainQueries.occOutlierMad(spark, sf)
      .select("occ_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty, "the 1.5x fence must flag the uniform corpus' tails")
  }

  test("MAD outliers: a planted far point is the ONLY 5x-fence flag") {
    import org.apache.spark.sql.SaveMode
    // occ derives lat/lon from event_id arithmetic, so plant by searching
    // ids: one species (user_id 7), a tight coordinate cluster, one far
    // point. The 5x fence must flag exactly the far point.
    def lat(id: Long) = if (id % 97 == 0) 0.0 else (id * 37 % 2200) / 10.0 - 105.0
    def lon(id: Long) = if (id % 97 == 0) 0.0 else (id * 61 % 4400) / 10.0 - 210.0
    // keep one id per distinct (lat, lon) so the cluster has genuine
    // spread — duplicate coordinates would push MAD to 0 and the guard
    // (mad > 0) would suppress every flag. Only id mod 4400 matters for
    // the coordinate pair, so the box must be wide to hold enough
    // distinct points (~37 in 20°×40°; MAD ≈ 5°/10°, far dev ≫ 5×MAD).
    val ids = (1L to 300000L).filter(id => id % 97 != 0 &&
        lat(id) > 0 && lat(id) < 20 && lon(id) > 0 && lon(id) < 40)
      .groupBy(id => (lat(id), lon(id))).values.map(_.min).toSeq.sorted
    assert(ids.length >= 30, s"search found only ${ids.length} distinct cluster points")
    val far = (1L to 300000L).find(id => id % 97 != 0 &&
      lat(id) > 60 && lat(id) < 80 && lon(id) > -170 && lon(id) < -150).get
    val chosen = ids :+ far
    val events = chosen.map(id => (id, id * 1000L, 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("madplant").toString
    events.write.mode(SaveMode.Overwrite).parquet(s"$tmp/events.parquet")
    val flagged = DomainQueries.occOutlierMad(spark, tmp, mult = 5.0)
      .select("occ_id").as[Long].collect().toSet
    assert(flagged === Set(far))
  }

  test("z-order buckets are geographically local and conserve occupancy") {
    val b = DomainQueries.spatialZorderLayout(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(b.nonEmpty)
    for ((bk, n, _, zmin, zmax, latMin, latMax, lonMin, lonMax) <- b) {
      assert(n > 0 && zmin <= zmax)
      assert(zmin / 8192 === bk && zmax / 8192 === bk) // buckets partition z-space
      // fixing the top 5 interleaved bits pins 3 cy bits and 2 cx bits:
      // every bucket is a ≤64°×128° rectangle — THE locality property
      assert(latMax - latMin <= 65.0, s"bucket $bk lat span")
      assert(lonMax - lonMin <= 129.0, s"bucket $bk lon span")
    }
    assert(b.map(_._2).sum === DomainQueries.occCleanCoords(spark, sf).count())
  }

  test("snapshot diff classifies added/removed/changed exactly") {
    val got = operators.Records.dataSnapshotDiff(spark, sf)
      .as[(Long, String)].collect().groupBy(_._2)
      .view.mapValues(_.map(_._1).toSet).toMap
    val ids = Tables.t(spark, sf, "documents").select("doc_id").as[Long].collect().toSet
    assert(got("removed") === ids.filter(_ % 13 == 0))
    assert(got("added") === ids.filter(_ % 11 == 0).map(i => -i - 1L))
    assert(got("changed") === ids.filter(i => i % 7 == 0 && i % 13 != 0))
  }

  test("events_funnel: pattern requires strict view<click<purchase order") {
    val funnel = DomainQueries.eventsFunnel(spark, sf)
      .select("n_events", "t_view", "t_click", "t_purchase", "conv_ns")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])].collect()
    assert(funnel.nonEmpty)
    for ((_, v, c, p, lat) <- funnel) {
      // stage timestamps must be strictly increasing where present
      for (tv <- v; tc <- c) assert(tc > tv)
      for (tc <- c; tp <- p) assert(tp > tc)
      // a later stage cannot exist without the earlier one
      if (c.isDefined) assert(v.isDefined)
      if (p.isDefined) assert(c.isDefined)
      assert(lat.isDefined === p.isDefined)
      for (tp <- p; tv <- v; l <- lat) assert(l === tp - tv)
    }
    // both converted and unconverted sessions exist in the testdata
    assert(funnel.exists(_._4.isDefined) && funnel.exists(_._4.isEmpty))
  }

  test("KMV sketch estimate lands within 30% of exact distinct") {
    // k=64 ⇒ expected relative error ~1/sqrt(62) ≈ 13%; 30% is a safe
    // deterministic bound for the 3 lineitem return-flag groups.
    val kmv = CoreQueries.q17(spark, sf)
      .select("l_returnflag", "kmv_distinct").as[(String, Double)].collect().toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(kmv.keySet === exact.keySet)
    for ((k, a) <- kmv) {
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e < 0.30, s"$k: kmv $a vs exact $e")
    }
  }

  test("core topk returns exactly 10 descending rows") {
    val v = CoreQueries.q04(spark, sf).select("total_spent").as[Double].collect()
    assert(v.length === 10)
    assert(v.sameElements(v.sorted(Ordering[Double].reverse)))
  }

  test("occ_fetch_summary matches its recomputed split; dead letters round-trip") {
    val sp = DomainQueries.taxValidateSplit(spark, sf)
      .filter(col("status") === "validated")
      .select(col("tax_id"), col("gbif_scientific_name").as("species"))
    val dead = sp.filter(col("tax_id") % 13 === 0)
    val succ = sp.filter(col("tax_id") % 13 =!= 0)
    // dead branch → JSONL sink, as occurrences_pipeline writes dead_records.jsonl
    val dir = java.nio.file.Files.createTempDirectory("graft_fetch_dead").toString
    graft.sources.Jsonl.writeConsolidated(dead, dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tax_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("species", org.apache.spark.sql.types.StringType)))
    assert(graft.sources.Jsonl.read(spark, dir, schema).count() === dead.count())
    val row = DomainQueries.occFetchSummary(spark, sf).collect().head
    assert(row.getLong(0) === succ.count())
    assert(row.getLong(1) === dead.count())
    val counts = DomainQueries.occ(spark, sf).groupBy("species").count()
    val expected = succ.join(counts, Seq("species"), "left_outer")
      .agg(sum(coalesce(col("count"), lit(0L)))).as[Long].head()
    assert(row.getLong(2) === expected)
  }

  test("clim_annotate is a zonal mean over >=1 buffer cells, in raster range") {
    val rows = DomainQueries.climAnnotate(spark, sf).cache()
    assert(rows.filter(col("n_cells") < 1).count() === 0)
    assert(rows.filter(col("n_cells") > 1).count() > 0) // buffers span cells
    val b = rows.agg(min("bio1"), max("bio1"), min("bio12"), max("bio12")).head()
    assert(b.getDouble(0) >= -273.15 && b.getDouble(1) <= 3999 * 0.1 - 273.15)
    assert(b.getDouble(2) >= 0.0 && b.getDouble(3) <= 1200.0)
    rows.unpersist()
  }

  test("tax_lineage carries all six ranks; a genus groups at most 2 species") {
    val df = DomainQueries.taxLineage(spark, sf)
    assert(df.columns.toSeq === Seq(
      "tax_id", "species", "kingdom", "phylum", "class", "order", "family", "genus"))
    val over = df.groupBy("genus").agg(countDistinct("species").as("n"))
      .filter(col("n") > 2).count()
    assert(over === 0)
  }

  test("biogeo_annotate carries both keep_fields with sorted distinct values") {
    val r = DomainQueries.biogeoAnnotate(spark, sf)
      .select("n_realms", "realms", "n_biomes", "biomes")
      .as[(Long, String, Long, String)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (nr, rs, nb, bs) =>
      val rv = rs.split(",").toSeq
      val bv = bs.split(",").toSeq
      rv.length == nr && rv == rv.sorted && rv.distinct == rv &&
        bv.length == nb && bv == bv.sorted && bv.distinct == bv
    })
  }

  test("cell diversity matches a full Scala replay; single-species cells score 0") {
    val got = DomainQueries.occCellDiversity(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    def floorLog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val cells = DomainQueries.valid(spark, sf)
      .select("species", "lat", "lon").as[(String, Double, Double)].collect()
      .map { case (sp, lat, lon) =>
        ((math.floor(lat).toLong + 90) * 360 + math.floor(lon).toLong + 180, sp)
      }
    val expected = cells.groupBy(_._1).map { case (cell, rows) =>
      val bySp = rows.groupBy(_._2).map(g => g._2.length.toLong)
      val n = bySp.sum
      val bits = bySp.map(ns => ns * floorLog2(n / ns)).sum
      cell -> ((cell, n, bySp.size.toLong, bits, bits * 1000 / n))
    }
    assert(got === expected)
    assert(got.values.filter(_._3 == 1L).forall(_._4 == 0L))
    // sf0.001's lattice puts at most one species per 1°-cell, so the
    // mixed-cell (> 0 bits) case is exercised by the sf0.01 oracle gate
    // (2947 cells), not here; the replay above is the exactness check
  }

  test("q20: planted supply shares split exactly at the one-eighth fence") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("q20").toString
    // part 1: 90/10 split -> only supp 10 dominates; part 2: 50/50 -> both
    Seq((1L, 10L, 90.0), (1L, 11L, 10.0), (2L, 10L, 50.0), (2L, 11L, 50.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/lineitem.parquet")
    Seq((10L, "SUPA", 0L), (11L, "SUPB", 0L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/supplier.parquet")
    Seq((0L, "GERMANY")).toDF("n_nationkey", "n_name")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/nation.parquet")
    val got = CoreQueries.q20(spark, tmp)
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got === Map(
      10L -> ((10L, "SUPA", "GERMANY", 2L)),
      11L -> ((11L, "SUPB", "GERMANY", 1L))))
  }

  test("column profile: planted nulls, ranges and renders are exact") {
    import org.apache.spark.sql.SaveMode
    import java.time.LocalDateTime
    val tmp = java.nio.file.Files.createTempDirectory("profile").toString
    Seq(
      (1L, Option(10L), "F", 100.5, LocalDateTime.of(1995, 1, 2, 0, 0), "1-URGENT"),
      (2L, Option.empty[Long], "O", 200.0, LocalDateTime.of(1995, 3, 4, 0, 0), "2-HIGH"),
      (3L, Option(10L), "F", 50.25, LocalDateTime.of(1995, 1, 2, 0, 0), "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    val got = graft.operators.Records.metaColumnProfile(spark, tmp)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === 6 && got.values.forall(_._2 == 3L))
    assert(got("o_custkey") === (("o_custkey", 3L, 1L, 1L, "10", "10")))
    assert(got("o_totalprice") === (("o_totalprice", 3L, 0L, 3L, "50.25", "200.00")))
    assert(got("o_orderdate") === (("o_orderdate", 3L, 0L, 2L, "1995-01-02", "1995-03-04")))
    assert(got("o_orderstatus") === (("o_orderstatus", 3L, 0L, 2L, "F", "O")))
  }

  test("q21: only the order with exactly one late supplier assigns blame") {
    import org.apache.spark.sql.SaveMode
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q21").toString
    def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")
    // o1: supp 1 late, supp 2 on time -> blame 1; o2: both late -> no blame;
    // o3: single-supplier order, late -> no blame (needs >1 suppliers)
    Seq((1L, 1L, ts("1995-06-01")), (1L, 2L, ts("1995-01-15")),
        (2L, 1L, ts("1995-06-01")), (2L, 2L, ts("1995-06-01")),
        (3L, 1L, ts("1995-06-01")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/lineitem.parquet")
    Seq((1L, ts("1995-01-01")), (2L, ts("1995-01-01")), (3L, ts("1995-01-01")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    Seq((1L, "SUPA"), (2L, "SUPB")).toDF("s_suppkey", "s_name")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/supplier.parquet")
    val got = CoreQueries.q21(spark, tmp).as[(Long, String, Long)].collect()
    assert(got.toSeq === Seq((1L, "SUPA", 1L)))
  }

  test("range overlap matches a Scala bbox replay; overlap bounded by either range") {
    val got = DomainQueries.occRangeOverlap(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val pts = DomainQueries.valid(spark, sf)
      .select("species", "lat", "lon").as[(String, Double, Double)].collect()
    val bbox = pts.groupBy(_._1).map { case (sp, g) =>
      val las = g.map(p => math.floor(p._2 * 10.0).toLong)
      val los = g.map(p => math.floor(p._3 * 10.0).toLong)
      sp -> (las.min, las.max, los.min, los.max)
    }
    val sps = bbox.keys.toSeq.sorted
    val expected = (for {
      s1 <- sps; s2 <- sps if s1 < s2
      (alo, ahi, blo, bhi) = bbox(s1)
      (clo, chi, dlo, dhi) = bbox(s2)
      dlat = math.min(ahi, chi) - math.max(alo, clo)
      dlon = math.min(bhi, dhi) - math.max(blo, dlo)
      if dlat > 0 && dlon > 0
    } yield (s1, s2) -> ((dlat, dlon, dlat * dlon))).toMap
    assert(got === expected)
  }

  test("accumulation curve matches a Scala rarefaction replay, monotone to the total") {
    val got = DomainQueries.occAccumulationCurve(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val occs = DomainQueries.valid(spark, sf)
      .select("occ_id", "species").as[(Long, String)].collect()
    def h52(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"acc:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString.take(13), 16)
    }
    val ordered = occs.sortBy { case (id, _) => (h52(id), id) }
    val n = ordered.length.toLong
    // distinct species among the first k records, at k = 2^j capped at n
    val jMax = if (n < 2) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    val expected = (0L to jMax.toLong).map { j =>
      val k = math.min(1L << j, n)
      (j, k, ordered.take(k.toInt).map(_._2).distinct.length.toLong)
    }
    assert(got.toSeq === expected)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
    assert(got.last._3 === occs.map(_._2).distinct.length.toLong)
  }

  test("q22: lapse gate and balance threshold select exactly the planted prospect") {
    import org.apache.spark.sql.SaveMode
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q22").toString
    // avg positive balance = (100+100+10)/3 = 70; negatives excluded from it
    Seq((1L, "A", 0, 100.0, "AUTO"), (2L, "B", 0, 100.0, "BIKE"),
        (3L, "C", 0, 10.0, "BIKE"), (4L, "D", 0, -50.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/customer.parquet")
    // c1 ordered inside the lapse window -> excluded; c2 only before it
    Seq((1L, 1L, Timestamp.valueOf("2000-05-01 00:00:00")),
        (2L, 2L, Timestamp.valueOf("1999-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    val got = CoreQueries.q22(spark, tmp).as[(String, Long, Double)].collect()
    assert(got.toSeq === Seq(("BIKE", 1L, 100.0)))
  }

  test("eoo/aoo: metrics match an exact Scala replay of the grid") {
    val got = DomainQueries.occEooAoo(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val pts = DomainQueries.valid(spark, sf)
      .select("species", "lat", "lon").as[(String, Double, Double)].collect()
    val expect = pts.groupBy(_._1).map { case (sp, g) =>
      val cells = g.map(p => math.floor(p._2 * 50.0).toLong * 20000 +
        math.floor(p._3 * 50.0).toLong).distinct.length.toLong
      val las = g.map(p => math.floor(p._2 * 10.0).toLong)
      val los = g.map(p => math.floor(p._3 * 10.0).toLong)
      sp -> ((g.length.toLong, cells, las.max - las.min, los.max - los.min))
    }
    assert(got === expect)
    // AOO can never exceed the point count; spans are non-negative
    assert(got.values.forall(v => v._2 <= v._1 && v._3 >= 0 && v._4 >= 0))
  }

  test("seasonality: peak month matches a UTC calendar replay, shares sum sanely") {
    val got = DomainQueries.occSeasonality(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val pts = DomainQueries.valid(spark, sf)
      .select("species", "ts_ns").as[(String, Long)].collect()
    def monthOf(ns: Long): Long =
      java.time.Instant.ofEpochSecond(0L, ns)
        .atZone(java.time.ZoneOffset.UTC).getMonthValue.toLong
    val expect = pts.groupBy(_._1).map { case (sp, g) =>
      val byM = g.groupBy(p => monthOf(p._2)).map(kv => kv._1 -> kv._2.length.toLong)
      val (pm, pn) = byM.toSeq.minBy { case (m, n) => (-n, m) }
      sp -> ((sp, g.length.toLong, byM.size.toLong, pm, pn, pn * 1000 / g.length))
    }
    assert(got === expect)
    assert(got.values.forall(v => v._4 >= 1 && v._4 <= 12 && v._6 <= 1000))
  }

  test("chunk windows: stride lattice covers every token, overlap is exact") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("chunks").toString
    // 80 tokens "w1 .. w80" -> starts 1,25,49,73; extents 32,32,32,8
    val text80 = (1 to 80).map(i => s"w$i").mkString(" ")
    Seq((1L, text80, "en", "s", text80.length.toLong),
        (2L, "", "en", "s", 0L), (3L, "one", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val got = operators.TextQueries.textChunkWindows(spark, tmp)
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    assert(!got.contains(2L)) // empty doc yields no chunks
    assert(got(3L).map(r => (r._2, r._3)).toSeq === Seq((1L, 1L)))
    val c1 = got(1L).sortBy(_._2)
    assert(c1.map(r => (r._2, r._3)).toSeq ===
      Seq((1L, 32L), (25L, 32L), (49L, 32L), (73L, 8L)))
    // hash replay: md5('ck:' + joined window), first 13 hex digits
    def h52(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("ck:" + s).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString.take(13), 16)
    }
    val toks = (1 to 80).map(i => s"w$i")
    for ((_, st, n, h) <- c1)
      assert(h === h52(toks.slice(st.toInt - 1, st.toInt - 1 + n.toInt).mkString(" ")))
  }

  test("chunk dedup: identical docs share every chunk, unique doc shares none") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("chunkdup").toString
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val unique = (1 to 60).map(i => s"only$i").mkString(" ")
    Seq((1L, shared, "en", "s", 0L), (2L, shared, "en", "s", 0L),
        (3L, unique, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val got = operators.TextQueries.dedupChunkLevel(spark, tmp)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 60 tokens -> starts 1,25,49 = 3 chunks each
    assert(got(1L) === ((1L, 3L, 3L, 1000L)))
    assert(got(2L) === ((2L, 3L, 3L, 1000L)))
    assert(got(3L) === ((3L, 3L, 0L, 0L)))
  }

  test("q23: planted two-supplier year splits market share 750/250") {
    import org.apache.spark.sql.SaveMode
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q23").toString
    Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/region.parquet")
    Seq((0, "FRANCE", 0), (1, "CHINA", 1), (2, "JAPAN", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/nation.parquet")
    Seq((1L, "C1", 0, 0.0, "AUTO")).toDF("c_custkey", "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/customer.parquet")
    Seq((10L, "S1", 1, 0.0), (11L, "S2", 2, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/supplier.parquet")
    Seq((1L, 1L, "O", 400.0, Timestamp.valueOf("1995-06-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    Seq((1L, 1L, 10L, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", Timestamp.valueOf("1995-07-01 00:00:00")),
        (1L, 2L, 11L, 2, 1.0, 100.0, 0.0, 0.0, "N", "O", Timestamp.valueOf("1995-07-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/lineitem.parquet")
    val got = CoreQueries.q23(spark, tmp)
      .as[(Long, String, Double, Double)].collect().map(r => r._2 -> r).toMap
    assert(got === Map(
      "CHINA" -> ((1995L, "CHINA", 300.0, 750.0)),
      "JAPAN" -> ((1995L, "JAPAN", 100.0, 250.0))))
  }

  test("cdc apply: last write wins, trailing deletes drop the key, ties break on event_id") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("cdc").toString
    // (event_id, ts_ns, user_id, event_type, value): key 1 double-upsert,
    // key 2 ends deleted, key 3 re-created after a delete, key 4 ts tie
    Seq((1L, 1000L, 1L, "view", 1.0), (2L, 2000L, 1L, "click", 2.0),
        (3L, 1000L, 2L, "view", 9.0), (4L, 2000L, 2L, "error", 0.0),
        (5L, 1000L, 3L, "error", 0.0), (6L, 2000L, 3L, "signup", 3.0),
        (7L, 5000L, 4L, "view", 4.0), (8L, 5000L, 4L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/events.parquet")
    val got = operators.Records.cdcApply(spark, tmp)
      .as[(Long, String, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got === Map(
      1L -> ((1L, "click", 2.0, 2000L, 2L)),
      3L -> ((3L, "signup", 3.0, 2000L, 2L)),
      4L -> ((4L, "purchase", 5.0, 5000L, 2L))))
  }

  test("centroid shift matches a Scala replay; first month per species is null") {
    val got = DomainQueries.occCentroidShift(spark, sf)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    assert(got.nonEmpty)
    val rows = DomainQueries.valid(spark, sf)
      .select(col("species"), col("lat"), col("lon"),
        expr("year(timestamp_micros(ts_ns div 1000)) * 100 + " +
          "month(timestamp_micros(ts_ns div 1000))").cast("long").as("ym"))
      .as[(String, Double, Double, Long)].collect()
    val cent = rows.groupBy(r => (r._1, r._4)).map { case ((sp, ym), es) =>
      val lats = es.map(e => math.floor((e._2 + 90.0) * 1000).toLong)
      val lons = es.map(e => math.floor((e._3 + 180.0) * 1000).toLong)
      (sp, ym) -> ((es.length.toLong, lats.sum / es.length, lons.sum / es.length))
    }
    for ((sp, ym, n, clat, clon, shift) <- got) {
      val (en, elat, elon) = cent((sp, ym))
      assert((n, clat, clon) === ((en, elat, elon)), s"$sp/$ym centroid")
      val prev = cent.keys.filter(k => k._1 == sp && k._2 < ym)
        .map(_._2).maxOption
      val expectShift = prev.map { p =>
        val (_, plat, plon) = cent((sp, p))
        math.abs(clat - plat) + math.abs(clon - plon)
      }
      assert(shift === expectShift, s"$sp/$ym shift")
    }
  }

  test("q28: latency bins conserve mass and split on the sign correctly") {
    val got = CoreQueries.q28(spark, sf)
      .as[(String, Boolean, Long, Long)].collect()
    assert(got.nonEmpty)
    val lags = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .as[Long].collect()
    assert(got.map(_._4).sum === lags.length.toLong)
    val expect = lags.groupBy(l =>
        (l > 0, 63L - java.lang.Long.numberOfLeadingZeros(math.abs(l) + 1)))
      .map { case (k, xs) => k -> xs.length.toLong }
    for ((pri, late, bits, n) <- got) {
      assert(Set("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")(pri))
      assert(bits >= 0)
      val _ = (late, n) // per-(late,bits) totals checked below
    }
    val gotBins = got.groupBy(r => (r._2, r._3))
      .map { case (k, rs) => k -> rs.map(_._4).sum }
    assert(gotBins === expect)
  }

  test("gap analysis: occupied never exceeds bbox, fraction recomputes") {
    val got = DomainQueries.occGapAnalysis(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val pts = DomainQueries.valid(spark, sf)
      .select(col("species"), expr("cast(floor(lat * 10.0) as bigint)"),
        expr("cast(floor(lon * 10.0) as bigint)"))
      .as[(String, Long, Long)].collect()
    for ((sp, nPts, occ, bbox, gap) <- got) {
      val mine = pts.filter(_._1 == sp)
      assert(nPts === mine.length.toLong)
      assert(occ === mine.map(p => (p._2, p._3)).distinct.length.toLong)
      val expBbox = (mine.map(_._2).max - mine.map(_._2).min + 1) *
        (mine.map(_._3).max - mine.map(_._3).min + 1)
      assert(bbox === expBbox)
      assert(occ <= bbox)
      assert(gap === (bbox - occ) * 1000 / bbox)
    }
  }

  test("q27: a one-way flow lands as +export/-import on the two nations") {
    import org.apache.spark.sql.SaveMode
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q27").toString
    Seq((0, "FRANCE", 0), (1, "CHINA", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/nation.parquet")
    Seq((1L, "C1", 0, 0.0, "AUTO")).toDF("c_custkey", "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/customer.parquet")
    Seq((10L, "S1", 1, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/supplier.parquet")
    val d = Timestamp.valueOf("1995-06-01 00:00:00")
    Seq((1L, 1L, "O", 100.0, d, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    Seq((1L, 1L, 10L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", d))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/lineitem.parquet")
    val got = CoreQueries.q27(spark, tmp)
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got === Map(
      "CHINA" -> (("CHINA", 100.0, 0.0, 100.0)),
      "FRANCE" -> (("FRANCE", 0.0, 100.0, -100.0))))
  }

  test("q26: only under-a-fifth-of-average items count, revenue recomputes") {
    import org.apache.spark.sql.SaveMode
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q26").toString
    Seq((1L, "P1", "B1", "T", 1, 0.0), (2L, "P2", "B2", "T", 1, 0.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/part.parquet")
    val ship = Timestamp.valueOf("1995-07-01 00:00:00")
    // part 1: qtys 1,10,10,10 (avg 7.75; 1*5*4=20 < 31 → only qty-1 counts;
    // 10*5*4=200 >= 31 rejected). part 2: uniform qtys — nothing counts.
    val rows = Seq((1L, 1.0, 100.0), (1L, 10.0, 5.0), (1L, 10.0, 5.0),
      (1L, 10.0, 5.0), (2L, 4.0, 7.0), (2L, 4.0, 7.0))
    rows.zipWithIndex.map { case ((pk, q, p), i) =>
      (i.toLong, pk, 1L, i + 1, q, p, 0.0, 0.0, "N", "O", ship) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/lineitem.parquet")
    val got = CoreQueries.q26(spark, tmp)
      .as[(String, Long, Double)].collect().toSet
    assert(got === Set(("B1", 1L, 100.0)))
  }

  test("q25: planted quarter chain yields exact milli growth, first quarter null") {
    import org.apache.spark.sql.SaveMode
    import java.sql.Timestamp
    val tmp = java.nio.file.Files.createTempDirectory("q25").toString
    Seq((0, "FRANCE", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/nation.parquet")
    Seq((1L, "C1", 0, 0.0, "AUTO")).toDF("c_custkey", "c_name", "c_nationkey",
        "c_acctbal", "c_mktsegment")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/customer.parquet")
    // Q1 100.00, Q2 250.00 (+150%), Q3 125.00 (−50%) — the negative-growth
    // case still divides positive operands (trunc == floor on both engines)
    Seq((1L, "1995-01-15", 60.0), (2L, "1995-02-15", 40.0),
        (3L, "1995-05-15", 250.0), (4L, "1995-08-15", 125.0))
      .map { case (k, d, p) =>
        (k, 1L, "O", p, Timestamp.valueOf(d + " 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    val got = CoreQueries.q25(spark, tmp)
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._2 -> r).toMap
    assert(got === Map(
      19951L -> (("FRANCE", 19951L, 10000L, None, None)),
      19952L -> (("FRANCE", 19952L, 25000L, Some(10000L), Some(1500L))),
      19953L -> (("FRANCE", 19953L, 12500L, Some(25000L), Some(-500L)))))
  }

  test("fuzzy match: within-block lev<=12 pairs only; oversized blocks drop") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("fuzzy").toString
    val pre = "the quick brown fox jump" // exactly 24 chars
    val near = pre + " over the lazy dog again and again"
    val docs = Seq(
      (1L, near), (2L, near.dropRight(5) + "xgain"), // lev 1 on the skeleton
      (3L, pre + " into a completely different continuation with many extra words"),
      (4L, "unrelated prefix entirely " + near)) ++
      // 65 same-prefix docs: block of 65 > cap 64 must produce no pairs
      Seq.tabulate(65)(i => (100L + i, "boilerplate header block " + s"variant $i"))
    docs.toDF("doc_id", "text")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/documents.parquet")
    val got = operators.TextQueries.dedupFuzzyMatch(spark, tmp)
      .as[(Long, Long, Long)].collect().toSet
    // plain-Scala Levenshtein over the planted skeletons confirms the distance
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expLev = lev(near.take(128), (near.dropRight(5) + "xgain").take(128))
    assert(expLev === 1L)
    assert(got === Set((1L, 2L, expLev.toLong)))
  }

  test("activity overlap replays Schoener's D = sum-min of milli day-profiles by hand") {
    import spark.implicits._
    val dayNs = 86400000000000L
    val prof = DomainQueries.valid(spark, sf)
      .select(col("species"), expr(s"ts_ns div $dayNs").as("d"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (sp, rows) =>
        val tot = rows.length.toLong
        sp -> rows.groupBy(_._2).map { case (d, g) =>
          d -> g.length.toLong * 1000 / tot
        }
      }
    val got = DomainQueries.occActivityOverlap(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    val sps = prof.keys.toSeq.sorted
    // every a < b pair sharing >= 1 day appears exactly once
    val expectKeys = (for {
      a <- sps; b <- sps if a < b
      if prof(a).keySet.intersect(prof(b).keySet).nonEmpty
    } yield (a, b)).toSet
    assert(got.map(r => (r._1, r._2)).toSet === expectKeys)
    for ((a, b, nShared, ov) <- got) {
      val shared = prof(a).keySet.intersect(prof(b).keySet)
      assert(nShared === shared.size)
      assert(ov === shared.toSeq.map(d => math.min(prof(a)(d), prof(b)(d))).sum)
      assert(ov >= 0 && ov <= 1000)
    }
  }

  test("quadtree cells: mass preserved, leaves under cap, refined cells have oversized parents") {
    // sf0.01: large enough that depth actually splits (the sf0.001 corpus
    // fits entirely in the root cell and would test nothing)
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    val pts = DomainQueries.valid(spark, dir)
      .select("lat", "lon").as[(Double, Double)].collect()
    def cell(k: Int, lat: Double, lon: Double): Long = {
      val side = (1 << k).toDouble
      val qy = math.min(math.floor((lat + 90.0) * side / 180.0).toLong, (1 << k) - 1L)
      val qx = math.min(math.floor((lon + 180.0) * side / 360.0).toLong, (1 << k) - 1L)
      qy * (1 << k) + qx
    }
    val got = DomainQueries.spatialQuadtreeCells(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).sum === pts.length)
    // every cell above depth 0 refines a parent that was over the cap
    val cnt = (0 to 4).map(k =>
      k -> pts.groupBy(p => cell(k, p._1, p._2)).map { case (c, g) => c -> g.length.toLong }
    ).toMap
    for ((depth, cid, n) <- got) {
      if (depth < 4) assert(cnt(depth.toInt)(cid) <= 1024, s"leaf over cap at $depth/$cid")
      assert(n <= cnt(depth.toInt)(cid))
      if (depth > 0) {
        // the point's parent cell at depth-1 must have been over the cap
        val k = depth.toInt
        val parentOver = pts.exists { p =>
          cell(k, p._1, p._2) == cid && cnt(k - 1)(cell(k - 1, p._1, p._2)) > 1024
        }
        assert(parentOver, s"cell $depth/$cid has no oversized parent")
      }
    }
  }

  test("k-anonymity: class partition replays by hand, risk monotone in k") {
    import spark.implicits._
    val cls = graft.Tables.t(spark, sf, "documents")
      .selectExpr("source", "lang",
        "cast(length(bin(n_chars)) - 1 as bigint) as lb")
      .as[(String, String, Long)].collect()
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val total = cls.sum
    val got = operators.Records.dataKAnonymity(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(2L, 5L, 10L, 20L))
    for ((k, (_, nCls, below, atRisk, minSz, riskM, anon)) <- got) {
      assert(nCls === cls.length.toLong)
      assert(below === cls.count(_ < k).toLong)
      assert(atRisk === cls.filter(_ < k).sum)
      assert(minSz === cls.min)
      assert(riskM === atRisk * 1000 / total)
      assert(anon === (below == 0L))
    }
    // risk can only grow with k
    assert((got(2L)._4 <= got(5L)._4) && (got(5L)._4 <= got(10L)._4) &&
      (got(10L)._4 <= got(20L)._4))
  }

  test("ripley k replays brute-force binned pair counts at every radius") {
    import spark.implicits._
    val nc = DomainQueries.valid(spark, sf)
      .selectExpr("(cast(floor(lat / 10.0) as bigint) + 9) * 36 + " +
        "cast(floor(lon / 10.0) as bigint) + 18 as cellid")
      .groupBy("cellid").count().as[(Long, Long)].collect().toMap
    val cells = nc.keys.toSeq.sorted
    val nPts = nc.values.sum
    val aCells = cells.length.toLong
    // brute-force ordered pair count over ALL occupied cell pairs (no
    // offset scatter): the operator's neighborhood join must equal it
    def pairsWithin(r: Long): Long = {
      val r2 = r * r
      val cross = (for {
        i <- cells.indices; j <- (i + 1) until cells.length
        (a, b) = (cells(i), cells(j))
        dy = a / 36 - b / 36; dx = a % 36 - b % 36
        if dy * dy + dx * dx <= r2
      } yield 2L * nc(a) * nc(b)).sum
      cross + cells.map(c => nc(c) * (nc(c) - 1)).sum
    }
    val got = DomainQueries.occRipleyK(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    val csr = Map(1L -> 3141L, 2L -> 12566L, 3L -> 28274L, 4L -> 50265L)
    for ((r, (_, nPairs, n, a, mean, csrM, flag)) <- got) {
      assert(n === nPts); assert(a === aCells)
      assert(nPairs === pairsWithin(r), s"pairs at r=$r")
      assert(nPairs > 0) // nonempty evidence at every radius
      assert(mean === nPairs * 1000 / nPts)
      assert(csrM === nPts * csr(r) / aCells)
      assert(flag === (if (mean > csrM) "clustered" else "dispersed"))
    }
    // monotone in r: larger radius can only add pairs
    assert((1L to 3L).forall(r => got(r)._2 <= got(r + 1)._2))
  }

  test("distance decay replays ring-binned cell-pair jaccard by hand") {
    import spark.implicits._
    val cs = DomainQueries.valid(spark, sf)
      .selectExpr("(cast(floor(lat / 10.0) as bigint) + 9) * 36 + " +
        "cast(floor(lon / 10.0) as bigint) + 18 as cellid", "species")
      .distinct().as[(Long, String)].collect()
      .groupBy(_._1).map { case (c, g) => c -> g.map(_._2).toSet }
    val cells = cs.keys.toSeq.sorted
    val expect = (for {
      i <- cells.indices; j <- (i + 1) until cells.length
      (a, b) = (cells(i), cells(j))
      shared = cs(a).intersect(cs(b)).size if shared > 0
    } yield {
      val dist = math.max(math.abs(a / 36 - b / 36), math.abs(a % 36 - b % 36))
      dist -> shared.toLong * 1000 / (cs(a).size + cs(b).size - shared)
    }).groupBy(_._1).map { case (d, g) =>
      d -> ((g.length.toLong, g.map(_._2).sum / g.length))
    }
    val got = DomainQueries.occDistanceDecay(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("mgnify enrich: update flag set only when a member resolved, both lookup paths exercised") {
    import spark.implicits._
    val rows = operators.Records.mgnifyEnrich(spark, sf)
      .select("n_metagenomes", "n_resolved", "mgnify_study_ids", "mgnify_status")
      .as[(Long, Long, String, String)].collect()
    assert(rows.nonEmpty)
    // only parents WITH metagenome members appear (the reference's
    // process_record guard), and the flag is exactly any-member-resolved
    assert(rows.forall(_._1 >= 1))
    assert(rows.forall(r => r._2 <= r._1))
    assert(rows.forall(r => (r._2 > 0) == (r._4 == "true")))
    // the None miss path and the resolved path both occur, and an
    // all-missed parent carries an empty id list (record untouched)
    assert(rows.exists(r => r._2 < r._1), "no lookup miss in fixture")
    assert(rows.exists(_._2 > 0), "no lookup hit in fixture")
    assert(rows.filter(_._2 == 0).forall(_._3 == ""))
    // resolved count matches the id list length
    assert(rows.filter(_._2 > 0)
      .forall(r => r._3.split(';').length.toLong == r._2))
  }

  test("sample relationships: precedence, orphan miss, and a 2-hop attach all occur") {
    import spark.implicits._
    val rows = operators.Records.sampleRelationships(spark, sf)
      .as[(String, String, String, Option[Long], Option[String])].collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_._3).view.mapValues(_.length).toMap
    // all four documented statuses occur in the synthesized graph
    assert(Set("root", "attached", "orphan", "unresolved").subsetOf(byStatus.keySet),
      s"statuses seen: $byStatus")
    // roots attach to themselves at depth 0; orphans carry no parent
    assert(rows.filter(_._2 == "root")
      .forall(r => r._4.contains(0L) && r._5.contains(r._1)))
    assert(rows.filter(_._3 == "orphan").forall(r => r._4.isEmpty && r._5.isEmpty))
    // the 2-hop chain resolves: some specimen attaches at depth 2
    assert(rows.exists(r => r._3 == "attached" && r._4.contains(2L)),
      "no depth-2 attachment in fixture")
    // per-type precedence: a key with BOTH characteristics (odd and
    // ≡2 mod 3, e.g. 5 ≡ both? 5%2=1, 5%3=2) reads derived_from
    val both = rows.find(_._1 == "ACC5")
    assert(both.exists(_._2 == "derived_from"))
  }

  test("link rollups: both rollup families, exact link mass, sorted lists") {
    import spark.implicits._
    val rows = operators.Records.linkRollups(spark, sf)
      .as[(String, String, Long, String)].collect()
    val byType = rows.groupBy(_._1)
    assert(byType.keySet === Set("tol_qc", "images"))
    // every part contributes exactly one tolqc link; every fifth order
    // carries the NHMUK attribute (import_images.py:32-34 filter)
    val nParts = graft.Tables.t(spark, sf, "part").count()
    val nTagged = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderkey") % 5 === 0).count()
    assert(byType("tol_qc").map(_._3).sum === nParts)
    assert(byType("images").map(_._3).sum === nTagged)
    // list bodies are sorted and sized to n_links (upsert hash stability)
    assert(rows.forall { r =>
      val ls = r._4.split(';')
      ls.length.toLong == r._3 && (ls sameElements ls.sorted)
    })
  }

  test("annotations explode: project fan-out, tax-lookup miss, and the two hard pins") {
    import spark.implicits._
    val rows = operators.Records.annotationsExplode(spark, sf)
      .select("project", "tax_id", "n_annotations", "accessions")
      .as[(String, Long, Long, String)].collect()
    val perProject = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perProject.keySet === Set("erga", "dtol", "asg", "gbdp"))
    // file-list containment: dtol ⊂ erga ⊂ gbdp (same records explode
    // into every project listing their yaml)
    assert(perProject("dtol") <= perProject("erga"))
    assert(perProject("erga") <= perProject("gbdp"))
    // the XMLSyntaxError skip drops rows: gbdp (all 6 files) < all parts
    val nParts = graft.Tables.t(spark, sf, "part").count()
    assert(perProject("gbdp") < nParts)
    // hard-pinned accessions survive with their pinned tax ids
    // (import_annotations.py:75-79)
    assert(rows.exists(r => r._2 == 7604L && r._4.split(';').contains("GCA_42")))
    assert(rows.exists(r => r._2 == 6579L && r._4.split(';').contains("GCA_99")))
  }

  test("overlap depth sweep conserves total file coverage and respects the file-count ceiling") {
    val got = operators.Records.metaOverlapDepth(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // independent file-span replay: sum over segments of depth*width must
    // equal the total covered length WITH multiplicity, i.e. the sum of
    // every file's span (the sweep cannot invent or lose coverage)
    val files = Tables.t(spark, sf, "orders")
      .select(
        ((year(col("o_orderdate")) - 1995) * 2 +
          when(month(col("o_orderdate")) > 6, 1).otherwise(0)).cast("long").as("fid"),
        (expr("datediff(o_orderdate, date'1970-01-01')").cast("long") +
          expr("cast(conv(substring(md5(cast(concat('ovl:', cast(o_orderkey as string))" +
            " as binary)), 1, 15), 16, 10) as bigint) % 31") - 15).as("w"))
      .groupBy("fid").agg(min("w").as("lo"), max("w").as("hi"))
      .as[(Long, Long, Long)].collect()
    val totalSpan = files.map { case (_, lo, hi) => hi - lo + 1 }.sum
    assert(got.map { case (d, w, _) => d * w }.sum === totalSpan)
    assert(got.map(_._1).max <= files.length.toLong)
    assert(got.forall(_._1 >= 0))
  }


  test("niche breadth: Levins B within [1, ~10] bins, standardized form consistent") {
    val got = operators.DomainQueries.occNicheBreadth(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nPts, nBins, sp2, b, ba) =>
      assert(nPts > 0 && nBins >= 1 && nBins <= 10)
      // floors keep sum(p_milli) <= 1000, so B_milli >= 1000 always;
      // 10 bins cap the true B at 10 (floor slack allows slight overshoot)
      assert(b >= 1000L && b <= 11000L)
      assert(b === 1000000000L / math.max(sp2, 1L))
      assert(ba === (b - 1000) * 1000 / 9000)
    }
  }


  test("envelope projection: observed cells never exceed suitable cells") {
    val got = operators.DomainQueries.occEnvelopeProjection(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nPts, obs, suit, occ) =>
      assert(nPts > 0 && obs >= 1)
      // every observed cell's climate lies inside the species' own
      // min/max box, so the projection is a superset by construction
      assert(obs <= suit, s"observed $obs > suitable $suit")
      assert(occ === obs * 1000 / math.max(suit, 1L))
      assert(occ >= 0 && occ <= 1000)
    }
  }

  test("zone pruning audit conserves rows and never scans less than it matches") {
    import spark.implicits._
    val got = operators.DomainQueries.spatialZonePruningAudit(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length <= 16)
    // disjoint grid boxes: matched rows over all boxes == every valid row
    val totalValid = operators.DomainQueries.valid(spark, sf).count()
    assert(got.map(_._3).sum === totalValid)
    got.foreach { case (qy, qx, matched, files, scanned, amp) =>
      assert(qy >= 0 && qy <= 3 && qx >= 0 && qx <= 3)
      // zone maps can over-read, never under-read; ≥1 file always hits
      assert(scanned >= matched && files >= 1 && files <= 32)
      assert(amp === scanned * 1000 / matched && amp >= 1000)
    }
  }

  test("GFS retention tiers are exhaustive, disjoint, and keep the whole last week") {
    import spark.implicits._
    val got = operators.Records.metaGfsRetention(spark, sf)
      .as[(Long, Long, String, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.length === got.length) // one row per snapshot
    got.foreach { case (_, age, tier, keep) =>
      assert(Set("daily", "weekly", "monthly", "expire")(tier))
      assert(keep === (tier != "expire"))
      if (age < 7) assert(tier === "daily", s"age $age must be daily-kept")
      if (tier == "weekly") assert(age >= 7 && age < 56)
      if (tier == "monthly") assert(age >= 7 && age < 360)
    }
    // each 7-day bucket in the weekly horizon keeps AT MOST one snapshot
    val weekly = got.filter(_._3 == "weekly").groupBy(_._1 / 7)
    weekly.foreach { case (wk, rows) =>
      assert(rows.length === 1, s"week bucket $wk kept ${rows.length}")
    }
  }

  test("bitemporal as-of: every version satisfies both bounds; late arrivals change the answer") {
    import spark.implicits._
    val asOf = operators.Records.metaBitemporalAsof(spark, sf)
      .select("custkey", "version_key", "valid_from", "txn_from", "n_visible")
      .as[(Long, Long, java.sql.Date, java.sql.Date, Long)].collect()
    assert(asOf.nonEmpty)
    val v = java.sql.Date.valueOf("1998-06-01")
    val t = java.sql.Date.valueOf("1998-06-03")
    asOf.foreach { case (k, _, vf, tf, n) =>
      assert(!vf.after(v), s"custkey $k version valid_from $vf past V")
      assert(!tf.after(t), s"custkey $k version txn_from $tf past T")
      assert(n >= 1L)
    }
    // driver-side replay: the chosen version is the max (valid, txn, key)
    // among visible ones, and for SOME customer a late-arriving version
    // (valid <= V but txn > T) exists and was correctly excluded
    val versions = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"))
      .as[(Long, Long, java.sql.Date)].collect()
      .map { case (c, o, d) =>
        val tf = java.sql.Date.valueOf(d.toLocalDate.plusDays(o % 7))
        (c, o, d, tf)
      }
    val visible = versions.filter(r => !r._3.after(v) && !r._4.after(t))
    val best = visible.groupBy(_._1).map { case (c, rs) =>
      c -> rs.maxBy(r => (r._3.getTime, r._4.getTime, r._2))._2
    }
    assert(asOf.map(r => r._1 -> r._2).toMap === best)
    val lateArrivals = versions.filter(r => !r._3.after(v) && r._4.after(t))
    assert(lateArrivals.nonEmpty, "corpus must contain late-arriving versions")
    // at least one customer's answer CHANGES when txn time is ignored
    val naiveBest = versions.filter(r => !r._3.after(v)).groupBy(_._1)
      .map { case (c, rs) => c -> rs.maxBy(r => (r._3.getTime, r._4.getTime, r._2))._2 }
    assert(best.exists { case (c, o) => naiveBest.get(c).exists(_ != o) },
      "a late arrival must flip at least one customer's as-of version")
  }

  test("buffer-region join: a boundary-straddling point hits via its buffer, interior and far points behave") {
    // Region 0 is the star centered (-150°, -50°) with east axis vertex
    // at exactly (-142°, -50°). Three planted occurrences:
    //  p1 at the center — point_inside AND buffer_hit;
    //  p2 at (-141.95°, -50°), 0.05° EAST of the vertex, uncert 5000 m —
    //     dlo ≈ 0.0699°, so the buffer's west vertex pokes ~0.02° into
    //     the star wedge while the point itself is outside: the
    //     boundary straddler the bare point join drops and the
    //     reference's buffered annotation keeps;
    //  p3 far from every region — must produce NO candidate row at all
    //     (the broadcast prefilter, not the exact test, removes it).
    import spark.implicits._
    val pts = Seq(
      (1L, "sp_a", -50.0, -150.0, 2000.0),
      (2L, "sp_b", -50.0, -141.95, 5000.0),
      (3L, "sp_c", 80.0, 170.0, 5000.0))
      .toDF("occ_id", "species", "lat", "lon", "uncert")
    val got = operators.DomainQueries.bufferRegionHits(pts, spark)
      .select("rid", "occ_id", "point_inside", "buffer_hit")
      .as[(Long, Long, Long, Int)].collect()
    val r0 = got.filter(r => r._1 == 0L)
    assert(r0.exists(r => r._2 == 1L && r._3 == 1L && r._4 == 1),
      s"interior point must read inside+hit: ${got.mkString(", ")}")
    assert(r0.exists(r => r._2 == 2L && r._3 == 0L && r._4 == 1),
      s"straddler must read outside+hit: ${got.mkString(", ")}")
    assert(!got.exists(_._2 == 3L), "far point must not be a candidate")
    // the straddler with a SMALL buffer (500 m => dlo ~ 0.007°) stays a
    // clean miss — the hit above is the buffer's doing, not slack
    val tight = Seq((4L, "sp_d", -50.0, -141.95, 500.0))
      .toDF("occ_id", "species", "lat", "lon", "uncert")
    val tg = operators.DomainQueries.bufferRegionHits(tight, spark)
      .select("occ_id", "buffer_hit").as[(Long, Int)].collect()
    assert(tg.forall(_._2 == 0), s"tight buffer must miss: ${tg.mkString(", ")}")
    // MARGIN PROOF (the prefilter-soundness argument the operator doc
    // cites): the bbox cut extends 10 deci-degrees past the region —
    // sound because (a) a buffer can only reach a region if the point
    // sits within dla ≈ 0.07° of the region's lat range, i.e. |lat| ≤
    // ~73.1°, where dlo(8 km) ≤ 0.25° ≪ 1°; (b) points polewards of
    // that cannot intersect ANY region regardless of their (possibly
    // huge) dlo. Sweep east of region 0's east vertex at max uncert:
    // hits must be exactly the offsets within buffer reach (dlo ≈
    // 0.112° at lat −50), and the 1.5°-offset point (beyond the bbox
    // margin for its cell band) must not appear as a candidate at all.
    val sweep = Seq(
      (10L, "sw", -50.0, -141.95, 8000.0),  // 0.05° out, reach 0.112 -> hit
      (11L, "sw", -50.0, -141.91, 8000.0),  // 0.09° out -> hit
      (12L, "sw", -50.0, -141.80, 8000.0),  // 0.20° out -> miss
      (13L, "sw", -50.0, -141.10, 8000.0),  // 0.90° out -> miss
      (14L, "sw", -50.0, -140.50, 8000.0),  // 1.50° out -> miss
      (15L, "sw", 87.0, -150.0, 8000.0),    // polar: dlo ~ 1.37° but 137° north of any region
      (16L, "sw", 73.5, -150.0, 8000.0))    // just past the reachable lat band
      .toDF("occ_id", "species", "lat", "lon", "uncert")
    val sg = operators.DomainQueries.bufferRegionHits(sweep, spark)
      .filter(col("rid") === 0)
      .select("occ_id", "buffer_hit").as[(Long, Int)].collect().toMap
    assert(sg.getOrElse(10L, 0) == 1, s"0.05-deg point must hit: $sg")
    assert(sg.getOrElse(11L, 0) == 1, s"0.09-deg point must hit: $sg")
    assert(Seq(12L, 13L, 14L).forall(sg.getOrElse(_, 0) == 0),
      s"beyond-reach offsets must miss: $sg")
    val polar = operators.DomainQueries.bufferRegionHits(sweep, spark)
      .filter(col("occ_id") >= 15L && col("buffer_hit") === 1).count()
    assert(polar === 0L, "polewards of the reachable band nothing may hit")
  }

}
