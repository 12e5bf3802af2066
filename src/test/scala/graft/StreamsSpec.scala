package graft

import graft.operators.DomainQueries
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("twin ledger: Streams' dataset-returning methods match SURVEY 2d's names") {
    // SURVEY §2d is the authoritative ledger; this pin fails when a twin
    // is added or removed without updating the table (or vice versa).
    val expected = Set("tumblingCounts", "dedupeWithinWatermark",
      "correlate", "ingestWithDeadLetters", "diffAgainstIndex",
      "sessionize", "scd2", "throttle", "cusum", "arrivalAccumulators",
      "schemaDrift", "conversionLag", "transitions", "growthStates",
      "bottomkSample", "funnel", "cdcApply", "watermarkLag", "ewma",
      "holtTrend", "forecastBacktest", "diurnalDft", "rollingMedian",
      "trimmedMean", "recordDays", "silenceStreaks", "runsTest",
      "mannKendall", "changepoint", "queueWait", "saxMotifs",
      "maxDrawdown", "sprtGate", "wilsonBounds", "tailIndex", "ljungBox",
      "interventionIts", "pageHinkley", "flapRate", "gapFillLocf",
      "burstiness", "lshIncrement", "peakToMean", "errorBudget",
      "incidentRuns")
    assert(expected.size === 45)
    val got = Streams.getClass.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filter(m => classOf[org.apache.spark.sql.Dataset[_]]
        .isAssignableFrom(m.getReturnType) ||
        classOf[org.apache.spark.sql.streaming.StreamingQuery]
          .isAssignableFrom(m.getReturnType))
      .map(_.getName).toSet
    assert(got === expected,
      s"ledger drift: extra=${got -- expected} missing=${expected -- got}")
  }

  test("sessionize splits on gap and carries counts/durations") {
    val gap = 100L
    val events = Seq((1L, 0L), (1L, 10L), (1L, 10000L), (2L, 5L)).toDS()
    val out = Streams.sessionize(events, gap, emitOpen = true)
      .collect().map(s => (s.user_id, s.session_start_ns, s.n_events, s.dur_ns)).toSet
    assert(out === Set((1L, 0L, 2L, 10L), (1L, 10000L, 1L, 0L), (2L, 5L, 1L, 0L)))
  }

  test("sessionize agrees with the window-function batch sessionizer") {
    val ev = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns")).as[(Long, Long)]
    val stateful = Streams.sessionize(ev, 21600000000000L, emitOpen = true)
      .collect().map(s => (s.user_id, s.n_events, s.dur_ns))
      .groupBy(identity).view.mapValues(_.length).toMap
    val windowed = DomainQueries.eventsSessionize(spark, sf)
      .select("user_id", "n_events", "dur_ns").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2, r._3))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(stateful === windowed)
  }

  test("streaming funnel detects the strict pattern and splits sessions") {
    val gap = 100L
    // user 1, session A: view(0) → click(5) → purchase(7) = converted;
    // session B (after gap): purchase before click → NOT converted;
    // user 2: click with ts == view's ts fails the strict > gate.
    val events = Seq(
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 7L, "purchase"),
      (1L, 10000L, "view"), (1L, 10001L, "purchase"), (1L, 10002L, "click"),
      (2L, 3L, "view"), (2L, 3L, "click")
    ).toDS()
    val out = Streams.funnel(events, gap, emitOpen = true)
      .collect().map(f => (f.user_id, f.session_start_ns, f.n_events, f.converted, f.conv_ns)).toSet
    assert(out === Set(
      (1L, 0L, 3L, true, 7L),
      (1L, 10000L, 3L, false, -1L),
      (2L, 3L, 2L, false, -1L)))
  }

  test("streaming funnel agrees with the batch min-if window funnel") {
    val ev = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_type"))
      .as[(Long, Long, String)]
    val stateful = Streams.funnel(ev, 21600000000000L, emitOpen = true)
      .collect().map(f => (f.user_id, f.n_events, f.converted, f.conv_ns))
      .groupBy(identity).view.mapValues(_.length).toMap
    val windowed = DomainQueries.eventsFunnel(spark, sf)
      .select(col("user_id"), col("n_events"),
        col("t_purchase").isNotNull.as("converted"),
        coalesce(col("conv_ns"), lit(-1L)).as("conv_ns"))
      .as[(Long, Long, Boolean, Long)]
      .collect().map(r => (r._1, r._2, r._3, r._4))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(stateful === windowed)
  }

  test("streaming scd2 agrees with the batch lag/lead history build") {
    val ev = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    val stateful = Streams.scd2(ev, emitOpen = true)
      .collect().map(o => (o.user_id, o.state, o.valid_from_ns, o.valid_to_ns)).toSet
    val batch = operators.Analytics.metaScd2History(spark, sf)
      .select(col("user_id"), col("state"), col("valid_from_ns"),
        coalesce(col("valid_to_ns"), lit(-1L)))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(stateful === batch)
  }

  test("streaming scd2 closes intervals across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = Streams.scd2(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L, 1L, "view"), (1L, 20L, 2L, "view"))
      q.processAllAvailable() // same state twice: nothing closes
      assert(spark.sql("SELECT * FROM scd2_out").count() === 0)
      mem.addData((1L, 30L, 3L, "click")) // change arrives in a LATER batch
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM scd2_out")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(rows === Set((1L, "view", 10L, 30L)))
    } finally q.stop()
  }

  test("streaming cusum agrees with the batch closed form and carries state") {
    // targets = the batch-derived per-type baselines (floored integer mean)
    val src = DomainQueries.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        expr("cast(floor(value * 1024) as bigint)").as("q"))
      .as[(String, Long, Long, Long)]
    val targets = src.groupBy("event_type").agg(expr("sum(q) div count(1)").as("t"))
      .as[(String, Long)].collect().toMap
    val stateful = Streams.cusum(src, targets, operators.Analytics.CUSUM_ALARM_FP)
      .collect().map(o => (o.event_type, o.event_id) -> (o.cusum_fp, o.alarm)).toMap
    val batch = operators.Analytics.eventsCusum(spark, sf)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(stateful === batch)
    // state carries across micro-batches: a drift split across batches
    // still accumulates to an alarm
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Long)]
    val q = Streams.cusum(mem.toDS(), Map("feed" -> 10240L), 2048000L)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      mem.addData((1L to 25L).map(i => ("feed", i, i, 112640L)): _*) // +100 each
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cusum_out WHERE alarm").as[Long].head() === 5)
      mem.addData((26L to 30L).map(i => ("feed", i, i, 112640L)): _*)
      q.processAllAvailable()
      // the second batch starts from the carried S, so ALL its rows alarm
      assert(spark.sql("SELECT count(*) FROM cusum_out WHERE alarm").as[Long].head() === 10)
    } finally q.stop()
  }

  test("streaming transitions equal the batch lead window, pairs cross batch bounds") {
    // whole-corpus agreement with the batch matrix
    val src = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    val stateful = Streams.transitions(src).collect()
      .groupBy(o => (o.prev, o.next)).map { case (k, v) => k -> v.length.toLong }
    val batch = operators.Analytics.eventsTransitionMatrix(spark, sf)
      .select("prev", "next", "n").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(stateful === batch)
    // a pair straddling the micro-batch boundary is still emitted
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = Streams.transitions(mem.toDS())
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      mem.addData((7L, 1000L, 1L, "view"), (7L, 2000L, 2L, "click"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM trans_out").as[Long].head() === 1)
      mem.addData((7L, 3000L, 3L, "purchase")) // pairs with batch-1's click
      q.processAllAvailable()
      val rows = spark.sql("SELECT prev, next FROM trans_out ORDER BY next")
        .as[(String, String)].collect().toSeq
      assert(rows === Seq(("view", "click"), ("click", "purchase")))
    } finally q.stop()
  }

  test("streaming conversion lag equals the batch window op, credit crosses batch bounds") {
    val src = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    val stateful = Streams.conversionLag(src).collect()
      .map(o => (o.user_id, o.event_id, o.lag_s, o.lag_bits)).toSet
    val batch = operators.Analytics.eventsConversionLag(spark, sf)
      .select("user_id", "event_id", "lag_s", "lag_bits")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(stateful === batch)
    // a purchase pairing with a view from the PREVIOUS micro-batch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = Streams.conversionLag(mem.toDS())
      .writeStream.format("memory").queryName("convlag_out")
      .outputMode("append").start()
    try {
      mem.addData((9L, 1000000000L, 1L, "view"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM convlag_out").as[Long].head() === 0)
      mem.addData((9L, 5000000000L, 2L, "purchase"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, lag_s, lag_bits FROM convlag_out")
        .as[(Long, Long, Long)].collect().toSeq
      assert(rows === Seq((9L, 4L, 2L)))
    } finally q.stop()
  }

  test("streaming schema drift converges to the batch monitor across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = DomainQueries.events(spark, sf)
      .select(expr("ts_ns div 86400000000000").as("day"),
        explode(expr("json_object_keys(props)")).as("k"))
      .select("k", "day").as[(String, Long)].collect()
    val (first, second) = src.splitAt(src.length / 2)
    val mem = MemoryStream[(String, Long)]
    val q = Streams.schemaDrift(mem.toDS())
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT k, first_day, last_day, n_days, n_events FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k
          |    ORDER BY n_events DESC) AS rn FROM drift_out) WHERE rn = 1""".stripMargin)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val batch = operators.Analytics.metaSchemaDrift(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming bottom-k sketch converges to the batch sample across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // same 52-bit hash + fixed-point value the batch operator computes
    val src = DomainQueries.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(conv(substring(md5(cast(concat('bk:', event_id) as binary)), 1, 13), 16, 10) as bigint)").as("h"),
        expr("cast(floor(value * 1024) as bigint)").as("v_fp"))
      .as[(String, Long, Long)].collect()
    val (first, second) = src.splitAt(src.length / 2)
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.bottomkSample(mem.toDS())
      .writeStream.format("memory").queryName("bk_out")
      .outputMode("append").start()
    try {
      mem.addData(first.toIndexedSeq); q.processAllAvailable()
      mem.addData(second.toIndexedSeq); q.processAllAvailable()
      // final emission per type (max n_seen) must equal the batch sketch
      val streamed = spark.sql(
        """SELECT event_type, n_sample, p50_fp, p95_fp FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
          |    ORDER BY n_seen DESC) AS rn FROM bk_out) WHERE rn = 1""".stripMargin)
        .as[(String, Long, Long, Long)].collect().toSet
      val batch = operators.Analytics.eventsBottomkSample(spark, sf)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming growth states + trailing churn reconcile with the batch accounting") {
    implicit val sqlCtx = spark.sqlContext
    val wk = 7L * 86400000000000L
    val pres = DomainQueries.events(spark, sf)
      .select(col("user_id"), expr(s"ts_ns div $wk").as("period"))
      .distinct().as[(Long, Long)].collect()
    // feed in period-ascending micro-batches (arrival order = event time)
    val byPeriod = pres.groupBy(_._2).toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, Long)]
    val q = Streams.growthStates(mem.toDS())
      .writeStream.format("memory").queryName("growth_out")
      .outputMode("append").start()
    try {
      byPeriod.foreach { case (_, cells) =>
        mem.addData(cells.toIndexedSeq); q.processAllAvailable()
      }
      val emitted = spark.table("growth_out")
        .as[Streams.GrowthOut].collect()
        .groupBy(o => (o.period, o.kind)).map { case (k, v) => k -> v.length.toLong }
      // the batch op charges ONE trailing churn per user at last+1,
      // clipped to the max active period; the stream leaves it pending
      val lastByUser = pres.groupBy(_._1).map { case (u, c) => u -> c.map(_._2).max }
      val maxact = pres.map(_._2).max
      val trailing = lastByUser.values.map(_ + 1).filter(_ <= maxact)
        .groupBy(identity).map { case (p, v) => (p, "churned") -> v.size.toLong }
      val got = (emitted.toSeq ++ trailing.toSeq)
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val batch = operators.Analytics.eventsGrowthAccounting(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .flatMap { case (p, nn, nr, ns, nc, _) =>
          Seq((p, "new") -> nn, (p, "retained") -> nr,
            (p, "resurrected") -> ns, (p, "churned") -> nc)
        }.filter(_._2 > 0).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming snapshot diff agrees with the batch diff across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // Same deterministic edit as the batch data_snapshot_diff demo: old =
    // documents; new = drop %13, edit %7, add negative mirrors of %11.
    val old = Tables.t(spark, sf, "documents")
    val nw = old.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(old.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", -col("doc_id") - 1))
      .select("doc_id", "text").as[(Long, String)].collect()
    // the new snapshot arrives split across TWO micro-batches
    val (first, second) = nw.splitAt(nw.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.diffAgainstIndex(
        mem.toDS().toDF("doc_id", "text"), old, "doc_id", "text")
      .writeStream.format("memory").queryName("snap_diff_out")
      .outputMode("append").start()
    try {
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      val afterFirst = spark.sql("SELECT COUNT(*) FROM snap_diff_out").as[Long].head()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM snap_diff_out")
        .as[(Long, String)].collect().toSet
      // both batches contributed (the edit pattern spreads across ids)
      assert(afterFirst > 0 && streamed.size > afterFirst.toInt)
      val batch = operators.Records.dataSnapshotDiff(spark, sf)
        .filter(col("change") =!= "removed")
        .as[(Long, String)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming LSH increment finds exactly the batch near-dup pairs across the split") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val indexed = docs.filter(col("doc_id") % 2 === 0)
    val arriving = docs.filter(col("doc_id") % 2 === 1)
      .as[(Long, String)].collect()
    val (first, second) = arriving.splitAt(arriving.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = Streams.lshIncrement(mem.toDS(), indexed)
      .writeStream.format("memory").queryName("lsh_inc_out")
      .outputMode("append").start()
    try {
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT new_id, idx_id FROM lsh_inc_out")
        .as[(Long, Long)].collect().toSet
        .map { p: (Long, Long) => (math.min(p._1, p._2), math.max(p._1, p._2)) }
      // the batch board query over the FULL corpus, restricted to pairs
      // that straddle the index/stream split (odd-even parity)
      val batch = operators.SketchQueries.dedupMinhashLsh(spark, sf)
        .select("doc1", "doc2").as[(Long, Long)].collect().toSet
        .filter { p: (Long, Long) => p._1 % 2 != p._2 % 2 }
      assert(streamed === batch)
      assert(streamed.nonEmpty) // planted fuzzy pairs cross the parity split
    } finally q.stop()
  }

  test("streaming throttle agrees with the batch rate-limit gate") {
    val ev = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"))
      .as[(Long, Long, Long)]
    val stateful = Streams.throttle(ev)
      .collect().map(o => (o.user_id, o.event_id, o.hour, o.ts_ns, o.rn)).toSet
    val batch = operators.Analytics.eventsThrottle(spark, sf)
      .select("user_id", "event_id", "hour", "ts_ns", "rn")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(stateful === batch)
  }

  test("streaming throttle enforces the cap across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streams.throttle(mem.toDS())
      .writeStream.format("memory").queryName("throttle_out")
      .outputMode("append").start()
    try {
      mem.addData((7L, 1000L, 1L), (7L, 2000L, 2L))
      q.processAllAvailable() // 2 kept, budget 1 left for this hour
      mem.addData((7L, 3000L, 3L), (7L, 4000L, 4L)) // SAME hour, later batch
      q.processAllAvailable() // only one more may pass
      val kept = spark.sql("SELECT event_id FROM throttle_out")
        .as[Long].collect().toSet
      assert(kept === Set(1L, 2L, 3L))
      // advance to the next hour, then replay a LATE hour-0 event: it must
      // drop (charging it to hour 1 would exceed hour 0's closed cap and
      // duplicate a (user, hour, rn) tuple)
      mem.addData((7L, 3600000000000L + 1L, 5L))
      q.processAllAvailable()
      mem.addData((7L, 5000L, 6L)) // late: hour 0 after hour 1 opened
      q.processAllAvailable()
      val after = spark.sql("SELECT event_id FROM throttle_out")
        .as[Long].collect().toSet
      assert(after === Set(1L, 2L, 3L, 5L))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeated ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val input = mem.toDF().toDF("doc_id", "ts_ns")
    val q = Streams.dedupeWithinWatermark(input, Seq("doc_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      val m = 60L * 1000 * 1000 * 1000
      mem.addData((1L, 1 * m), (1L, 2 * m), (2L, 3 * m))
      q.processAllAvailable()
      mem.addData((1L, 4 * m), (3L, 5 * m)) // 1 is still within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped from finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val input = mem.toDF().toDF("ts_ns", "event_type", "value")
    val q = Streams.tumblingCounts(input, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000 * 1000 * 1000
      mem.addData((1 * h + 5, "click", 1.0))
      q.processAllAvailable()
      // advance event time far enough to finalize window [1h, 2h)
      mem.addData((5 * h, "click", 1.0))
      q.processAllAvailable()
      // this event is 3+ hours behind the watermark → must be ignored
      mem.addData((1 * h + 99, "click", 100.0))
      q.processAllAvailable()
      mem.addData((9 * h, "click", 1.0)) // finalize remaining windows
      q.processAllAvailable()
      val w1 = spark.table("late_test")
        .where(col("window.start").cast("long") === 3600L)
        .select("n", "sum_value").as[(Long, Double)].collect()
      assert(w1.toSeq === Seq((1L, 1.0))) // late (100.0) event not counted
    } finally q.stop()
  }

  test("stream-static enrichment joins a dim table onto a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val input = mem.toDF().toDF("user_key", "amount")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_key", "tier")
    val q = input.join(dim, Seq("user_key"), "left_outer")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select(col("user_key"), col("tier")).as[(Long, Option[String])].collect().toSet
      assert(got === Set((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val input = mem.toDF().toDF("user_id", "event_type", "ts_ns")
    val m = 60L * 1000 * 1000 * 1000
    val q = Streams.correlate(input, "click", "purchase", 30 * m)
      .writeStream.format("memory").queryName("corr_test")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "click", 10 * m), (1L, "purchase", 20 * m),   // within 30 min ✓
        (2L, "click", 10 * m), (2L, "purchase", 50 * m),   // 40 min → out
        (3L, "purchase", 5 * m), (3L, "click", 10 * m),    // purchase before click → out
        (1L, "purchase", 600 * m))                         // advance watermarks
      q.processAllAvailable()
      val got = spark.table("corr_test")
        .select("user_id", "lag_ns").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 10 * m)))
      // Bounded state: the interval bounds sit on the event-time columns,
      // so Spark must derive a state-eviction watermark predicate for BOTH
      // join sides (a left click is dropped once the right watermark passes
      // a_ts + interval; a right purchase once the left watermark passes
      // b_ts). Without the watermark-visible upper bound the left predicate
      // is None and click state grows without bound.
      val exec = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val joins = exec.collect {
        case j: org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec => j
      }
      assert(joins.nonEmpty, "expected a StreamingSymmetricHashJoinExec in the plan")
      assert(joins.head.stateWatermarkPredicates.left.isDefined,
        "left join side has no state-eviction predicate — click state is unbounded")
      assert(joins.head.stateWatermarkPredicates.right.isDefined,
        "right join side has no state-eviction predicate — purchase state is unbounded")
    } finally q.stop()
  }

  test("streaming tumbling counts equal batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val input = mem.toDF().toDF("ts_ns", "event_type", "value")
    val q = Streams.tumblingCounts(input)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      val hourNs = 3600L * 1000 * 1000 * 1000
      mem.addData(
        (1 * hourNs + 5, "click", 1.0), (1 * hourNs + 99, "click", 2.0),
        (1 * hourNs + 100, "view", 3.0), (2 * hourNs + 1, "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .select(col("window.start").cast("long").as("w"), col("event_type"), col("n"), col("sum_value"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got === Set(
        (3600L, "click", 2L, 3.0), (3600L, "view", 1L, 3.0), (7200L, "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming file ingest forks success and dead-letter sinks exactly once") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_ingest").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    Files.writeString(java.nio.file.Paths.get(s"$in/a.jsonl"),
      """{"occ_id": 1, "uncert": 2.0}
        |garbage line
        |{"occ_id": 2, "uncert": 4.0}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("occ_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("uncert", org.apache.spark.sql.types.DoubleType)))
    val q = Streams.ingestWithDeadLetters(spark, in, schema,
      s"$root/ok", s"$root/dead", s"$root/ckpt")
    q.awaitTermination(60000) // AvailableNow terminates when drained
    assert(spark.read.parquet(s"$root/ok").select("occ_id").as[Long].collect().toSet
      === Set(1L, 2L))
    assert(spark.read.parquet(s"$root/dead").select("_corrupt_record")
      .as[String].collect().toSeq === Seq("garbage line"))
    // restart with the same checkpoint: nothing re-ingested (exactly-once)
    val q2 = Streams.ingestWithDeadLetters(spark, in, schema,
      s"$root/ok", s"$root/dead", s"$root/ckpt")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/ok").count() === 2)
    // replay WITHOUT the checkpoint: the same files re-run under the same
    // batch ids, and the batch_id-keyed dynamic-partition overwrite makes
    // the re-delivery idempotent — still no duplicates (the at-least-once
    // foreachBatch hazard the sinks are hardened against).
    val q3 = Streams.ingestWithDeadLetters(spark, in, schema,
      s"$root/ok", s"$root/dead", s"$root/ckpt2")
    q3.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/ok").count() === 2)
    assert(spark.read.parquet(s"$root/dead").count() === 1)
  }

  test("streaming cdc apply equals the batch survivors, deletes tombstone across batches") {
    // whole-corpus agreement with the batch operator
    val src = operators.DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
    val live = Streams.cdcApply(src).collect().filterNot(_.deleted)
      .map(o => o.ukey -> ((o.last_type, o.last_val, o.last_ts_ns, o.n_changes))).toMap
    val batch = operators.Records.cdcApply(spark, sf)
      .as[(Long, String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(live === batch)
    // cross-batch: an upsert then a later delete tombstones the key;
    // a stale replay in batch 3 must NOT resurrect it
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val q = Streams.cdcApply(mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    try {
      mem.addData((7L, 1000L, 1L, "view", 1.0), (8L, 1000L, 2L, "view", 2.0))
      q.processAllAvailable()
      mem.addData((7L, 2000L, 3L, "error", 0.0))
      q.processAllAvailable()
      mem.addData((7L, 1500L, 4L, "click", 5.0)) // stale: older than the delete
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT ukey, last_type, deleted, n_changes FROM (" +
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY ukey ORDER BY n_changes DESC) rn" +
        "  FROM cdc_out) WHERE rn = 1")
        .as[(Long, String, Boolean, Long)].collect().map(r => r._1 -> r).toMap
      assert(last(7L) === ((7L, "error", true, 3L)))
      assert(last(8L) === ((8L, "view", false, 1L)))
    } finally q.stop()
  }

  test("streaming arrival accumulators fold to the batch regularity rows") {
    val src = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .as[(Long, String, Long, Long)]
    val folded = Streams.arrivalAccumulators(src).collect()
      .groupBy(_.event_type).collect { case (t, rs) if rs.exists(_.n_gaps > 0) =>
        val (n, sg, sg2) = (rs.map(_.n_gaps).sum, rs.map(_.sg).sum, rs.map(_.sg2).sum)
        val disp = if (sg / n > 0) Some((sg2 / n) * 1000 / ((sg / n) * (sg / n))) else None
        t -> ((n, sg / n, disp))
      }
    val batch = operators.Analytics.eventsArrivalRegularity(spark, sf)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(folded === batch)
    // a gap straddling the micro-batch boundary still accumulates
    implicit val sqlCtx = spark.sqlContext
    val M = 60000000000L
    val mem = MemoryStream[(Long, String, Long, Long)]
    val q = Streams.arrivalAccumulators(mem.toDS())
      .writeStream.format("memory").queryName("reg_out")
      .outputMode("append").start()
    try {
      mem.addData((9L, "view", 0L, 1L))
      q.processAllAvailable()
      mem.addData((9L, "view", 5 * M, 2L)) // pairs with batch-1's event
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT n_gaps, sg, sg2 FROM reg_out ORDER BY n_gaps DESC LIMIT 1")
        .as[(Long, Long, Long)].head()
      assert(last === ((1L, 5L, 25L)))
    } finally q.stop()
  }

  test("streaming watermark lag equals a per-type arrival fold, lateness crosses batch bounds") {
    // whole-corpus agreement: fold the shared etime derivation per type
    // in arrival (event_id) order — the twin is per-type scoped, so the
    // expected values come from the same fold, not the global batch op
    val src = operators.Analytics.watermarkEventTimes(spark, sf)
      .select(col("event_type"), col("event_id"), col("etime_ns"))
      .as[(String, Long, Long)]
    val stateful = Streams.watermarkLag(src).collect()
      .groupBy(_.event_type).view
      .mapValues(rs => rs.maxBy(_.n_events))
      .mapValues(o => (o.n_events, o.n_late, o.max_lag_s, o.sum_lag_s)).toMap
    val expected = src.collect().groupBy(_._1).view.mapValues { rows =>
      var maxEt = Long.MinValue
      var (n, late, maxLag, sumLag) = (0L, 0L, 0L, 0L)
      for ((_, _, et) <- rows.sortBy(_._2)) {
        n += 1
        if (maxEt != Long.MinValue && et < maxEt) {
          val lag = (maxEt - et) / 1000000000L
          late += 1; maxLag = math.max(maxLag, lag); sumLag += lag
        } else maxEt = math.max(maxEt, et)
      }
      (n, late, maxLag, sumLag)
    }.toMap
    assert(stateful === expected)
    assert(expected.values.exists(_._2 > 0)) // the corpus HAS late events
    // an event late relative to a PREVIOUS micro-batch's high-water mark
    implicit val sqlCtx = spark.sqlContext
    val G = 1000000000L
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.watermarkLag(mem.toDS())
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 1L, 100 * G), ("a", 2L, 50 * G)) // seq-2 late by 50s
      q.processAllAvailable()
      mem.addData(("a", 3L, 30 * G)) // late by 70s vs batch-1's max
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT n_events, n_late, max_lag_s, sum_lag_s FROM wm_out " +
          "ORDER BY n_events DESC LIMIT 1").as[(Long, Long, Long, Long)].head()
      assert(last === ((3L, 2L, 70L, 120L)))
    } finally q.stop()
  }

  test("streaming ewma equals the batch forecaster, history carries across batches") {
    // whole-corpus agreement with the batch operator
    val hours = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val stateful = Streams.ewma(hours).collect()
      .map(o => (o.event_type, o.hour_id) ->
        (o.c, o.forecast_num, o.resid_num, o.flag)).toMap
    val batch = operators.Analytics.eventsEwmaResidual(spark, sf)
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(stateful === batch)
    assert(batch.nonEmpty)
    // an hour in batch 2 must see batch 1's hours in its forecast window
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.ewma(mem.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      mem.addData((0L to 8L).map(h => ("a", h, 10L)): _*)
      q.processAllAvailable()
      // hour 8 forecast = 10 * (2^0+...+2^7) = 2550, resid = 10*255-2550 = 0
      val r8 = spark.sql("SELECT forecast_num, flag FROM ewma_out WHERE hour_id = 8")
        .as[(Long, String)].head()
      assert(r8 === ((2550L, "ok")))
      mem.addData(("a", 9L, 100L)) // spike: history lives in carried state
      q.processAllAvailable()
      val r9 = spark.sql("SELECT forecast_num, flag FROM ewma_out WHERE hour_id = 9")
        .as[(Long, String)].head()
      assert(r9 === ((2550L, "high")))
    } finally q.stop()
  }

  test("streaming holt trend equals the batch forecaster, ramp forecast is exact across batches") {
    // whole-corpus agreement with the batch operator
    val hours = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val stateful = Streams.holtTrend(hours).collect()
      .map(o => (o.event_type, o.hour_id) ->
        (o.c, o.level_num, o.trend_num, o.forecast_num, o.resid_num, o.flag))
      .toMap
    val batch = operators.Analytics.eventsHoltTrend(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7, r._8)).toMap
    assert(stateful === batch)
    assert(batch.nonEmpty)
    // a linear ramp forecasts EXACTLY (the Holt-beats-EWMA property),
    // and batch 2's hour must see batch 1's window in carried state
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.holtTrend(mem.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      mem.addData((0L to 8L).map(h => ("a", h, (h + 1) * 10L)): _*)
      q.processAllAvailable()
      // hour 8 window = 10..80: level 80*4096, trend 10*4096, resid 0
      val r8 = spark.sql(
        "SELECT level_num, trend_num, resid_num, flag FROM holt_out WHERE hour_id = 8")
        .as[(Long, Long, Long, String)].head()
      assert(r8 === ((327680L, 40960L, 0L, "rising")))
      mem.addData(("a", 9L, 100L)) // ramp continues: history lives in state
      q.processAllAvailable()
      val r9 = spark.sql(
        "SELECT forecast_num, resid_num, flag FROM holt_out WHERE hour_id = 9")
        .as[(Long, Long, String)].head()
      assert(r9 === ((409600L, 0L, "rising")))
    } finally q.stop()
  }

  test("streaming forecast backtest equals the batch MAEs, residuals accrue across batches") {
    // whole-corpus agreement with the batch operator
    val hours = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val stateful = Streams.forecastBacktest(hours).collect()
      .map(o => o.event_type -> (o.n_hours, o.mae_naive_milli,
        o.mae_ewma_milli, o.mae_holt_milli, o.winner)).toMap
    val batch = operators.Analytics.eventsForecastBacktest(spark, sf)
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(stateful === batch)
    assert(batch.nonEmpty)
    // a residual straddling the micro-batch boundary uses carried state:
    // constant 10s for hours 0..24, then a spike at 25 in batch 2
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.forecastBacktest(mem.toDS())
      .writeStream.format("memory").queryName("bt_out")
      .outputMode("append").start()
    try {
      mem.addData((0L to 24L).map(h => ("a", h, 10L)): _*)
      q.processAllAvailable()
      // hour 24 is the only scored hour: every model forecasts 10 exactly
      val r1 = spark.sql("SELECT n_hours, mae_naive_milli, mae_ewma_milli," +
        " mae_holt_milli, winner FROM bt_out")
        .as[(Long, Long, Long, Long, String)].collect().toSeq
      assert(r1 === Seq((1L, 0L, 0L, 0L, "naive24")))
      mem.addData(("a", 25L, 110L)) // spike of +100 over every forecast
      q.processAllAvailable()
      val r2 = spark.sql("SELECT n_hours, mae_naive_milli, mae_ewma_milli," +
        " mae_holt_milli FROM bt_out WHERE n_hours = 2")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // each model still forecast 10 for hour 25: |110-10|*1000/2 = 50000
      assert(r2 === Seq((2L, 50000L, 50000L, 50000L)))
    } finally q.stop()
    // micro-batch split landing EXACTLY on the warm-up fence: batch 1 =
    // hours 0..23 (zero scored hours, zero emissions), batch 2 opens at
    // hour h0+24 — the first scored hour — whose 24-deep window lives
    // entirely in carried state (r9 verdict boundary case)
    val mem2 = MemoryStream[(String, Long, Long)]
    val q2 = Streams.forecastBacktest(mem2.toDS())
      .writeStream.format("memory").queryName("bt_fence")
      .outputMode("append").start()
    try {
      mem2.addData((0L to 23L).map(h => ("b", h, (h + 1) * 2L)): _*)
      q2.processAllAvailable()
      assert(spark.sql("SELECT * FROM bt_fence").count() === 0L)
      mem2.addData(("b", 24L, 50L)) // ramp continues: 2,4,..,48 then 50
      q2.processAllAvailable()
      val rf = spark.sql("SELECT n_hours, mae_naive_milli, mae_ewma_milli," +
        " mae_holt_milli, winner FROM bt_fence")
        .as[(Long, Long, Long, Long, String)].collect().toSeq
      // naive24 forecasts cc(0)=2 → |50-2|*1000 = 48000; Holt on the
      // exact linear ramp forecasts 50 exactly → 0; EWMA of the last 8
      // ramp cells (34..48, weights 2^7..2^0 /255) underestimates:
      // fe = Σ cc(24−i)·2^(8−i) = 11746, |50·255 − 11746|·1000/255 = 3937
      assert(rf === Seq((1L, 48000L, 3937L, 0L, "holt")))
    } finally q2.stop()
  }

  test("streaming diurnal dft equals the batch harmonics, counters accumulate across batches") {
    // whole-corpus agreement with the batch operator
    val hours = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val stateful = Streams.diurnalDft(hours).collect()
      .map(o => (o.event_type, o.k) ->
        (o.re_norm, o.im_norm, o.power_num, o.power_ppm, o.is_dominant))
      .toMap
    val batch = operators.Analytics.eventsDiurnalDft(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6, r._7)).toMap
    assert(stateful === batch)
    assert(batch.nonEmpty)
    // counters carry across batches: a 12h-period signal only emerges
    // once batch 2's bucket lands
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.diurnalDft(mem.toDS())
      .writeStream.format("memory").queryName("dft_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 10L)) // all mass in bucket 0
      q.processAllAvailable()
      val r1 = spark.sql("SELECT k, re_norm, im_norm FROM dft_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(r1 === Set((1L, 1024000L, 0L), (2L, 1024000L, 0L),
        (3L, 1024000L, 0L)))
      mem.addData(("a", 36L, 10L)) // hour 36 -> bucket 12: 12h period
      q.processAllAvailable()
      // full multiset: batch 1's three tied-dominant rows plus batch 2's
      // refreshed rows where ONLY the 12h harmonic survives
      val r2 = spark.sql(
        "SELECT k, re_norm, power_num, is_dominant FROM dft_out")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(r => (r._1, r._2))
      assert(r2.toSeq === Seq(
        (1L, 0L, 0L, false), (1L, 1024000L, 1048576000000L, true),
        (2L, 1024000L, 1048576000000L, true),
        (2L, 1024000L, 1048576000000L, true),
        (3L, 0L, 0L, false), (3L, 1024000L, 1048576000000L, true)))
    } finally q.stop()
  }

  test("streaming rolling median equals the batch operator, window carries across batches") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val stateful = Streams.rollingMedian(days).collect()
      .map(o => (o.event_type, o.day_id) -> (o.c, o.n_days_window, o.med7))
      .toMap
    val batch = operators.Analytics.eventsRollingMedian(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(stateful === batch)
    assert(batch.nonEmpty)
    // a day in batch 2 must see batch 1's days in its median window
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.rollingMedian(mem.toDS())
      .writeStream.format("memory").queryName("med_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 5L), ("a", 1L, 9L), ("a", 2L, 1L))
      q.processAllAvailable()
      // day 2 window = [1, 5, 9] → lower median 5
      val r2 = spark.sql("SELECT n_days_window, med7 FROM med_out WHERE day_id = 2")
        .as[(Long, Long)].head()
      assert(r2 === ((3L, 5L)))
      mem.addData(("a", 3L, 7L)) // history lives in carried state
      q.processAllAvailable()
      // day 3 window = [1, 5, 7, 9] → lower median (pos 2) = 5
      val r3 = spark.sql("SELECT n_days_window, med7 FROM med_out WHERE day_id = 3")
        .as[(Long, Long)].head()
      assert(r3 === ((4L, 5L)))
    } finally q.stop()
  }

  test("streaming trimmed mean: sample is merge-invariant and matches the Spark-md5 batch sample") {
    // the java-side 'tm:' md5 must be byte-identical to Spark's expr —
    // build the expected bottom-64 sample with SPARK md5 and compare
    val ev = DomainQueries.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        expr("cast(floor(value * 1000) as bigint)").as("vm"))
    val expected = ev
      .withColumn("h", expr("cast(conv(substring(md5(cast(concat('tm:', " +
        "event_id) as binary)), 1, 13), 16, 10) as bigint)"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (tpe, rows) =>
        val vs = rows.map(r => (r._4, r._3)).sorted.take(64).map(_._2).sorted
        val kept = vs.slice(vs.length / 20, vs.length - vs.length / 20)
        tpe -> ((rows.length.toLong, vs.length.toLong, kept.sum / kept.length))
      }
    val whole = Streams.trimmedMean(ev.as[(String, Long, Long)]).collect()
      .map(o => o.event_type -> ((o.n_seen, o.n_sample, o.trimmed_mean_est_milli)))
      .toMap
    assert(whole === expected)
    assert(whole.nonEmpty)
    // merge-invariance: two micro-batches end at the same sample as one
    implicit val sqlCtx = spark.sqlContext
    val all = ev.as[(String, Long, Long)].collect().sortBy(_._2)
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.trimmedMean(mem.toDS())
      .writeStream.format("memory").queryName("tm_out")
      .outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val last = spark.sql(
        "SELECT event_type, n_sample, trimmed_mean_est_milli FROM tm_out t " +
          "WHERE n_seen = (SELECT max(n_seen) FROM tm_out u " +
          "                WHERE u.event_type = t.event_type)")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(last === expected.map { case (t, (_, m, tm)) => t -> ((m, tm)) })
    } finally q.stop()
  }

  test("streaming silence-streaks carries O(1) state and converges to the batch operator") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .distinct().as[(String, Long)]
    val batch = operators.Analytics.eventsSilenceStreaks(spark, sf)
      .as[(String, Long, Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val whole = Streams.silenceStreaks(days).collect()
      .map(o => o.event_type -> ((o.n_days, o.span_days, o.n_silent_runs,
        o.max_gap_days, o.last_gap_end_day, o.coverage_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream INSIDE a gap so the previous-day state crosses the
    // boundary: days 0,1,5,6,9 → gaps of 3 (ending day 4) and 2 (ending 8)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Streams.silenceStreaks(mem.toDS())
      .writeStream.format("memory").queryName("sil_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L), ("a", 1L)); q.processAllAvailable()
      mem.addData(("a", 5L), ("a", 6L), ("a", 9L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_days, span_days, n_silent_runs, " +
        "max_gap_days, last_gap_end_day, coverage_milli FROM sil_out " +
        "ORDER BY n_days")
        .as[(Long, Long, Long, Long, Option[Long], Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 2L, 0L, 0L, None, 1000L)))
      assert(rows.last === ((5L, 10L, 2L, 3L, Some(8L), 500L)))
    } finally q.stop()
  }

  test("streaming record-days carries O(1) state and converges to the batch operator") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsRecordDays(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val whole = Streams.recordDays(days).collect()
      .map(o => o.event_type -> ((o.n_days, o.n_records, o.last_record_day,
        o.exp_records_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream: the state (run max + counters) must survive the
    // boundary — planted series sets records at days 0,1,3 only
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.recordDays(mem.toDS())
      .writeStream.format("memory").queryName("rd_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 5L), ("a", 1L, 7L)); q.processAllAvailable()
      mem.addData(("a", 2L, 6L), ("a", 3L, 9L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_days, n_records, last_record_day, " +
        "exp_records_milli FROM rd_out ORDER BY n_days")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 2L, 1L, 1500L)))
      // harmonic lattice: 1000 + 500 + 333 + 250 = 2083
      assert(rows.last === ((4L, 3L, 3L, 2083L)))
    } finally q.stop()
  }

  test("streaming flap-rate carries O(1) state and converges to the batch operator") {
    val ev = DomainQueries.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("st"))
      .as[(Long, Long, Long, Long)]
    val batch = operators.Analytics.eventsFlapRate(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val whole = Streams.flapRate(ev).collect()
      .map(o => o.user_id -> ((o.n_events, o.n_err, o.n_flips,
        o.flap_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream on a flip boundary: 0,1 | 1,0 → flips at events
    // 2 and 4 (state crosses the batch boundary), 2 flips / 3 moves
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = Streams.flapRate(mem.toDS())
      .writeStream.format("memory").queryName("flap_out")
      .outputMode("append").start()
    try {
      mem.addData((7L, 0L, 0L, 0L), (7L, 1L, 1L, 1L)); q.processAllAvailable()
      mem.addData((7L, 2L, 2L, 1L), (7L, 3L, 3L, 0L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_events, n_err, n_flips, flap_milli " +
        "FROM flap_out ORDER BY n_events")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 1L, 1L, 1000L)))
      assert(rows.last === ((4L, 2L, 2L, 666L)))
    } finally q.stop()
  }

  test("streaming LOCF gap-fill emits the batch calendar exactly") {
    val obs = DomainQueries.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("hour"),
        expr("cast(floor(value * 1000) as bigint)").as("v_milli"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n_events"), sum("v_milli").as("value_milli"))
      .as[(String, Long, Long, Long)]
    val batch = operators.Analytics.eventsGapFillLocf(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val whole = Streams.gapFillLocf(obs).collect()
      .map(o => (o.event_type, o.hour, o.n_events, o.value_milli_locf,
        o.is_filled)).toSet
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split INSIDE a gap: observed hours 0, 3 | 5 — the LOCF value and
    // last-hour state must cross the boundary to fill hour 4
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Long)]
    val q = Streams.gapFillLocf(mem.toDS())
      .writeStream.format("memory").queryName("locf_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 2L, 10L), ("a", 3L, 1L, 30L))
      q.processAllAvailable()
      mem.addData(("a", 5L, 1L, 50L)); q.processAllAvailable()
      val rows = spark.sql("SELECT hour, n_events, value_milli_locf, " +
        "is_filled FROM locf_out ORDER BY hour")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows === Seq((0L, 2L, 10L, 0L), (1L, 0L, 10L, 1L),
        (2L, 0L, 10L, 1L), (3L, 1L, 30L, 0L), (4L, 0L, 30L, 1L),
        (5L, 1L, 50L, 0L)))
    } finally q.stop()
  }

  test("streaming burstiness carries O(1) counters and converges to the batch operator") {
    val hrs = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("hour_id"))
      .groupBy("event_type", "hour_id").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsBurstiness(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val whole = Streams.burstiness(hrs).collect()
      .map(o => o.event_type -> ((o.n_hours, o.n_events, o.peak,
        o.mean_milli, o.peak_to_mean_milli, o.fano_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream: counters (incl. the running peak) must survive
    // the boundary — hours with counts 2, 6 | 4: peak 6, mean 4
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.burstiness(mem.toDS())
      .writeStream.format("memory").queryName("burst_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 2L), ("a", 1L, 6L)); q.processAllAvailable()
      mem.addData(("a", 2L, 4L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_hours, n_events, peak, mean_milli, " +
        "peak_to_mean_milli, fano_milli FROM burst_out ORDER BY n_hours")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      // 2 hours: n=8, peak 6, mean 4000m, p2m 6*2*1000/8=1500, fano:
      // (sumsq/2 - 4*4)*1000/4 = (20-16)*250 = 1000
      assert(rows.head === ((2L, 8L, 6L, 4000L, 1500L, 1000L)))
      // 3 hours: n=12, peak 6, mean 4000m, p2m 6*3*1000/12=1500, fano:
      // (56/3 - 16)*1000/4 = (18-16)*250 = 500
      assert(rows.last === ((3L, 12L, 6L, 4000L, 1500L, 500L)))
    } finally q.stop()
  }

  test("streaming error budget carries O(1) cumulative state and equals the batch sheet") {
    val hrs = DomainQueries.events(spark, sf)
      .select(expr("ts_ns div 3600000000000").as("hour_id"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("err"))
      .groupBy("hour_id")
      .agg(count(lit(1)).as("n_total"), sum("err").as("n_err"))
      .select(col("hour_id"), col("n_total"), col("n_err"))
      .as[(Long, Long, Long)]
    val batch = operators.Analytics.eventsErrorBudget(spark, sf)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val whole = Streams.errorBudget(hrs).collect()
      .map(o => o.hour_id -> ((o.n_total, o.n_err, o.burn_milli,
        o.cum_burn_milli, o.over_budget))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream: the cumulative burn must carry the boundary
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streams.errorBudget(mem.toDS())
      .writeStream.format("memory").queryName("budget_out")
      .outputMode("append").start()
    try {
      mem.addData((0L, 10L, 1L), (1L, 10L, 5L)); q.processAllAvailable()
      mem.addData((2L, 10L, 0L)); q.processAllAvailable()
      val rows = spark.sql("SELECT hour_id, burn_milli, cum_burn_milli, " +
        "over_budget FROM budget_out ORDER BY hour_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      assert(rows === Seq((0L, 100L, 100L, false), (1L, 500L, 300L, true),
        (2L, 0L, 200L, false)))
    } finally q.stop()
  }

  test("streaming incident runs emit on close and match the batch islands after a flush") {
    val hrs = DomainQueries.events(spark, sf)
      .select(expr("ts_ns div 3600000000000").as("hour_id"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("err"))
      .groupBy("hour_id")
      .agg(count(lit(1)).as("n_total"), sum("err").as("n_err"))
      .select(col("hour_id"), col("n_total"), col("n_err"))
      .as[(Long, Long, Long)]
    val maxHour = hrs.agg(max("hour_id")).as[Long].collect().head
    // sentinel healthy hour flushes a corpus-final open incident
    val flushed = hrs.union(Seq((maxHour + 2, 1000L, 0L)).toDS())
    val batch = operators.Analytics.eventsIncidentRuns(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val got = Streams.incidentRuns(flushed).collect()
      .map(o => (o.run_start_hour, o.n_hours, o.total_errs)).toSet
    assert(got === batch)
    assert(batch.nonEmpty)
    // split mid-incident: the run-length state must cross the boundary;
    // SLO_MILLI = 200, so err 3/10 breaches and 1/10 heals
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = Streams.incidentRuns(mem.toDS())
      .writeStream.format("memory").queryName("runs_out")
      .outputMode("append").start()
    try {
      mem.addData((0L, 10L, 3L), (1L, 10L, 4L)); q.processAllAvailable()
      mem.addData((2L, 10L, 3L), (3L, 10L, 1L), (5L, 10L, 3L))
      q.processAllAvailable()
      mem.addData((7L, 10L, 1L)); q.processAllAvailable()
      val rows = spark.sql("SELECT run_start_hour, n_hours, total_errs " +
        "FROM runs_out ORDER BY run_start_hour")
        .as[(Long, Long, Long)].collect().toSeq
      // hours 0-2 one incident (closed by healthy hour 3), hour 5 its
      // own (closed by the GAP to hour 7)
      assert(rows === Seq((0L, 3L, 10L), (5L, 1L, 3L)))
    } finally q.stop()
  }

  test("streaming peak-to-mean carries O(1) state and reproduces the batch min-hour tie-break") {
    val hrs = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("hour_id"))
      .groupBy("event_type", "hour_id").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsPeakToMean(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val whole = Streams.peakToMean(hrs).collect()
      .map(o => o.event_type -> ((o.n_hours, o.peak, o.peak_hour,
        o.mean_hourly, o.peak_to_mean_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream + a TIE on the peak: the first hour must win
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.peakToMean(mem.toDS())
      .writeStream.format("memory").queryName("p2m_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 2L), ("a", 1L, 6L)); q.processAllAvailable()
      mem.addData(("a", 2L, 6L), ("a", 3L, 2L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_hours, peak, peak_hour, mean_hourly, " +
        "peak_to_mean_milli FROM p2m_out ORDER BY n_hours")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 6L, 1L, 4L, 1500L)))
      // hour 2 ties the peak across the batch boundary: hour 1 keeps it
      assert(rows.last === ((4L, 6L, 1L, 4L, 1500L)))
    } finally q.stop()
  }

  test("streaming runs-test carries O(1) state and converges to the batch operator") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsRunsTest(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val whole = Streams.runsTest(days).collect()
      .map(o => o.event_type -> ((o.n_up, o.n_down, o.n_runs, o.n_moves,
        o.exp_runs_milli, o.verdict_sign))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream ON a tie so the dropped-tie + previous-sign state
    // crosses the boundary: series 1,3,3,2,4 → signs +,(tie),-,+ = 3 runs
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.runsTest(mem.toDS())
      .writeStream.format("memory").queryName("rt_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 3L))
      q.processAllAvailable()
      mem.addData(("a", 3L, 2L), ("a", 4L, 4L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_up, n_down, n_runs, n_moves, " +
        "exp_runs_milli, verdict_sign FROM rt_out ORDER BY n_moves")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((1L, 0L, 1L, 1L, 1000L, 0L)))
      // n⁺=2 n⁻=1: E[R]·milli = 1000 + 2000·2·1/3 = 2333; R=3, sign(9−7)=+1
      assert(rows.last === ((2L, 1L, 3L, 3L, 2333L, 1L)))
    } finally q.stop()
  }

  test("streaming mann-kendall converges to the batch trend test across batches") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsTrendMannKendall(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // single batch = whole calendar: one emission per type == batch op
    val whole = Streams.mannKendall(days).collect()
      .map(o => o.event_type -> ((o.n_days, o.s_stat, o.n_pairs,
        o.trend_sign, o.abs_tau_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // incremental: planted strictly-increasing series split mid-stream;
    // the final emission must read a perfect positive trend (tau = 1000)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.mannKendall(mem.toDS())
      .writeStream.format("memory").queryName("mk_out")
      .outputMode("append").start()
    try {
      mem.addData((0L to 3L).map(d => ("a", d, d + 1L)): _*)
      q.processAllAvailable()
      mem.addData((4L to 7L).map(d => ("a", d, d + 1L)): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT n_days, s_stat, n_pairs, trend_sign, " +
        "abs_tau_milli FROM mk_out ORDER BY n_days")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2) // one emission per micro-batch
      assert(rows.head === ((4L, 6L, 6L, 1L, 1000L)))
      assert(rows.last === ((8L, 28L, 28L, 1L, 1000L)))
    } finally q.stop()
  }

  test("streaming changepoint converges to the batch binseg split across batches") {
    val hours = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("h"))
      .groupBy("event_type", "h").agg(count(lit(1)).as("x"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsChangepoint(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // single batch = whole series: one emission per type, equal to batch op
    val whole = Streams.changepoint(hours).collect()
      .map(o => o.event_type -> ((o.n_hours, o.split_i, o.split_hour,
        o.gain_fp, o.mean_left_milli, o.mean_right_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // incremental: batch-2 hours see batch-1 history; final answer converges
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.changepoint(mem.toDS())
      .writeStream.format("memory").queryName("cp_out")
      .outputMode("append").start()
    try {
      // planted level shift at hour 4: [2,2,2,2 | 10,10,10,10]
      mem.addData((0L to 3L).map(h => ("a", h, 2L)): _*)
      q.processAllAvailable()
      mem.addData((4L to 7L).map(h => ("a", h, 10L)): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT n_hours, split_i, split_hour, " +
        "mean_left_milli, mean_right_milli FROM cp_out ORDER BY n_hours")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2) // one emission per micro-batch
      // after the full series the split sits at i=4 (hour_id 3):
      // means 2000 vs 10000 milli
      assert(rows.last === ((8L, 4L, 3L, 2000L, 10000L)))
    } finally q.stop()
  }

  test("streaming queue wait carries the Lindley running-min across batches in O(1) state") {
    val ev = DomainQueries.events(spark, sf)
      .select(col("event_type"), col("ts_ns"), col("event_id"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsQueueWait(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // single batch = whole series: the one emission per type equals the
    // batch operator's row exactly
    val whole = Streams.queueWait(ev).collect()
      .map(o => o.event_type ->
        ((o.n_arrivals, o.n_waited, o.max_wait_ms, o.mean_wait_ms))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream (per-key ascending order preserved): the LAST
    // emission per type converges to the same row — the running min and
    // arrival index must survive the boundary
    implicit val sqlCtx = spark.sqlContext
    val all = ev.collect().sortBy(e => (e._2, e._3))
    val (b1, b2) = all.splitAt(all.length / 3)
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.queueWait(mem.toDS())
      .writeStream.format("memory").queryName("qw_out")
      .outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val last = spark.sql(
        "SELECT event_type, n_waited, max_wait_ms, mean_wait_ms " +
          "FROM qw_out t WHERE n_arrivals = (SELECT max(n_arrivals) " +
          "FROM qw_out u WHERE u.event_type = t.event_type)")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(last === batch.map { case (t, (_, nw, mx, mn)) => t -> ((nw, mx, mn)) })
    } finally q.stop()
  }

  test("streaming sax motifs re-rank to the batch histogram after a late batch") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsSaxMotifs(spark, sf)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // single batch = whole series
    val whole = Streams.saxMotifs(days).collect()
      .map(o => (o.event_type, o.motif) -> o.n_windows).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-calendar: the second batch's days re-rank the first
    // batch's symbols (a rank-based breakpoint is a whole-series
    // property); the max-n_days emission per type must equal batch
    implicit val sqlCtx = spark.sqlContext
    val all = days.collect().sortBy(_._2)
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.saxMotifs(mem.toDS())
      .writeStream.format("memory").queryName("sax_out")
      .outputMode("append").start()
    try {
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val last = spark.sql(
        "SELECT event_type, motif, n_windows FROM sax_out t " +
          "WHERE n_days = (SELECT max(n_days) FROM sax_out u " +
          "                WHERE u.event_type = t.event_type)")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(last === batch)
    } finally q.stop()
  }

  test("streaming max-drawdown carries O(1) state and converges to the batch operator") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsMaxDrawdown(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val whole = Streams.maxDrawdown(days).collect()
      .map(o => o.event_type -> ((o.n_days, o.peak_daily, o.max_drawdown,
        o.max_dd_milli, o.n_days_below_peak10))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream: the run max must survive the boundary — day 3's
    // drawdown is against day 2's peak from the PREVIOUS batch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.maxDrawdown(mem.toDS())
      .writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 10L), ("a", 1L, 8L)); q.processAllAvailable()
      mem.addData(("a", 2L, 12L), ("a", 3L, 3L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_days, peak_daily, max_drawdown, " +
        "max_dd_milli, n_days_below_peak10 FROM dd_out ORDER BY n_days")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 10L, 2L, 200L, 1L)))
      assert(rows.last === ((4L, 12L, 9L, 750L, 2L)))
    } finally q.stop()
  }

  test("streaming sprt gate latches the first crossing across batches, equals the batch op") {
    val events = DomainQueries.events(spark, sf)
      .select(col("event_type"), col("ts_ns"), col("event_id"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .as[(String, Long, Long, Long)]
    val batch = operators.Analytics.eventsSprtGate(spark, sf)
      .as[(String, Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val whole = Streams.sprtGate(events).collect()
      .map(o => o.event_type -> ((o.n_obs, o.final_llr_fp, o.decision,
        o.decision_step))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream BEFORE the crossing: the latched decision step
    // counts observations from both batches
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long, Long)]
    val q = Streams.sprtGate(mem.toDS())
      .writeStream.format("memory").queryName("sprt_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 0L, 60000L), ("a", 1L, 1L, 10000L))
      q.processAllAvailable()
      mem.addData((2L to 11L).map(i => ("a", i, i, 60000L)): _*)
      q.processAllAvailable()
      val rows = spark.sql("SELECT n_obs, final_llr_fp, decision, " +
        "decision_step FROM sprt_out ORDER BY n_obs")
        .as[(Long, Long, String, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 140017L, "continue", -1L)))
      // 140017 + 10 * 301656 = 3156577 >= 3087468, crossed at obs 12
      assert(rows.last === ((12L, 3156577L, "accept_h1", 12L)))
    } finally q.stop()
  }

  test("streaming wilson bounds replay the exact isqrt closed form from two counters") {
    val events = DomainQueries.events(spark, sf)
      .select(col("event_type"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .as[(String, Long)]
    val batch = operators.Analytics.eventsWilsonBounds(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val whole = Streams.wilsonBounds(events).collect()
      .map(o => o.event_type -> ((o.n, o.k, o.phat_milli,
        o.wilson_lo_micro, o.wilson_hi_micro))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Streams.wilsonBounds(mem.toDS())
      .writeStream.format("memory").queryName("wb_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 60000L), ("a", 10000L)); q.processAllAvailable()
      mem.addData(("a", 70000L), ("a", 50000L), ("a", 20000L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT n, k, phat_milli, wilson_lo_micro, " +
        "wilson_hi_micro FROM wb_out ORDER BY n")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 1L, 500L, 94552L, 905447L)))
      assert(rows.last === ((5L, 3L, 600L, 230726L, 882375L)))
    } finally q.stop()
  }

  test("streaming tail index folds dyadic counters, equals the batch OLS") {
    val events = DomainQueries.events(spark, sf)
      .select(col("event_type"),
        expr("cast(floor(value * 1000) as bigint)").as("v"))
      .as[(String, Long)]
    val batch = operators.Analytics.eventsTailIndex(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val whole = Streams.tailIndex(events).collect()
      .map(o => o.event_type -> ((o.n_buckets, o.slope_sign,
        o.slope_abs_milli, o.alpha_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Streams.tailIndex(mem.toDS())
      .writeStream.format("memory").queryName("ti_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 2048L), ("a", 4096L)); q.processAllAvailable()
      mem.addData(("a", 2048L), ("a", 2048L), ("a", 2048L))
      q.processAllAvailable()
      val rows = spark.sql("SELECT n_buckets, slope_sign, slope_abs_milli, " +
        "alpha_milli FROM ti_out ORDER BY slope_abs_milli")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 0L, 0L, 0L)))
      // bucket 11 now holds 4 (log2=2), bucket 12 holds 1 (log2=0)
      assert(rows.last === ((2L, -1L, 2000L, 2000L)))
    } finally q.stop()
  }

  test("streaming ljung-box re-demeans per batch, equals the batch lattice") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsLjungBox(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    val whole = Streams.ljungBox(days).collect()
      .map(o => o.event_type -> ((o.n_days, o.r1_milli, o.r2_milli,
        o.r3_milli, o.r4_milli, o.q_milli, o.white_flag))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.ljungBox(mem.toDS())
      .writeStream.format("memory").queryName("lb_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 1L), ("a", 1L, 2L)); q.processAllAvailable()
      mem.addData(("a", 2L, 1L), ("a", 3L, 2L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_days, r1_milli, r2_milli, r3_milli, " +
        "r4_milli, q_milli, white_flag FROM lb_out ORDER BY n_days")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, -500L, 0L, 0L, 0L, 2000L, 1L)))
      // alternating series: strong negative lag-1, positive lag-2
      assert(rows.last === ((4L, -750L, 500L, -250L, 0L, 9000L, 1L)))
    } finally q.stop()
  }

  test("streaming ITS moves the breakpoint with the horizon, equals the batch fit") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsInterventionIts(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9,
        r._10))).toMap
    val whole = Streams.interventionIts(days).collect()
      .map(o => o.event_type -> ((o.n_pre, o.n_post, o.mean_pre_milli,
        o.mean_post_milli, o.jump_milli, o.slope_pre_sign,
        o.slope_pre_abs_milli, o.slope_post_sign,
        o.slope_post_abs_milli))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.interventionIts(mem.toDS())
      .writeStream.format("memory").queryName("its_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 10L), ("a", 1L, 20L)); q.processAllAvailable()
      mem.addData(("a", 2L, 30L), ("a", 3L, 40L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_pre, n_post, mean_pre_milli, " +
        "mean_post_milli, jump_milli, slope_pre_sign, slope_pre_abs_milli, " +
        "slope_post_sign, slope_post_abs_milli FROM its_out ORDER BY n_pre")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(rows.length === 2)
      assert(rows.head === ((1L, 1L, 10000L, 20000L, 10000L, 0L, 0L, 0L, 0L)))
      // horizon grew 2 -> 4: the breakpoint moved and days re-assigned
      assert(rows.last ===
        ((2L, 2L, 15000L, 35000L, 20000L, 1L, 10000L, 1L, 10000L)))
    } finally q.stop()
  }

  test("streaming page-hinkley re-calibrates on the growing horizon, equals the batch op") {
    val days = DomainQueries.events(spark, sf)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)]
    val batch = operators.Analytics.eventsPageHinkley(spark, sf)
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val whole = Streams.pageHinkley(days).collect()
      .map(o => o.event_type -> ((o.n_days, o.n_calib, o.max_ph,
        o.n_alarm_days, o.first_alarm_day))).toMap
    assert(whole === batch)
    assert(batch.nonEmpty)
    // split mid-stream: day 3's level shift must alarm against the
    // calibration that REASSIGNS batch-1 days once the horizon grows
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streams.pageHinkley(mem.toDS())
      .writeStream.format("memory").queryName("ph_out")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L, 10L), ("a", 1L, 10L)); q.processAllAvailable()
      mem.addData(("a", 2L, 30L), ("a", 3L, 80L)); q.processAllAvailable()
      val rows = spark.sql("SELECT n_days, n_calib, max_ph, n_alarm_days, " +
        "first_alarm_day FROM ph_out ORDER BY n_days")
        .as[(Long, Long, Long, Long, Option[Long])].collect()
      assert(rows.length === 2)
      assert(rows.head === ((2L, 1L, 0L, 0L, None)))
      // n0=2, s0=20; dev(30)=40, dev(80)=140; ph hits 180 > 5*s0=100 at day 3
      assert(rows.last === ((4L, 2L, 180L, 1L, Some(3L))))
    } finally q.stop()
  }
}
