package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable.ArrayBuffer

/** Structured Streaming surface: the same event semantics as the batch
  * operators (DomainQueries.eventsTumbling / eventsSessionize), expressed
  * as streaming transforms. Works on both streaming and batch inputs —
  * specs assert stream == batch.
  */
object Streams {

  /** Watermarked event-time tumbling aggregate. Input needs `ts_ns`
    * (long), `event_type`, `value`. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Streaming exact-dedup: state for an id is kept only within the
    * watermark (bounded state — the streaming counterpart of the batch
    * dedup_exact hash-groupBy). Input needs `ts_ns` + the id columns. */
  def dedupeWithinWatermark(events: DataFrame, idCols: Seq[String],
                            watermark: String = "1 hour"): DataFrame =
    events.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval correlation: events of `typeA` joined to the
    * same user's `typeB` events that follow within `withinNs` (e.g. click
    * → purchase attribution). Both sides carry watermarks AND the join
    * condition carries BOTH interval bounds on the event-time columns
    * themselves (`b_ts >= a_ts` and `b_ts <= a_ts + interval`), which is
    * what lets Spark derive state-eviction predicates for BOTH sides: a
    * left row is dropped once the right watermark passes `a_ts + interval`,
    * a right row once the left watermark passes `b_ts`. The exact ns-
    * precision bound is kept as an extra (watermark-invisible) conjunct —
    * the µs interval bound is rounded UP so it never excludes a pair the
    * ns bound admits. Input needs user_id/event_type/ts_ns. */
  def correlate(events: DataFrame, typeA: String, typeB: String,
                withinNs: Long, watermark: String = "2 hours"): DataFrame = {
    val wm = events
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", watermark)
    val a = wm.filter(col("event_type") === typeA)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"), col("ts_ns").as("a_ts_ns"))
    val b = wm.filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"), col("ts_ns").as("b_ts_ns"))
    // µs bound ≥ ns bound: ts is ts_ns truncated to µs, so b_ts - a_ts can
    // exceed (b_ts_ns - a_ts_ns)/1000 by at most one µs tick.
    val withinUsCeil = withinNs / 1000 + 1
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinUsCeil MICROSECOND") &&
        col("b_ts_ns") - col("a_ts_ns") <= withinNs)
      .select(col("a_user").as("user_id"), col("a_ts_ns"), col("b_ts_ns"),
        (col("b_ts_ns") - col("a_ts_ns")).as("lag_ns"))
  }

  /** Streaming file ingest with a dead-letter fork — the reference's
    * occurrence-fetch shape (success/dead split + quarantine) as a
    * continuously-arriving-files stream: `readStream` over schema-explicit
    * JSONL with PERMISSIVE corrupt-record capture, `foreachBatch` routing
    * each micro-batch to a success sink and a quarantine sink. foreachBatch
    * (not two independent queries) so one file read feeds both sinks.
    *
    * Delivery: foreachBatch is inherently at-least-once (a crash between a
    * sink write and the checkpoint commit — or between the two writes —
    * replays the micro-batch), so each sink write is made IDEMPOTENT:
    * output is partitioned by the deterministic `_batch_id` and written
    * with dynamic-partition overwrite, so a replayed batch replaces its
    * own partition instead of appending duplicates — effectively
    * exactly-once end to end. `maxFilesPerTrigger` bounds micro-batch
    * size at scale. */
  def ingestWithDeadLetters(spark: org.apache.spark.sql.SparkSession,
                            inDir: String, schema: org.apache.spark.sql.types.StructType,
                            okDir: String, deadDir: String, checkpoint: String,
                            maxFilesPerTrigger: Int = 100)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist()
        def sink(df: DataFrame, dir: String): Unit =
          df.withColumn("_batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(dir)
        try {
          sink(cached.filter(col("_corrupt_record").isNull)
            .drop("_corrupt_record"), okDir)
          sink(cached.filter(col("_corrupt_record").isNotNull)
            .select("_corrupt_record"), deadDir)
        } finally cached.unpersist()
        ()
      }
      .start()

  /** Streaming counterpart of the batch data_snapshot_diff
    * ([[graft.operators.Records.diffSnapshots]]): the currently-indexed
    * snapshot is the STATIC side, reduced to (key, content-hash) once;
    * new-snapshot rows arrive as the stream and each micro-batch emits
    * ONLY its added/changed keys — the changed-keys-only incremental
    * refresh behind the reference's periodic summary-index update
    * (`update_summary_index.py` re-walks every study each period; this
    * ships the delta instead). A stream-static left-outer hash join on
    * the key: payloads never enter the join (only the 16-byte md5
    * travels), the static hash side broadcasts at dim scale, and there
    * is no streaming state at all — each arriving row classifies
    * against the static index alone, so micro-batch boundaries cannot
    * change the result. `removed` needs full-new-snapshot knowledge by
    * definition and stays with the batch diff (or arrives as explicit
    * tombstones upstream); the spec asserts the union of micro-batch
    * outputs equals the batch diff's added+changed set exactly. */
  def diffAgainstIndex(stream: DataFrame, indexed: DataFrame,
                       key: String, payload: String): DataFrame = {
    val idx = indexed.select(col(key),
      md5(col(payload).cast("binary")).as("oh"), lit(1).as("op"))
    stream.select(col(key), md5(col(payload).cast("binary")).as("nh"))
      .join(idx, Seq(key), "left_outer")
      .withColumn("change", when(col("op").isNull, "added")
        .when(!(col("oh") <=> col("nh")), "changed"))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** Streaming near-dup INDEX MAINTENANCE — the incremental sibling of
    * dedup_minhash_lsh the way diffAgainstIndex is dedup_incremental_
    * exact's: arriving docs' minhash band keys probe the STANDING bucket
    * index (a stream-static equi-join per band; the static side is the
    * batch index — rebuilt on the batch cadence, swapped via
    * AliasPublish). Stateless by design: each arriving doc classifies
    * against the index alone, so micro-batch boundaries cannot change the
    * result and there is no unbounded pair state. The standing index
    * applies the batch side's BAND_CUTOFF cap computed over the INDEX
    * HALF's buckets only (broadcast anti-join) before any candidate
    * forms — a bucket that is <= cutoff among indexed docs but > cutoff
    * corpus-wide makes the stream emit pairs a full-corpus batch run
    * would drop, so cross-checks against dedup_minhash_lsh must compute
    * the expected set with the index-side cap semantics (StreamsSpec
    * does); the arriving doc's signature
    * is computed with the JVM mirror of the SQL md5 lattice
    * (Md5Prefix.hash60s over the same lowercase [a-z0-9]+ trigrams), so
    * stream and batch signatures are byte-identical — StreamsSpec
    * cross-checks the union of micro-batch outputs against
    * dedup_minhash_lsh's cross-split pairs exactly. Emits one row per
    * SHARED band (the posting-list grain); consumers dedup on
    * (new_id, idx_id) as their semantics require. */
  def lshIncrement(newDocs: Dataset[(Long, String)], indexed: DataFrame): DataFrame = {
    import graft.operators.SketchQueries
    import newDocs.sparkSession.implicits._
    val sigs = SketchQueries.minhashIndex(indexed)
    val bands = sigs.select(col("doc_id").as("idx_id"), explode(col("bds")).as("bd"))
      .select(col("idx_id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
    val oversized = bands.groupBy("band", "bh").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > SketchQueries.BAND_CUTOFF).select("band", "bh")
    val idx = bands.join(broadcast(oversized), Seq("band", "bh"), "left_anti")
      .join(sigs.select(col("doc_id").as("idx_id"), col("sig").as("idx_sig")),
        Seq("idx_id"))
    val K = SketchQueries.K
    val seeds = SketchQueries.seeds
    val newBands = newDocs.flatMap { case (id, text) =>
      // Locale.ROOT: a Turkish-style default locale lowercases 'I' to
      // dotless 'ı' (unmatched by [a-z0-9]) and silently diverges the
      // stream signature from Spark's locale-independent lower().
      val toks = "[a-z0-9]+".r.findAllIn(
        text.toLowerCase(java.util.Locale.ROOT)).toArray
      if (toks.length < 3) Iterator.empty
      else {
        val sig = Array.fill(K)(Long.MaxValue)
        var i = 0
        while (i + 2 < toks.length) {
          val h = graft.functions.Md5Prefix.hash60s(
            toks(i) + "_" + toks(i + 1) + "_" + toks(i + 2))
          var k = 0
          while (k < K) {
            val v = h ^ seeds(k); if (v < sig(k)) sig(k) = v; k += 1
          }
          i += 1
        }
        (0 until 8).iterator.map(b =>
          (id, b, (0 until 4).map(r => sig(b * 4 + r)).mkString("_"), sig.toSeq))
      }
    }.toDF("new_id", "band", "bh", "new_sig")
    newBands.join(idx, Seq("band", "bh"))
      .withColumn("est_jaccard", expr(
        s"size(filter(zip_with(new_sig, idx_sig, (x, y) -> x = y), v -> v)) " +
          s"/ cast($K as double)"))
      .filter(col("est_jaccard") >= 0.5)
      .select("new_id", "idx_id", "band", "est_jaccard")
  }

  case class SessState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_ns: Long, n_events: Long, dur_ns: Long)

  /** Gap-based sessionization over (user_id, ts_ns) with
    * flatMapGroupsWithState. Closed sessions are emitted; the open session
    * is carried in state (and emitted too when `emitOpen`, for batch use).
    */
  def sessionize(events: Dataset[(Long, Long)], gapNs: Long,
                 emitOpen: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long)], state: GroupState[SessState]) =>
        val ts = it.map(_._2).toArray.sorted
        val out = ArrayBuffer.empty[SessionOut]
        var cur = state.getOption.orNull
        for (tm <- ts) {
          if (cur == null) cur = SessState(tm, tm, 1)
          else if (tm - cur.last > gapNs) {
            out += SessionOut(uid, cur.start, cur.n, cur.last - cur.start)
            cur = SessState(tm, tm, 1)
          } else cur = SessState(cur.start, tm, cur.n + 1)
        }
        if (cur != null) {
          state.update(cur)
          if (emitOpen) out += SessionOut(uid, cur.start, cur.n, cur.last - cur.start)
        }
        out.iterator
    }
  }

  case class Scd2State(state: String, from: Long)
  case class Scd2Out(user_id: Long, state: String,
                     valid_from_ns: Long, valid_to_ns: Long) // -1 = still open

  /** Streaming counterpart of the batch meta_scd2_history (SCD2 validity
    * intervals): per-user state holds only the CURRENT (state,
    * valid_from) record; a state change closes the previous interval at
    * the changing event's timestamp and emits it, repeats of the current
    * state fold away. Events sort by (ts, event_id) inside each batch —
    * with per-user ascending arrival across batches this reproduces the
    * batch lag/lead windows exactly. State per user is ONE fixed-size
    * record, bounded regardless of stream length. Input: (user_id,
    * ts_ns, event_id, event_type). */
  def scd2(events: Dataset[(Long, Long, Long, String)],
           emitOpen: Boolean = false): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long, Long, String)],
       state: GroupState[Scd2State]) =>
        val evs = it.map(e => (e._2, e._3, e._4)).toArray.sortBy(e => (e._1, e._2))
        val res = ArrayBuffer.empty[Scd2Out]
        var cur = state.getOption.orNull
        for ((tm, _, tpe) <- evs) {
          if (cur == null) cur = Scd2State(tpe, tm)
          else if (tpe != cur.state) {
            res += Scd2Out(uid, cur.state, cur.from, tm)
            cur = Scd2State(tpe, tm)
          } // a repeat of the current state folds away: no state change
        }
        if (cur != null) {
          state.update(cur)
          if (emitOpen) res += Scd2Out(uid, cur.state, cur.from, -1L)
        }
        res.iterator
    }
  }

  case class ThrottleState(hour: Long, n: Long)
  case class ThrottleOut(user_id: Long, event_id: Long, hour: Long,
                         ts_ns: Long, rn: Long)

  /** Streaming counterpart of the batch events_throttle rate limit: per
    * user the state is ONE (current hour, kept-count) pair; an event in
    * the same hour passes while count < perHour, a later hour resets the
    * window. With per-user ascending arrival across batches (the same
    * assumption as [[scd2]]/[[funnel]]) this reproduces the batch
    * row_number gate exactly — verified against it on the full event
    * table, and the cap holds when a burst splits across micro-batches.
    * Input: (user_id, ts_ns, event_id). */
  def throttle(events: Dataset[(Long, Long, Long)],
               perHour: Int = 3): Dataset[ThrottleOut] = {
    import events.sparkSession.implicits._
    val hourNs = 3600000000000L
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long, Long)],
       state: GroupState[ThrottleState]) =>
        val evs = it.map(e => (e._2, e._3)).toArray.sortBy(identity)
        val res = ArrayBuffer.empty[ThrottleOut]
        var cur = state.getOption.getOrElse(ThrottleState(Long.MinValue, 0))
        for ((tm, id) <- evs) {
          val h = tm / hourNs
          if (h > cur.hour) cur = ThrottleState(h, 0)
          // h < cur.hour: a late event from an already-closed hour.
          // Charging it to the newer hour's budget would both exceed the
          // closed hour's cap and duplicate (user, hour, rn) — fail SAFE
          // by dropping it (the batch twin, which sees all data, is the
          // backfill authority).
          if (h == cur.hour && cur.n < perHour) {
            cur = cur.copy(n = cur.n + 1)
            res += ThrottleOut(uid, id, h, tm, cur.n)
          }
        }
        state.update(cur)
        res.iterator
    }
  }

  case class CusumState(s: Long)
  case class CusumOut(event_type: String, event_id: Long, cusum_fp: Long,
                      alarm: Boolean)

  /** Streaming counterpart of the batch events_cusum drift monitor: per
    * event type the state is ONE Long — the running one-sided sum
    * S = max(0, S + (q − target)) — so state is bounded regardless of
    * stream length. `targets` is the per-type fixed-point baseline (in
    * production the profile comes from a prior batch run; the batch
    * operator derives it from the full data, which a stream cannot).
    * With per-type ascending arrival across batches this reproduces the
    * batch closed form exactly (spec-verified). Input:
    * (event_type, ts_ns, event_id, q) with q already 2^-10 fixed-point. */
  def cusum(events: Dataset[(String, Long, Long, Long)],
            targets: Map[String, Long], alarmFp: Long): Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long, Long)],
       state: GroupState[CusumState]) =>
        val t = targets.getOrElse(tpe, 0L)
        val evs = it.map(e => (e._2, e._3, e._4)).toArray.sortBy(e => (e._1, e._2))
        var s = state.getOption.map(_.s).getOrElse(0L)
        val res = evs.map { case (_, id, q) =>
          s = math.max(0L, s + (q - t))
          CusumOut(tpe, id, s, s > alarmFp)
        }
        state.update(CusumState(s))
        res.iterator
    }
  }

  case class RegState(lastTs: Long, n: Long, sg: Long, sg2: Long)
  case class RegOut(user_id: Long, event_type: String,
                    n_gaps: Long, sg: Long, sg2: Long)

  /** Streaming counterpart of events_arrival_regularity's accumulators:
    * per (user, type) the state is FOUR Longs — last timestamp plus the
    * (n, Σg, Σg²) gap moments on the same floor-minute lattice the
    * batch operator uses — so state is bounded regardless of stream
    * length. Each batch absorbs its events in (ts, id) order and emits
    * the refreshed accumulator row; with per-key ascending arrival
    * across batches (the cusum twin's contract) folding the LATEST
    * emission per key up to event_type replays the batch op's per-type
    * sums exactly, gaps straddling micro-batch bounds included via
    * lastTs. Events older than the carried lastTs are DROPPED rather
    * than folded as negative gaps — the batch op sorts globally and
    * can never see one. Input: (user_id, event_type, ts_ns, event_id). */
  def arrivalAccumulators(
      events: Dataset[(Long, String, Long, Long)]): Dataset[RegOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e._1, e._2)).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: (Long, String), it: Iterator[(Long, String, Long, Long)],
       state: GroupState[RegState]) =>
        val evs = it.map(e => (e._3, e._4)).toArray.sorted
        var st = state.getOption.getOrElse(RegState(Long.MinValue, 0L, 0L, 0L))
        for ((ts, _) <- evs if ts >= st.lastTs || st.lastTs == Long.MinValue) {
          if (st.lastTs != Long.MinValue) {
            val g = (ts - st.lastTs) / 60000000000L
            st = RegState(ts, st.n + 1, st.sg + g, st.sg2 + g * g)
          } else st = st.copy(lastTs = ts)
        }
        state.update(st)
        Iterator.single(RegOut(key._1, key._2, st.n, st.sg, st.sg2))
    }
  }

  case class DriftState(first: Long, last: Long, days: Seq[Long], n: Long)
  case class DriftOut(k: String, first_day: Long, last_day: Long,
                      n_days: Long, n_events: Long)

  /** Streaming counterpart of the batch meta_schema_drift: per JSON key
    * the state is (first day, last day, distinct-day set, count) —
    * bounded by the CALENDAR (days per key), never by event volume, the
    * same state argument as the retention cohort build. Each batch
    * absorbs its (key, day) pairs and emits the refreshed drift row, so
    * the latest emission per key always equals the batch operator over
    * everything seen. Input: (key, day) — the upstream json key
    * explosion is the stateless part and stays in the DataFrame layer. */
  def schemaDrift(keyDays: Dataset[(String, Long)]): Dataset[DriftOut] = {
    import keyDays.sparkSession.implicits._
    keyDays.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (k: String, it: Iterator[(String, Long)], state: GroupState[DriftState]) =>
        val days = it.map(_._2).toSeq
        val prev = state.getOption.getOrElse(
          DriftState(Long.MaxValue, Long.MinValue, Seq.empty, 0L))
        val merged = DriftState(
          math.min(prev.first, days.min), math.max(prev.last, days.max),
          (prev.days ++ days).distinct, prev.n + days.length)
        state.update(merged)
        Iterator.single(DriftOut(k, merged.first, merged.last,
          merged.days.length.toLong, merged.n))
    }
  }

  case class ViewState(ts: Long)
  case class ConvLagOut(user_id: Long, event_id: Long, lag_s: Long, lag_bits: Long)

  /** Streaming counterpart of the batch events_conversion_lag: per-user
    * state is ONE timestamp — the most recent view seen so far (views
    * arrive ascending, so latest = running max, the batch window's
    * MAX-of-preceding-views) — and every purchase within the 7-day
    * lookback emits its exact lag + floor-log2 bin as the batch op
    * computes them. A conversion whose triggering view landed in an
    * earlier micro-batch is still credited (the cross-batch case a
    * stateless window cannot see). State is one long per user. With
    * per-user ascending arrival the emitted set equals the batch
    * window's exactly (spec-verified).
    * Input: (user_id, ts_ns, event_id, event_type). */
  def conversionLag(events: Dataset[(Long, Long, Long, String)]): Dataset[ConvLagOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long, Long, String)],
       state: GroupState[ViewState]) =>
        val evs = it.map(e => (e._2, e._3, e._4)).toArray.sortBy(e => (e._1, e._2))
        var lastView = state.getOption
        val out = Array.newBuilder[ConvLagOut]
        for ((ts, id, tpe) <- evs) {
          if (tpe == "purchase")
            // the 0 <= lower bound guards out-of-order cross-batch input
            // (a stale state ts AFTER this purchase) from emitting
            // negative lags the batch window can never produce
            lastView.filter(v => 0L <= ts - v.ts && ts - v.ts <= 604800000000000L)
              .foreach { v =>
              val lagS = (ts - v.ts) / 1000000000L
              out += ConvLagOut(uid, id, lagS,
                63L - java.lang.Long.numberOfLeadingZeros(lagS + 1))
            }
          if (tpe == "view") lastView = Some(ViewState(ts))
        }
        lastView.foreach(state.update)
        out.result().iterator
    }
  }

  case class TransState(ts: Long, id: Long, tpe: String)
  case class TransOut(user_id: Long, prev: String, next: String)

  /** Streaming counterpart of the batch events_transition_matrix pair
    * extraction: per user the state is ONE (ts, id, type) triple — the
    * last event seen — so a consecutive pair that straddles a
    * micro-batch boundary is still emitted (the lead-window semantics a
    * stateless stream map cannot reproduce). State is bounded by the
    * user population, never by event volume. With per-user ascending
    * arrival across batches the emitted multiset of (prev, next) pairs
    * equals the batch lead window's exactly (spec-verified); the
    * downstream count/normalize step is the stateless aggregate both
    * sides share. Input: (user_id, ts_ns, event_id, event_type). */
  def transitions(events: Dataset[(Long, Long, Long, String)]): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long, Long, String)],
       state: GroupState[TransState]) =>
        val evs = it.map(e => (e._2, e._3, e._4)).toArray.sortBy(e => (e._1, e._2))
        var last = state.getOption
        val out = Array.newBuilder[TransOut]
        for ((ts, id, tpe) <- evs) {
          last.foreach(p => out += TransOut(uid, p.tpe, tpe))
          last = Some(TransState(ts, id, tpe))
        }
        last.foreach(state.update)
        out.result().iterator
    }
  }

  case class GrowthState(first: Long, last: Long)
  case class GrowthOut(user_id: Long, period: Long, kind: String)

  /** Streaming counterpart of the batch events_growth_accounting state
    * machine: per-user state is just (first, last) active period; each
    * arriving (user, period) cell emits its lifecycle classification
    * (new / retained / resurrected), and a GAP retroactively emits the
    * churn row for last+1 — so with period-ascending arrival the
    * emitted multiset equals the batch classification minus ONLY the
    * trailing churn row per user (the one the batch charges after the
    * final streak; in production that fires off an event-time timeout
    * once the watermark passes the next period — here it stays pending
    * state, spec-reconciled). Duplicate cells across batches are
    * absorbed by the last-period compare. Input: (user_id, period). */
  def growthStates(pres: Dataset[(Long, Long)]): Dataset[GrowthOut] = {
    import pres.sparkSession.implicits._
    pres.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long)], state: GroupState[GrowthState]) =>
        val ps = it.map(_._2).toArray.distinct.sorted
        var st = state.getOption
        val out = Array.newBuilder[GrowthOut]
        for (p <- ps) {
          st match {
            case None => out += GrowthOut(uid, p, "new")
            case Some(g) if p <= g.last => () // duplicate / out-of-order
            case Some(g) if p == g.last + 1 =>
              out += GrowthOut(uid, p, "retained")
            case Some(g) =>
              out += GrowthOut(uid, g.last + 1, "churned")
              out += GrowthOut(uid, p, "resurrected")
          }
          st = Some(GrowthState(st.map(_.first).getOrElse(p),
            math.max(p, st.map(_.last).getOrElse(p))))
        }
        st.foreach(state.update)
        out.result().iterator
    }
  }

  case class BkState(items: Seq[(Long, Long)], nSeen: Long) // (h, v_fp) asc, ≤ k
  case class BkOut(event_type: String, n_seen: Long, n_sample: Long,
                   p50_fp: Long, p95_fp: Long)

  /** Streaming counterpart of the batch events_bottomk_sample: per-type
    * state IS the bottom-k sketch (≤ k (hash, value) pairs), and because
    * the bottom-k of a union equals the bottom-k of merged bottom-ks,
    * absorbing each micro-batch into the state gives EXACTLY the batch
    * sketch over everything seen so far — mergeability exercised as
    * streaming state, with the same (h, v_fp) ordering as the batch op.
    * Emits refreshed disc p50/p95 estimates (+ the cumulative row count,
    * which also orders the emissions) each batch. Input:
    * (event_type, h, v_fp) with h the 52-bit sample hash. */
  def bottomkSample(events: Dataset[(String, Long, Long)],
                    k: Int = 64): Dataset[BkOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)], state: GroupState[BkState]) =>
        val prev = state.getOption.getOrElse(BkState(Seq.empty, 0L))
        val batch = it.map(e => (e._2, e._3)).toSeq
        val merged = (prev.items ++ batch).sortBy(identity).take(k)
        val nSeen = prev.nSeen + batch.length
        state.update(BkState(merged, nSeen))
        val vals = merged.map(_._2).sorted
        val n = vals.length
        Iterator.single(BkOut(tpe, nSeen, n.toLong,
          vals((n + 1) / 2 - 1), vals((19 * n + 19) / 20 - 1)))
    }
  }

  case class FunnelState(start: Long, last: Long, n: Long,
                         tView: Long, tClick: Long, tPurchase: Long) // -1 = unset
  case class FunnelOut(user_id: Long, session_start_ns: Long, n_events: Long,
                       converted: Boolean, conv_ns: Long) // -1 when not converted

  /** Streaming counterpart of the batch events_funnel pattern match:
    * per-user session state additionally tracks the first view, the first
    * LATER click and the first LATER purchase — processing events in
    * ascending ts order makes the incremental greedy update equivalent to
    * the batch min-if windows (strict `>` on both stage transitions).
    * Sessions close on gap expiry and emit whether the full pattern
    * completed plus the view→purchase latency. State per user is one
    * fixed-size record — bounded regardless of stream length. Input:
    * (user_id, ts_ns, event_type). */
  def funnel(events: Dataset[(Long, Long, String)], gapNs: Long,
             emitOpen: Boolean = false): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    def out(uid: Long, st: FunnelState): FunnelOut =
      FunnelOut(uid, st.start, st.n, st.tPurchase >= 0,
        if (st.tPurchase >= 0) st.tPurchase - st.tView else -1L)
    def advance(st: FunnelState, tm: Long, tpe: String): FunnelState = {
      var (v, c, p) = (st.tView, st.tClick, st.tPurchase)
      if (tpe == "view" && v < 0) v = tm
      else if (tpe == "click" && v >= 0 && c < 0 && tm > v) c = tm
      else if (tpe == "purchase" && c >= 0 && p < 0 && tm > c) p = tm
      FunnelState(st.start, tm, st.n + 1, v, c, p)
    }
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long, String)], state: GroupState[FunnelState]) =>
        val evs = it.map(e => (e._2, e._3)).toArray.sortBy(_._1)
        val res = ArrayBuffer.empty[FunnelOut]
        var cur = state.getOption.orNull
        for ((tm, tpe) <- evs) {
          if (cur == null) cur = advance(FunnelState(tm, tm, 0, -1, -1, -1), tm, tpe)
          else if (tm - cur.last > gapNs) {
            res += out(uid, cur)
            cur = advance(FunnelState(tm, tm, 0, -1, -1, -1), tm, tpe)
          } else cur = advance(cur, tm, tpe)
        }
        if (cur != null) {
          state.update(cur)
          if (emitOpen) res += out(uid, cur)
        }
        res.iterator
    }
  }

  case class CdcState(ts: Long, id: Long, tpe: String, value: Double, n: Long)
  case class CdcOut(ukey: Long, last_type: String, last_val: Double,
                    last_ts_ns: Long, n_changes: Long, deleted: Boolean)

  /** Streaming counterpart of the batch meta_cdc_apply: per-key state is
    * the latest change by the (ts, event_id) total order plus the
    * cumulative change count. The strict (ts, id) guard on every
    * replacement is what makes the fold order-independent — a stale row
    * never overwrites a newer state, whether the two arrived in the same
    * batch (any order) or batches apart — so no per-batch sort is
    * needed. Emits the refreshed survivor per key each batch with a
    * tombstone flag (`error` = delete, the batch op's D-mapping) — the
    * continuous form of the periodic re-index upsert. State is bounded
    * by the key population, never by change volume. Input:
    * (user_id, ts_ns, event_id, event_type, value). */
  def cdcApply(events: Dataset[(Long, Long, Long, String, Double)]): Dataset[CdcOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (uid: Long, it: Iterator[(Long, Long, Long, String, Double)],
       state: GroupState[CdcState]) =>
        val prev = state.getOption
        var cur = prev
        var n = prev.map(_.n).getOrElse(0L)
        for ((_, ts, id, tpe, v) <- it) {
          n += 1
          if (cur.forall(p => p.ts < ts || (p.ts == ts && p.id < id)))
            cur = Some(CdcState(ts, id, tpe, v, 0L))
        }
        val merged = cur.get.copy(n = n)
        state.update(merged)
        Iterator.single(CdcOut(uid, merged.tpe, merged.value, merged.ts, n,
          merged.tpe == "error"))
    }
  }

  case class WmState(maxEt: Long, n: Long, nLate: Long,
                     maxLag: Long, sumLag: Long)
  case class WmOut(event_type: String, n_events: Long, n_late: Long,
                   max_lag_s: Long, sum_lag_s: Long)

  /** Streaming counterpart of the batch events_watermark_lag lateness
    * audit, scoped to a PER-TYPE running-max watermark proxy: an event
    * is late iff an earlier arrival of the same type carried a later
    * event time, and each micro-batch emits the refreshed cumulative
    * (count, late count, max/sum lag seconds) row per type. State is
    * ONE record per type — O(|types|), never event volume. Arrival
    * order within a batch is the seq column (the batch op orders by
    * event_id); the engine's own watermark is global min-across-
    * partitions — this models the audit shape, not engine internals.
    * Input: (event_type, arrival_seq, etime_ns). */
  def watermarkLag(events: Dataset[(String, Long, Long)]): Dataset[WmOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[WmState]) =>
        var st = state.getOption.getOrElse(WmState(Long.MinValue, 0L, 0L, 0L, 0L))
        for ((_, _, et) <- it.toArray.sortBy(_._2)) {
          if (st.maxEt != Long.MinValue && et < st.maxEt) {
            val lag = (st.maxEt - et) / 1000000000L
            st = st.copy(n = st.n + 1, nLate = st.nLate + 1,
              maxLag = math.max(st.maxLag, lag), sumLag = st.sumLag + lag)
          } else st = WmState(math.max(st.maxEt, et), st.n + 1,
            st.nLate, st.maxLag, st.sumLag)
        }
        state.update(st)
        Iterator.single(WmOut(tpe, st.n, st.nLate, st.maxLag, st.sumLag))
    }
  }

  case class EwmaState(h0: Long, recent: Seq[(Long, Long)])
  case class EwmaOut(event_type: String, hour_id: Long, c: Long,
                     forecast_num: Long, resid_num: Long, flag: String)

  /** Streaming counterpart of events_ewma_residual's dyadic forecaster:
    * per type the state is the first-seen hour plus AT MOST the last 8
    * (hour, count) cells — O(|types|·8) regardless of stream length.
    * Input is the upstream watermarked hourly aggregate
    * (event_type, hour_id, count), per-key ascending across batches
    * (the cusum twin's contract); a calendar hour with no events never
    * arrives and correctly contributes 0 to later forecasts. Warm-up
    * hours (< first-seen + 8) update state but emit nothing — exactly
    * the batch operator's fence. */
  def ewma(hours: Dataset[(String, Long, Long)]): Dataset[EwmaOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[EwmaState]) =>
        val rows = it.map(e => (e._2, e._3)).toArray.sortBy(_._1)
        var st = state.getOption.getOrElse(EwmaState(Long.MaxValue, Seq.empty))
        val out = rows.flatMap { case (h, c) =>
          val h0 = math.min(st.h0, h)
          val f = (1 to 8).map(i =>
            st.recent.collectFirst { case (hh, cc) if hh == h - i => cc }
              .getOrElse(0L) * (1L << (8 - i))).sum
          st = EwmaState(h0, (st.recent :+ (h -> c)).filter(_._1 > h - 8))
          if (h >= h0 + 8) {
            val flag = if (c * 255 > f * 2) "high"
              else if (c * 510 < f) "low" else "ok"
            Some(EwmaOut(tpe, h, c, f, c * 255 - f, flag))
          } else None
        }
        state.update(st)
        out.iterator
    }
  }

  case class HoltState(h0: Long, recent: Seq[(Long, Long)])
  case class HoltOut(event_type: String, hour_id: Long, c: Long,
                     level_num: Long, trend_num: Long, forecast_num: Long,
                     resid_num: Long, flag: String)

  /** Streaming counterpart of events_holt_trend's dyadic Holt
    * forecaster — same state shape as [[ewma]] (first-seen hour plus AT
    * MOST the last 8 (hour, count) cells per type, O(|types|·8)
    * forever), same upstream contract (watermarked hourly aggregate,
    * per-key ascending across batches; a silent calendar hour never
    * arrives and correctly reads 0 in the window). Per emitted hour the
    * twin replays the SEQUENTIAL coupled recurrence in 1/4096 fixed
    * point (l2 = y2, b2 = y2 − y1, six exact halving rounds — D = 2^12
    * covers the 2 bits each round spends, so every `/2` is exact),
    * which the batch operator's unrolled coefficient lattice equals
    * bit-for-bit (AnalyticsSpec pins the equivalence). */
  def holtTrend(hours: Dataset[(String, Long, Long)]): Dataset[HoltOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[HoltState]) =>
        val rows = it.map(e => (e._2, e._3)).toArray.sortBy(_._1)
        var st = state.getOption.getOrElse(HoltState(Long.MaxValue, Seq.empty))
        val out = rows.flatMap { case (h, c) =>
          val h0 = math.min(st.h0, h)
          val y = (1 to 8).map(i =>
            st.recent.collectFirst { case (hh, cc) if hh == h - 9 + i => cc }
              .getOrElse(0L))
          st = HoltState(h0, (st.recent :+ (h -> c)).filter(_._1 > h - 8))
          if (h >= h0 + 8) {
            var l = y(1) * 4096L
            var b = (y(1) - y(0)) * 4096L
            for (i <- 2 until 8) {
              val lp = l
              l = (y(i) * 4096L + lp + b) / 2
              b = (l - lp) / 2 + b / 2
            }
            val flag = if (b * 16 > l) "rising"
              else if (b * 16 < -l) "falling" else "flat"
            Some(HoltOut(tpe, h, c, l, b, l + b, c * 4096L - l - b, flag))
          } else None
        }
        state.update(st)
        out.iterator
    }
  }

  case class BtState(h0: Long, recent: Seq[(Long, Long)],
                     n: Long, sn: Long, se: Long, sh: Long)
  case class BtOut(event_type: String, n_hours: Long, mae_naive_milli: Long,
                   mae_ewma_milli: Long, mae_holt_milli: Long, winner: String)

  /** Streaming counterpart of events_forecast_backtest: per type the
    * state is the first-seen hour, AT MOST the last 24 (hour, count)
    * cells (the deepest lag any of the three models reads) and four
    * accumulator Longs — O(|types|·24) forever. Same contract as
    * [[ewma]] (watermarked hourly aggregate, per-key ascending; a
    * silent hour never arrives and reads 0 in every window). Each
    * batch folds its hours through the three residual lattices
    * (identical per-hour milli floors, Holt via the same sequential
    * recurrence the batch lattice unrolls) and emits the refreshed
    * per-type MAE row — the LATEST emission per type equals the batch
    * operator over the stream prefix (arrivalAccumulators contract). */
  def forecastBacktest(hours: Dataset[(String, Long, Long)]): Dataset[BtOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[BtState]) =>
        val rows = it.map(e => (e._2, e._3)).toArray.sortBy(_._1)
        var st = state.getOption
          .getOrElse(BtState(Long.MaxValue, Seq.empty, 0L, 0L, 0L, 0L))
        rows.foreach { case (h, c) =>
          val h0 = math.min(st.h0, h)
          def cc(hh: Long): Long =
            st.recent.collectFirst { case (x, v) if x == hh => v }
              .getOrElse(0L)
          var (n, sn, se, sh) = (st.n, st.sn, st.se, st.sh)
          if (h >= h0 + 24) {
            sn += math.abs(c - cc(h - 24)) * 1000
            val fe = (1 to 8).map(i => cc(h - i) * (1L << (8 - i))).sum
            se += math.abs(c * 255 - fe) * 1000 / 255
            val y = (1 to 8).map(i => cc(h - 9 + i)) // y1 oldest
            var l = y(1) * 4096L
            var b = (y(1) - y(0)) * 4096L
            for (i <- 2 until 8) {
              val lp = l
              l = (y(i) * 4096L + lp + b) / 2
              b = (l - lp) / 2 + b / 2
            }
            sh += math.abs(c * 4096 - (l + b)) * 1000 / 4096
            n += 1
          }
          st = BtState(h0,
            (st.recent :+ (h -> c)).filter(_._1 > h - 24), n, sn, se, sh)
        }
        state.update(st)
        if (st.n == 0L) Iterator.empty
        else {
          val (mn, me, mh) = (st.sn / st.n, st.se / st.n, st.sh / st.n)
          val winner = if (mn <= me && mn <= mh) "naive24"
            else if (me <= mh) "ewma" else "holt"
          Iterator.single(BtOut(tpe, st.n, mn, me, mh, winner))
        }
    }
  }

  case class DftState(buckets: Seq[Long])
  case class DftOut(event_type: String, k: Long, re_norm: Long,
                    im_norm: Long, power_num: Long, power_ppm: Long,
                    is_dominant: Boolean)

  /** Streaming counterpart of events_diurnal_dft: per type the state is
    * exactly 24 bucket counters — O(|types|·24) forever, the cleanest
    * mergeable-state twin on the board (counter addition commutes, so
    * ANY batch split of the stream yields the same counters). Input is
    * the watermarked hourly aggregate ([[ewma]]'s contract); each batch
    * folds its counts into hour-of-day buckets and emits the refreshed
    * k = 1..3 harmonic rows from the CURRENT counters on the identical
    * fixed-point lattice (same 24 trig literals, same
    * normalize-before-square discipline) — the LATEST emission per
    * (type, k) equals the batch operator over the stream prefix
    * bit-for-bit (the arrivalAccumulators replay contract). */
  def diurnalDft(hours: Dataset[(String, Long, Long)]): Dataset[DftOut] = {
    val C = graft.operators.Analytics.DIURNAL_C
    val S = graft.operators.Analytics.DIURNAL_S
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[DftState]) =>
        val buckets = state.getOption.map(_.buckets.toArray)
          .getOrElse(new Array[Long](24))
        it.foreach { case (_, h, c) => buckets((h % 24).toInt) += c }
        state.update(DftState(buckets.toSeq))
        val tot = buckets.sum
        if (tot == 0L) Iterator.empty
        else {
          val rows = (1L to 3L).map { k =>
            val reRaw = (0 until 24).map(b => buckets(b) * C((k * b % 24).toInt)).sum
            val imRaw = (0 until 24).map(b => buckets(b) * S((k * b % 24).toInt)).sum
            val reN = reRaw * 1000 / tot
            val imN = imRaw * 1000 / tot
            (k, reN, imN, reN * reN + imN * imN)
          }
          val mx = rows.map(_._4).max
          rows.map { case (k, reN, imN, pw) =>
            DftOut(tpe, k, reN, imN, pw, pw * 1000000L / 1048576000000L,
              pw == mx)
          }.iterator
        }
    }
  }

  case class MedState(recent: Seq[(Long, Long)])
  case class MedOut(event_type: String, day_id: Long, c: Long,
                    n_days_window: Long, med7: Long)

  /** Streaming counterpart of events_rolling_median's trailing-7-day
    * lower median: per type the state is AT MOST the last 7 (day, count)
    * cells — O(|types|·7) regardless of stream length. Same contract as
    * [[ewma]]: input is the upstream watermarked DAILY aggregate,
    * per-key ascending across batches; a silent day never arrives and
    * simply falls out of the range frame, exactly like the batch
    * operator's RANGE window. */
  def rollingMedian(days: Dataset[(String, Long, Long)]): Dataset[MedOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[MedState]) =>
        val rows = it.map(e => (e._2, e._3)).toArray.sortBy(_._1)
        var st = state.getOption.getOrElse(MedState(Seq.empty))
        val out = rows.map { case (d, c) =>
          val win = (st.recent.filter(x => x._1 >= d - 6 && x._1 < d)
            .map(_._2) :+ c).sorted
          st = MedState((st.recent :+ (d -> c)).filter(_._1 >= d - 6))
          MedOut(tpe, d, c, win.length, win((win.length + 1) / 2 - 1))
        }
        state.update(st)
        out.iterator
    }
  }

  case class TmState(seen: Long, sample: Seq[(Long, Long)])
  case class TmOut(event_type: String, n_seen: Long, n_sample: Long,
                   trimmed_mean_est_milli: Long)

  /** Streaming counterpart of events_trimmed_mean. An EXACT trimmed mean
    * needs every value's rank — O(stream) state, dead on an infinite
    * stream — so the twin rides the repo's canonical bounded answer to
    * value-distribution statistics: the mergeable bottom-K KMV sample
    * (eventsBottomkSample / quantile_sketch_union discipline). Per type
    * the state is the K = 64 (hash, v_milli) pairs with the smallest
    * 52-bit md5 under this operator's OWN 'tm:' salt (the shared-salt
    * correlation landmine) — bottom-K of a union = bottom-K of merged
    * bottom-Ks, so after any micro-batch split the sample is
    * BIT-IDENTICAL to sampling the whole prefix directly (the spec
    * asserts this against a batch-computed sample). Each batch emits the
    * sample's 5%-trimmed mean on the same floor(value·1000) milli
    * lattice as the batch operator: sorted sample, drop m div 20 from
    * each tail, kept-sum div kept-count. The JVM-side hash is the shared
    * [[graft.functions.Md5Prefix]] contract (byte-identical to Spark's
    * conv(substring(md5(concat('tm:', event_id)), 1, 13), 16, 10)). */
  def trimmedMean(events: Dataset[(String, Long, Long)],
                  k: Int = 64): Dataset[TmOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[TmState]) =>
        val incoming =
          it.map(e => (graft.functions.Md5Prefix.hash52("tm:", e._2), e._3)).toArray
        val st = state.getOption.getOrElse(TmState(0L, Seq.empty))
        val sample = (st.sample ++ incoming).sortBy(identity).take(k)
        val seen = st.seen + incoming.length
        state.update(TmState(seen, sample))
        val vs = sample.map(_._2).sorted
        val m = vs.length
        val cut = m / 20
        val kept = vs.slice(cut, m - cut)
        if (kept.isEmpty) Iterator.empty
        else Iterator(TmOut(tpe, seen, m.toLong, kept.sum / kept.length))
    }
  }

  case class RdState(runMax: Long, nDays: Long, nRecords: Long,
                     lastRecordDay: Long, harmonic: Long)
  case class RdOut(event_type: String, n_days: Long, n_records: Long,
                   last_record_day: Long, exp_records_milli: Long)

  /** Streaming counterpart of events_record_days — the O(1)-state
    * shape (queueWait's class): a record is "this day's count strictly
    * exceeds the running max", so the whole statistic carries across
    * micro-batches as FIVE longs per type — running max, day counter,
    * record counter, last record day, and the harmonic lattice
    * Σ 1000 div k accumulated as days arrive (each term floored exactly
    * like the batch operator's 1000 div rn). Input is the upstream
    * watermarked (type, day, count) aggregate, per-key ascending, each
    * day once; within a batch rows sort by day. Once the stream drains
    * the calendar the LAST emission per type equals the batch row —
    * the spec pins that equality. */
  def recordDays(days: Dataset[(String, Long, Long)]): Dataset[RdOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[RdState]) =>
        var st = state.getOption.getOrElse(RdState(Long.MinValue, 0L, 0L,
          Long.MinValue, 0L))
        for ((_, day, c) <- it.toSeq.sortBy(_._2)) {
          val n = st.nDays + 1
          val rec = st.nDays == 0L || c > st.runMax
          st = RdState(math.max(st.runMax, c), n,
            st.nRecords + (if (rec) 1L else 0L),
            if (rec) day else st.lastRecordDay,
            st.harmonic + 1000L / n)
        }
        state.update(st)
        if (st.nDays == 0L) Iterator.empty
        else Iterator(RdOut(tpe, st.nDays, st.nRecords, st.lastRecordDay,
          st.harmonic))
    }
  }

  case class SilState(prevDay: Long, minDay: Long, maxDay: Long,
                      nDays: Long, nRuns: Long, maxGap: Long,
                      lastGapEnd: Option[Long])
  case class SilOut(event_type: String, n_days: Long, span_days: Long,
                    n_silent_runs: Long, max_gap_days: Long,
                    last_gap_end_day: Option[Long], coverage_milli: Long)

  /** Streaming counterpart of events_silence_streaks — O(1) state (the
    * queueWait class): the silence audit only needs the previous
    * observed day, the span endpoints and three gap counters — seven
    * longs per type at any calendar length. Input is the upstream
    * (type, day) observed-day stream, per-key ascending, each day once;
    * within a batch rows sort by day. Same lattice as the batch lag
    * windows (gap = day − prev − 1, runs where gap ≥ 1), so once the
    * stream drains the calendar the LAST emission per type equals the
    * batch row — the spec pins that equality. */
  def silenceStreaks(days: Dataset[(String, Long)]): Dataset[SilOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long)],
       state: GroupState[SilState]) =>
        var st = state.getOption.getOrElse(
          SilState(Long.MinValue, 0L, 0L, 0L, 0L, 0L, None))
        for ((_, day) <- it.toSeq.sortBy(_._2)) {
          if (st.nDays == 0L) st = SilState(day, day, day, 1L, 0L, 0L, None)
          else {
            val gap = day - st.prevDay - 1
            st = SilState(day, st.minDay, day, st.nDays + 1,
              st.nRuns + (if (gap >= 1) 1L else 0L),
              math.max(st.maxGap, gap),
              if (gap >= 1) Some(day - 1) else st.lastGapEnd)
          }
        }
        state.update(st)
        if (st.nDays == 0L) Iterator.empty
        else {
          val span = st.maxDay - st.minDay + 1
          Iterator(SilOut(tpe, st.nDays, span, st.nRuns, st.maxGap,
            st.lastGapEnd, st.nDays * 1000 / span))
        }
    }
  }

  case class RtState(prevC: Long, prevSgn: Long, nUp: Long, nDown: Long,
                     nRuns: Long)
  case class RtOut(event_type: String, n_up: Long, n_down: Long,
                   n_runs: Long, n_moves: Long, exp_runs_milli: Long,
                   verdict_sign: Long)

  /** Streaming counterpart of events_runs_test — also O(1) state: the
    * Wald–Wolfowitz run count only needs the previous day's count and
    * the previous nonzero move sign (ties dropped exactly like the
    * batch lag windows), plus the three counters. Five longs per type,
    * at any stream length. Same input contract as [[recordDays]]; the
    * expectation and verdict recompute per emission from the counters
    * on the batch lattice verbatim (2000·n⁺·n⁻ div n, sign of
    * R·n − (n + 2·n⁺·n⁻) — |counters| are calendar-bounded so nothing
    * overflows). Types with no nonzero move emit nothing, matching the
    * batch filter. */
  def runsTest(days: Dataset[(String, Long, Long)]): Dataset[RtOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[RtState]) =>
        var st = state.getOption.getOrElse(
          RtState(Long.MinValue, 0L, 0L, 0L, 0L))
        for ((_, day, c) <- it.toSeq.sortBy(_._2)) {
          if (st.prevC == Long.MinValue) st = st.copy(prevC = c)
          else {
            val sgn = java.lang.Long.signum(c - st.prevC).toLong
            if (sgn == 0L) st = st.copy(prevC = c)
            else st = RtState(c, sgn,
              st.nUp + (if (sgn > 0) 1L else 0L),
              st.nDown + (if (sgn < 0) 1L else 0L),
              st.nRuns + (if (sgn != st.prevSgn) 1L else 0L))
          }
        }
        state.update(st)
        val n = st.nUp + st.nDown
        if (n == 0L) Iterator.empty
        else Iterator(RtOut(tpe, st.nUp, st.nDown, st.nRuns, n,
          1000L + 2000L * st.nUp * st.nDown / n,
          java.lang.Long.signum(
            st.nRuns * n - (n + 2L * st.nUp * st.nDown)).toLong))
    }
  }

  case class MkState(days: Seq[(Long, Long)])
  case class MkOut(event_type: String, n_days: Long, s_stat: Long,
                   n_pairs: Long, trend_sign: Long, abs_tau_milli: Long)

  /** Streaming counterpart of events_trend_mann_kendall: every batch
    * folds the new daily counts into the per-type series and re-scores
    * S = Σ_{i<j} sign(c_j − c_i) over the days seen so far — the
    * monitoring read ("does the data CURRENTLY show monotone drift").
    * State is the per-type (day, count) series: CALENDAR-bounded like
    * changepoint's, never event-volume-bounded; the O(d²) re-score at
    * ≤ a-few-thousand days is microseconds. Input is the upstream
    * watermarked (type, day, count) aggregate, each day delivered once
    * (the ewma contract). Arithmetic is the batch lattice verbatim —
    * |S| ≤ d²/2 so nothing can overflow, abs happens BEFORE the
    * truncating division exactly like the batch operator — so once the
    * stream has drained the calendar its LAST emission per type equals
    * the batch row; the spec pins that equality. Types with a single
    * day have no pairs and emit nothing, matching the batch inner-join
    * drop. */
  def mannKendall(days: Dataset[(String, Long, Long)]): Dataset[MkOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[MkState]) =>
        val st = state.getOption.getOrElse(MkState(Seq.empty))
        val ds = (st.days ++ it.map(e => (e._2, e._3))).sortBy(_._1)
        state.update(MkState(ds))
        val n = ds.length
        if (n < 2) Iterator.empty
        else {
          val cs = ds.map(_._2).toArray
          var s = 0L
          var i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              s += java.lang.Long.signum(cs(j) - cs(i)); j += 1
            }
            i += 1
          }
          val pairs = n.toLong * (n - 1) / 2
          Iterator(MkOut(tpe, n.toLong, s, pairs,
            java.lang.Long.signum(s).toLong, math.abs(s) * 1000 / pairs))
        }
    }
  }

  case class CpState(hours: Seq[(Long, Long)])
  case class CpOut(event_type: String, n_hours: Long, split_i: Long,
                   split_hour: Long, gain_fp: Long,
                   mean_left_milli: Long, mean_right_milli: Long)

  /** Streaming counterpart of events_changepoint_binseg's first split:
    * every batch re-runs the prefix-sum argmax over the hourly series
    * seen so far and emits the refreshed best split per updated type —
    * the monitoring read ("where does the data CURRENTLY say behavior
    * shifted"). State is the per-type (hour, count) series: bounded by
    * the CALENDAR — the very relation the batch operator materializes
    * per type (8.8k cells/year) — never by event volume; input is the
    * upstream watermarked hourly aggregate, per-key ascending across
    * batches (the ewma contract). Arithmetic is the batch operator's
    * exact integer lattice verbatim (all-positive truncating divs, ties
    * to the earliest split), so once the stream has seen the whole
    * series its LAST emission per type equals the batch row exactly —
    * the spec pins that equality. Types with one occupied hour have no
    * admissible split and emit nothing, matching the batch drop.
    *
    * Overflow is LOUD, mirroring the batch operator's ANSI semantics:
    * the squared prefix sums s1² / (s−s1)² / s² wrap Long once a type's
    * cumulative count passes ~3.04e9 (sqrt(Long.MaxValue)), so like
    * queueWait the twin uses multiplyExact/addExact and throws there
    * instead of silently corrupting every later split (ADVICE r9). */
  def changepoint(hours: Dataset[(String, Long, Long)]): Dataset[CpOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[CpState]) =>
        val st = state.getOption.getOrElse(CpState(Seq.empty))
        val hs = (st.hours ++ it.map(e => (e._2, e._3))).sortBy(_._1)
        state.update(CpState(hs))
        val n = hs.length.toLong
        if (n < 2) Iterator.empty
        else {
          val s = hs.map(_._2).foldLeft(0L)(Math.addExact)
          var best: CpOut = null
          var s1 = 0L
          for (((hour, x), idx) <- hs.zipWithIndex; if idx < n - 1) {
            s1 = Math.addExact(s1, x)
            val i = idx + 1L
            val s2 = s - s1
            val gain = Math.multiplyExact(s1, s1) / i +
              Math.multiplyExact(s2, s2) / (n - i) -
              Math.multiplyExact(s, s) / n
            if (best == null || gain > best.gain_fp)
              best = CpOut(tpe, n, i, hour, gain,
                s1 * 1000 / i, (s - s1) * 1000 / (n - i))
          }
          Iterator(best)
        }
    }
  }

  case class QwState(i: Long, minX: Long, n: Long, nWaited: Long,
                     maxW: Long, sumW: Long)
  case class QwOut(event_type: String, n_arrivals: Long, n_waited: Long,
                   max_wait_ms: Long, mean_wait_ms: Long)

  /** Streaming counterpart of events_queue_wait — the twin the Lindley
    * recursion was BORN for: W_i = max(0, W_{i−1} + S − gap_i) is an
    * online recurrence, and the batch operator's running-min reduction
    * (x_i = S·i − A_i, W_i = x_i − min_{k≤i} x_k) carries across
    * micro-batches as TWO longs — the arrival index and the running min
    * of x. Unlike the sample/series twins above the state here is O(1)
    * per key with no calendar bound needed: six longs, at any stream
    * length. Input is (event_type, ts_ns, event_id), per-key ascending
    * across batches (the ewma contract); within a batch rows sort on
    * (ts_ns, event_id), matching the batch window order exactly. Each
    * batch emits the refreshed whole-prefix aggregate on the same
    * exact-ms lattice (wms is non-negative, so truncating div ==
    * floor), so once the stream has drained the series the LAST
    * emission per type equals the batch operator's row — the spec pins
    * that equality whole-vs-split.
    *
    * Overflow is LOUD, mirroring the batch operator's ANSI semantics:
    * i·svcNs wraps Long near 3e8 arrivals per type, and on a DIVERGENT
    * queue (mean gap < S) sumW grows ~i² and wraps first, near 2.5e7 —
    * multiplyExact/addExact throw there instead of silently corrupting
    * every later emission (r9 review finding). A stream that trips this
    * has a structurally-overloaded queue; the fix is a shorter service
    * time or windowed restarts, not a bigger integer. */
  def queueWait(events: Dataset[(String, Long, Long)],
                svcNs: Long = 30000000000L): Dataset[QwOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[QwState]) =>
        val st = state.getOption.getOrElse(
          QwState(0L, Long.MaxValue, 0L, 0L, 0L, 0L))
        var (i, minX, n, nw, mx, sm) =
          (st.i, st.minX, st.n, st.nWaited, st.maxW, st.sumW)
        for ((_, ts, _) <- it.toArray.sortBy(e => (e._2, e._3))) {
          i += 1
          val x = Math.subtractExact(Math.multiplyExact(i, svcNs), ts)
          if (x < minX) minX = x
          val w = (x - minX) / 1000000L
          n += 1
          if (w > 0) nw += 1
          if (w > mx) mx = w
          sm = Math.addExact(sm, w)
        }
        state.update(QwState(i, minX, n, nw, mx, sm))
        if (n == 0) Iterator.empty
        else Iterator(QwOut(tpe, n, nw, mx, sm / n))
    }
  }

  case class SaxState(days: Seq[(Long, Long)])
  case class SaxOut(event_type: String, n_days: Long, motif: String,
                    n_windows: Long)

  /** Streaming counterpart of events_sax_motifs. The tercile symbols are
    * RANK-based over the whole series — a late day can re-symbolize every
    * earlier day — so like [[changepoint]] the twin re-runs the exact
    * batch discretization per micro-batch over the per-type (day, count)
    * series and emits the refreshed motif histogram for every updated
    * type. State is CALENDAR-bounded (≤365 cells/type/year), never
    * event-volume-bounded; input is the upstream watermarked daily
    * aggregate emitting each day once (the changepoint contract, though
    * re-ranking makes arrival order immaterial here). Symbols replay the
    * batch lattice verbatim — 0-based (c, day) rank ·3 div n — and each
    * run of three consecutive calendar days contributes one motif, so
    * once the stream has drained the series the rows of the LAST
    * emission per type (the max-n_days rows the spec selects) equal the
    * batch operator's exactly. Types still under 3 days emit nothing. */
  def saxMotifs(days: Dataset[(String, Long, Long)]): Dataset[SaxOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[SaxState]) =>
        val st = state.getOption.getOrElse(SaxState(Seq.empty))
        val ds = st.days ++ it.map(e => (e._2, e._3))
        state.update(SaxState(ds))
        val n = ds.length
        if (n < 3) Iterator.empty
        else {
          val sym = ds.sortBy { case (d, c) => (c, d) }.zipWithIndex
            .map { case ((d, _), i) => d -> i.toLong * 3 / n }.toMap
          val byDay = ds.map(_._1).sorted
          byDay.sliding(3).collect {
            case Seq(d2, d1, d0) if d1 == d0 - 1 && d2 == d0 - 2 =>
              s"${sym(d2)}${sym(d1)}${sym(d0)}"
          }.toSeq.groupBy(identity)
            .map { case (m, xs) => SaxOut(tpe, n.toLong, m, xs.size.toLong) }
            .iterator
        }
    }
  }

  case class DdState(runMax: Long, nDays: Long, maxDd: Long, maxDdm: Long,
                     nBelow: Long)
  case class DdOut(event_type: String, n_days: Long, peak_daily: Long,
                   max_drawdown: Long, max_dd_milli: Long,
                   n_days_below_peak10: Long)

  /** Streaming counterpart of events_max_drawdown — O(1) state (the
    * queueWait class): the drawdown statistic at each day only needs the
    * running maximum and three extrema counters — five longs per type at
    * any calendar length. Input is the upstream watermarked
    * (type, day, count) aggregate, per-key ascending, each day once;
    * within a batch rows sort by day. Same nonnegative lattice as the
    * batch operator (ddm = (run_max − c)·1000 / run_max, run_max ≥ 1),
    * so once the stream drains the calendar the LAST emission per type
    * equals the batch row — the spec pins that equality. */
  def maxDrawdown(days: Dataset[(String, Long, Long)]): Dataset[DdOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[DdState]) =>
        var st = state.getOption.getOrElse(DdState(0L, 0L, 0L, 0L, 0L))
        for ((_, day, c) <- it.toSeq.sortBy(_._2)) {
          val runMax = math.max(st.runMax, c)
          val dd = runMax - c
          val ddm = dd * 1000L / runMax
          st = DdState(runMax, st.nDays + 1,
            math.max(st.maxDd, dd), math.max(st.maxDdm, ddm),
            st.nBelow + (if (ddm >= 100L) 1L else 0L))
        }
        state.update(st)
        if (st.nDays == 0L) Iterator.empty
        else Iterator(DdOut(tpe, st.nDays, st.runMax, st.maxDd, st.maxDdm,
          st.nBelow))
    }
  }

  case class SpState(llr: Long, n: Long, decision: String, step: Long)
  case class SpOut(event_type: String, n_obs: Long, final_llr_fp: Long,
                   decision: String, decision_step: Long)

  /** Streaming counterpart of events_sprt_gate — O(1) state, and the
    * member of the family where streaming is the NATIVE shape (a
    * sequential test exists to stop a live stream early): the cumulative
    * LLR, the observation counter and the first-crossing verdict/step —
    * two longs and a tag per type. Input is the event-grain
    * (type, ts_ns, event_id, value_milli) stream, per-key ascending in
    * (ts_ns, event_id) across batches (the queueWait contract); within a
    * batch rows sort the same way. The ×2^20 literals and the ±3087468
    * boundaries replay the batch lattice verbatim, and the decision is
    * LATCHED at the first crossing exactly like the batch min_by — later
    * excursions only update the audit fields. Drained stream ⇒ last
    * emission equals the batch row (spec-pinned). */
  def sprtGate(events: Dataset[(String, Long, Long, Long)]): Dataset[SpOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long, Long)],
       state: GroupState[SpState]) =>
        var st = state.getOption.getOrElse(SpState(0L, 0L, "", -1L))
        for ((_, _, _, vMilli) <- it.toSeq.sortBy(e => (e._2, e._3))) {
          val inc = if (vMilli >= 50000L) 301656L else -161639L
          val llr = Math.addExact(st.llr, inc)
          val n = st.n + 1
          val (dec, step) =
            if (st.decision.nonEmpty) (st.decision, st.step)
            else if (llr >= 3087468L) ("accept_h1", n)
            else if (llr <= -3087468L) ("accept_h0", n)
            else ("", -1L)
          st = SpState(llr, n, dec, step)
        }
        state.update(st)
        if (st.n == 0L) Iterator.empty
        else Iterator(SpOut(tpe, st.n, st.llr,
          if (st.decision.isEmpty) "continue" else st.decision, st.step))
    }
  }

  case class WbState(n: Long, k: Long)
  case class WbOut(event_type: String, n: Long, k: Long, phat_milli: Long,
                   wilson_lo_micro: Long, wilson_hi_micro: Long)

  /** Streaming counterpart of events_wilson_bounds — the smallest
    * possible state on the board (two longs: trials and successes); the
    * whole closed form including the exact integer sqrt replays per
    * emission from the counters. Input is the event-grain
    * (type, value_milli) stream; arrival order is immaterial (the
    * statistic is a pair of commutative counters — any batch split
    * replays identically, the diurnalDft argument). Drained stream ⇒
    * last emission equals the batch row (spec-pinned). */
  def wilsonBounds(events: Dataset[(String, Long)]): Dataset[WbOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long)],
       state: GroupState[WbState]) =>
        var st = state.getOption.getOrElse(WbState(0L, 0L))
        for ((_, vMilli) <- it)
          st = WbState(st.n + 1, st.k + (if (vMilli >= 50000L) 1L else 0L))
        state.update(st)
        if (st.n == 0L) Iterator.empty
        else {
          val n = st.n; val k = st.k
          // Two-step long division (exact: A = qn + r ⇒ floor(A·c/n) =
          // q·c + floor(r·c/n)) — never forms the A·1e8 product that
          // wraps signed 64-bit at ~6e5 events/type. multiplyExact so
          // the k(n−k) envelope (n ≲ 6.07e9) overflows loudly.
          val bigA = Math.multiplyExact(k, n - k)
          val a = Math.addExact(
            Math.multiplyExact(bigA / n, 100000000L),
            (bigA % n) * 100000000L / n + 96040000L)
          val s0 = math.sqrt(a.toDouble).toLong
          val r = if ((s0 + 1) * (s0 + 1) <= a) s0 + 1
                  else if (s0 * s0 > a) s0 - 1 else s0
          val den = n * 10000L + 38416L
          Iterator(WbOut(tpe, n, k, k * 1000L / n,
            (k * 10000000000L + 19208000000L - 1960000L * r) / den,
            (k * 10000000000L + 19208000000L + 1960000L * r) / den))
        }
    }
  }

  case class TiState(buckets: Seq[(Long, Long)])
  case class TiOut(event_type: String, n_buckets: Long, slope_sign: Long,
                   slope_abs_milli: Long, alpha_milli: Long)

  /** Streaming counterpart of events_tail_index — COUNTER state (the
    * diurnalDft class): one count per dyadic value bucket (~20 cells
    * per type at any volume), counter addition commutes so arrival
    * order and batch splits are immaterial; the OLS replays per
    * emission from the counters on the batch lattice verbatim
    * (floor-log2 via bit length on both the bucket and its count).
    * Drained stream ⇒ last emission equals the batch row
    * (spec-pinned). */
  def tailIndex(events: Dataset[(String, Long)]): Dataset[TiOut] = {
    import events.sparkSession.implicits._
    def log2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long)],
       state: GroupState[TiState]) =>
        val m = scala.collection.mutable.Map(
          state.getOption.getOrElse(TiState(Seq.empty)).buckets: _*)
        for ((_, v) <- it if v >= 1024L) {
          val b = log2(v)
          m(b) = m.getOrElse(b, 0L) + 1L
        }
        state.update(TiState(m.toSeq))
        if (m.isEmpty) Iterator.empty
        else {
          val rows = m.toSeq.map { case (b, nb) => (b, log2(nb)) }
          val n = rows.length.toLong
          val sx = rows.map(_._1).sum
          val sy = rows.map(_._2).sum
          val sxy = rows.map(r => r._1 * r._2).sum
          val sxx = rows.map(r => r._1 * r._1).sum
          val cov = n * sxy - sx * sy
          val varx = math.max(n * sxx - sx * sx, 1L)
          val absM = math.abs(cov) * 1000L / varx
          Iterator(TiOut(tpe, n, java.lang.Long.signum(cov).toLong, absM,
            if (cov < 0) absM else 0L))
        }
    }
  }

  case class LbState(days: Seq[(Long, Long)])
  case class LbOut(event_type: String, n_days: Long, r1_milli: Long,
                   r2_milli: Long, r3_milli: Long, r4_milli: Long,
                   q_milli: Long, white_flag: Long)

  /** Streaming counterpart of events_ljung_box. The autocorrelations
    * demean against the FINAL mean (dev = n·c − S), so every arriving
    * day re-weights all earlier products — like [[changepoint]] the
    * twin re-runs the exact batch lattice per micro-batch over the
    * stored per-type (day, count) series (calendar-bounded state).
    * Contiguity gates replay verbatim: lag-k products count only when
    * the row k back is also the day k back. Drained stream ⇒ last
    * emission equals the batch row (spec-pinned). */
  def ljungBox(days: Dataset[(String, Long, Long)]): Dataset[LbOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[LbState]) =>
        val st = LbState(state.getOption.getOrElse(LbState(Seq.empty)).days
          ++ it.map(e => (e._2, e._3)))
        state.update(st)
        val ds = st.days.sortBy(_._1).toArray
        val n = ds.length.toLong
        if (n == 0L) Iterator.empty
        else {
          val s = ds.map(_._2).sum
          val dev = ds.map { case (_, c) => n * c - s }
          val varn = math.max(dev.map(d => d * d).sum, 1L)
          val rs = (1 to 4).map { k =>
            var cov = 0L
            for (i <- k until ds.length)
              if (ds(i - k)._1 == ds(i)._1 - k) cov += dev(i) * dev(i - k)
            java.lang.Long.signum(cov).toLong *
              (math.abs(cov) * 1000L / varn)
          }
          val q = (n * (n + 2) * rs.zipWithIndex.map { case (r, i) =>
            r * r / math.max(n - (i + 1), 1L)
          }.sum) / 1000L
          Iterator(LbOut(tpe, n, rs(0), rs(1), rs(2), rs(3), q,
            if (q < 9488L) 1L else 0L))
        }
    }
  }

  case class ItsState(days: Seq[(Long, Long)])
  case class ItsOut(event_type: String, n_pre: Long, n_post: Long,
                    mean_pre_milli: Long, mean_post_milli: Long,
                    jump_milli: Long, slope_pre_sign: Long,
                    slope_pre_abs_milli: Long, slope_post_sign: Long,
                    slope_post_abs_milli: Long)

  /** Streaming counterpart of events_intervention_its. The break sits
    * at the midpoint of each type's OWN observed span, so every
    * arriving day can move the breakpoint and re-assign segment
    * membership — calendar-bounded re-scan state (the changepoint
    * class). Both segment OLS fits replay the batch sufficient-
    * statistics lattice verbatim per emission. Drained stream ⇒ last
    * emission equals the batch row (spec-pinned). A single-day span
    * puts EVERY row in the post segment (x=0 ≥ span div 2 = 0 — all
    * POST, not pre): like the batch operator's greatest(n,1) guard,
    * the empty segment reads mean 0 / slope 0 and the row still
    * emits. */
  def interventionIts(days: Dataset[(String, Long, Long)]): Dataset[ItsOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[ItsState]) =>
        val st = ItsState(state.getOption.getOrElse(ItsState(Seq.empty)).days
          ++ it.map(e => (e._2, e._3)))
        state.update(st)
        val ds = st.days.sortBy(_._1)
        if (ds.isEmpty) Iterator.empty
        else {
          val d0 = ds.head._1
          val span = ds.last._1 - d0 + 1
          val cut = span / 2
          case class Acc(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long)
          def fold(rows: Seq[(Long, Long)]): Acc =
            rows.foldLeft(Acc(0, 0, 0, 0, 0)) { case (a, (day, c)) =>
              val x = day - d0
              Acc(a.n + 1, a.sx + x, a.sy + c, a.sxy + x * c, a.sxx + x * x)
            }
          val (pre, post) = ds.partition { case (day, _) => day - d0 < cut }
          val (ap, aq) = (fold(pre), fold(post))
          def slope(a: Acc): (Long, Long) = {
            val cov = a.n * a.sxy - a.sx * a.sy
            val vx = math.max(a.n * a.sxx - a.sx * a.sx, 1L)
            (java.lang.Long.signum(cov).toLong,
              math.abs(cov) * 1000L / vx)
          }
          val (s0, m0) = slope(ap); val (s1, m1) = slope(aq)
          val mPre = ap.sy * 1000L / math.max(ap.n, 1L)
          val mPost = aq.sy * 1000L / math.max(aq.n, 1L)
          Iterator(ItsOut(tpe, ap.n, aq.n, mPre, mPost, mPost - mPre,
            s0, m0, s1, m1))
        }
    }
  }

  case class PhState(days: Seq[(Long, Long)])
  case class PhOut(event_type: String, n_days: Long, n_calib: Long,
                   max_ph: Long, n_alarm_days: Long,
                   first_alarm_day: Option[Long])

  /** Streaming counterpart of events_page_hinkley. The calibration
    * window is the FIRST HALF OF THE FINAL HORIZON (n0 = n div 2), so a
    * new day can re-assign earlier days between calibration and test —
    * like [[changepoint]] the twin re-runs the exact batch lattice per
    * micro-batch over the stored per-type (day, count) series. State is
    * CALENDAR-bounded (≤365 cells/type/year), never event-volume-
    * bounded; input is the upstream watermarked daily aggregate emitting
    * each day once. Drained stream ⇒ last emission equals the batch row
    * (spec-pinned). */
  def pageHinkley(days: Dataset[(String, Long, Long)]): Dataset[PhOut] = {
    import days.sparkSession.implicits._
    days.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[PhState]) =>
        val st = PhState(state.getOption.getOrElse(PhState(Seq.empty)).days
          ++ it.map(e => (e._2, e._3)))
        state.update(st)
        val ds = st.days.sortBy(_._1)
        val n = ds.length.toLong
        if (n == 0L) Iterator.empty
        else {
          val n0 = n / 2
          val s0 = ds.take(n0.toInt).map(_._2).foldLeft(0L)(Math.addExact)
          var g = 0L; var rmin = 0L; var maxPh = 0L; var nAlarm = 0L
          var firstAlarm: Option[Long] = None
          for ((((day, c)), i) <- ds.zipWithIndex) {
            val rn = i + 1L
            val dev = if (rn > n0)
              Math.subtractExact(Math.multiplyExact(c, n0), s0) else 0L
            g = Math.addExact(g, dev)
            rmin = math.min(rmin, g)
            val ph = g - math.min(0L, rmin)
            maxPh = math.max(maxPh, ph)
            if (rn > n0 && ph > 5L * s0) {
              nAlarm += 1
              if (firstAlarm.isEmpty) firstAlarm = Some(day)
              else firstAlarm = Some(math.min(firstAlarm.get, day))
            }
          }
          Iterator(PhOut(tpe, n, n0, maxPh, nAlarm, firstAlarm))
        }
    }
  }

  case class FlapState(last: Long, n: Long, nerr: Long, flips: Long)
  case class FlapOut(user_id: Long, n_events: Long, n_err: Long,
                     n_flips: Long, flap_milli: Long)

  /** Streaming counterpart of events_flap_rate — O(1) state per user
    * (last binary state + three counters). Input rows are (user_id,
    * ts_ns, event_id, state01); each micro-batch sorts its rows by the
    * batch operator's (ts, event_id) total order (the runsTest
    * discipline — flip counting is order-sensitive within a batch;
    * across batches the upstream watermark delivers event-time order).
    * Drained stream ⇒ last emission equals the batch row
    * (spec-pinned). */
  def flapRate(events: Dataset[(Long, Long, Long, Long)]): Dataset[FlapOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (user: Long, it: Iterator[(Long, Long, Long, Long)],
       state: GroupState[FlapState]) =>
        var st = state.getOption.getOrElse(FlapState(-1L, 0L, 0L, 0L))
        for ((_, _, _, s) <- it.toSeq.sortBy(e => (e._2, e._3))) {
          st = FlapState(s, st.n + 1, st.nerr + s,
            st.flips + (if (st.last >= 0L && s != st.last) 1L else 0L))
        }
        state.update(st)
        if (st.n == 0L) Iterator.empty
        else Iterator(FlapOut(user, st.n, st.nerr, st.flips,
          if (st.n <= 1L) 0L else st.flips * 1000L / (st.n - 1L)))
    }
  }

  case class LocfState(lastHour: Long, lastValue: Long)
  case class LocfOut(event_type: String, hour: Long, n_events: Long,
                     value_milli_locf: Long, is_filled: Long)

  /** Streaming counterpart of events_gap_fill_locf — O(1) state (last
    * observed hour + its LOCF value). Input is the upstream watermarked
    * (type, hour, n_events, value_milli) aggregate emitting each
    * OBSERVED hour once in ascending order; on each arrival the twin
    * emits the gap hours since the last observation (n_events = 0,
    * value carried forward, is_filled = 1) and then the observed row —
    * so the drained concatenation equals the batch calendar rows
    * exactly (spec-pinned). The batch calendar starts at each type's
    * own min hour, which is also the twin's first arrival. */
  def gapFillLocf(hours: Dataset[(String, Long, Long, Long)])
      : Dataset[LocfOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long, Long)],
       state: GroupState[LocfState]) =>
        var st = state.getOption.getOrElse(LocfState(Long.MinValue, 0L))
        val out = scala.collection.mutable.ArrayBuffer.empty[LocfOut]
        for ((_, hour, nEvents, valueMilli) <- it.toSeq.sortBy(_._2)) {
          if (st.lastHour != Long.MinValue) {
            var h = st.lastHour + 1
            while (h < hour) {
              out += LocfOut(tpe, h, 0L, st.lastValue, 1L)
              h += 1
            }
          }
          out += LocfOut(tpe, hour, nEvents, valueMilli, 0L)
          st = LocfState(hour, valueMilli)
        }
        state.update(st)
        out.iterator
    }
  }

  case class BudgetState(cumErr: Long, cumTotal: Long)
  case class BudgetOut(hour_id: Long, n_total: Long, n_err: Long,
                       burn_milli: Long, cum_burn_milli: Long,
                       over_budget: Boolean)

  /** Streaming counterpart of events_error_budget — O(1) GLOBAL state
    * (cumulative error/total counters; the SLO burn is corpus-global by
    * definition, so the single-key state task is the honest shape).
    * Input is the upstream watermarked per-hour (hour, total, err)
    * aggregate emitting each hour once, ascending; each arrival emits
    * the batch operator's row for that hour — running burn and the
    * over-budget verdict against the shared
    * [[graft.operators.Analytics.SLO_MILLI]]. Drained stream ⇒ the
    * emission sequence equals the batch rows exactly (spec-pinned). */
  def errorBudget(hours: Dataset[(Long, Long, Long)]): Dataset[BudgetOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_ => 0).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: Int, it: Iterator[(Long, Long, Long)],
       state: GroupState[BudgetState]) =>
        var st = state.getOption.getOrElse(BudgetState(0L, 0L))
        val out = scala.collection.mutable.ArrayBuffer.empty[BudgetOut]
        for ((hour, nTotal, nErr) <- it.toSeq.sortBy(_._1)) {
          st = BudgetState(Math.addExact(st.cumErr, nErr),
            Math.addExact(st.cumTotal, nTotal))
          out += BudgetOut(hour, nTotal, nErr,
            nErr * 1000L / nTotal,
            st.cumErr * 1000L / st.cumTotal,
            st.cumErr * 1000L / st.cumTotal > graft.operators.Analytics.SLO_MILLI)
        }
        state.update(st)
        out.iterator
    }
  }

  case class RunState(runStart: Long, runHours: Long, runErrs: Long,
                      lastHour: Long, open: Boolean)
  case class RunOut(run_start_hour: Long, n_hours: Long, total_errs: Long)

  /** Streaming counterpart of events_incident_runs — O(1) run-length
    * state (open incident's start/length/error-mass + last breached
    * hour). Input is the per-hour (hour, total, err) aggregate
    * ascending; an incident EMITS when it closes — a non-breached
    * successor hour or a gap breaks the consecutive-breach island
    * exactly as the batch islands-by-(hour − row_number) grouping does.
    * The honest Append-mode semantics: a still-open incident has no
    * final row yet (the batch sheet on a corpus ending mid-incident
    * carries that one extra open row; the spec flushes it with a
    * sentinel healthy hour and pins exact equality). */
  def incidentRuns(hours: Dataset[(Long, Long, Long)]): Dataset[RunOut] = {
    import hours.sparkSession.implicits._
    val slo = graft.operators.Analytics.SLO_MILLI
    hours.groupByKey(_ => 0).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: Int, it: Iterator[(Long, Long, Long)],
       state: GroupState[RunState]) =>
        var st = state.getOption.getOrElse(
          RunState(0L, 0L, 0L, Long.MinValue, open = false))
        val out = scala.collection.mutable.ArrayBuffer.empty[RunOut]
        for ((h, nTotal, nErr) <- it.toSeq.sortBy(_._1)) {
          val breached = nErr * 1000L / nTotal > slo
          if (st.open && (h > st.lastHour + 1 || !breached)) {
            out += RunOut(st.runStart, st.runHours, st.runErrs)
            st = st.copy(open = false)
          }
          if (breached) {
            st = if (st.open)
              RunState(st.runStart, st.runHours + 1,
                Math.addExact(st.runErrs, nErr), h, open = true)
            else RunState(h, 1L, nErr, h, open = true)
          }
        }
        state.update(st)
        out.iterator
    }
  }

  case class PeakState(nHours: Long, nEvents: Long, peak: Long,
                       peakHour: Long)
  case class PeakOut(event_type: String, n_hours: Long, peak: Long,
                     peak_hour: Long, mean_hourly: Long,
                     peak_to_mean_milli: Long)

  /** Streaming counterpart of events_peak_to_mean — O(1) state
    * (hours, events, peak, peak-hour). Input contract matches
    * [[burstiness]]: the upstream watermarked (type, hour, count)
    * aggregate emits each observed hour once, ascending; keeping the
    * FIRST hour that attains a new maximum (later equal counts fail
    * the strict `>`) reproduces the batch `max_by(hour, c·2^20 − hour)`
    * min-hour tie-break exactly. Drained stream ⇒ last emission equals
    * the batch row (spec-pinned). */
  def peakToMean(hours: Dataset[(String, Long, Long)]): Dataset[PeakOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[PeakState]) =>
        var st = state.getOption.getOrElse(PeakState(0L, 0L, 0L, 0L))
        for ((_, h, c) <- it.toSeq.sortBy(_._2)) {
          st = PeakState(st.nHours + 1, Math.addExact(st.nEvents, c),
            if (c > st.peak) c else st.peak,
            if (c > st.peak) h else st.peakHour)
        }
        state.update(st)
        if (st.nHours == 0L) Iterator.empty
        else Iterator(PeakOut(tpe, st.nHours, st.peak, st.peakHour,
          st.nEvents / st.nHours,
          st.peak * st.nHours * 1000L / st.nEvents))
    }
  }

  case class BurstState(nHours: Long, nEvents: Long, peak: Long, sumsq: Long)
  case class BurstOut(event_type: String, n_hours: Long, n_events: Long,
                      peak: Long, mean_milli: Long, peak_to_mean_milli: Long,
                      fano_milli: Long)

  /** Streaming counterpart of events_burstiness — O(1) counter state
    * (hours, events, peak, Σc²; counter addition and max commute, so
    * arrival order and batch splits are immaterial — the diurnalDft
    * class). Input is the upstream watermarked (type, hour, count)
    * aggregate emitting each observed hour once; the milli formulas
    * replay the batch divide-by-n-FIRST lattice per emission. Drained
    * stream ⇒ last emission equals the batch row (spec-pinned). */
  def burstiness(hours: Dataset[(String, Long, Long)]): Dataset[BurstOut] = {
    import hours.sparkSession.implicits._
    hours.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (tpe: String, it: Iterator[(String, Long, Long)],
       state: GroupState[BurstState]) =>
        var st = state.getOption.getOrElse(BurstState(0L, 0L, 0L, 0L))
        for ((_, _, c) <- it) {
          st = BurstState(st.nHours + 1, Math.addExact(st.nEvents, c),
            math.max(st.peak, c),
            Math.addExact(st.sumsq, Math.multiplyExact(c, c)))
        }
        state.update(st)
        if (st.nHours == 0L) Iterator.empty
        else {
          val mean = st.nEvents / st.nHours
          Iterator(BurstOut(tpe, st.nHours, st.nEvents, st.peak,
            st.nEvents * 1000L / st.nHours,
            st.peak * st.nHours * 1000L / st.nEvents,
            ((st.sumsq / st.nHours) - mean * mean) * 1000L /
              math.max(mean, 1L)))
        }
    }
  }
}
