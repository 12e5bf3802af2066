package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus a feature-extract
  * stage shaped like a real decode pipeline (partition-wise batch
  * processing over a typed Dataset).
  *
  * STUB: `decodeFeatures` is where a real deployment would invoke an
  * image/audio decoder — those libraries are not in this container, so it
  * computes a deterministic 16-bin byte histogram instead. Everything
  * around it (schema, Dataset encoders, mapPartitions batching, partition
  * alignment, metadata passthrough) is the real Spark-side contract.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int, format: String)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long, features: Array[Double])

  /** Model documents as media blobs (payload = UTF-8 bytes) so the binary
    * plumbing is exercised on the driver testdata. */
  def fromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    t(s, dir, "documents").select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          col("source").as("format")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decode, integer core: 16-bin high-nibble byte histogram. A real
    * implementation would decode pixels/samples here. Kept in exact count
    * space so the checkable projection can carry a cross-engine oracle
    * (DuckDB recomputes the nibbles from `hex(encode(text))`). */
  def decodeCounts(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 4) += 1L
      i += 1
    }
    hist
  }

  /** L1-normalized feature vector over [[decodeCounts]] — the consumer-
    * facing embedding shape. */
  def decodeFeatures(payload: Array[Byte]): Array[Double] =
    if (payload.length == 0) new Array[Double](16)
    else decodeCounts(payload).map(_.toDouble / payload.length)

  /** Partition-wise feature extraction: one decoder init per partition
    * (the `it =>` prelude is where codec/model handles would be opened),
    * then streaming batch decode — the mapInPandas/mapPartitions shape. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder initialization would go here
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, decodeFeatures(r.payload))
      }
    }
  }

  /** Frame/chunk sampling: every Nth fixed-size window of the payload —
    * the video-frame-sample shape (binary slicing, no decode). */
  def frameSample(ds: Dataset[MediaRecord], chunkBytes: Int, everyN: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.payload.grouped(chunkBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 =>
          (r.media_id, idx.toLong, chunk)
      }
    }.toDF("media_id", "chunk_idx", "chunk")
  }

  /** Checkable projection: the INTEGER nibble counts serialized to one
    * string column — exact long arithmetic both engines render
    * identically, which upgrades this query from rows-only to a full
    * DuckDB hash oracle (normalized doubles would re-open the
    * double→string rendering divergence). The typed Dataset from
    * [[extractFeatures]] stays the consumer API; the counts exercise the
    * same decode core. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    fromDocuments(s, dir)
      .mapPartitions { it =>
        // per-partition decoder initialization would go here
        it.map(r => (r.media_id, r.kind, r.payload.length.toLong,
          decodeCounts(r.payload).mkString(",")))
      }
      .toDF("media_id", "kind", "n_bytes", "nibble_counts")
  }

  /** The frame-sample plumbing as an oracle-checked query: every 4th
    * 32-byte window of each payload, identified by the md5 of its hex
    * rendering (both engines hash the same uppercase hex string — DuckDB's
    * md5 is VARCHAR-only, so hashing raw bytes cross-engine is not an
    * option). Chunking is pure binary slicing — the decode stub never
    * runs — which is exactly the video-frame-sampling I/O shape: the
    * payload bytes stream through one narrow stage, nothing shuffles. */
  def multimodalFrameSample(s: SparkSession, dir: String): DataFrame =
    frameSample(fromDocuments(s, dir), chunkBytes = 32, everyN = 4)
      .select(col("media_id"), col("chunk_idx"),
        md5(hex(col("chunk")).cast("binary")).as("chunk_md5"))

  /** STFT-style audio framing — the OVERLAPPING-window twin of
    * [[multimodalFrameSample]]'s disjoint chunks, and the windowing
    * contract every spectrogram/mel pipeline starts from (25 ms frame /
    * 10 ms hop analog): 64-byte frames every 32 bytes (50% overlap, the
    * canonical STFT shape) over each AUDIO blob, complete frames only
    * (n_frames = (n_bytes − 64) div 32 + 1), every 8th frame emitted
    * with a deterministic fingerprint — the decode-free stand-in for
    * the per-frame FFT a real deployment would run here. Duration
    * assumes the meta contract's 16 kHz 16-bit mono (duration_ms =
    * n_bytes div 32). Plan: ONE narrow scan + generator — zero
    * shuffles; payload bytes never leave the scan task, only 16-byte
    * fingerprints and frame arithmetic survive the projection. The
    * framing lattice (start_byte = idx·32, hex offsets idx·64+1) is
    * integer-exact and mirrored in the DuckDB oracle. */
  def multimodalAudioWindows(s: SparkSession, dir: String): DataFrame =
    fromDocuments(s, dir).toDF()
      .filter(col("kind") === "audio")
      .select(col("media_id"), hex(col("payload")).as("hx"),
        expr("cast(length(payload) as bigint)").as("n_bytes"))
      .filter(col("n_bytes") >= 64)
      .withColumn("n_frames", expr("(n_bytes - 64) div 32 + 1"))
      .withColumn("duration_ms", expr("n_bytes div 32"))
      .select(col("media_id"), col("n_frames"), col("duration_ms"),
        explode(expr("sequence(0L, n_frames - 1, 8L)")).as("frame_idx"),
        col("hx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * 32).as("start_byte"),
        col("n_frames"), col("duration_ms"),
        md5(expr("cast(substring(hx, cast(frame_idx * 64 + 1 as int), 128) as binary)"))
          .as("frame_md5"))

  private val AUDIO_WINDOWS_SQL =
    """WITH b AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents WHERE doc_id % 3 = 1),
      |f AS (
      |  SELECT media_id, hx, (n_bytes - 64) // 32 + 1 AS n_frames,
      |    n_bytes // 32 AS duration_ms
      |  FROM b WHERE n_bytes >= 64)
      |SELECT media_id, i AS frame_idx, i * 32 AS start_byte,
      |  n_frames, duration_ms,
      |  md5(substr(hx, CAST(i * 64 + 1 AS BIGINT), 128)) AS frame_md5
      |FROM f, LATERAL unnest(generate_series(0,
      |  CAST(n_frames - 1 AS BIGINT))) t(i)
      |WHERE i % 8 = 0""".stripMargin

  /** Byte-size spectrum per media kind — the storage-planning read that
    * sizes decode batches, file compaction targets and shuffle block
    * expectations BEFORE any payload moves: kind × floor-log2(bytes)
    * bins (≤ kinds×64 rows at any corpus size) with media count, byte
    * mass and exact min/max. Pure narrow projection + one partial-agg
    * exchange; the payload itself never shuffles — only its length. */
  def multimodalSizeSpectrum(s: SparkSession, dir: String): DataFrame =
    fromDocuments(s, dir).toDF()
      .select(col("kind"), expr("cast(length(payload) as bigint)").as("nb"))
      .select(col("kind"),
        expr("cast(length(bin(nb)) - 1 as bigint)").as("size_bits"), col("nb"))
      .groupBy("kind", "size_bits")
      .agg(count(lit(1)).as("n_media"), sum("nb").as("byte_mass"),
        min("nb").as("min_bytes"), max("nb").as("max_bytes"))

  /** Media inventory per feed — the (source × kind) mix table a
    * multimodal ingest dashboard leads with: how many blobs and bytes
    * each feed contributes per modality, plus each kind's byte share
    * WITHIN its feed (exact milli — per-source totals ride a tiny
    * window over the ≤|sources|×3-row aggregate, never the blob scan).
    * Payload bytes never shuffle: the narrow projection drops them to a
    * length before the ONE partial-agg exchange. */
  def multimodalSourceMix(s: SparkSession, dir: String): DataFrame = {
    val wSrc = Window.partitionBy("format")
    fromDocuments(s, dir).toDF()
      .select(col("meta.format").as("format"), col("kind"),
        expr("cast(length(payload) as bigint)").as("nb"))
      .groupBy("format", "kind")
      .agg(count(lit(1)).as("n_media"), sum("nb").as("byte_mass"))
      .withColumn("src_bytes", sum("byte_mass").over(wSrc))
      .select(col("format"), col("kind"), col("n_media"), col("byte_mass"),
        col("src_bytes"),
        expr("byte_mass * 1000 div src_bytes").as("byte_share_milli"))
  }

  private val SOURCE_MIX_SQL =
    """WITH b AS (
      |  SELECT source AS format,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |c AS (SELECT format, kind, CAST(COUNT(*) AS BIGINT) AS n_media,
      |        CAST(SUM(nb) AS BIGINT) AS byte_mass
      |      FROM b GROUP BY 1, 2)
      |SELECT format, kind, n_media, byte_mass,
      |  CAST(SUM(byte_mass) OVER (PARTITION BY format) AS BIGINT) AS src_bytes,
      |  byte_mass * 1000
      |    // CAST(SUM(byte_mass) OVER (PARTITION BY format) AS BIGINT)
      |    AS byte_share_milli
      |FROM c""".stripMargin

  private val SIZE_SPECTRUM_SQL =
    """WITH b AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents)
      |SELECT kind, CAST(length(bin(nb)) - 1 AS BIGINT) AS size_bits,
      |  CAST(COUNT(*) AS BIGINT) AS n_media, CAST(SUM(nb) AS BIGINT) AS byte_mass,
      |  MIN(nb) AS min_bytes, MAX(nb) AS max_bytes
      |FROM b GROUP BY 1, 2""".stripMargin

  /** Content-addressed dedup of binary payloads — the CAS step every
    * multimodal corpus runs before feature extraction (identical images
    * re-crawled under different ids must decode once): group by
    * (byte length, content md5) and report each duplicate group with its
    * canonical (min) id. The length in the key is the production
    * prefilter — at 100 TB the length histogram prunes candidate groups
    * before any hash comparison, and here it also keeps the group key
    * collision-proof against md5-input truncation bugs. Payloads never
    * shuffle: only the 16-byte hash + length travel (the
    * data_snapshot_diff discipline applied to binary columns). md5 is
    * computed over the hex rendering because DuckDB's md5 only binds to
    * VARCHAR (the [[multimodalFrameSample]] precedent). */
  def multimodalDedupBytes(s: SparkSession, dir: String): DataFrame = {
    val media = fromDocuments(s, dir).toDF().select(col("media_id"), col("payload"))
    // the test corpus has no byte-identical payloads, so plant re-crawls:
    // every %9 payload re-appears under a mirrored negative id
    // (collision-free at any corpus size — the snapshot_diff discipline)
    val recrawled = media.filter(col("media_id") % 9 === 0)
      .withColumn("media_id", -col("media_id") - 1)
    media.unionByName(recrawled)
      .select(col("media_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(hex(col("payload")).cast("binary")).as("content_md5"))
      .groupBy("content_md5", "n_bytes")
      .agg(count(lit(1)).as("n_copies"), min("media_id").as("canonical_media_id"))
      .filter(col("n_copies") >= 2)
  }

  /** Chunk-level dedup over binary payloads — the shift-resistant CAS
    * layer [[multimodalDedupBytes]] cannot reach: a re-crawled payload
    * with a small leading edit shares NO whole-payload hash, but its
    * content-defined chunks re-synchronize right after the edit, so
    * chunk-level dedup still collapses ~all of its bytes. Planted
    * re-crawls (%9, mirrored negative id) carry an 8-byte prefix edit
    * for exactly this reason. Chunking + hashing run in ONE
    * mapPartitions pass (the documented multimodal decode-batching
    * shape — graft.functions.CdcChunks.chunkLengths is the same static
    * kernel the native Expression calls, and slicing here keeps payload
    * bytes OUT of every shuffle): only (16-byte md5, length, media_id)
    * rows reach the group-by. Hashes are md5 over the chunk's uppercase
    * hex rendering (DuckDB md5 binds to VARCHAR — the frame-sample
    * precedent). */
  def multimodalChunkDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").select(
      col("doc_id").as("media_id"), col("text"))
    val recrawled = media.filter(col("media_id") % 9 === 0)
      .select((-col("media_id") - 1).as("media_id"),
        concat(lit("edited: "), col("text")).as("text"))
    val hexDigits = "0123456789ABCDEF".toCharArray
    media.unionByName(recrawled).as[(Long, String)]
      .mapPartitions { it =>
        // per-partition codec/hasher init would go here
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          var off = 0
          graft.functions.CdcChunks.chunkLengths(bytes).iterator.map { len =>
            val hx = new Array[Byte](2 * len)
            var i = 0
            while (i < len) {
              val b = bytes(off + i) & 0xff
              hx(2 * i) = hexDigits(b >> 4).toByte
              hx(2 * i + 1) = hexDigits(b & 15).toByte
              i += 1
            }
            off += len
            md.reset()
            val dig = md.digest(hx)
            (dig.map(b => f"$b%02x").mkString, len.toLong, id)
          }
        }
      }
      .toDF("chunk_md5", "chunk_bytes", "media_id")
      .groupBy("chunk_md5", "chunk_bytes")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("media_id")).as("n_media"),
        min("media_id").as("first_media"))
      .filter(col("n_media") >= 2)
  }

  /** Perceptual near-dup fingerprint over binary payloads — the
    * modality-agnostic pHash layer between [[multimodalDedupBytes]]
    * (exact) and [[multimodalChunkDedup]] (shared-bytes accounting): a
    * 60-bit WEIGHTED simhash per payload (Charikar 2002 / Manku et al.
    * 2007, public literature) over the SET of its char 8-grams, each
    * gram weighted by an integer idf (floor-log2 N − floor-log2 df).
    * The weighting is load-bearing, not decoration: the r10 unweighted
    * cut read a cross-corpus median Hamming of 12 (every payload drawn
    * from the same Zipf vocabulary shares most of its gram mass, so
    * unweighted majorities correlate globally) while idf weighting
    * pushes strays to median ~29 and keeps the planted prefix-edited
    * re-crawls at ≤8 — separation by physics, not by threshold tuning.
    * A real deployment would swap char grams for decoded-frame features
    * — the documented decode-stub seam. Payloads under 256 bytes are
    * GATED OUT (a small edit on a tiny gram population is a large
    * angular move; tiny blobs belong to the exact CAS / chunk layers).
    * Candidate pairs come from 6×10-bit band buckets with a
    * 64-per-bucket degeneracy cap applied BEFORE any pair materializes
    * (band width scales with log2(corpus) in production — 10 bits fits
    * the gate corpus; the cap is what keeps a saturated band harmless),
    * survivors verify with bit_count(xor) ≤ 8. Gram explosion stays in
    * whole-stage codegen (sequence + substring — the Shingles
    * discipline, no interpreted HOF lambda); payload bytes never
    * shuffle (8-byte gram hashes and sigs do). */
  def multimodalPhashDedup(s: SparkSession, dir: String): DataFrame = {
    // gate BEFORE planting re-crawls: a sub-gate original must not
    // leave its 8-byte-longer edited twin behind as an unpairable
    // singleton (r10 review finding)
    val media = t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), col("text"))
      .filter(octet_length(col("text").cast("binary")) >= 256)
    val recrawled = media.filter(col("media_id") % 9 === 0)
      .select((-col("media_id") - 1).as("media_id"),
        concat(lit("edited: "), col("text")).as("text"))
    // r14: checkpoint WIDTH pinned (a bare ckpt materializes at the
    // AQE-coalesced width and the gram explode then ran 2-wide; the md5
    // stage was 2.9 s of the sealed 4.3 s), and the per-POSITION md5
    // replaced by an md5-once-per-DISTINCT-gram dictionary: the corpus
    // draws grams from a shared vocabulary, so positions >> distinct
    // grams (1.27 M vs 13 k at sf0.1 — ~100x fewer hashes; the text_
    // surprisal vocabulary-join discipline, shuffle-safe at any scale —
    // AQE broadcasts the dict while it is small). Hash values, dedup
    // key (media_id, h) and everything downstream are bit-identical.
    val gatedBase = media.unionByName(recrawled)
    val par = graft.Ckpt.wide(gatedBase) // volume-aware, floor = defaultParallelism
    val gated = graft.Ckpt.hashed(gatedBase,
      par, "media_id") // grams + the N fold both read it
    // One explicit gram-keyed exchange serves the (media, gram) dedup,
    // the dictionary dedup AND the dict join (all co-partitioned, zero
    // further exchanges; shuffle_hash because the planner would
    // otherwise broadcast the POSITIONS side — explode keeps the tiny
    // pre-explode size estimate). The extra (media_id, h) dedup after
    // the dict attach restores today's exact keyed-on-h semantics even
    // for 55-bit gram collisions.
    def positions: DataFrame = gated
      .select(col("media_id"), col("text"),
        explode(expr("sequence(0, length(text) - 8)")).as("i"))
      .select(col("media_id"),
        expr("substring(text, i + 1, 8)").as("gram"))
    // dict re-derives the explode on its own branch (narrow + parallel;
    // map-side partial dedup means only per-task distinct grams reach
    // its exchange) — sharing one exchange between dict and the join
    // stream is NOT reused under AQE and the 1.27M-row explode+shuffle
    // ran twice. shuffle_hash: the planner would otherwise broadcast
    // the POSITIONS side (explode keeps the tiny pre-explode estimate).
    val dict = positions.select("gram").dropDuplicates("gram")
      .withColumn("h",
        expr("cast(conv(substring(md5(cast(concat('ph:', gram)" +
          " as binary)), 1, 15), 16, 10) as bigint)"))
    val grams = graft.Ckpt.stamp(
      positions.repartition(par, col("gram"))
        .join(dict.hint("shuffle_hash"), Seq("gram"))
        .select("media_id", "h")
        .repartition(par, col("h"))
        .dropDuplicates("media_id", "h"), // set semantics: mass ≠ weight
      par, "h") // df fold + the weighted join read it, both keyed on h
    val dfr = grams.groupBy("h").agg(count(lit(1)).as("dfh"))
    val n = gated.agg(count(lit(1)).as("nd"))
    val bitCols = (0 until 60).map { j =>
      sum(expr(s"w * ((h >> $j) & 1)")).as(s"c$j")
    }
    val sigExpr = (0 until 60).map(j =>
      when(expr(s"2 * c$j >= tw"), expr(s"shiftleft(1L, $j)")).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    // Raw (media_id, h, w) rows pre-shuffle by media_id so the 61-sum
    // aggregate runs COMPLETE at full width: a map-side partial agg here
    // emits ~|media| 62-column rows per h-partitioned task (the overlap
    // blowup), and AQE then coalesces the fat merge to one task.
    val sigs = graft.Ckpt.stamp(grams.join(dfr, Seq("h"))
      .crossJoin(broadcast(n))
      .withColumn("w",
        expr("(length(bin(nd)) - 1) - (length(bin(dfh)) - 1)"))
      .select("media_id", "h", "w")
      .repartition(par, col("media_id"))
      .groupBy("media_id")
      .agg(sum("w").as("tw"), bitCols: _*)
      .select(col("media_id"), sigExpr.as("sig")),
      par, "media_id") // referenced by both band-join sides
    val bands = sigs.select(col("media_id"), col("sig"),
        explode(expr("array(0L, 1L, 2L, 3L, 4L, 5L)")).as("band"))
      .withColumn("bv", expr("(sig >> (band * 10)) & 1023"))
    val ok = bands.groupBy("band", "bv").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 64).select("band", "bv")
    val capped = bands.join(ok, Seq("band", "bv"))
    val a = capped.select(col("band"), col("bv"),
      col("media_id").as("media_a"), col("sig").as("sa"))
    val b = capped.select(col("band"), col("bv"),
      col("media_id").as("media_b"), col("sig").as("sb"))
    a.join(b, Seq("band", "bv")).filter(col("media_a") < col("media_b"))
      .withColumn("hamming", expr("cast(bit_count(sa ^ sb) as bigint)"))
      .filter(col("hamming") <= 8)
      .select("media_a", "media_b", "hamming").distinct()
  }

  /** Byte-entropy screen over binary payloads — the
    * compressed-vs-raw detector a multimodal curation pass runs before
    * wasting decode cycles (an already-deflated or encrypted blob reads
    * as near-uniform bytes; text/raw bitmaps read low): per payload,
    * the byte histogram folds to an EXACT floor-log2 entropy proxy
    * H ≈ ⌊log2 N⌋·1000 − Σ n_b·⌊log2 n_b⌋·1000 div N (bit lengths via
    * length(bin(x)) — the events_rate_autocorr lattice, no float log
    * ever), plus distinct-byte count and the top byte's milli share.
    * Bytes come off the hex rendering (two chars per byte — the
    * frame-sample precedent; payloads never shuffle, only the ≤256-row
    * per-doc histogram does). Plan: one (media, byte) partial-agg
    * exchange + one media-grain fold. */
  def multimodalByteEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // per-payload byte histogram + fold in ONE mapPartitions pass (the
    // documented decode-batching shape, multimodalChunkDedup precedent):
    // the hex-explode + conv() variant shuffled a row PER BYTE and
    // measured 3.25 s at sf0.1; this tight loop is scan-bound. The
    // integer formulas are byte-for-byte the oracle's: bit lengths via
    // 64 − numberOfLeadingZeros ≡ length(bin(x)), positive floor
    // divisions only.
    fromDocuments(s, dir).toDF()
      .select(col("media_id"), col("payload"))
      .filter(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val hist = new Array[Long](256)
          var i = 0
          while (i < payload.length) { hist(payload(i) & 0xff) += 1; i += 1 }
          val n = payload.length.toLong
          var distinct = 0L; var top = 0L; var sumNlog = 0L
          var b = 0
          while (b < 256) {
            val nb = hist(b)
            if (nb > 0) {
              distinct += 1
              if (nb > top) top = nb
              sumNlog += nb * (63 - java.lang.Long.numberOfLeadingZeros(nb))
            }
            b += 1
          }
          def bits(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
          (id, n, distinct, top * 1000 / n,
            bits(n) * 1000 - sumNlog * 1000 / n)
        }
      }
      .toDF("media_id", "n_bytes", "n_distinct", "top_share_milli",
        "entropy_proxy_milli")
  }

  private val ENTROPY_SQL =
    """WITH b AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx
      |           FROM documents),
      |bs AS (SELECT media_id,
      |         ('0x' || substr(hx, CAST(2 * i + 1 AS BIGINT), 2))::BIGINT AS b
      |       FROM b, LATERAL unnest(generate_series(0,
      |         CAST(len(hx) // 2 - 1 AS BIGINT))) t(i)),
      |h AS (SELECT media_id, b, CAST(COUNT(*) AS BIGINT) AS nb
      |      FROM bs GROUP BY 1, 2),
      |f AS (SELECT media_id, CAST(SUM(nb) AS BIGINT) AS n_bytes,
      |        CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |        CAST(MAX(nb) AS BIGINT) AS top_nb,
      |        CAST(SUM(nb * (length(bin(nb)) - 1)) AS BIGINT) AS sum_nlog
      |      FROM h GROUP BY 1)
      |SELECT media_id, n_bytes, n_distinct,
      |  top_nb * 1000 // n_bytes AS top_share_milli,
      |  (length(bin(n_bytes)) - 1) * 1000 - sum_nlog * 1000 // n_bytes
      |    AS entropy_proxy_milli
      |FROM f""".stripMargin

  /** Aspect-ratio / bytes-per-pixel asset audit — the pre-training sanity
    * sweep an image/video pipeline runs before decoding anything: bucket
    * every asset by aspect class (portrait / square / landscape /
    * degenerate-zero-dimension) from its declared metadata and report the
    * byte-density spectrum per (kind, class) — a near-zero bytes-per-pixel
    * row is a corrupt or over-compressed batch, a degenerate row is a
    * broken extractor upstream. Dimensions are [[fromDocuments]]'s modeled
    * meta (width = n_chars % 640, height = n_chars % 480 — keep in sync);
    * all thresholds on the exact milli lattice (ratio floored BEFORE the
    * class compare — both engines floor identically). Plan: one narrow
    * metadata projection + ONE (kind, class) partial aggregate; payload
    * bytes never shuffle — only their length. */
  def multimodalAspectAudit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        (col("n_chars") % 640).as("w"), (col("n_chars") % 480).as("h"),
        expr("cast(octet_length(text) as bigint)").as("nb"))
      .select(col("kind"),
        when(col("w") === 0 || col("h") === 0, "degenerate")
          .when(expr("w * 1000 div h") < 900, "portrait")
          .when(expr("w * 1000 div h") <= 1111, "square")
          .otherwise("landscape").as("aspect_class"),
        expr("nb * 1000 div greatest(w * h, 1L)").as("bpp"))
      .groupBy("kind", "aspect_class")
      .agg(count(lit(1)).as("n_assets"),
        expr("sum(bpp) div count(1)").as("mean_bpp_milli"),
        max("bpp").as("max_bpp_milli"))

  private val ASPECT_SQL =
    """WITH m AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |    n_chars % 640 AS w, n_chars % 480 AS h,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |c AS (
      |  SELECT kind,
      |    CASE WHEN w = 0 OR h = 0 THEN 'degenerate'
      |         WHEN w * 1000 // h < 900 THEN 'portrait'
      |         WHEN w * 1000 // h <= 1111 THEN 'square'
      |         ELSE 'landscape' END AS aspect_class,
      |    nb * 1000 // GREATEST(w * h, 1) AS bpp
      |  FROM m)
      |SELECT kind, aspect_class, CAST(COUNT(*) AS BIGINT) AS n_assets,
      |  CAST(SUM(bpp) // COUNT(*) AS BIGINT) AS mean_bpp_milli,
      |  CAST(MAX(bpp) AS BIGINT) AS max_bpp_milli
      |FROM c GROUP BY 1, 2""".stripMargin

  /** Per-kind compute-budget allocation — the batch-sizing sheet a
    * multimodal trainer reads before mixing modalities (a 224×224 image,
    * a second of audio and a video clip cost wildly different decode/
    * encode FLOPs; token counts alone can't price them): per kind the
    * exact integer cost proxy — image = width·height pixels, audio =
    * byte-duration ms at the 16 kHz meta rate (nb·1000 div 16000),
    * video = 64-byte frames × pixels — with item count, total, max and
    * the milli share of the whole corpus budget. Plan: one codegen
    * metadata projection + ONE 3-row kind aggregate; the share window
    * rides the 3-row result. */
  def multimodalComputeBudget(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        (col("n_chars") % 640).as("w"), (col("n_chars") % 480).as("h"),
        octet_length(col("text")).cast("long").as("nb"))
      .withColumn("cost", expr(
        "CASE WHEN kind = 'image' THEN w * h" +
          " WHEN kind = 'audio' THEN nb * 1000 div 16000" +
          " ELSE (nb div 64) * w * h END"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_items"), sum("cost").as("total_cost"),
        max("cost").as("max_cost"))
      .withColumn("share_milli",
        expr("total_cost * 1000 div greatest(sum(total_cost) over (), 1L)"))

  private val COMPUTE_BUDGET_SQL =
    """WITH m AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |    n_chars % 640 AS w, n_chars % 480 AS h,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |c AS (
      |  SELECT kind,
      |    CASE WHEN kind = 'image' THEN w * h
      |         WHEN kind = 'audio' THEN nb * 1000 // 16000
      |         ELSE (nb // 64) * w * h END AS cost
      |  FROM m),
      |g AS (
      |  SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_items,
      |    CAST(SUM(cost) AS BIGINT) AS total_cost, MAX(cost) AS max_cost
      |  FROM c GROUP BY kind)
      |SELECT kind, n_items, total_cost, max_cost,
      |  total_cost * 1000
      |    // GREATEST(CAST(SUM(total_cost) OVER () AS BIGINT), 1)
      |    AS share_milli
      |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_compute_budget" -> (multimodalComputeBudget _),
    "multimodal_aspect_audit" -> (multimodalAspectAudit _),
    "multimodal_byte_entropy" -> (multimodalByteEntropy _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_size_spectrum" -> (multimodalSizeSpectrum _),
    "multimodal_source_mix" -> (multimodalSourceMix _),
    "multimodal_dedup_bytes" -> (multimodalDedupBytes _),
    "multimodal_chunk_dedup" -> (multimodalChunkDedup _),
    "multimodal_phash_dedup" -> (multimodalPhashDedup _),
    "multimodal_frame_sample" -> (multimodalFrameSample _),
    "multimodal_audio_windows" -> (multimodalAudioWindows _))

  /** The oracle rebuilds each byte's high nibble from the hex encoding of
    * the UTF-8 payload: byte i ⟺ hex chars (2i+1, 2i+2), and the first of
    * the pair IS the high nibble. A doc × 16-bin grid left join fills the
    * empty bins with 0 so the joined string always has 16 entries. */
  /** The chunk oracle replays the CDC kernel the way text_cdc_chunks'
    * oracle does (every 16-byte window hash recomputed independently
    * with list_reduce in mod-2^61-1 space), then slices each chunk out
    * of the hex rendering (2 hex chars per byte — charset-proof) and
    * hashes it. */
  /** Oracle CTEs ending at `ch(media_id, chunk_md5, chunk_bytes)` — the
    * CDC chunk-hash replay CHUNK_SQL selects from (kept factored for
    * readability; phash abandoned these CTEs for per-gram hashes). */
  private def cdcChunkCtes: String = {
    val w = graft.functions.CdcChunks.W
    val div = graft.functions.CdcChunks.Mask + 1
    val byteList =
      s"""list_transform(generate_series(0, CAST(len(hx) // 2 - 1 AS BIGINT)),
         |      i -> CAST((strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
         |              + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1) AS HUGEINT))""".stripMargin
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, text FROM documents
       |  UNION ALL
       |  SELECT -doc_id - 1, 'edited: ' || text FROM documents WHERE doc_id % 9 = 0),
       |b AS (SELECT media_id, hex(encode(text)) AS hx FROM m),
       |bs AS (SELECT media_id, hx, $byteList AS bs FROM b),
       |e AS (SELECT media_id, hx, len(bs) AS n,
       |    list_filter(generate_series($w, len(bs)), e ->
       |      list_reduce(list_prepend(CAST(0 AS HUGEINT), bs[e-${w - 1}:e]),
       |        (h, x) -> (h * 31 + x) % 2305843009213693951) % $div = 0) AS ends0
       |  FROM bs),
       |ae AS (SELECT media_id, hx, n,
       |    CASE WHEN len(ends0) > 0 AND ends0[-1] = n THEN ends0 ELSE ends0 || [n] END AS ends
       |  FROM e WHERE n > 0),
       |ch AS (SELECT media_id,
       |    md5(substr(hx, 2 * CAST(COALESCE(ends[i-1], 0) AS BIGINT) + 1,
       |        2 * CAST(ends[i] - COALESCE(ends[i-1], 0) AS BIGINT))) AS chunk_md5,
       |    CAST(ends[i] - COALESCE(ends[i-1], 0) AS BIGINT) AS chunk_bytes
       |  FROM ae, LATERAL unnest(generate_series(1, len(ends))) t(i))""".stripMargin
  }

  private val CHUNK_SQL =
    s"""$cdcChunkCtes
       |SELECT chunk_md5, chunk_bytes, CAST(COUNT(*) AS BIGINT) AS n_copies,
       |  CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
       |  MIN(media_id) AS first_media
       |FROM ch GROUP BY 1, 2
       |HAVING COUNT(DISTINCT media_id) >= 2""".stripMargin

  /** The oracle replays the weighted simhash exactly: per-gram md5
    * hashes ('ph:' salt — its own stream), set semantics via DISTINCT,
    * integer idf weights from bit lengths, bit-majority in 60 wide
    * weighted sums (no 60× row explode), then the same 6×10-bit band
    * join + cap + Hamming verify the Spark plan runs. */
  private val PHASH_SQL = {
    val bitSums = (0 until 60)
      .map(j => s"CAST(SUM(w * ((h >> $j) & 1)) AS BIGINT) AS c$j")
      .mkString(",\n        ")
    val sigSum = (0 until 60)
      .map(j => s"CASE WHEN 2 * c$j >= tw THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString("\n          + ")
    s"""WITH gd AS (SELECT doc_id, text FROM documents
       |            WHERE octet_length(encode(text)) >= 256),
       |g0 AS (
       |  SELECT doc_id AS media_id, text FROM gd
       |  UNION ALL
       |  SELECT -doc_id - 1, 'edited: ' || text FROM gd WHERE doc_id % 9 = 0),
       |gr AS (SELECT DISTINCT media_id,
       |    ('0x' || substr(md5('ph:' || substr(text, CAST(i + 1 AS BIGINT), 8)),
       |      1, 15))::BIGINT AS h
       |  FROM g0, LATERAL unnest(generate_series(0,
       |    CAST(length(text) - 8 AS BIGINT))) t(i)),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM g0),
       |dfr AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS dfh FROM gr GROUP BY h),
       |wg AS (SELECT gr.media_id, gr.h,
       |         (length(bin(nd)) - 1) - (length(bin(dfh)) - 1) AS w
       |       FROM gr JOIN dfr USING (h) CROSS JOIN n),
       |sg AS (SELECT media_id, CAST(SUM(w) AS BIGINT) AS tw,
       |        $bitSums
       |       FROM wg GROUP BY media_id),
       |sig AS (SELECT media_id, CAST($sigSum AS BIGINT) AS sig FROM sg),
       |bd AS (SELECT media_id, sig, CAST(t.j AS BIGINT) AS band,
       |         ((sig >> (t.j * 10)) & 1023) AS bv
       |       FROM sig, LATERAL unnest(generate_series(0, 5)) t(j)),
       |ok AS (SELECT band, bv FROM bd GROUP BY band, bv HAVING COUNT(*) <= 64)
       |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM bd a JOIN bd b ON a.band = b.band AND a.bv = b.bv
       |  AND a.media_id < b.media_id
       |JOIN ok ON ok.band = a.band AND ok.bv = a.bv
       |WHERE bit_count(xor(a.sig, b.sig)) <= 8""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "multimodal_compute_budget" -> COMPUTE_BUDGET_SQL,
    "multimodal_aspect_audit" -> ASPECT_SQL,
    "multimodal_byte_entropy" -> ENTROPY_SQL,
    "multimodal_chunk_dedup" -> CHUNK_SQL,
    "multimodal_phash_dedup" -> PHASH_SQL,
    "multimodal_size_spectrum" -> SIZE_SPECTRUM_SQL,
    "multimodal_source_mix" -> SOURCE_MIX_SQL,
    "multimodal_dedup_bytes" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT -doc_id - 1, text FROM documents WHERE doc_id % 9 = 0),
        |b AS (
        |  SELECT media_id, md5(hex(encode(text))) AS content_md5,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM m)
        |SELECT content_md5, n_bytes, CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  MIN(media_id) AS canonical_media_id
        |FROM b GROUP BY content_md5, n_bytes
        |HAVING COUNT(*) >= 2""".stripMargin,
    "multimodal_audio_windows" -> AUDIO_WINDOWS_SQL,
    "multimodal_frame_sample" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        |SELECT doc_id AS media_id, i AS chunk_idx,
        |  md5(substr(hx, CAST(64 * i + 1 AS BIGINT), 64)) AS chunk_md5
        |FROM b, LATERAL unnest(generate_series(0,
        |  CAST((len(hx) + 63) // 64 - 1 AS BIGINT))) t(i)
        |WHERE i % 4 = 0""".stripMargin,
    "multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM documents),
        |nib AS (
        |  SELECT doc_id, strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1 AS bin
        |  FROM b, LATERAL unnest(generate_series(0, CAST(len(hx) // 2 - 1 AS BIGINT))) t(i)),
        |cnt AS (SELECT doc_id, bin, COUNT(*) AS k FROM nib GROUP BY doc_id, bin),
        |grid AS (SELECT doc_id, gs.g AS bin FROM b, generate_series(0, 15) gs(g)),
        |filled AS (
        |  SELECT g.doc_id, g.bin, COALESCE(c.k, 0) AS k
        |  FROM grid g LEFT JOIN cnt c ON g.doc_id = c.doc_id AND g.bin = c.bin)
        |SELECT b.doc_id AS media_id, b.kind, b.n_bytes,
        |  (SELECT string_agg(CAST(k AS VARCHAR), ',' ORDER BY bin)
        |   FROM filled f WHERE f.doc_id = b.doc_id) AS nibble_counts
        |FROM b""".stripMargin)
}
