package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media records carry opaque payload + typed metadata") {
    val ds = Multimodal.fromDocuments(spark, sf)
    val r = ds.head()
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.payload.nonEmpty)
    assert(r.meta.format.startsWith("src"))
  }

  test("byte-level CAS dedup: every planted re-crawl forms exactly one pair group") {
    val groups = Multimodal.multimodalDedupBytes(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val nNinth = Tables.t(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 9 === 0).count()
    // the corpus has no natural byte dups (asserted by dedup_exact's
    // spec history), so groups == planted mirrors, each of exactly 2
    assert(groups.length.toLong === nNinth)
    assert(groups.forall(_._3 == 2L), "a planted group lost or gained a copy")
    // canonical is the group min — the negative mirror id
    assert(groups.forall(_._4 < 0L))
  }

  test("feature extraction is deterministic, 16-dim, L1-normalized") {
    def run() = Multimodal.extractFeatures(Multimodal.fromDocuments(spark, sf))
      .toDF().select("media_id", "features")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val f1 = run()
    val f2 = run()
    assert(f1.length > 0)
    assert(f1.map(_._2.toSeq).toSeq === f2.map(_._2.toSeq).toSeq)
    assert(f1.forall(_._2.length == 16))
    assert(f1.forall(r => math.abs(r._2.sum - 1.0) < 1e-9))
  }

  test("portal records assemble nested documents with derived status") {
    val df = graft.operators.Records.portalRecords(spark, sf)
    val schema = df.schema
    assert(schema("customFields").dataType.typeName === "array")
    assert(schema("organism").dataType.typeName === "struct")
    val rows = df.selectExpr("tracking_status", "size(customFields)",
        "organism.ontologyTerm").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) == 3))
    assert(rows.forall(_.getString(2).startsWith("NCBITaxon:")))
    val statuses = df.select("tracking_status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses.contains("Raw Data - Submitted"))
  }

  test("frame sampling keeps every Nth fixed-size chunk") {
    val df = Multimodal.frameSample(Multimodal.fromDocuments(spark, sf), 16, 2)
    val idx = df.select("chunk_idx").as[Long].collect()
    assert(idx.nonEmpty)
    assert(idx.forall(_ % 2 == 0))
  }

  test("audio windows: overlapping STFT framing replays byte-for-byte") {
    val payloads = Multimodal.fromDocuments(spark, sf)
      .filter(_.kind == "audio").collect()
      .map(r => r.media_id -> r.payload).toMap
    val got = operators.Multimodal.multimodalAudioWindows(spark, sf)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    // every audio blob with >= 64 bytes appears; others don't
    assert(got.keySet === payloads.filter(_._2.length >= 64).keys.toSet)
    for ((id, frames) <- got) {
      val p = payloads(id)
      val nFrames = (p.length - 64) / 32 + 1
      val hx = p.map(b => f"${b & 0xff}%02X").mkString
      // emitted = every 8th frame index of the complete-frame range
      assert(frames.map(_._2).sorted.toSeq ===
        (0L until nFrames by 8).toSeq)
      for ((_, idx, start, nf, durMs, md5got) <- frames) {
        assert(nf === nFrames)
        assert(start === idx * 32)
        assert(durMs === p.length / 32) // 16 kHz 16-bit mono
        assert(start + 64 <= p.length) // complete frames only
        val slice = hx.substring((idx * 64).toInt, (idx * 64).toInt + 128)
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8"))
        assert(md5got === d.map(b => f"$b%02x").mkString, s"md5 $id/$idx")
      }
      // 50% overlap: consecutive frame STARTS are half a frame apart
      assert(frames.forall(f => f._3 % 32 == 0))
    }
  }

  test("chunk dedup: a prefix-edited re-crawl shares chunks whole-payload hashing misses") {
    val shared = Multimodal.multimodalChunkDedup(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(shared.nonEmpty)
    assert(shared.forall(r => r._4 >= 2 && r._3 >= r._4)) // copies >= media
    // replay: for one planted pair, the edited copy's chunk hash multiset
    // must intersect the original's even though the full payloads differ
    val doc = graft.Tables.t(spark, sf, "documents")
      .filter("doc_id % 9 = 0 AND length(text) > 200")
      .select("doc_id", "text").as[(Long, String)].head()
    def chunkSet(text: String): Set[String] = {
      val bytes = text.getBytes("UTF-8")
      var off = 0
      graft.functions.CdcChunks.chunkLengths(bytes).map { len =>
        val hx = bytes.slice(off, off + len).map(b => f"${b & 0xff}%02X").mkString
        off += len
        java.security.MessageDigest.getInstance("MD5")
          .digest(hx.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
      }.toSet
    }
    val orig = chunkSet(doc._2)
    val edited = chunkSet("edited: " + doc._2)
    assert(orig !== edited) // the edit does change the leading chunk(s)
    val common = orig.intersect(edited)
    assert(common.nonEmpty, "CDC boundaries failed to re-synchronize")
    // every shared chunk of this pair is visible in the operator output
    val outHashes = shared.map(_._1).toSet
    assert(common.subsetOf(outHashes))
  }

  test("phash dedup: planted prefix-edited re-crawls land in a small Hamming ball, word-salad stays apart") {
    import spark.implicits._
    val pairs = graft.operators.Multimodal.multimodalPhashDedup(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // contract: ordered ids, verified distance
    assert(pairs.forall(p => p._1 < p._2 && p._3 >= 0 && p._3 <= 8))
    // recall on the planted re-crawls above the 256-byte gate: an
    // 8-byte prefix edit perturbs ~8 of ≥249 gram features, so the
    // bit-majority signature stays within the Hamming ball and ≥90%
    // of planted (doc, -doc-1) pairs are found
    val planted = graft.Tables.t(spark, sf, "documents")
      .filter("doc_id % 9 = 0 AND octet_length(cast(text as binary)) >= 256")
      .select("doc_id").as[Long].collect().toSet
    val found = pairs.collect {
      case (a, b, _) if a < 0 && b == -a - 1 => b
      case (a, b, _) if b < 0 && a == -b - 1 => a
    }.toSet
    assert(found.size * 10 >= planted.size * 9,
      s"phash recall ${found.size}/${planted.size}")
    // selectivity: the banded+verified pair set is a sliver of all
    // pairs (cross-doc survivors beyond the re-crawls are dominated by
    // the corpus's planted FUZZY near-dup pairs — those are true
    // positives for a perceptual layer, not strays)
    val nSigs = graft.Tables.t(spark, sf, "documents")
      .filter("octet_length(cast(text as binary)) >= 256").count() +
      planted.size
    assert(pairs.length.toLong * 10 <= nSigs * (nSigs - 1) / 2,
      s"${pairs.length} pairs of ${nSigs * (nSigs - 1) / 2} possible")
  }

  test("phash clusters equal a driver union-find over the phash pair graph") {
    import spark.implicits._
    val pairs = graft.operators.Multimodal.multimodalPhashDedup(spark, sf)
      .select("media_a", "media_b").as[(Long, Long)].collect()
    val got = graft.operators.Graphs.multimodalPhashClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    // driver union-find with min-label canonicalization
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got === want)
    assert(got.nonEmpty)
    // every planted re-crawl pair found by phash shares its family
    pairs.collect { case (a, b) if a < 0 && b == -a - 1 => (a, b) }
      .foreach { case (a, b) => assert(got(a) === got(b)) }
  }
}
