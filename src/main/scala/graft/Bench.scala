package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The suite compiles far more than 100 codegen stages (73 queries ×
      // warm-up + 2 timed passes). The default cache (maxEntries=100)
      // evicts between the warm-up and the timed pass, so simple queries
      // re-pay janino compilation inside the measurement — that was the
      // r3 q02/q03 "regression" (0.18→1.27 s on unchanged code). Size the
      // cache to hold the whole suite.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // Each testdata table is ONE small parquet file (lineitem 10.8 MB),
      // so the default 128 MB split size plans every scan as a single
      // task and scan-bound stages run 1-wide on a 32-core harness. 1 MB
      // splits feed the cores at bench SF; on a real cluster the default
      // is correct (files >> splits), so this is harness sizing, not an
      // operator setting — same class as shuffle.partitions=32.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize every output column: .count() alone would let Catalyst
    // prune the computed projections out of the measured plan.
    def run(name: String): Long =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()

    // SPARK_GRAFT_QUERIES=q02_filter_project,q03_join_agg → isolation runs.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
    val names = subset match {
      case Some(qs) => qs.split(',').map(_.trim).filter(SparkEntry.queries.contains).toSeq.sorted
      case None     => SparkEntry.queries.keys.toSeq.sorted
    }
    // Machine-load settle gate, BEFORE the warm-up pass (after it our own
    // warm-up work dominates the 1-min loadavg and the gate would always
    // hit its cap). Three consecutive rounds of driver runs spiked the
    // alphabetically-FIRST timed queries (cleaning_summary 11.8x r11,
    // dedup_doc_prefix 26x r10) on unchanged bytes because the bench was
    // launched minutes after the sf0.1 verify marathon — external load
    // decays over the run, so the early board slots absorb the
    // contention. The warm-up pass can't fix load decay; waiting for the
    // 1-min load to drop can, and the warm-up pass itself then buys the
    // timed board a further few contention-free minutes. Bounded (3 min
    // cap) so a genuinely busy host still benches; the wait lands in the
    // JSON so the artifact says whether the gate cleared or timed out.
    // /proc/loadavg gives all three windows (the MXBean exposes only the
    // 1-min average). r12 proved the 1-min gate alone cannot catch the
    // post-verify-marathon state: the driver run waited 115 s, the 1-min
    // average cleared, and the alphabetically-contiguous q27-q38 slots
    // still spiked up to 17.8x because the 15-min average was 1.6+ and
    // contention decayed INTO the timed board. Bound the 15-min window
    // too (higher cap: it decays slowly by construction, so give it
    // 10 min), and record all three in the JSON so a run that starts hot
    // self-documents as suspect even when the gate caps out.
    def loads: (Double, Double, Double) =
      try {
        val parts = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
          .split("\\s+")
        (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
      } catch { case _: Throwable =>
        val l = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        (l, l, l)
      }
    val settleT0 = System.nanoTime()
    def settleWaited: Long = System.nanoTime() - settleT0
    while ({ val (l1, _, l15) = loads
             (l1 > 1.0 && settleWaited < 180e9.toLong) ||
             (l15 > 1.5 && settleWaited < 600e9.toLong) })
      Thread.sleep(5000)
    val settleS = settleWaited / 1e9
    val (startL1, startL5, startL15) = loads
    // Self-documenting hot-run marker (r15, verdict item): true iff the
    // settle gate exited because a CAP expired while the load was still
    // above its threshold — the exact signature of every phantom-spike
    // driver run (r10-r14). A capped run's numbers are suspect by
    // construction; the flag says so from the artifact alone.
    val settleCapped = startL1 > 1.0 || startL15 > 1.5

    // Untimed warm-up pass: JIT, codegen caches, parquet footers, file
    // listing — so the timed pass measures steady-state query time.
    names.foreach { n => try run(n) catch { case _: Throwable => } }
    System.gc()

    // Min of two timed runs: steady-state time, robust to JIT/GC noise.
    // A throwing query reports -1 (NOT its short failure wall time): a
    // fast-failing regression must read as an error, never as a speedup.
    // Per-query gc_ms (collector-time delta over both timed runs) and
    // peak_mb (max heap-pool peak, pools reset per query) make
    // session-pressure spikes attributable from the artifact alone — a
    // genuine regression shows flat gc/peak, an environment spike shows
    // gc_ms dwarfing the delta (the r7 range_convex_hull diagnosis class).
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => p.getType == java.lang.management.MemoryType.HEAP && p.isValid)
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    val results = names.map { name =>
      heapPools.foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
      val gc0 = gcMs
      spark.sparkContext.setJobDescription(s"bench: $name")
      def onePass(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { run(name); true } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val two = (1 to 2).map(_ => onePass())
      val min2 = if (two.forall(_._2)) two.map(_._1).min else -1.0
      // Robustness pass (r15, additions-only — the reported `queries` /
      // `value` stay EXACTLY min-of-first-two so every prior round's
      // numbers compare 1:1): sub-second queries (the phantom-spike
      // class: r14 driver run read 36 s on a 2.7 s query) and queries
      // whose two runs disagree >1.5x get a THIRD timed run; `med3`
      // carries the median of the three and `spread_flags` names queries
      // whose run spread exceeds 3x — a genuine regression shows a tight
      // spread, an environment spike self-documents.
      val needThird = min2 >= 0 &&
        (min2 < 1.0 || two.map(_._1).max > 1.5 * min2)
      val third = if (needThird) Some(onePass()) else None
      spark.sparkContext.setJobDescription(null)
      val all = (two ++ third).filter(_._2).map(_._1)
      val med3 = third.filter(_._2).map(_ => all.sorted.apply(all.size / 2))
      val spread = if (min2 > 0 && all.nonEmpty) all.max / all.min else 1.0
      val gcDelta = gcMs - gc0
      val peakMb = heapPools.map(p => try p.getPeakUsage.getUsed catch { case _: Throwable => 0L }).sum >> 20
      (name, min2, gcDelta, peakMb, med3, spread)
    }
    def fmt(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v, _, _, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val med3s = results.collect { case (k, _, _, _, Some(m), _) =>
      "\"" + k + "\":" + fmt(m) }.mkString("{", ",", "}")
    val spreadFlags = results.collect { case (k, _, _, _, _, sp) if sp > 3.0 =>
      "\"" + k + "\"" }.mkString("[", ",", "]")
    val gcs = results.map { case (k, _, g, _, _, _) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val peaks = results.map { case (k, _, _, m, _, _) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v, _, _, _, _) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Key order matters for crash/truncation forensics: the harness that
    // records this line keeps only the LAST ~2 KB of output, so the
    // per-query map goes first and the suite total goes last — a
    // head-truncated tail still shows the total (BENCH_r03 lost it).
    // Machine-load marker: a uniform inflation across ALL queries (the
    // r5 driver run was ~27% hot on unchanged code) is an environment
    // artifact, not a regression — loadavg + timestamp in the artifact
    // makes that diagnosable from the JSON alone.
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    // cpus is a free-form master spec (e.g. "32" or "*") — quote it, and
    // strip anything outside [0-9*,] so a quote/backslash in the env var
    // can't corrupt the JSON artifact
    val cpusSafe = cpus.filter(c => c.isDigit || c == '*' || c == ',')
    val env = s""""load_avg":${fmt(load)},"load1":${fmt(startL1)},"load5":${fmt(startL5)},"load15":${fmt(startL15)},"settle_s":${fmt(settleS)},"settle_capped":$settleCapped,"epoch_ms":${System.currentTimeMillis()},"cpus":"$cpusSafe""""
    val json = s"""{"metric":"total","unit":"sec","sf":"$sfDir",$env,"queries":$qs,"med3":$med3s,"spread_flags":$spreadFlags,"gc_ms":$gcs,"peak_mb":$peaks,"errors":$errors,"value":${fmt(total)}}"""
    // Durable copy: survives any stdout/stderr truncation. A subset run
    // (SPARK_GRAFT_QUERIES isolation protocol) writes BENCH_SUBSET.json —
    // it must NEVER clobber the sealed full-suite artifact (a judge
    // session lost the driver's 267-query re-run to exactly that).
    val outFile = if (subset.isDefined) "BENCH_SUBSET.json" else "BENCH_LOCAL.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
