package graft

import graft.functions.{ConvexHullAreaKm2, RollingHash}
import scala.util.Random

/** Randomized (seeded, deterministic) invariants for the geometry/hash
  * kernels — 200 cases per property. */
class PropertySpec extends SparkSpec {

  private def pts(rnd: Random, n: Int): List[(Double, Double)] =
    List.fill(n)((rnd.between(-179.0, 179.0), rnd.between(-85.0, 85.0)))

  private def area(agg: ConvexHullAreaKm2, ps: Seq[(Double, Double)]): Double =
    agg.finish(ps.foldLeft(agg.zero)(agg.reduce))

  test("theil-sen slope ignores a planted outlier day (the breakdown-point property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // clean ramp c = 100 + 7*day plus one wild outlier day: 29 of the
    // 435 pairwise slopes involve the outlier, the median doesn't move
    val rows = (0L until 30L).map { d =>
      ("probe", d, if (d == 15L) 100000L else 100L + 7L * d)
    }
    val daily = rows.toDF("event_type", "day", "c")
    val out = operators.Analytics.theilSenCore(daily)
      .select("event_type", "n_days", "n_pairs", "ts_slope_milli")
      .as[(String, Long, Long, Long)].head()
    assert(out === (("probe", 30L, 435L, 7000L)))
    // sanity: an OLS slope on the same series would be dragged far off —
    // the planted mass shifts n*Sxy - Sx*Sy by orders of magnitude
    val clean = operators.Analytics.theilSenCore(
        (0L until 30L).map(d => ("probe", d, 100L + 7L * d))
          .toDF("event_type", "day", "c"))
      .select("ts_slope_milli").as[Long].head()
    assert(clean === 7000L)
  }

  test("lz78_count parses the classic cases exactly") {
    import graft.functions.Lz78Count.phrases
    // all-distinct tokens: every token is its own phrase
    assert(phrases("a b c d e") === 5L)
    // the classic doubling corpus a a a a...: dict grows a, a_a, a_a_a —
    // k(k+1)/2 tokens parse into k phrases (maximal compression)
    assert(phrases(Array.fill(10)("x").mkString(" ")) === 4L) // x,xx,xxx + trailing xxxx
    // exact repetition of one phrase compresses: 'a b' * 8 = 16 tokens
    // parse: a | b | a_b | a_b_a? no — greedy over tokens:
    // a, b, a_b, a_b_a? dict lookup path is pinned by hand below
    assert(phrases("a b a b a b a b") < 8L)
    // trailing open phrase counts once: 'a a' -> dict {a}, trailing 'a'
    assert(phrases("a a") === 2L)
    assert(phrases("a") === 1L)
    assert(phrases("") === 0L)
    // case folding + tokenizer classes match the oracle's [a-z0-9]+
    assert(phrases("Foo foo FOO!") === phrases("foo foo foo"))
    // window cap: tokens past 64 don't change the parse
    val base = (0 until 64).map(i => s"t$i").mkString(" ")
    assert(phrases(base + " zzz qqq") === phrases(base))
    // incompressible text approaches one phrase per token; repeated
    // boilerplate stays far below it (the quality-score separation)
    val distinct = (0 until 64).map(i => s"w$i").mkString(" ")
    val template = Array.fill(16)("lorem ipsum dolor sit").mkString(" ")
    assert(phrases(distinct) === 64L)
    assert(phrases(template) < 24L)
  }

  test("hull area is permutation-invariant and non-negative") {
    val rnd = new Random(42)
    val agg = new ConvexHullAreaKm2()
    for (_ <- 1 to 200) {
      val ps = pts(rnd, 3 + rnd.nextInt(15))
      val a1 = area(agg, ps)
      val a2 = area(agg, rnd.shuffle(ps))
      assert(math.abs(a1 - a2) < 1e-9)
      assert(a1 >= 0.0 || a1 == -1.0)
    }
  }

  test("hull area only grows when points are added") {
    val rnd = new Random(43)
    val agg = new ConvexHullAreaKm2()
    for (_ <- 1 to 200) {
      val base = pts(rnd, 3 + rnd.nextInt(10))
      val extra = pts(rnd, 1 + rnd.nextInt(5))
      assert(math.max(area(agg, base ++ extra), 0.0) >= math.max(area(agg, base), 0.0) - 1e-9)
    }
  }

  test("hull reduce/merge (partial aggregation) equals single-pass") {
    val rnd = new Random(44)
    val agg = new ConvexHullAreaKm2()
    for (_ <- 1 to 200) {
      val a = pts(rnd, 1 + rnd.nextInt(12))
      val b = pts(rnd, 1 + rnd.nextInt(12))
      if ((a ++ b).length >= 3) {
        val single = area(agg, a ++ b)
        val merged = agg.finish(agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
        assert(math.abs(math.max(single, 0) - math.max(merged, 0)) < 1e-9)
      }
    }
  }

  test("rolling hash: deterministic, in range, collision-free on distinct strings") {
    val rnd = new Random(45)
    val seen = scala.collection.mutable.Map.empty[Long, String]
    for (_ <- 1 to 500) {
      val s = rnd.alphanumeric.take(rnd.nextInt(80)).mkString
      val h = RollingHash.hashBytes(s.getBytes("UTF-8"))
      assert(h === RollingHash.hashBytes(s.getBytes("UTF-8")))
      assert(h >= 0 && h < RollingHash.Mod)
      seen.get(h).foreach(prev => assert(prev == s, s"collision: '$prev' vs '$s'"))
      seen(h) = s
    }
  }

  test("holt lattice: per-lag coefficients equal the sequential recurrence on random series") {
    // the operator's by-lag coefficient literals (lag 1 = newest hour)
    val wl = Seq(2048L, 1536L, 896L, 352L, -8L, -186L, -372L, -170L)
    val wt = Seq(1024L, 256L, -192L, -368L, -364L, -271L, -542L, 457L)
    def sequential(y: IndexedSeq[Long]): (Long, Long) = {
      var l = y(1) * 4096L
      var b = (y(1) - y(0)) * 4096L
      for (i <- 2 until 8) {
        val lp = l
        l = (y(i) * 4096L + lp + b) / 2
        b = (l - lp) / 2 + b / 2
      }
      (l, b)
    }
    def lattice(y: IndexedSeq[Long]): (Long, Long) = (
      (1 to 8).map(lag => wl(lag - 1) * y(8 - lag)).sum,
      (1 to 8).map(lag => wt(lag - 1) * y(8 - lag)).sum)
    val rnd = new Random(46)
    for (_ <- 1 to 500) {
      val y = IndexedSeq.fill(8)(rnd.nextLong(1000000L))
      assert(lattice(y) === sequential(y))
    }
    // constant series reproduces itself with zero trend
    val const = IndexedSeq.fill(8)(7L)
    assert(sequential(const) === ((7L * 4096, 0L)))
    // a linear ramp forecasts the next point exactly
    val ramp = IndexedSeq.tabulate(8)(i => (i + 1) * 10L)
    val (l, b) = sequential(ramp)
    assert(l + b === 90L * 4096)
  }

  test("haversine: symmetric, non-negative, zero at identity, bounded") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new Random(46)
    val rows = List.fill(300) {
      val (lo1, la1) = (rnd.between(-179.0, 179.0), rnd.between(-85.0, 85.0))
      val (lo2, la2) = (rnd.between(-179.0, 179.0), rnd.between(-85.0, 85.0))
      (la1, lo1, la2, lo2)
    }.toDF("la1", "lo1", "la2", "lo2")
    val res = rows.select(
      operators.DomainQueries.haversineM(col("la1"), col("lo1"), col("la2"), col("lo2")).as("d12"),
      operators.DomainQueries.haversineM(col("la2"), col("lo2"), col("la1"), col("lo1")).as("d21"),
      operators.DomainQueries.haversineM(col("la1"), col("lo1"), col("la1"), col("lo1")).as("d11"))
      .as[(Double, Double, Double)].collect()
    res.foreach { case (d12, d21, d11) =>
      assert(math.abs(d12 - d21) < 1e-6)
      assert(d12 >= 0.0 && d11 === 0.0)
      assert(d12 <= math.Pi * 6371000.0 + 1.0)
    }
  }

  test("asof join equals the naive per-row maximum over random event sets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new Random(48)
    for (_ <- 1 to 20) {
      // small key space + coarse times force equal-timestamp collisions
      val left = List.fill(30)(
        (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "lt", "lid")
      val right = List.fill(30)(
        (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "rt", "rid")
      val got = operators.EventJoins.asofJoin(
          left, right, "k", "lt", "rt", tiebreak = Seq("rid"))
        .select("k", "lt", "lid", "rt", "rid")
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
      // reference: latest rt <= lt; ties on rt broken by max rid
      val rightRows = right.as[(Long, Long, Long)].collect()
      val want = left.as[(Long, Long, Long)].collect().map { case (k, lt, lid) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 <= lt)
        if (cands.isEmpty) (k, lt, lid, None, None)
        else {
          val best = cands.maxBy(r => (r._2, r._3))
          (k, lt, lid, Some(best._2), Some(best._3))
        }
      }.toSet
      assert(got === want)
    }
  }

  test("interval join equals the naive range filter over random intervals") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new Random(49)
    for (binW <- Seq(1L, 7L, 100L)) {
      val pts = List.tabulate(60)(i => (i.toLong, rnd.nextInt(200).toLong))
        .toDF("pid", "pt")
      val ivs = List.tabulate(15) { i =>
        val lo = rnd.nextInt(200).toLong
        (i.toLong, lo, lo + rnd.nextInt(40))
      }.toDF("iid", "lo", "hi")
      val got = operators.EventJoins.intervalJoin(pts, "pt", ivs, "lo", "hi", binW)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got === want, s"binWidth=$binW")
    }
  }

  test("histogram length-deciles equal exact global NTILE for uneven N") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new Random(47)
    // include N < 10, N % 10 != 0, and heavy length ties
    for (n <- Seq(3, 7, 10, 47, 123, 1000)) {
      val docs = List.tabulate(n)(i => (i.toLong, rnd.nextInt(20).toLong))
        .toDF("doc_id", "n_chars")
      val w = Window.orderBy(col("n_chars"), col("doc_id"))
      val exact = docs
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val dist = operators.TextPrep.lengthDeciles(spark, docs)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(dist === exact, s"mismatch at n=$n")
    }
  }

  test("streaming scd2 matches a plain-Scala reference on random streams") {
    import spark.implicits._
    val rnd = new Random(53)
    val types = Array("a", "b", "c")
    def ref(evs: Seq[(Long, Long, Long, String)]): Set[(Long, String, Long, Long)] =
      evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
        val sorted = es.map(e => (e._2, e._3, e._4)).sortBy(e => (e._1, e._2))
        val changes = sorted.foldLeft(Vector.empty[(String, Long)]) {
          case (acc, (tm, _, tpe)) =>
            if (acc.isEmpty || acc.last._1 != tpe) acc :+ ((tpe, tm)) else acc
        }
        changes.zipWithIndex.map { case ((st, from), i) =>
          (uid, st, from,
            if (i + 1 < changes.length) changes(i + 1)._2 else -1L)
        }
      }.toSet
    for (round <- 1 to 30) {
      val evs = List.tabulate(20 + rnd.nextInt(100))(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong,
          types(rnd.nextInt(3))))
      val shuffled = rnd.shuffle(evs)
      val got = streaming.Streams.scd2(shuffled.toDS(), emitOpen = true)
        .collect().map(o => (o.user_id, o.state, o.valid_from_ns, o.valid_to_ns))
        .toSet
      assert(got === ref(shuffled), s"round $round")
    }
  }

  test("streaming throttle matches a plain-Scala reference on random streams") {
    import spark.implicits._
    val rnd = new Random(59)
    val hourNs = 3600000000000L
    def ref(evs: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long, Long)] =
      evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
        es.map(e => (e._2, e._3)).groupBy(_._1 / hourNs).toSeq.flatMap {
          case (h, g) => g.sortBy(identity).take(3).zipWithIndex.map {
            case ((tm, id), i) => (uid, id, h, tm, (i + 1).toLong)
          }
        }
      }.toSet
    for (round <- 1 to 30) {
      // ts spread over ~4 hours so several windows fill and reset
      val evs = List.tabulate(20 + rnd.nextInt(100))(i =>
        (rnd.nextInt(3).toLong, math.abs(rnd.nextLong()) % (4 * hourNs), i.toLong))
      val shuffled = rnd.shuffle(evs)
      val got = streaming.Streams.throttle(shuffled.toDS())
        .collect().map(o => (o.user_id, o.event_id, o.hour, o.ts_ns, o.rn)).toSet
      assert(got === ref(shuffled), s"round $round")
    }
  }

  test("streaming funnel matches a plain-Scala reference on random streams") {
    import spark.implicits._
    val rnd = new Random(47)
    val types = Array("view", "click", "purchase", "other")
    // plain-Scala reference: split per-user ts-sorted events on the gap,
    // then scan each session for first view < first later click < first
    // later purchase (strict >)
    def ref(evs: Seq[(Long, Long, String)], gap: Long): Map[(Long, Long, Boolean, Long), Int] =
      evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
        val sorted = es.map(e => (e._2, e._3)).sortBy(_._1)
        val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
          case (acc, e) =>
            if (e._1 - acc.last.last._1 > gap) acc :+ Vector(e)
            else acc.init :+ (acc.last :+ e)
        }
        sessions.map { ses =>
          val tv = ses.collectFirst { case (t, "view") => t }
          val tc = tv.flatMap(v => ses.collectFirst { case (t, "click") if t > v => t })
          val tp = tc.flatMap(c => ses.collectFirst { case (t, "purchase") if t > c => t })
          (uid, ses.length.toLong, tp.isDefined,
            tp.flatMap(p => tv.map(p - _)).getOrElse(-1L))
        }
      }.groupBy(identity).view.mapValues(_.length).toMap
    for (round <- 1 to 30) {
      val gap = 50L + rnd.nextInt(100)
      // small ts range forces ties and gap boundaries; shuffled input
      // order exercises the sort inside the stateful function
      val evs = List.fill(30 + rnd.nextInt(120))(
        (rnd.nextInt(4).toLong, rnd.nextInt(800).toLong, types(rnd.nextInt(4))))
      // ties (same user, same ts, different types) stay in: every output
      // is a ts value and the strict > gates make tie ORDER unobservable,
      // which is itself the property worth exercising
      val shuffled = rnd.shuffle(evs)
      val got = streaming.Streams.funnel(shuffled.toDS(), gap, emitOpen = true)
        .collect().map(f => (f.user_id, f.n_events, f.converted, f.conv_ns)).toSeq
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === ref(shuffled, gap), s"round $round gap $gap")
    }
  }

  test("TopKByScore: any reduce/merge split equals the single-pass fold") {
    // the mergeability every consumer leans on: q17's KMV, the rerank
    // family, events_bottomk_sample and its streaming twin all assume
    // partial buffers combine to exactly the global top-k
    val rnd = new Random(47)
    for (round <- 1 to 200) {
      val k = 1 + rnd.nextInt(8)
      val agg = new graft.functions.TopKByScore(k)
      // duplicate scores AND duplicate ids force the tie-break paths
      val xs = List.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(12).toLong, rnd.nextInt(6).toDouble))
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val cut = rnd.nextInt(xs.length + 1)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged === whole, s"round $round k=$k cut=$cut")
      // and the buffer really is the global top-k (score desc, id asc)
      val want = xs.map(e => (e._2, e._1)).sortBy(t => (-t._1, t._2)).take(k)
      assert(whole === want, s"round $round k=$k")
    }
  }

  test("CUSUM closed form equals the max-recurrence on arbitrary integer series") {
    // events_cusum rests on S_k = P_k - min(0, min_{j<=k} P_j); prove it
    // against the defining recurrence for random (negative-heavy,
    // positive-heavy, mixed) integer series
    val rnd = new Random(48)
    for (round <- 1 to 200) {
      val bias = rnd.nextInt(21) - 10
      val xs = List.fill(1 + rnd.nextInt(60))(rnd.nextInt(41) - 20 + bias)
      var s = 0L
      val rec = xs.map { x => s = math.max(0L, s + x); s }
      var p = 0L
      var minP = 0L
      val closed = xs.map { x =>
        p += x; minP = math.min(minP, p); p - math.min(0L, minP)
      }
      assert(rec === closed, s"round $round bias $bias")
    }
  }

  test("gini rank lattice equals the pairwise-difference definition on random multisets") {
    // events_user_gini rests on the identity Σᵢⱼ|xᵢ−xⱼ| = 2(2Σ i·x₍ᵢ₎ −
    // (n+1)S) for ASCENDING ranks — prove the operator's milli formula
    // against the defining pair sum, on tie-heavy random multisets
    val rnd = new Random(49)
    for (round <- 1 to 200) {
      val xs = List.fill(1 + rnd.nextInt(40))(1L + rnd.nextInt(12))
      val sorted = xs.sorted
      val n = sorted.length.toLong
      val s = sorted.sum
      val isum = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val lattice = (2 * isum - (n + 1) * s) * 1000 / (n * s)
      val pairsum = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      assert(pairsum % 2 === 0L)
      val brute = (pairsum / 2) * 1000 / (n * s)
      assert(lattice === brute, s"round $round xs=$xs")
      assert(lattice >= 0 && lattice < 1000)
    }
  }

  test("mann-kendall S: antisymmetric under reversal, saturated on monotone series") {
    // events_trend_mann_kendall + its streaming twin share the pair-sign
    // fold; pin its defining invariants on random series with ties
    val rnd = new Random(50)
    def mk(cs: IndexedSeq[Long]): Long =
      (for (i <- cs.indices; j <- i + 1 until cs.length)
        yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
    for (round <- 1 to 200) {
      val cs = IndexedSeq.fill(2 + rnd.nextInt(30))(rnd.nextInt(8).toLong)
      val n = cs.length.toLong
      assert(mk(cs) === -mk(cs.reverse), s"round $round")
      assert(math.abs(mk(cs)) <= n * (n - 1) / 2)
      val mono = cs.sorted.zipWithIndex.map { case (c, i) => c * 100 + i }
      assert(mk(mono.toIndexedSeq) === n * (n - 1) / 2)
    }
  }

  test("runs count: reversal-invariant with up/down swapped on random series") {
    // events_runs_test + twin: runs over the tie-dropped sign sequence;
    // reversing the day order negates AND reverses the signs, so the
    // run boundaries (and count) are preserved while n_up/n_down swap
    val rnd = new Random(51)
    def runs(cs: IndexedSeq[Long]): (Long, Long, Long) = {
      val sgns = cs.sliding(2).map(p => java.lang.Long.signum(p(1) - p(0)))
        .filter(_ != 0).toIndexedSeq
      val r = if (sgns.isEmpty) 0L
        else 1L + sgns.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      (sgns.count(_ > 0).toLong, sgns.count(_ < 0).toLong, r)
    }
    for (round <- 1 to 200) {
      val cs = IndexedSeq.fill(2 + rnd.nextInt(40))(rnd.nextInt(6).toLong)
      val (up, down, r) = runs(cs)
      val (rup, rdown, rr) = runs(cs.reverse)
      assert((rup, rdown, rr) === ((down, up, r)), s"round $round cs=$cs")
      if (up + down > 0) assert(r >= 1 && r <= up + down)
    }
  }

  test("isqrt lattice: floor(sqrt(double)) + ±1 correction is the exact integer sqrt") {
    // events_wilson_bounds (and its twin) rest on this: for any radicand
    // below 2^53 the corrected value r satisfies r² ≤ a < (r+1)² exactly
    val rnd = new Random(51)
    def isqrt(a: Long): Long = {
      val s0 = math.sqrt(a.toDouble).toLong
      if ((s0 + 1) * (s0 + 1) <= a) s0 + 1
      else if (s0 * s0 > a) s0 - 1 else s0
    }
    for (_ <- 1 to 200) {
      // bias toward perfect squares and off-by-one neighbors — the only
      // places a naive floor(sqrt) can land wrong
      val base = 1L + (rnd.nextLong() & ((1L << 26) - 1))
      for (a <- Seq(base * base - 1, base * base, base * base + 1,
        (rnd.nextLong() & ((1L << 53) - 1)) + 1)) {
        val r = isqrt(a)
        assert(r >= 0 && r * r <= a && (r + 1) * (r + 1) > a, s"a=$a r=$r")
      }
    }
  }

  test("R/S window lattice: integer (cmax-cmin)^2*1000 div (w*Sx2-S^2) equals the rational 1000*(R/S)^2 floor") {
    // events_hurst_rs' core identity: pre-scaling deviations by w makes
    // the cumulative walk integer and ends it at exactly 0, and
    // R_scaled² / (w·Σx² − S²) = (R/S_pop)² with no sqrt — check against
    // BigDecimal rationals on random windows, plus the walk invariants.
    val rnd = new Random(53)
    for (round <- 1 to 300) {
      val w = Seq(4, 8, 16)(rnd.nextInt(3))
      val xs = Array.fill(w)(rnd.nextInt(1000).toLong)
      val sw = xs.sum
      val e = xs.map(x => w * x - sw)
      val walk = e.scanLeft(0L)(_ + _).drop(1)
      assert(walk.last === 0L, "pre-scaled walk must end at 0")
      val (cmax, cmin) = (walk.max, walk.min)
      assert(cmax >= 0L && cmin <= 0L)
      val den = w * xs.map(x => x * x).sum - sw * sw
      if (den > 0) {
        val lattice = (cmax - cmin) * (cmax - cmin) * 1000 / den
        val exact = (BigInt(cmax - cmin) * (cmax - cmin) * 1000 / BigInt(den))
          .toLong
        assert(lattice === exact, s"round $round w=$w")
        // the integer form IS the continuous definition: 1000·(R/S_pop)²
        // with R from the unscaled mean-deviation walk — within float ulp
        val m = sw.toDouble / w
        val s2 = xs.map(x => (x - m) * (x - m)).sum / w
        val rTrue = {
          var c = 0.0; var mx = 0.0; var mn = 0.0
          xs.foreach { x => c += x - m; mx = math.max(mx, c); mn = math.min(mn, c) }
          mx - mn
        }
        val continuous = 1000.0 * rTrue * rTrue / s2
        assert(math.abs(lattice - continuous) <= 1.0 + 1e-6 * continuous,
          s"round $round: lattice $lattice vs continuous $continuous")
      }
    }
  }

  test("two-step long division equals floor(a*c/n^2) on random operands") {
    // text_yule_k's /N² lattice: q·c + (r·c) div n then div n composes to
    // the exact floor without ever forming the a·c product
    val rnd = new Random(52)
    for (round <- 1 to 200) {
      val n = 1L + rnd.nextInt(1 << 20)
      val a = math.abs(rnd.nextLong()) % (n * math.min(n, 1L << 20))
      val c = 10000000L
      val q = a / n; val r = a % n
      val twoStep = (q * c + (r * c) / n) / n
      val exact = (BigInt(a) * c / (BigInt(n) * n)).toLong
      assert(twoStep === exact, s"round $round a=$a n=$n")
    }
  }
}
