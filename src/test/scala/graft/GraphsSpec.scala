package graft

import graft.operators.Graphs
import scala.util.Random

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def referenceCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // classic union-find with path compression
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connected components on a chain (worst-case diameter)") {
    // 0-1-2-...-15 all one component; 100-101 a second one
    val edges = (0L until 15L).map(i => (i, i + 1)) :+ (100L, 101L)
    val got = Graphs.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got === ((0L to 15L).map(_ -> 0L) ++ Seq(100L -> 100L, 101L -> 100L)).toMap)
  }

  test("exhausting maxIter with labels still moving fails loudly") {
    // a 6-chain needs ~3 rounds of min-label doubling; maxIter=1 cannot
    // converge — silently returning the partial labels would hand the
    // caller WRONG cluster ids, so the operator must throw instead
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Graphs.connectedComponents(chain, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connected components match union-find on a random graph") {
    val rnd = new Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val got = Graphs.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got === referenceCC(edges))
  }

  test("big-star CC: 10k-node path converges in O(log n) rounds with exact labels") {
    // The high-diameter regime min-label CANNOT handle (it would need
    // 10000 rounds): a path graph of n = 10001 nodes, ids PERMUTED by a
    // coprime lattice so the component minimum sits mid-path (sorted ids
    // would hand large-star an artificially easy geometry).
    val n = 10001L
    def id(i: Long): Long = (i * 7919L) % n
    val path = (0L until n - 1).map(i => (id(i), id(i + 1)))
    val (labels, rounds) = Graphs.alternatingCC(path.toDF("a", "b"))
    val logBound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) // 2*ceil(log2 n)
    assert(rounds <= logBound, s"took $rounds rounds, bound $logBound")
    val got = labels.as[(Long, Long)].collect()
    assert(got.length === n)
    assert(got.forall(_._2 === 0L), "single component rooted at min id 0")
    // same API, algo switch: big-star through connectedComponents agrees
    // with min-label (and union-find) on a random multi-component graph
    val rnd = new Random(41)
    val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val bs = Graphs.connectedComponents(edges.toDF("a", "b"), algo = "big-star")
      .as[(Long, Long)].collect().toMap
    assert(bs === referenceCC(edges))
  }

  test("bipartite premium components agree with union-find over the same edges") {
    import org.apache.spark.sql.functions.col
    val edges = graft.Tables.t(spark, sf, "lineitem")
      .filter(col("l_extendedprice") > 104000)
      .select(col("l_partkey"), col("l_suppkey") + 100000000L)
      .as[(Long, Long)].collect().toSeq
    val got = Graphs.graphBipartiteComponents(spark, sf)
      .select("node", "cluster_id").as[(Long, Long)].collect().toMap
    assert(got === referenceCC(edges))
    // structure is non-degenerate: multiple components (5 at spec SF
    // 0.001, 39 at the sf0.01 gate, 286 at sf0.1)
    assert(got.values.toSet.size > 1, "expected multiple components")
  }

  test("big-star CC fails loudly when maxRounds is too small") {
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Graphs.connectedComponents(chain, maxIter = 2, algo = "big-star")
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("fixed-point pagerank replays the integer lattice exactly; hub outranks leaves") {
    // path 1-2-3-4 plus a hub 5 touching every path node, and a random
    // graph: the Spark loop must equal a plain-Scala replay of the SAME
    // positive-integer floor-division recurrence BIT FOR BIT (that
    // equality is what makes the DuckDB unrolled-CTE oracle sound).
    def replay(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] = {
      val sym = edges.filter(e => e._1 != e._2)
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size.toLong
      val SCALE = 1073741824L
      val tele = SCALE * 3 / 20 / n
      var r = deg.keys.map(_ -> SCALE / n).toMap
      for (_ <- 1 to iters) {
        val next = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((a, b) <- sym) next(b) += (r(a) * 17) / (20 * deg(a))
        r = next.map { case (k, v) => k -> (v + tele) }.toMap
      }
      r
    }
    val hubby = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))
    val got = Graphs.pageRank(hubby.toDF("x", "y"))
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    assert(got === replay(hubby))
    assert(got(5L) > got(1L) && got(5L) > got(4L), s"hub must outrank leaves: $got")
    val rnd = new Random(13)
    val rand = Seq.fill(100)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val gotR = Graphs.pageRank(rand.toDF("x", "y"))
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    assert(gotR === replay(rand))
    // rank_val is the exact 2^-30 scaling of the fixed-point rank
    val vals = Graphs.pageRank(hubby.toDF("x", "y"))
      .select("rank_fp", "rank_val").as[(Long, Double)].collect()
    for ((fp, v) <- vals) assert(v === fp.toDouble / 1073741824.0)
  }

  test("label propagation replays the synchronous majority update; bridge does not merge") {
    def replay(edges: Seq[(Long, Long)], iters: Int = 4): Map[Long, Long] = {
      val sym = edges.filter(e => e._1 != e._2)
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val nbrs = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      var lab = nbrs.keys.map(k => k -> k).toMap
      for (_ <- 1 to iters) {
        lab = nbrs.map { case (v, as) =>
          val cnt = as.map(lab).groupBy(identity).view.mapValues(_.size.toLong).toMap
          v -> cnt.toSeq.map { case (l, c) => (-c, l) }.min._2
        }
      }
      lab
    }
    // two triangles joined by ONE bridge edge: CC merges them into one
    // component; majority propagation must keep them separate
    val twoTri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val got = Graphs.labelPropagation(twoTri.toDF("x", "y"))
      .as[(Long, Long)].collect().toMap
    assert(got === replay(twoTri))
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(10L) === got(11L) && got(11L) === got(12L))
    assert(got(1L) !== got(10L), "bridge edge merged the two dense groups")
    // bit-exact on an arbitrary graph too
    val rnd = new Random(17)
    val rand = Seq.fill(90)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val gotR = Graphs.labelPropagation(rand.toDF("x", "y"))
      .as[(Long, Long)].collect().toMap
    assert(gotR === replay(rand))
  }

  test("ancestor closure: binary-tree depth is exactly bitlength-1; shallow rounds fail loudly") {
    // for parent = node div 2 the depth to root 1 is floor(log2(node))
    val got = Graphs.graphAncestorClosure(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    for ((node, root, depth) <- got) {
      assert(root === 1L)
      // doc_id 0 hangs directly off root 1 (greatest(0 div 2, 1) = 1)
      val want = if (node == 0L) 1L else 63L - java.lang.Long.numberOfLeadingZeros(node)
      assert(depth === want, s"node $node: depth $depth != $want")
    }
    // 2^rounds < depth must throw, not silently return partial ancestors
    val chain = (1L to 10L).map(v => (v, math.max(v - 1, 1L))).toDF("node", "anc")
    val e = intercept[IllegalStateException] {
      Graphs.ancestorClosure(chain, rounds = 2).collect()
    }
    assert(e.getMessage.contains("raise rounds"))
  }

  test("triangle counts match brute force on a random graph, K4 gives 3 each") {
    // K4 has C(4,3)=4 triangles; each node sits in exactly 3 of them
    val k4 = (for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)).toDF("a", "b")
    assert(Graphs.triangleCounts(k4).as[(Long, Long)].collect().toMap ===
      (0L to 3L).map(_ -> 3L).toMap)
    // chain 4-5-6 has none; duplicates/direction/self edges are ignored
    val noisy = Seq((4L, 5L), (5L, 4L), (5L, 6L), (6L, 6L)).toDF("a", "b")
    assert(Graphs.triangleCounts(noisy).count() === 0)
    // hub-heavy graph (the degree-orientation stress case): a star
    // contributes NO triangles no matter how large the hub degree, and
    // a triangle hanging off the hub still counts exactly once
    val star = ((1L to 30L).map(i => (0L, i)) ++ Seq((1L, 2L))).toDF("a", "b")
    assert(Graphs.triangleCounts(star).as[(Long, Long)].collect().toMap ===
      Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    // random graph vs brute-force enumeration
    val rnd = new Random(11)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val eset = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val nodes = eset.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if eset((a, b)) && eset((b, c)) && eset((a, c))
      n <- Seq(a, b, c)
    } brute(n) += 1
    val got = Graphs.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got === brute.toMap)
  }

  test("kcore: a triangle survives the peel, its tail strips layer by layer") {
    // 1-2-3 triangle with a 3-4-5 tail: 5 peels first, then 4; the
    // triangle keeps degree 2 forever
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val got = Graphs.kcorePeel(edges).as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false, 5L -> false))
    // a pure cycle is its own 2-core: nothing peels
    val cycle = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("x", "y")
    val gotC = Graphs.kcorePeel(cycle).as[(Long, Boolean)].collect().toMap
    assert(gotC.values.forall(identity) && gotC.size === 4)
  }

  test("ktruss: clique edges survive, star and pendant edges peel") {
    // K4 on 1-4: every edge closes a triangle with survivors forever
    val k4 = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toDF("x", "y")
    val gotK4 = Graphs.trussPeel(k4).as[(Long, Long, Boolean)].collect()
    assert(gotK4.length === 6 && gotK4.forall(_._3))
    // star 10-(11..15): kcore-style degree keeps the hub, truss rejects
    // every edge (no edge closes a triangle)
    val star = (11L to 15L).map(l => (10L, l)).toDF("x", "y")
    val gotStar = Graphs.trussPeel(star).as[(Long, Long, Boolean)].collect()
    assert(gotStar.length === 5 && gotStar.forall(!_._3))
    // triangle 1-2-3 with pendant 3-4: triangle survives, pendant peels
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("x", "y")
    val gotTp = Graphs.trussPeel(tp).as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotTp === Map((1L, 2L) -> true, (2L, 3L) -> true,
      (1L, 3L) -> true, (3L, 4L) -> false))
    // fused triangles: at k=3 an edge's triangle co-edges sit in that
    // same triangle, so they can never be triangle-free — the 3-truss is
    // exactly "edges in >= 1 triangle" and NO multi-round cascade exists
    // at k=3 (cascades need k >= 4; next fixture). Here only the
    // triangle-free pendant peels, in round 1.
    val chainT = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L),
      (4L, 5L)).toDF("x", "y")
    val gotCh = Graphs.trussPeel(chainT).as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotCh((4L, 5L)) === false)
    assert(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
      .forall(gotCh(_)))
  }

  test("ktruss k=4: a triangle strip cascades round by round, K5 survives") {
    // Triangle strip 1-2-3-4-5-6 (triangles {1,2,3},{2,3,4},{3,4,5},
    // {4,5,6}): at k=4 (support >= 2) the boundary edges die in round 1,
    // which drops the interior edges (2,3),(3,4),(4,5) to support 1 so
    // they die in round 2 — a GENUINE cascade (multi-round peeling is
    // load-bearing). The K5 on 10..14 (every edge in 3 triangles) must
    // survive untouched.
    val strip = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L))
    val k5 = for { a <- 10L to 14L; b <- (a + 1) to 14L } yield (a, b)
    val g = (strip ++ k5).toDF("x", "y")
    val after1 = Graphs.trussPeel(g, k = 4, rounds = 1)
      .as[(Long, Long, Boolean)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val after3 = Graphs.trussPeel(g, k = 4, rounds = 3)
      .as[(Long, Long, Boolean)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // interior strip edges survive round 1 ...
    assert(Seq((2L, 3L), (3L, 4L), (4L, 5L)).forall(after1(_)))
    // ... and are dead by round 2 (cascade), so rounds=3 kills the strip
    assert(strip.forall(e => !after3(e)))
    // K5 is a 5-truss: every edge survives both runs
    assert(k5.forall(e => after1(e) && after3(e)))
  }

  test("bfs layers: chain distances exact, horizon truncates, two seeds race") {
    // chain 14-1-2-3-4-5: seed 14 (14%7=0); node 5 is 5 hops -> unreached in 4
    val chain = Seq((14L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val got = Graphs.bfsLayers(chain, n => n % 7 === 0).as[(Long, Long)].collect().toMap
    assert(got === Map(14L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> -1L))
    // two seeds: every node takes the NEARER one (7 and 21 both seeds)
    val twoSeeds = Seq((7L, 2L), (2L, 3L), (3L, 21L)).toDF("x", "y")
    val got2 = Graphs.bfsLayers(twoSeeds, n => n % 7 === 0).as[(Long, Long)].collect().toMap
    assert(got2 === Map(7L -> 0L, 21L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("survivorship: one canonical per cluster, it has the cluster-max quality") {
    val got = Graphs.dedupSurvivorship(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    val quality = operators.TextQueries.textQuality(spark, sf)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(got.length === quality.size) // every document is mapped
    val byCluster = got.groupBy(_._2)
    for ((cl, members) <- byCluster) {
      val canons = members.map(_._3).distinct
      assert(canons.length === 1, s"cluster $cl has ${canons.length} canonicals")
      val canon = canons.head
      assert(members.exists(m => m._1 == canon && m._4), s"cluster $cl canonical not a member")
      val best = members.map(m => (-quality(m._1), m._1)).min
      assert(canon === best._2, s"cluster $cl canonical is not the quality argmax")
    }
    // clusters correspond to dedupCluster labels where they exist
    val clusters = Graphs.dedupCluster(spark, sf).as[(Long, Long)].collect().toMap
    for ((doc, cl, _, _) <- got)
      assert(cl === clusters.getOrElse(doc, doc))
  }

  test("cluster sizes bin the CC components exactly") {
    val got = Graphs.dedupClusterSizes(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val sizes = Graphs.dedupCluster(spark, sf).as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.length.toLong).toSeq
    assert(sizes.nonEmpty)
    val expect = sizes.groupBy(sz => 63L - java.lang.Long.numberOfLeadingZeros(sz))
      .map { case (bits, szs) =>
        bits -> ((bits, szs.length.toLong, szs.sum, szs.min, szs.max)) }
    assert(got === expect)
    // mass conservation: binned docs are exactly the clustered docs
    assert(got.values.map(_._3).sum === sizes.sum)
  }

  test("degree spectrum: star + triangle bin exactly; dup/self edges ignored") {
    // star center 0 with leaves 1..5 (deg 5 vs 1), disjoint triangle
    // 10-11-12 (deg 2 each); duplicate and self edges must not count
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (10L, 10L))
    val got = Graphs.degreeStats(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // deg 1 ⇒ bin 0 (5 leaves); deg 2 ⇒ bin 1 (triangle); deg 5 ⇒ bin 2
    assert(got === Map(
      0L -> ((5L, 5L, 1L, 1L)),
      1L -> ((3L, 6L, 2L, 2L)),
      2L -> ((1L, 5L, 5L, 5L))))
    // handshake check: endpoint mass = 2·|E|
    assert(got.values.map(_._2).sum === 16L)
  }

  /** Driver-side Kruskal over unique weights — the MSF ground truth. */
  private def referenceMsf(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set[(Long, Long, Long)]()
    for ((u, v, w) <- edges.sortBy(_._3)) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((math.min(u, v), math.max(u, v), w)) }
    }
    out.toSet
  }

  test("boruvka msf matches driver Kruskal on random graphs, including a disconnected forest") {
    val rnd = new Random(41)
    // two islands of 30 nodes each (node ids 0-29 and 100-129) — the
    // result must be a FOREST, one tree per island
    val mk = (base: Long) => Seq.fill(120)(
      (base + rnd.nextInt(30), base + rnd.nextInt(30))).filter(p => p._1 != p._2)
    val raw = (mk(0L) ++ mk(100L)).distinct
    // unique weights: hash-ish base + index tiebreak
    val edges = raw.zipWithIndex.map { case ((u, v), i) =>
      (u, v, (u * 7 + v * 13) % 50 * 1000 + i) }
    val got = Graphs.boruvkaMsf(edges.toDF("u", "v", "w"))
      .as[(Long, Long, Long)].collect().toSet
    // canonicalize reference over the same (least, greatest) orientation
    val canon = edges.map { case (u, v, w) => (math.min(u, v), math.max(u, v), w) }
      .groupBy(e => (e._1, e._2)).map { case (_, g) => g.minBy(_._3) }.toSeq
    assert(got === referenceMsf(canon))
    // forest shape: |edges| = |nodes| - |components|
    val nodes = raw.flatMap(p => Seq(p._1, p._2)).distinct.size
    assert(got.size === nodes - 2)
  }

  test("boruvka msf converges in O(log n) rounds on a path graph") {
    // a 1024-node path is the worst case for min-label CC (diameter n);
    // Borůvka must finish in ~log2(n) contraction rounds
    val n = 1024
    val edges = (0L until (n - 1)).map(i => (i, i + 1, 5000 + (i * 2654435761L) % 100000 * 1024 + i))
    val (forest, rounds) = Graphs.boruvkaMsfRounds(edges.toDF("u", "v", "w"), maxRounds = 16)
    // every path edge is in the MSF (removing any disconnects the path)
    assert(forest.count() === (n - 1).toLong)
    assert(rounds <= 2 + (math.log(n) / math.log(2)).toInt,
      s"needed $rounds rounds for a $n-node path")
  }

  test("boruvka msf refuses duplicate weights loudly") {
    val e = intercept[IllegalArgumentException] {
      Graphs.boruvkaMsf(Seq((1L, 2L, 7L), (2L, 3L, 7L)).toDF("u", "v", "w"))
    }
    assert(e.getMessage.contains("distinct edge weights"))
  }

  /** Independent reference for [[Graphs.landmarkHarmonic]]'s landmark
    * pick: java MessageDigest md5 of "lm:<node>", first 13 hex chars as
    * a hex long — no Spark expression shared with the operator. */
  private def lmHash(node: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"lm:$node".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(7).map("%02x".format(_)).mkString.take(13), 16)
  }

  private def referenceBfs(adj: Map[Long, Set[Long]], src: Long,
                           horizon: Int): Map[Long, Int] = {
    var dist = Map(src -> 0)
    var frontier = Set(src)
    for (d <- 1 to horizon) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    dist
  }

  test("modularity: divide-first lattice replays by hand, degree mass conserves") {
    val edges = operators.TextQueries.dedupNgramJaccard(spark, sf)
      .select("doc1", "doc2").as[(Long, Long)].collect()
    val labels = Graphs.graphCommunities(spark, sf)
      .as[(Long, Long)].collect().toMap
    val m = edges.length.toLong
    val got = Graphs.graphModularity(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // same node universe and deterministic labels as graph_communities
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, g) => n -> g.length.toLong }
    val byC = labels.groupBy(_._2).map { case (c, g) => c -> g.keys.toSet }
    assert(got.keySet === byC.keySet)
    var total = 0L
    for ((c, (_, nNodes, iC, dC, mGot, contrib)) <- got) {
      val nodes = byC(c)
      assert(nNodes === nodes.size)
      assert(mGot === m)
      assert(iC === edges.count(e => labels(e._1) == c && labels(e._2) == c))
      assert(dC === nodes.toSeq.map(deg).sum)
      val half = dC * 1000 / (2 * m)
      assert(contrib === iC * 1000000L / m - half * half)
      total += contrib
    }
    // degree mass conserves and the partition's Q stays in [-1, 1]
    assert(got.values.map(_._4).sum === 2 * m)
    assert(got.values.map(_._3).sum <= m)
    assert(total >= -1000000L && total <= 1000000L)
    // a one-community partition scores exactly zero on this lattice
    assert(m * 1000000L / m - (2 * m * 1000 / (2 * m)) *
      (2 * m * 1000 / (2 * m)) === 0L)
  }

  test("landmark harmonic: exact integer folds, disconnected component contributes zero") {
    // Component A: a 9-node path (ids chosen freely — the reference
    // recomputes whatever landmarks the hash picks); component B: the
    // pair {1000, 1001}. With 2 landmarks the hash may seat them both
    // in A, both in B, or split — the reference BFS handles every case,
    // and we additionally assert the zero-contribution path on whichever
    // component ends up landmark-free (forced below).
    val pathEdges = (1L to 8L).map(i => (i, i + 1))
    val edges = (pathEdges :+ (1000L, 1001L)).toDF("x", "y")
    val nodes = (1L to 9L) ++ Seq(1000L, 1001L)
    val adj = (pathEdges ++ Seq((1000L, 1001L)))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val lms = nodes.sortBy(n => (lmHash(n), n)).take(2)
    val dists = lms.map(referenceBfs(adj, _, 6))
    val expected = nodes.map { n =>
      val ds = dists.flatMap(_.get(n)).filter(_ > 0)
      n -> ((ds.size.toLong, ds.map(1000L / _).sum))
    }.toMap
    val got = Graphs.landmarkHarmonic(edges, nLandmarks = 2, rounds = 6)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expected)
    // Force the zero-contribution path: 4 landmarks over an 11-node
    // clique component vs the isolated pair — at most 4 of 11 clique
    // nodes are landmarks, and IF the hash seats all 4 in the clique
    // (it does for these ids: verified by the reference pick below),
    // the pair must read (0, 0), not NULL and not a crash.
    val cliqueIds = (1L to 11L)
    val clique = for { a <- cliqueIds; b <- cliqueIds if a < b } yield (a, b)
    val nodes2 = cliqueIds ++ Seq(1000L, 1001L)
    val lms2 = nodes2.sortBy(n => (lmHash(n), n)).take(4)
    assume(lms2.forall(_ <= 11L), "hash seated a landmark in the pair; fixture ids need reshuffling")
    val got2 = Graphs.landmarkHarmonic((clique :+ (1000L, 1001L)).toDF("x", "y"),
      nLandmarks = 4, rounds = 6)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got2(1000L) === ((0L, 0L)) && got2(1001L) === ((0L, 0L)))
    // clique non-landmarks sit at distance 1 from all 4 landmarks;
    // landmarks see the OTHER 3 at distance 1 (self contributes 0)
    cliqueIds.foreach { n =>
      if (lms2.contains(n)) assert(got2(n) === ((3L, 3000L)))
      else assert(got2(n) === ((4L, 4000L)))
    }
  }

  test("rich club: threshold populations shrink monotonically and phi stays in [0, 1000]") {
    val got = Graphs.graphRichClub(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).sameElements(1L to 8L))
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "n_nodes must be non-increasing in k")
        assert(b._3 <= a._3, "n_edges must be non-increasing in k")
      case _ =>
    }
    got.foreach { case (_, nk, ek, phi) =>
      assert(phi >= 0 && phi <= 1000)
      if (nk >= 2) assert(ek * 2 <= nk * (nk - 1), "edge count exceeds clique size")
      else assert(phi === 0L)
    }
  }


  test("diameter estimate: ecc bounded by the 6-hop horizon, diameter_lb is the landmark max") {
    val got = Graphs.graphDiameterEstimate(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).sameElements(0L until got.length.toLong))
    val dlb = got.map(_._3).max
    got.foreach { case (_, reach, ecc, d) =>
      assert(ecc >= 0 && ecc <= 6, "horizon-censored eccentricity")
      assert(reach >= 0)
      assert((ecc == 0) == (reach == 0), "zero reach iff zero eccentricity")
      assert(d === dlb)
    }
  }

  test("cluster purity: component sizes agree with the label table and shares replay") {
    val purity = Graphs.dedupClusterPurity(spark, sf)
      .as[(Long, Long, Long, String, Long, Boolean)].collect()
    val labels = Graphs.dedupCluster(spark, sf).as[(Long, Long)].collect()
    val sizes = labels.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(purity.map(_._1).toSet === sizes.keySet)
    purity.foreach { case (cid, n, nLangs, _, share, pure) =>
      assert(n === sizes(cid))
      assert(nLangs >= 1 && nLangs <= n)
      assert(share >= 1000 / nLangs && share <= 1000)
      assert(pure === (nLangs == 1))
    }
  }

}
