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
}
