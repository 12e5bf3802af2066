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
}
