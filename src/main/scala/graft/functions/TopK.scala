package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k (score desc, id asc as tie-break) — the
  * distributed replacement for a `row_number().over(partitionBy(group))`
  * rerank. The window plan funnels EVERY candidate of a group through one
  * task (a skew point once groups number 10⁵+ with large candidate sets);
  * this typed Aggregator keeps a k-bounded sorted buffer that combines
  * map-side, so shuffle volume per group is O(k), never O(candidates).
  *
  * Output is the ranked array (rank = position + 1), exactly matching
  * ROW_NUMBER() OVER (ORDER BY score DESC, id) <= k given distinct ids.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Long, Double)]] {

  // buffer is sorted best-first: score desc, id asc. Double.compare (not
  // primitive >) imposes a total order matching Spark's ORDER BY DESC —
  // NaN ranks first. With primitive >, a NaN landing in a full buffer's
  // tail would make `!better(e, b.last)` true for every later candidate,
  // silently dropping higher-scoring rows.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val e = (in._2, in._1)
    if (b.length >= k && !better(e, b.last)) b
    else insert(b, e)
  }

  private def insert(b: Seq[(Double, Long)], e: (Double, Long)): Seq[(Double, Long)] = {
    val i = b.indexWhere(x => better(e, x))
    val ins = if (i < 0) b :+ e else (b.take(i) :+ e) ++ b.drop(i)
    if (ins.length > k) ins.take(k) else ins
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge two sorted buffers, keep best k
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[(Double, Long)]): Seq[(Long, Double)] =
    b.map(e => (e._2, e._1))

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
