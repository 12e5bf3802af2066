package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Per-group convex-hull area in km², the exact-geometry version of the
  * reference's range estimation (transforms.py:889-934: convex hull of
  * occurrence points, area in the EPSG:6933 equal-area projection).
  *
  * Typed Aggregator so it composes with groupBy().agg(). The buffer keeps
  * only candidate hull points: whenever it grows past `PruneAt` it is
  * collapsed to its own hull, so per-group state stays O(hull size) —
  * safe for groups of millions of points (partial aggregation runs
  * map-side; merge unions two pruned hulls).
  *
  * Returns -1.0 for groups with <3 non-collinear points (callers map it
  * to NULL; the reference emits a "too few points" note).
  */
class ConvexHullAreaKm2 extends Aggregator[(Double, Double), Seq[(Double, Double)], Double] {
  import ConvexHullAreaKm2._

  override def zero: Seq[(Double, Double)] = Vector.empty

  override def reduce(b: Seq[(Double, Double)], pt: (Double, Double)): Seq[(Double, Double)] = {
    val nb = b :+ pt
    if (nb.length > PruneAt) hull(nb).toSeq else nb
  }

  override def merge(a: Seq[(Double, Double)], b: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val ab = a ++ b
    if (ab.length > PruneAt) hull(ab).toSeq else ab
  }

  override def finish(b: Seq[(Double, Double)]): Double = {
    if (b.length < 3) return -1.0
    val h = hull(b)
    if (h.length < 3) return -1.0 // collinear
    // Shoelace over EPSG:6933-projected points, m² → km².
    var area = 0.0
    var i = 0
    while (i < h.length) {
      val (x1, y1) = project(h(i))
      val (x2, y2) = project(h((i + 1) % h.length))
      area += x1 * y2 - x2 * y1
      i += 1
    }
    math.abs(area) / 2.0 / 1e6
  }

  override def bufferEncoder: Encoder[Seq[(Double, Double)]] =
    ExpressionEncoder[Seq[(Double, Double)]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ConvexHullAreaKm2 {
  private val PruneAt = 512

  /** EPSG:6933 (EASE-Grid 2.0 global): equal-area cylindrical with
    * standard parallel 30°. x = R·λ·cos φ1, y = R·sin φ / cos φ1. */
  private val R = 6378137.0
  private val CosPhi1 = math.cos(math.toRadians(30.0))

  def project(p: (Double, Double)): (Double, Double) = {
    val (lon, lat) = p
    (R * math.toRadians(lon) * CosPhi1, R * math.sin(math.toRadians(lat)) / CosPhi1)
  }

  /** Andrew's monotone chain; input need not be sorted or distinct. */
  def hull(pts: Iterable[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    val sorted = pts.toArray.distinct.sortBy(identity)
    if (sorted.length <= 2) return ArrayBuffer.empty ++= sorted
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(seq: Iterator[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
      val out = ArrayBuffer.empty[(Double, Double)]
      for (p <- seq) {
        while (out.length >= 2 && cross(out(out.length - 2), out(out.length - 1), p) <= 0)
          out.remove(out.length - 1)
        out += p
      }
      out
    }
    val lower = half(sorted.iterator)
    val upper = half(sorted.reverseIterator)
    lower.dropRight(1) ++= upper.dropRight(1)
  }
}
