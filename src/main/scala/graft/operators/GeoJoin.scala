package graft.operators

import graft.operators.DomainQueries.haversineM
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance joins at scale.
  *
  * `left JOIN right ON haversine(left, right) <= radius` compiles to a
  * BroadcastNestedLoopJoin — fine for a 20-row centroid table
  * (occ_centroid_filter), catastrophic when both sides are large
  * (O(|L|·|R|) comparisons). This operator composes existing Spark ops
  * into the classic grid-banding plan instead:
  *
  *  1. pick a cell size ≥ the search radius (in degrees, lat-adjusted);
  *  2. assign left rows to their cell, right rows to their cell AND its
  *     8 neighbors (explode ×9);
  *  3. shuffle equi-join on the cell id — every true match lands in the
  *     same bucket;
  *  4. verify the exact haversine distance.
  *
  * Cost drops to O(|L| + 9|R| + matches-per-cell verification) with one
  * hash-partitioned shuffle — no custom SparkStrategy needed (SURVEY §5:
  * compose existing ops first).
  */
object GeoJoin {

  /** Degrees per cell for a given radius: one cell must cover the radius
    * in the worst (highest-latitude) band we care about (|lat| ≤ 80°). */
  private def cellDeg(radiusM: Double): Double = {
    val worstMetersPerDegLon = 111320.0 * math.cos(math.toRadians(80.0))
    math.max(radiusM / worstMetersPerDegLon, radiusM / 111320.0)
  }

  private def cellId(lat: Column, lon: Column, deg: Double): Column =
    (floor(lat / deg).cast("long") + 1000L) * 100000L + floor(lon / deg).cast("long") + 10000L

  /** Inner pair join: rows (left ⋈ right) with haversine ≤ radiusM.
    * Column names must not collide across the two inputs. */
  def withinRadius(left: DataFrame, lLat: String, lLon: String,
                   right: DataFrame, rLat: String, rLon: String,
                   radiusM: Double): DataFrame = {
    val deg = cellDeg(radiusM)
    val l = left.withColumn("_cell", cellId(col(lLat), col(lLon), deg))
    val neighbors = expr("explode(sequence(-1, 1))")
    val r = right
      .select(col("*"), neighbors.as("_dlat"))
      .select(col("*"), expr("explode(sequence(-1, 1))").as("_dlon"))
      .withColumn("_cell",
        cellId(col(rLat), col(rLon), deg) + col("_dlat") * 100000L + col("_dlon"))
      .drop("_dlat", "_dlon")
    l.join(r, Seq("_cell"))
      .filter(haversineM(col(lLat), col(lLon), col(rLat), col(rLon)) <= radiusM)
      .drop("_cell")
  }

  /** Left rows having NO right row within radiusM (the centroid-filter
    * shape, for when the centroid set is itself large). */
  def antiWithinRadius(left: DataFrame, lLat: String, lLon: String,
                       right: DataFrame, rLat: String, rLon: String,
                       radiusM: Double): DataFrame = {
    val deg = cellDeg(radiusM)
    val l = left.withColumn("_cell", cellId(col(lLat), col(lLon), deg))
    val r = right
      .select(col(rLat).as("_rlat"), col(rLon).as("_rlon"))
      .select(col("*"), expr("explode(sequence(-1, 1))").as("_dlat"))
      .select(col("*"), expr("explode(sequence(-1, 1))").as("_dlon"))
      .withColumn("_cell",
        cellId(col("_rlat"), col("_rlon"), deg) + col("_dlat") * 100000L + col("_dlon"))
      .drop("_dlat", "_dlon")
    l.join(r,
        l("_cell") === r("_cell") &&
          haversineM(col(lLat), col(lLon), col("_rlat"), col("_rlon")) <= radiusM,
        "left_anti")
      .drop("_cell")
  }
}
