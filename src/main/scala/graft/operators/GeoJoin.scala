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
  *     8 neighbors (explode ×9), with longitude cells wrapping at the
  *     ±180° antimeridian (a pair straddling the date line must land in
  *     the same bucket — naive flooring silently loses those matches);
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
    * in the worst (highest-latitude) REGULAR band (|lat| < 80°); above
    * that the polar-cap collapse in [[cellId]] takes over. */
  private def cellDeg(radiusM: Double): Double = {
    val worstMetersPerDegLon = 111320.0 * math.cos(math.toRadians(80.0))
    math.max(radiusM / worstMetersPerDegLon, radiusM / 111320.0)
  }

  /** Wrap-aware cell id. Longitude cells wrap modulo the cell count
    * around the globe, with `dLat`/`dLon` applied BEFORE wrapping so
    * neighbor expansion crosses the antimeridian correctly.
    *
    * Above |lat| ≥ 80° the cell-width guarantee breaks (meters-per-degree
    * of longitude shrinks below the radius bound), so each polar cap
    * collapses into ONE cell per pole, longitude ignored — any two cap
    * points co-locate and the exact haversine verify decides. Cap↔band
    * boundary pairs still meet: the collapse is applied AFTER `dLat`, so
    * a neighbor-expanded row one band below the cap lands in the cap
    * cell (and a cap row expanded downward lands in the top regular
    * band). A pair two full bands apart is ≥ one band of latitude
    * (≥ radius) apart, so nothing beyond ±1 band can match. The caps are
    * tiny (|lat|>80 is <1% of the sphere), so the per-pole bucket stays
    * bounded. */
  private def cellId(lat: Column, lon: Column, deg: Double,
                     dLat: Column, dLon: Column): Column = {
    val lonCells = math.ceil(360.0 / deg).toLong
    val capN = math.floor(80.0 / deg).toLong // first band at/above +80°
    val rawLat = floor(lat / deg).cast("long") + dLat
    val inNorthCap = rawLat >= capN
    val inSouthCap = rawLat <= -capN - 1 // first band at/below −80°
    val latCell = when(inNorthCap, lit(capN))
      .when(inSouthCap, lit(-capN - 1))
      .otherwise(rawLat)
    val lonCell = when(inNorthCap || inSouthCap, lit(0L))
      .otherwise(pmod(floor(lon / deg).cast("long") + dLon, lit(lonCells)))
    latCell * lonCells + lonCell
  }

  private def withCell(df: DataFrame, latCol: String, lonCol: String,
                       deg: Double): DataFrame =
    df.withColumn("_cell", cellId(col(latCol), col(lonCol), deg, lit(0L), lit(0L)))

  private def withNeighborCells(df: DataFrame, latCol: String, lonCol: String,
                                deg: Double): DataFrame =
    df.select(col("*"), expr("explode(sequence(-1, 1))").as("_dlat"))
      .select(col("*"), expr("explode(sequence(-1, 1))").as("_dlon"))
      .withColumn("_cell",
        cellId(col(latCol), col(lonCol), deg, col("_dlat"), col("_dlon")))
      .drop("_dlat", "_dlon")

  /** Inner pair join: rows (left ⋈ right) with haversine ≤ radiusM.
    * Column names must not collide across the two inputs. */
  def withinRadius(left: DataFrame, lLat: String, lLon: String,
                   right: DataFrame, rLat: String, rLon: String,
                   radiusM: Double): DataFrame = {
    val deg = cellDeg(radiusM)
    withCell(left, lLat, lLon, deg)
      .join(withNeighborCells(right, rLat, rLon, deg), Seq("_cell"))
      .filter(haversineM(col(lLat), col(lLon), col(rLat), col(rLon)) <= radiusM)
      .drop("_cell")
  }

  /** Left rows having NO right row within radiusM (the centroid-filter
    * shape, for when the centroid set is itself large). */
  def antiWithinRadius(left: DataFrame, lLat: String, lLon: String,
                       right: DataFrame, rLat: String, rLon: String,
                       radiusM: Double): DataFrame = {
    val deg = cellDeg(radiusM)
    val l = withCell(left, lLat, lLon, deg)
    val r = withNeighborCells(
      right.select(col(rLat).as("_rlat"), col(rLon).as("_rlon")),
      "_rlat", "_rlon", deg)
    l.join(r,
        l("_cell") === r("_cell") &&
          haversineM(col(lLat), col(lLon), col("_rlat"), col("_rlon")) <= radiusM,
        "left_anti")
      .drop("_cell")
  }
}
