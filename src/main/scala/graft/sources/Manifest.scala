package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map manifest layout: range-sharded parquet plus a tiny JSON
  * manifest of per-FILE (min, max, rows) statistics on the layout key,
  * and a reader that prunes whole files at PLANNING time from those
  * stats — the Iceberg/Delta scan-planning shape, scoped to what a
  * library can do portably: the driver decides which files exist in the
  * scan, Spark's vectorized parquet reader does the I/O, and row-level
  * filters still push into each surviving file's row groups.
  *
  * Why this matters at 100 TB: `spark.read.parquet(dir).filter(k
  * BETWEEN lo AND hi)` must still LIST and FOOTER-READ every file in the
  * table before row-group pruning helps; with the manifest the driver
  * touches one small JSON and hands Spark only the overlapping shards —
  * the difference between O(|files|) planning and O(|survivors|).
  * Models the reference's per-study sharded fetches (the paged
  * annotation scan, cf. import_annotations.py:1-33) re-expressed as a
  * layout contract instead of a driver loop.
  */
object Manifest {

  case class ShardStat(path: String, lo: Long, hi: Long, rows: Long)

  /** Write `df` as `shards` range-partitioned parquet files on `key` and
    * record each FILE's exact (min, max, rows) zone map in
    * `<dir>/_manifest.json` (underscore-prefixed so parquet directory listings skip it, like _SUCCESS). The stats pass is one extra scan of the
    * just-written data grouped by `input_file_name()` — partial-agg,
    * |files| result rows. repartitionByRange gives disjoint key ranges
    * per file, which is what makes the zone map selective (a random
    * layout would give every file the full key span and prune
    * nothing — the same reason Z-order exists for 2-D keys). */
  def writeSharded(df: DataFrame, dir: String, key: String, shards: Int): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(shards, col(key))
      .write.mode("overwrite").parquet(dir)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("path"))
      .agg(min(col(key)).cast("long").as("lo"),
        max(col(key)).cast("long").as("hi"),
        count(lit(1)).as("rows"))
      .collect() // |files| rows — driver-sized by construction
    val body = stats.sortBy(_.getAs[String]("path")).map { r =>
      s"""{"path":"${r.getAs[String]("path")}","lo":${r.getAs[Long]("lo")},""" +
        s""""hi":${r.getAs[Long]("hi")},"rows":${r.getAs[Long]("rows")}}"""
    }.mkString("[", ",", "]")
    Files.write(Paths.get(dir, "_manifest.json"),
      body.getBytes(StandardCharsets.UTF_8))
  }

  /** Parse the manifest — a tiny driver-side read. */
  def readManifest(dir: String): Seq[ShardStat] = {
    val body = new String(Files.readAllBytes(Paths.get(dir, "_manifest.json")),
      StandardCharsets.UTF_8)
    """\{"path":"([^"]+)","lo":(-?\d+),"hi":(-?\d+),"rows":(\d+)\}""".r
      .findAllMatchIn(body)
      .map(m => ShardStat(m.group(1), m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong))
      .toSeq
  }

  /** Scan only the files whose zone map overlaps [lo, hi], then apply
    * the exact row filter on top (zone maps admit false positives at
    * range edges, never false negatives). If nothing overlaps, an empty
    * frame with the table schema is returned without scanning data
    * (one footer read for the schema). */
  def prunedRead(spark: SparkSession, dir: String, key: String,
                 lo: Long, hi: Long): DataFrame = {
    val shards = readManifest(dir)
    require(shards.nonEmpty, s"empty manifest in $dir")
    val keep = shards.filter(s => s.hi >= lo && s.lo <= hi).map(_.path)
    val base =
      if (keep.nonEmpty) spark.read.parquet(keep: _*)
      else spark.read.parquet(shards.head.path).filter(lit(false))
    base.filter(col(key) >= lo && col(key) <= hi)
  }
}
