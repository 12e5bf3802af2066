package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic rebuild-then-swap publish — the atomic-replace alternative to
  * the reference's articles-index refresh (`update_articles_index.py:7-44`
  * bulk-upserts documents IN PLACE into a fixed index, so readers can
  * observe a half-refreshed mix; this module models the shape such a
  * refresh should have for exactly-one-snapshot reads): every publish
  * writes a
  * COMPLETE snapshot under a fresh versioned directory, then "swaps the
  * alias" by creating that version's `_PUBLISHED` marker. Creating one
  * file is atomic on any filesystem/object store, so readers — who
  * resolve max(published version) first — always see exactly one full
  * snapshot, never a half-written mix. A crashed publish leaves an
  * unmarked orphan directory and the alias untouched (re-run safe);
  * rollback is deleting one marker. Unlike [[Upsert]] (partition-level
  * in-place refresh) this is the full-rebuild/atomic-replace shape.
  */
object AliasPublish {
  private val MARKER = "_PUBLISHED"
  // ≤18 digits: all-digit names beyond Long range must SKIP, not throw
  private val VersionDir = "v=(\\d{1,18})".r

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** One root listing + one marker probe per version dir (object-store
    * round trips are the cost model here); non-numeric `v=` names — a
    * manual v=2.bak, a tool's v=tmp — are skipped, never fatal. Returns
    * (version, published) ascending. */
  private def listVersions(s: SparkSession, root: String): Seq[(Long, Boolean)] = {
    val f = fs(s, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VersionDir(v) =>
          Some(v.toLong -> f.exists(new Path(st.getPath, MARKER)))
        case _ => None
      })
      .sortBy(_._1)
  }

  /** Versions under `root` that completed their alias swap, ascending. */
  def publishedVersions(s: SparkSession, root: String): Seq[Long] =
    listVersions(s, root).collect { case (v, true) => v }

  /** Orphan (crashed-publish) versions: snapshot dirs with no marker. */
  def unpublished(s: SparkSession, root: String): Seq[Long] =
    listVersions(s, root).collect { case (v, false) => v }

  /** Write a full snapshot as the next version and atomically publish it.
    * Returns the published version number. */
  def publish(df: DataFrame, root: String): Long = {
    val s = df.sparkSession
    val next = listVersions(s, root).foldLeft(0L) { case (m, (v, _)) => math.max(m, v) } + 1
    df.write.mode("error").parquet(s"$root/v=$next")
    fs(s, root).create(new Path(root, s"v=$next/$MARKER"), false).close() // the swap
    next
  }

  /** Resolve the alias and read the current snapshot. */
  def readCurrent(s: SparkSession, root: String): DataFrame = {
    val vs = publishedVersions(s, root)
    require(vs.nonEmpty, s"no published snapshot under $root")
    s.read.parquet(s"$root/v=${vs.last}")
  }

  /** Retention vacuum: delete all but the newest `keep` PUBLISHED
    * versions, plus unpublished orphans STRICTLY OLDER than the oldest
    * kept published version (a crashed publish's leftovers). Orphans at
    * or above the retained window are never touched — one may be an
    * in-flight publish about to create its marker, and an in-flight
    * version number is always > the newest version published when the
    * write began, hence ≥ every version the window can retain under
    * the same single-writer assumption [[publish]] itself carries (two
    * concurrent publishers can collide on a version number regardless
    * of vacuum — writer coordination is external to this module).
    * Readers are unaffected: the resolved max(published) version is
    * always in the keep set, so a concurrent read never loses its
    * snapshot mid-scan. Returns the deleted versions (ascending). */
  def vacuum(s: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val all = listVersions(s, root)
    val published = all.collect { case (v, true) => v }
    if (published.isEmpty) Seq.empty // nothing is safely deletable yet
    else {
      val keepSet = published.takeRight(keep).toSet
      val oldestKept = keepSet.min
      val doomed = all.collect {
        case (v, true) if !keepSet.contains(v) => v
        case (v, false) if v < oldestKept => v
      }
      val f = fs(s, root)
      doomed.foreach(v => f.delete(new Path(root, s"v=$v"), true))
      doomed
    }
  }
}
