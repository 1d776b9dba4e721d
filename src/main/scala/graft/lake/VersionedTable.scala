package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer publish for plain-parquet datasets — the engine's
  * substitute for a transactional table format's snapshot swap, closing
  * the transient PATH_NOT_FOUND window that rename-pair swaps
  * ([[LakeStorage.compact]]'s legacy path, the old delete-then-rename
  * upsert sink) leave and `readRetrying` had to absorb.
  *
  * Layout (all under one table root):
  * {{{
  *   <root>/v-<ts>-<token>/part-*.parquet   immutable version directory
  *   <root>/_ready-v-<ts>-<token>           zero-byte publish marker
  * }}}
  *
  * The commit primitive is FILE CREATION, not pointer overwrite: a
  * version becomes visible the instant its `_ready-` marker appears in
  * a directory listing, and file creation is atomically visible on
  * every Hadoop filesystem (an overwrite-rename of a single pointer
  * file is NOT — `AbstractFileSystem`'s generic OVERWRITE rename is
  * delete-then-rename, which reopens exactly the absent-pointer window
  * this exists to kill). Readers resolve the CURRENT version as the
  * lexicographically greatest marker (names embed a zero-padded
  * publish timestamp, so greatest = newest); version directories are
  * immutable once published, so a resolved read can never lose files
  * under itself.
  *
  * Concurrent-reader contract (spec-pinned, no retry anywhere):
  *  - a reader overlapping any number of publishes sees SOME fully
  *    published version — old or new data, never an error, never a
  *    partial directory (data files are fully written before the
  *    marker is created);
  *  - [[vacuum]] (run by [[publish]]) keeps the newest `keepVersions`
  *    versions, so a reader that resolved version N can finish reading
  *    it until N ages `keepVersions` publishes into the past — size
  *    the retention to the longest read a deployment runs, exactly
  *    like a table format's snapshot-expiry horizon.
  *  - crash between data write and marker creation leaves an orphan
  *    (invisible) directory; vacuum removes orphans older than the
  *    oldest retained PUBLISHED version, never a directory whose
  *    marker may still be in flight.
  *
  * Object stores: S3 listings are strongly consistent (post-2020), and
  * marker creation is a single atomic PUT — this scheme needs no
  * rename at all, which is precisely what makes it object-store-safe
  * where directory-rename swaps are not.
  *
  * Single writer assumed (same as the sinks it backs); two concurrent
  * publishes degrade gracefully — both versions land, the greater name
  * wins the next resolve, the loser ages out via vacuum.
  */
object VersionedTable {

  private val MarkerPrefix = "_ready-"
  private val VersionPrefix = "v-"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Published versions, ascending (oldest first). Marker-backed: a
    * version directory without its marker does not exist yet.
    */
  def listVersions(spark: SparkSession, root: String): Seq[String] = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    if (!fs.exists(rootP)) Seq.empty
    else fs.listStatus(rootP).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix))
      .sorted
  }

  def currentVersion(spark: SparkSession, root: String): Option[String] =
    listVersions(spark, root).lastOption

  /** True when `root` holds at least one published version. */
  def isVersioned(spark: SparkSession, root: String): Boolean =
    currentVersion(spark, root).isDefined

  /** Read the current version. Fails (like any read of an absent
    * dataset) when nothing has been published.
    */
  def readCurrent(spark: SparkSession, root: String): DataFrame =
    currentVersion(spark, root) match {
      case Some(v) => spark.read.parquet(new Path(root, v).toString)
      case None => throw new IllegalStateException(
        s"no published version at $root")
    }

  /** Millisecond timestamp embedded in a version name; None for names
    * this writer could not have produced (vacuum must skip those, not
    * crash on a stray user-made `v-` directory).
    */
  private def versionTsOpt(v: String): Option[Long] = {
    val digits = v.stripPrefix(VersionPrefix).takeWhile(_ != '-')
    if (digits.nonEmpty && digits.forall(_.isDigit) && digits.length <= 18)
      Some(digits.toLong)
    else None
  }

  private def versionTs(v: String): Long = versionTsOpt(v).getOrElse(
    throw new IllegalArgumentException(s"not a version name: $v"))

  /** Write `df` as a new immutable version and publish it by marker
    * creation; then vacuum to `keepVersions`. Returns the version name.
    * The data write completes (all files + parquet `_SUCCESS`) before
    * the marker exists, so no reader can resolve a partial version.
    */
  def publish(df: DataFrame, root: String, keepVersions: Int = 3): String = {
    require(keepVersions >= 2,
      s"keepVersions must be >= 2 so in-flight readers of the previous " +
        s"version survive a publish, got $keepVersions")
    val spark = df.sparkSession
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    fs.mkdirs(rootP)
    // strictly increasing even under clock skew: never at or below the
    // newest published version's timestamp
    val ts = math.max(System.currentTimeMillis(),
      currentVersion(spark, root).map(versionTs(_) + 1).getOrElse(0L))
    val token = java.util.UUID.randomUUID().toString.take(8)
    val version = f"$VersionPrefix$ts%013d-$token"
    df.write.mode("errorifexists").parquet(new Path(rootP, version).toString)
    val marker = new Path(rootP, s"$MarkerPrefix$version")
    fs.create(marker, false).close() // atomic visibility = the commit
    vacuum(spark, root, keepVersions)
    version
  }

  /** Drop all but the newest `keep` published versions (marker first,
    * then data — a reader can only resolve marked versions), plus any
    * orphan (marker-less) version directory older than the oldest
    * retained version. Returns the removed version names.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"must keep at least one version, got $keep")
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val versions = listVersions(spark, root)
    val doomed = versions.dropRight(keep)
    doomed.foreach { v =>
      fs.delete(new Path(rootP, s"$MarkerPrefix$v"), false)
      fs.delete(new Path(rootP, v), true)
    }
    // orphans: data dirs with no marker, provably dead — strictly older
    // than a version that IS published (a writer creates its marker
    // immediately after its data write, so an in-flight publish is
    // always the newest timestamp in the root)
    val oldestKept = versions.drop(doomed.length).headOption.map(versionTs)
    val orphans =
      if (!fs.exists(rootP)) Seq.empty
      else {
        val marked = versions.toSet
        fs.listStatus(rootP).toSeq.map(_.getPath.getName)
          .filter(n => n.startsWith(VersionPrefix) && !marked.contains(n))
          .filter(n => versionTsOpt(n)
            .exists(ts => oldestKept.exists(ts < _)))
      }
    orphans.foreach(n => fs.delete(new Path(rootP, n), true))
    doomed ++ orphans
  }

  /** [[LakeStorage.compact]] re-expressed over the manifest: rewrite
    * the current version to `targetFiles` files as a NEW version — no
    * rename of live data, no reader window at all. Returns the row
    * count (invariant-check hook; the rewrite never changes data).
    */
  def compact(spark: SparkSession, root: String, targetFiles: Int,
              keepVersions: Int = 3): Long = {
    require(targetFiles > 0,
      s"target file count must be positive, got $targetFiles")
    val v = publish(readCurrent(spark, root).repartition(targetFiles),
      root, keepVersions)
    spark.read.parquet(new Path(root, v).toString).count()
  }

  /** Key-wise upsert of `batch` into the table (J5 semantics via
    * [[graft.operators.Joins.upsert]]), published as a new version.
    * First call on an empty root publishes the batch as-is. This is
    * the persistence step behind the idempotent streaming sink and
    * `StarSchema.accumulateDaily` — re-delivered batches converge to
    * the same state, and readers never hit the old swap window.
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, keys: Seq[String],
                  root: String, keepVersions: Int = 3): Unit = {
    // readCurrent pins a concrete version path at plan time, and
    // publish's vacuum (keepVersions >= 2) retains that version through
    // the write — the merge can stream from old to new version without
    // materializing
    val merged =
      if (isVersioned(spark, root))
        graft.operators.Joins.upsert(readCurrent(spark, root), batch, keys)
      else batch
    publish(merged, root, keepVersions)
    ()
  }
}
