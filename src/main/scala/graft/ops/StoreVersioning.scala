package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned roots for the persisted stores ([[IvfIndex]],
  * [[DedupStore]]): every rebuild or compaction writes a FRESH
  * `v<n>/` directory and commits it by creating a `_COMMITTED` marker
  * file inside it — never by overwriting live data in place, and
  * never by a multi-step pointer mutation.
  *
  * This is what makes the stores' failure story structural instead of
  * rhetorical: an in-place static overwrite DELETES its target before
  * the new job commits, so a mid-rebuild crash used to leave a gutted
  * or mixed-generation store (new centroids over old vectors), and a
  * retried compaction could overwrite its own staging copy with the
  * data it had just destroyed. Here the commit point is ONE atomic
  * file creation: the current root is the highest `v<n>` that carries
  * the marker, so a crashed build's marker-less directory is simply
  * invisible, a crash can never leave the store pointer-less (there
  * is no pointer to half-write), and the recovery for any failed
  * save/compact is: run it again.
  *
  * Retention: a commit prunes all older versions EXCEPT the one it
  * supersedes — an in-flight reader that resolved the old root before
  * the commit keeps its files for one full commit cycle (a streaming
  * micro-batch, a long scan). A reader that holds a root across TWO
  * commits is out of contract. Marker-less orphans older than the new
  * version are pruned outright; legacy non-versioned entries are left
  * untouched (rebuild migrates a legacy store; its files are not
  * silently destroyed).
  *
  * Concurrency contract: ONE maintainer at a time (save/append/
  * delete/compact are serial maintenance operations); readers may
  * freely race a commit. Tombstones filed while a compaction is in
  * flight are superseded by its commit (single-writer rule). The
  * contract is ENFORCED, not just documented: every maintenance
  * operation runs under [[withMaintainerLock]] — a marker-file lease
  * at the store root — so a second concurrent maintainer fails
  * loudly instead of racing [[nextVersion]]'s read-modify-write
  * (two saves allocating the same `v<n>` would interleave their
  * files inside one version directory and commit a chimera).
  */
private[ops] object StoreVersioning {

  private val Marker = "_COMMITTED"
  private val Lock = "_MAINTAINER_LOCK"

  /** Lease horizon: a lock file OLDER than this is treated as the
    * debris of a crashed maintainer and stolen (one retry). A LIVE
    * maintenance op must finish inside the lease — size it above the
    * longest save/compact the deployment runs (the default covers any
    * fixture-scale build by orders of magnitude); a lease that
    * expires under a still-running maintainer reverts to the
    * documented single-maintainer honor contract, exactly like any
    * lease-based lock.
    */
  private[ops] val LeaseMs: Long = 30L * 60 * 1000

  /** Run `body` holding the store's maintainer lease: one atomic
    * lock-file creation at the store root, released on every exit
    * path. A concurrent second maintainer gets a LOUD error naming
    * the lock (never a silent race on version allocation); a lock
    * older than [[LeaseMs]] is stolen once (crash debris must not
    * brick the store — the versioned-root design already makes any
    * crashed maintenance recoverable by rerunning it).
    */
  def withMaintainerLock[T](spark: SparkSession, dir: String,
      op: String)(body: => T): T = {
    val fs = fsFor(spark, dir)
    val base = new Path(dir)
    if (!fs.exists(base)) fs.mkdirs(base)
    val lock = new Path(base, Lock)
    def acquire(): Boolean =
      try fs.createNewFile(lock)
      catch { case _: java.io.IOException => false }
    val got = acquire() || {
      val stale = try {
        System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > LeaseMs
      } catch { case _: java.io.FileNotFoundException => true }
      // steal only an expired lease, and only via one fresh attempt —
      // two stealers still serialize on the createNewFile below
      stale && { fs.delete(lock, false); acquire() }
    }
    if (!got) sys.error(
      s"$op: another maintainer holds $lock (single-maintainer " +
        "contract); if that maintainer crashed, the lease self-expires " +
        s"after ${LeaseMs / 60000} min — or remove the lock file manually")
    try body finally { fs.delete(lock, false); () }
  }

  /** A takedown id relation, first column cast to long — LOUDLY: under
    * non-ANSI SQL an uncastable id casts to NULL, and a NULL tombstone
    * anti-joins to nothing, silently turning a retraction (GDPR
    * erasure, license takedown) into a no-op. A malformed request must
    * error, not not-retract.
    */
  def requireLongIds(ids: DataFrame, as: String): DataFrame = {
    val cast = ids.select(col(ids.columns.head).cast("long").as(as))
      .distinct()
    val bad = cast.filter(col(as).isNull).count()
    require(bad == 0,
      s"takedown request contains $bad id(s) that are null or not " +
        s"castable to long — refusing to file tombstones that would " +
        "silently retract nothing")
    cast.filter(col(as).isNotNull)
  }

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Data-file count under `path` (recursive) — the fragmentation
    * signal a compaction decision reads: each append lands fresh
    * files, so files-per-partition growing past ~1 means the store's
    * scans are paying open/footer overhead a [[IvfIndex.compact]]/
    * [[DedupStore.compact]] would re-bound. Driver-side listing, the
    * same class of metadata walk every parquet read performs.
    */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = fsFor(spark, path)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  /** The committed version NUMBER (the `<n>` of the root's `v<n>`). */
  def versionOf(root: String): Long =
    root.split('/').last.drop(1).toLong

  private def committedVersions(fs: FileSystem, dir: String): Seq[Long] = {
    val base = new Path(dir)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong)
      .filter(n => fs.exists(new Path(s"$dir/v$n/$Marker")))
      .sorted
  }

  /** The committed version root, or None for an empty/new store. */
  def currentRoot(spark: SparkSession, dir: String): Option[String] =
    committedVersions(fsFor(spark, dir), dir).lastOption.map(n => s"$dir/v$n")

  /** The committed root, required: a query/append/delete against a
    * store that has never committed is a caller error with a name.
    */
  def requireRoot(spark: SparkSession, dir: String): String =
    currentRoot(spark, dir).getOrElse(sys.error(
      s"no committed store at $dir (no v*/$Marker) — build it with save()"))

  /** Allocate the next version name: v<max+1> over ALL existing v*
    * entries, committed or orphaned (so a retry never collides with
    * its own debris).
    */
  def nextVersion(spark: SparkSession, dir: String): String = {
    val fs = fsFor(spark, dir)
    val base = new Path(dir)
    val existing =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq.map(_.getPath.getName)
        .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
    s"v${(existing :+ 0L).max + 1}"
  }

  /** Commit `version`: create its `_COMMITTED` marker (the single
    * atomic commit point), then prune every OTHER `v*` entry except
    * the version this commit supersedes (the one-commit reader
    * grace above).
    */
  def commit(spark: SparkSession, dir: String, version: String): Unit = {
    val fs = fsFor(spark, dir)
    val grace = committedVersions(fs, dir).lastOption.map(n => s"v$n")
    fs.create(new Path(s"$dir/$version/$Marker"), true).close()
    fs.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      if (n.matches("v\\d+") && n != version && !grace.contains(n))
        fs.delete(st.getPath, true)
    }
  }
}
