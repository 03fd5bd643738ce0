package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned roots for the persisted stores ([[IvfIndex]],
  * [[DedupStore]]): every rebuild or compaction writes a FRESH
  * `v<n>/` directory and commits by swapping the one-line `CURRENT`
  * pointer file — never by overwriting live data in place.
  *
  * This is what makes the stores' failure story structural instead of
  * rhetorical: an in-place static overwrite DELETES its target before
  * the new job commits, so a mid-rebuild crash used to leave a gutted
  * or mixed-generation store (new centroids over old vectors), and a
  * retried compaction could overwrite its own staging copy with the
  * data it had just destroyed. With versioned roots, readers and
  * appenders resolve through CURRENT; a crashed rebuild leaves
  * CURRENT untouched (old data AND its still-applied tombstones), an
  * orphaned half-written `v<n+1>/` is invisible and superseded by the
  * next successful commit, and the recovery for any failed
  * save/compact is simply: run it again.
  *
  * Concurrency contract: ONE maintainer at a time (save/append/
  * delete/compact are serial maintenance operations); readers may
  * race a commit and see the old version — the pointer swap is the
  * single commit point. Tombstones filed while a compaction is in
  * flight are superseded by its commit (single-writer rule).
  */
private[ops] object StoreVersioning {

  private def currentPath(dir: String) = new Path(s"$dir/CURRENT")

  private def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed version root, or None for an empty/new store. */
  def currentRoot(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsFor(spark, dir)
    val p = currentPath(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val name =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim
        finally in.close()
      Some(s"$dir/$name")
    }
  }

  /** The committed root, required: a query/append/delete against a
    * store that has never committed is a caller error with a name.
    */
  def requireRoot(spark: SparkSession, dir: String): String =
    currentRoot(spark, dir).getOrElse(sys.error(
      s"no committed store at $dir (no CURRENT pointer) — build it with save()"))

  /** Allocate the next version name: v<max+1> over existing v* entries
    * (orphans from crashed builds count, so a retry never collides
    * with its own debris).
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

  /** Commit `version` as CURRENT (write-tmp + rename — the one-file
    * swap is the commit point), then prune everything else under
    * `dir`: superseded versions with their applied tombstones,
    * orphaned half-written versions, and any legacy un-versioned
    * layout.
    */
  def commit(spark: SparkSession, dir: String, version: String): Unit = {
    val fs = fsFor(spark, dir)
    val tmp = new Path(s"$dir/CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(currentPath(dir), false)
    if (!fs.rename(tmp, currentPath(dir)))
      sys.error(s"failed to commit store version $version at $dir")
    fs.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      if (n != "CURRENT" && n != version) fs.delete(st.getPath, true)
    }
  }
}
