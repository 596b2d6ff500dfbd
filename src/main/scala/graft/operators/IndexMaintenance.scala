package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared maintenance plumbing for the stored indexes
  * ([[MinHashIndex]], the stored IVF index in [[Similarity]]): the
  * single-writer lock that serializes `append` against `compact`, and
  * the deferred-deletion ledger that gives in-flight readers of a
  * retired storage generation a GRACE WINDOW instead of a mid-scan
  * FileNotFound.
  *
  * Why both exist: `compact` rewrites the index into a fresh
  * generation and flips the meta pointer. Without the lock, an
  * `append` racing the compaction lands its batch in the doomed old
  * generation and is silently lost — missed near-dups forever after.
  * Without the ledger, a query that resolved the OLD meta just before
  * the flip fails mid-scan when the old directories are deleted under
  * it. The lock turns the lost-append into a loud error; the ledger
  * turns the reader crash into "run [[vacuum]] once readers drain".
  * (`tombstone` needs neither: it only ever APPENDS new files to
  * `tombstones/`, which a concurrent compaction leaves untouched —
  * it retires only the tombstone files it listed at start.)
  */
private[graft] object IndexMaintenance {

  def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def lockPath(dir: String) = new Path(dir, "_graft_maintenance.lock")
  private val RetiredPrefix = "_graft_retired-"

  /** Run `body` holding the index's single-writer lock — an atomic
    * create-fails-if-exists file. A second writer fails LOUDLY instead
    * of silently losing its batch into a doomed generation. A crashed
    * writer leaves the lock behind; the error names the file so an
    * operator can confirm no writer is alive and delete it (a full
    * rebuild — [[MinHashIndex.build]] / `ivfWriteIndex` — also clears
    * it, that being the recovery path anyway). */
  def withWriterLock[T](spark: SparkSession, dir: String, op: String)
                       (body: => T): T = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val p = lockPath(dir)
    val out =
      try f.create(p, false)
      catch { case e: java.io.IOException => throw new IllegalStateException(
        s"$op: another maintenance writer holds $p (append and compact are " +
          "mutually exclusive); if its process is dead, delete the lock file",
        e) }
    out.close()
    try body finally f.delete(p, false)
  }

  /** Record paths retired by a compaction for a later [[vacuum]] —
    * the old generation's directories and the tombstone files it
    * applied. Written AFTER the meta flip, so the ledger only ever
    * names paths no NEW reader can resolve. */
  def recordRetired(spark: SparkSession, dir: String, tag: String,
                    paths: Seq[String]): Unit = {
    val out = fs(spark, dir).create(new Path(dir, RetiredPrefix + tag), true)
    try out.write(paths.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  /** Delete everything the retirement ledgers name — run once readers
    * that started before the generation flip have drained (the grace
    * window is operational policy: a query's lifetime, not ours to
    * guess). Idempotent; returns the number of paths deleted. */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return 0
    var n = 0
    f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(RetiredPrefix)).foreach { ledger =>
        val in = f.open(ledger)
        val lines = try new String(in.readAllBytes(), "UTF-8").split('\n').toSeq
                    finally in.close()
        lines.map(_.trim).filter(_.nonEmpty).foreach { p =>
          if (f.delete(new Path(p), true)) n += 1
        }
        f.delete(ledger, false)
      }
    // the tombstones dir may now be empty: drop it so readers take the
    // no-tombstones fast path
    val tomb = new Path(dir, "tombstones")
    if (f.exists(tomb) && f.listStatus(tomb).isEmpty) f.delete(tomb, false)
    n
  }

  /** Rebuild-path reset: clear ledgers and a stale lock (the caller
    * is about to overwrite the whole index anyway). */
  def clearState(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return
    f.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith(RetiredPrefix) ||
        p.getName == lockPath(dir).getName)
      .foreach(f.delete(_, false))
  }
}
