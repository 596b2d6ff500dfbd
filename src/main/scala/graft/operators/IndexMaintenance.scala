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

  /** Lease after which a lock file counts as ABANDONED and may be
    * stolen (`spark.graft.maintenance.lockLeaseMs`, default 15 min).
    * Size it comfortably above the longest maintenance tick: the lock
    * is not renewed mid-operation, so a legitimate writer slower than
    * the lease could be stolen from. */
  private def leaseMs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.maintenance.lockLeaseMs")
      .map(_.toLong).getOrElse(15L * 60 * 1000)

  /** Run `body` holding the single-writer lock — an atomic
    * create-fails-if-exists file stamped with owner + operation for
    * diagnostics. A second LIVE writer fails LOUDLY instead of
    * silently losing its batch into a doomed generation. A lock older
    * than [[leaseMs]] is presumed left by a CRASHED writer (OOM,
    * kill -9 — Spark drivers die like that) and is STOLEN, so an
    * always-on view maintainer self-heals instead of crash-looping
    * until an operator hand-deletes a file. The steal is race-safe:
    * the stale lock is first RENAMED to a unique tombstone — rename
    * is atomic, exactly one stealer wins — and the loser falls
    * through to a plain create against the winner's fresh lock, which
    * fails loudly as usual. [[clearLock]] / [[clearState]] remain the
    * explicit recovery paths when waiting out the lease is not
    * wanted. */
  def withWriterLock[T](spark: SparkSession, dir: String, op: String)
                       (body: => T): T = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    val p = lockPath(dir)
    def held(e: Throwable) = new IllegalStateException(
      s"$op: another maintenance writer holds $p (append and compact are " +
        "mutually exclusive); a dead writer's lock is stolen automatically " +
        s"after the ${leaseMs(spark)}ms lease " +
        "(spark.graft.maintenance.lockLeaseMs), or delete it explicitly " +
        "via IndexMaintenance.clearLock", e)
    def acquire() = f.create(p, false)
    val out =
      try acquire()
      catch {
        case e: java.io.IOException =>
          val stat =
            try Some(f.getFileStatus(p))
            catch { case _: java.io.FileNotFoundException => None }
          val expired = stat.exists(s =>
            System.currentTimeMillis() - s.getModificationTime > leaseMs(spark))
          if (expired) {
            val tomb = new Path(dir,
              s"_graft_stale_lock-${java.util.UUID.randomUUID()}")
            if (f.rename(p, tomb)) f.delete(tomb, false)
            try acquire() catch {
              case e2: java.io.IOException => throw held(e2) }
          } else if (stat.isEmpty) {
            // holder released between our create and the stat: retry once
            try acquire() catch {
              case e2: java.io.IOException => throw held(e2) }
          } else throw held(e)
      }
    try out.write((s"op=$op\tpid=${ProcessHandle.current().pid()}\t" +
      s"acquired_ms=${System.currentTimeMillis()}\n").getBytes("UTF-8"))
    finally out.close()
    try body finally f.delete(p, false)
  }

  /** Explicitly remove a (presumed stale) maintenance lock — the
    * manual recovery path when waiting out the lease is not wanted.
    * Returns whether a lock existed. */
  def clearLock(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).delete(lockPath(dir), false)

  /** Record paths retired by a compaction for a later [[vacuum]] —
    * the old generation's directories and the tombstone files it
    * applied. Written AFTER the meta flip, so the ledger only ever
    * names paths no NEW reader can resolve. */
  def recordRetired(spark: SparkSession, dir: String, tag: String,
                    paths: Seq[String]): Unit = {
    val out = fs(spark, dir).create(new Path(dir, RetiredPrefix + tag), true)
    try out.write(paths.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  private val PendingPrefix = "_graft_pending-g"

  /** Two-phase retirement, closing the flip/ledger crash window: a
    * crash BETWEEN the meta flip and a post-flip [[recordRetired]]
    * would leave the old generation's directories unledgered forever
    * (unvacuumable disk) and its already-applied tombstone files
    * still LIVE — silently suppressing an id legitimately re-appended
    * later. Instead the rebuild writes this PENDING entry BEFORE the
    * flip, naming the paths that retire once the pointer reaches
    * `activationGen`; [[promotePending]] (an atomic rename) turns it
    * into a real retirement ledger only after the flip is observable.
    * Crash before the flip: the entry stays pending — [[vacuum]] and
    * [[retiredPaths]] ignore it, so the still-current generation is
    * never reclaimed, and a retried rebuild overwrites it (same tag).
    * Crash after the flip: the next maintenance op or vacuum under
    * the current generation promotes and the paths retire normally. */
  def recordPendingRetired(spark: SparkSession, dir: String,
                           activationGen: Long, tag: String,
                           paths: Seq[String]): Unit = {
    val out = fs(spark, dir).create(
      new Path(dir, s"$PendingPrefix$activationGen-$tag"), true)
    try out.write(paths.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  /** Promote every pending retirement whose activation generation is
    * ≤ `currentGen` (its flip landed) to a real retirement ledger —
    * one atomic rename each. Call under the index's writer lock or
    * from vacuum, with the CURRENT generation read from the index's
    * meta. Returns how many entries were promoted. */
  def promotePending(spark: SparkSession, dir: String,
                     currentGen: Long): Int = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return 0
    var n = 0
    f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(PendingPrefix)).foreach { p =>
        val rest = p.getName.stripPrefix(PendingPrefix)
        val dash = rest.indexOf('-')
        if (dash > 0 && rest.take(dash).forall(_.isDigit) &&
            rest.take(dash).toLong <= currentGen) {
          if (f.rename(p, new Path(dir, RetiredPrefix + rest.drop(dash + 1))))
            n += 1
        }
      }
    n
  }

  /** Every path the retirement ledgers currently name — retired but
    * not yet vacuumed. Readers use this to SKIP retired tombstone
    * files: a compaction/recluster already applied them physically,
    * so anti-joining them again would hide a vector legitimately
    * re-introduced after its delete. */
  def retiredPaths(spark: SparkSession, dir: String): Set[String] = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return Set.empty
    f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(RetiredPrefix)).flatMap { ledger =>
        val in = f.open(ledger)
        val lines = try new String(in.readAllBytes(), "UTF-8").split('\n')
                    finally in.close()
        lines.map(_.trim).filter(_.nonEmpty)
      }.toSet
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
        p.getName.startsWith(PendingPrefix) ||
        p.getName == lockPath(dir).getName)
      .foreach(f.delete(_, false))
  }
}
