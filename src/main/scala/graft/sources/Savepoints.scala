package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named, immutable MULTI-TABLE savepoints: one savepoint pins the
  * current version of every table in a set under a single name, so a
  * whole pipeline state — corpus, dedup assignments, views, indexes'
  * base tables — can be re-read later exactly as it was. This is the
  * reproducibility primitive a training run needs ("the data of
  * run 2026-08-13") and one that single-table time travel cannot
  * give: each table's as-of timestamp resolves independently, while a
  * savepoint stores the exact version SET that was live together.
  *
  * A savepoint is one file (`<dir>/<name>.sp`, atomic
  * create-fails-if-exists → immutable once written; a torn write
  * cannot half-publish because the name only resolves after a
  * successful create). Contents: `alias<TAB>tableDir<TAB>version`
  * lines. Reads go through [[Snapshots.read]] at the pinned version —
  * all pruning (and the TVF surface) works as-of that version.
  *
  * Savepoints pin MANIFESTS, not bytes: keep [[Snapshots.expire]]'s
  * horizon behind your oldest live savepoint (same operational rule
  * as the change feed's slowest consumer) — a read past an expired
  * pin fails loudly on the missing manifest, never silently serves
  * newer data.
  *
  * Reference scope: the reference pins nothing — each notebook rerun
  * reads whatever the tables hold that day; this is the missing
  * "which data trained this model" answer at 100 TB.
  */
object Savepoints {

  private val Ext = ".sp"

  private def fsOf(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  private def pathOf(dir: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9._-]{1,128}"),
      s"savepoint name must be [A-Za-z0-9._-]{1,128}: $name")
    new Path(dir, name + Ext)
  }

  /** Pin each table's CURRENT latest version under `name`. Fails
    * loudly if `name` exists (savepoints are immutable — drop first
    * to re-pin) or if any table has no snapshot yet. Returns the
    * pinned alias → version map. */
  def create(spark: SparkSession, dir: String, name: String,
             tables: Map[String, String]): Map[String, Long] = {
    require(tables.nonEmpty, "a savepoint needs at least one table")
    // the file format is line/tab delimited: an alias or path carrying
    // either would serialize a pin that every later describe/read
    // rejects as corrupt — and squat on the immutable name
    tables.foreach { case (alias, tableDir) =>
      require(!alias.exists(c => c == '\t' || c == '\n' || c == '\r') &&
        alias.nonEmpty, s"savepoint alias must be non-empty with no " +
        s"tab/newline: '$alias'")
      require(!tableDir.exists(c => c == '\t' || c == '\n' || c == '\r') &&
        tableDir.nonEmpty, s"table dir must be non-empty with no " +
        s"tab/newline: '$tableDir'")
    }
    val pinned = tables.map { case (alias, tableDir) =>
      val v = Snapshots.latestVersion(spark, tableDir).getOrElse(
        throw new IllegalArgumentException(
          s"savepoint $name: no snapshots at $tableDir (alias $alias)"))
      (alias, tableDir, v)
    }.toSeq.sortBy(_._1)
    val f = fsOf(spark, dir)
    f.mkdirs(new Path(dir))
    val p = pathOf(dir, name)
    val out =
      try f.create(p, false)
      catch { case e: java.io.IOException => throw new IllegalStateException(
        s"savepoint $name already exists at $p (savepoints are immutable; " +
          "drop it first to re-pin)", e) }
    try out.write(pinned.map { case (a, d, v) => s"$a\t$d\t$v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // register this savepoint directory INSIDE each pinned table so
    // [[Snapshots.expire]] rescues the pins even when the expiring
    // caller never heard of this savepoint dir — without it, retention
    // is savepoint-aware only for callers that remember to pass
    // `savepointDirs`, and a forgotten call site silently deletes what
    // the savepoint promised to keep. Registration is best-effort: a
    // read-only pinned table (foreign data someone else retains) must
    // not fail the pin itself.
    pinned.foreach { case (alias, tableDir, _) =>
      try Snapshots.registerSavepointDir(spark, tableDir, dir)
      catch { case e: java.io.IOException =>
        org.slf4j.LoggerFactory.getLogger("graft.Savepoints").warn(
          s"savepoint $name: could not register savepoint dir $dir in " +
            s"table $tableDir (alias $alias) - expire() on that table " +
            s"will only honor this pin when passed savepointDirs " +
            s"explicitly: ${e.getMessage}")
      }
    }
    pinned.map { case (a, _, v) => a -> v }.toMap
  }

  /** The savepoint's pinned set: alias → (tableDir, version). */
  def describe(spark: SparkSession, dir: String,
               name: String): Map[String, (String, Long)] = {
    val f = fsOf(spark, dir)
    val p = pathOf(dir, name)
    if (!f.exists(p)) throw new IllegalArgumentException(
      s"no savepoint $name at $dir")
    val in = f.open(p)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.split('\n').map(_.trim).filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(a, d, v) => a -> (d, v.toLong)
        case _ => throw new IllegalStateException(
          s"corrupt savepoint line in $p: $line")
      }
    }.toMap
  }

  /** One pinned table, exactly as it was: [[Snapshots.read]] at the
    * savepoint's version. */
  def read(spark: SparkSession, dir: String, name: String,
           alias: String): DataFrame = {
    val pins = describe(spark, dir, name)
    val (tableDir, v) = pins.getOrElse(alias,
      throw new IllegalArgumentException(
        s"savepoint $name has no table $alias " +
          s"(has: ${pins.keys.toSeq.sorted.mkString(", ")})"))
    Snapshots.read(spark, tableDir, Some(v))
  }

  /** All savepoint names at `dir`, sorted. */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val f = fsOf(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) Nil
    else f.listStatus(root).map(_.getPath.getName).toSeq
      .filter(_.endsWith(Ext)).map(_.stripSuffix(Ext)).sorted
  }

  /** Remove a savepoint name (the pinned tables are untouched).
    * Returns whether it existed. */
  def drop(spark: SparkSession, dir: String, name: String): Boolean =
    fsOf(spark, dir).delete(pathOf(dir, name), false)
}
