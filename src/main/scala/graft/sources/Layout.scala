package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB tier: Z-order clustering for
  * multi-column data skipping, and small-file compaction for
  * streaming-sink hygiene. Both are write-side only — readers are
  * plain `spark.read.parquet` and benefit automatically through
  * parquet min/max row-group stats and file pruning.
  */
object Layout {

  /** Spread the low 16 bits of `v` so bit i lands at position 2i —
    * the classic Morton interleave step, as pure Column bit-ops
    * (whole-stage codegen, no UDF). */
  private def spread(v: Column): Column = {
    val m1 = lit(0x0000FFFFL); val m2 = lit(0x00FF00FFL)
    val m3 = lit(0x0F0F0F0FL); val m4 = lit(0x33333333L)
    val m5 = lit(0x55555555L)
    val a = v.bitwiseAND(m1)
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(m2)
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(m3)
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(m4)
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(m5)
  }

  /** Morton (Z-curve) value of two 16-bit keys: interleaves their
    * bits so rows close in BOTH dimensions are close on the curve.
    * Callers map raw columns onto [0, 65535] first (rank, bin, or
    * modulo — [[zValueOf]] does an equi-width map for numerics). */
  def zValue(x: Column, y: Column): Column =
    spread(x.cast("long")).bitwiseOR(shiftleft(spread(y.cast("long")), 1))

  /** Equi-width map of a numeric column onto [0, bits16) given its
    * [lo, hi] range — the cheap driver-free normalizer for zValue. */
  def to16(v: Column, lo: Double, hi: Double): Column =
    least(lit(65535L), greatest(lit(0L),
      floor((v.cast("double") - lo) / (hi - lo) * 65535).cast("long")))

  /** Write `df` Z-clustered on (x, y): range-partition by the Morton
    * value (so each output file owns a compact curve segment = a
    * small rectangle in (x, y) space) and sort within partitions (so
    * parquet row-group min/max stats are tight). A point or range
    * predicate on EITHER dimension then touches only the few files
    * whose rectangle intersects it — data skipping a single-column
    * sort can only give to its leading column. */
  def writeZClustered(df: DataFrame, x: Column, y: Column,
                      numFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory to ~`targetRows` rows per file —
    * the streaming-sink small-file repair step. Rewrites into a
    * temporary sibling, verifies the copy, then swaps via
    * rename-aside → rename-in → drop-aside, so at every instant a
    * complete copy of the data exists at or next to `path` (a crash
    * between the two renames leaves the data at `path__compact_old`;
    * re-running after moving it back, or reading it directly,
    * recovers everything). On a POSIX/HDFS filesystem each rename is
    * atomic; object stores emulate rename as copy+delete, so there
    * the swap is crash-safe but not atomic to concurrent readers.
    * Note that on EVERY filesystem (HDFS included) `path` does not
    * exist for the instant between the two renames — a concurrent
    * reader listing the directory in that window fails with
    * path-not-found; schedule compaction when the table is not being
    * concurrently opened, or retry readers on miss. For a table that
    * must stay readable THROUGH compaction, use
    * [[Snapshots.compactCommit]] — its manifest swap has no such
    * window at all. */
  def compact(spark: SparkSession, path: String, targetRows: Long): Long = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartition(files).write.mode("overwrite").parquet(tmp)
    // verify BEFORE the swap — never destroy the source on a bad copy
    val m = spark.read.parquet(tmp).count()
    require(m == n, s"compaction row mismatch: $n -> $m")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val aside = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_old")
    fs.delete(aside, true) // stale aside from a prior crashed run
    require(fs.rename(dst, aside), s"compact: could not move $dst aside")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"compact: could not move $tmp into place; original data is at $aside")
    fs.delete(aside, true)
    n
  }
}
