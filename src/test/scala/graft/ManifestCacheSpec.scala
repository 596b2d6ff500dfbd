package graft

import org.apache.spark.sql.functions._
import graft.sources.Snapshots

/** The driver-side immutable-manifest cache behind
  * [[Snapshots.manifest]]: cached reads must be row-identical to the
  * parquet manifest, expired versions must fail even when cached, and
  * the fast paths (file listing, batch watermark, recorded schema)
  * must agree with the distributed reads they replaced. */
class ManifestCacheSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_mcache").toString

  private def events = Tables.load(spark, sf("sf0.001"), "events")

  test("cached manifest equals the parquet manifest row for row") {
    val dir = tmpDir()
    Snapshots.commit(events.limit(100), dir, statsCol = Some("event_id")) // v0
    Snapshots.commit(events.limit(50), dir, statsCol = Some("event_id"))  // v1
    // first read populates the cache; re-read serves from it
    val viaCache = Snapshots.manifest(spark, dir, Some(1L))
    val direct = spark.read.parquet(s"$dir/_manifests/v${"%012d".format(1)}")
    assert(viaCache.schema == direct.schema)
    val a = viaCache.orderBy("path").collect().map(_.toString).toSeq
    val b = direct.orderBy("path").collect().map(_.toString).toSeq
    assert(a == b)
    // read() through the cached file list returns the same data
    assert(Snapshots.read(spark, dir, Some(0L)).count() == 100)
    assert(Snapshots.read(spark, dir).count() == 150)
  }

  test("expire invalidates cached versions: reads fail like uncached ones") {
    val dir = tmpDir()
    Snapshots.commit(events.limit(100), dir)                  // v0
    Snapshots.commit(events.limit(50), dir, overwrite = true) // v1
    Snapshots.commit(events.limit(25), dir)                   // v2
    // warm the cache on v0 BEFORE expiring it
    assert(Snapshots.manifest(spark, dir, Some(0L)).count() >= 1)
    assert(Snapshots.expire(spark, dir, keepLast = 2) > 0)
    intercept[Exception](Snapshots.manifest(spark, dir, Some(0L)).collect())
    intercept[Exception](Snapshots.read(spark, dir, Some(0L)).collect())
    // survivors still served (from cache) after the expiry
    assert(Snapshots.read(spark, dir, Some(2L)).count() == 75)
  }

  test("batch watermark and recorded schema agree with the manifest") {
    val dir = tmpDir()
    val batch = events.limit(10).select("event_id", "event_type", "value")
    assert(Snapshots.lastCommittedBatch(spark, dir) == -1L)
    Snapshots.commitStreamBatch(batch, dir, batchId = 7L,
      statsCol = Some("event_id"))
    assert(Snapshots.lastCommittedBatch(spark, dir) == 7L)
    // a replayed batch is fenced via the cached watermark
    assert(Snapshots.commitStreamBatch(batch, dir, batchId = 7L).isEmpty)
    // non-stream commits carry the fence forward
    Snapshots.commit(batch, dir)
    assert(Snapshots.lastCommittedBatch(spark, dir) == 7L)
    // recorded schema matches what the files actually read back as
    val ts = Snapshots.tableSchema(spark, dir).get
    assert(ts == Snapshots.read(spark, dir).schema)
  }
}
