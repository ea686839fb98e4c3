package graft

import graft.feed.ChangeFeed
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/** Lake maintenance: time-travel reads, small-file compaction, physical vacuum —
  * the operations that keep a 10^10-event table healthy (every epoch adds files;
  * superseded snapshots pin old ones). */
class MaintenanceSpec extends SparkSpec {

  test("time travel, compact (read-equivalent, fewer files), vacuum (GC + pruned history)") {
    val root = tmpDir("graft-maint")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      // 2 buckets × 4-way write salt over 4 shuffle partitions ⇒ several files/bucket
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2), maxFilesPerTrigger = 1)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 2000, nDocs = 400)),
      cfg.feedDir, nFiles = 6)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, ChangeFeed.seedSnapshot(spark, 50), cfg)
    // AQE would coalesce this tiny shuffle to one partition (one file/bucket);
    // disable coalescing so the fixture actually produces small files
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try CdcRunner.runAvailableNow(spark, cfg)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    val before = lake.manifest
    val vCur = before.version
    val stateBefore = lake.read(spark).collect().map(_.toString).sorted

    // time travel: an older snapshot reads and differs from the head
    val old = lake.readVersion(spark, 2).count()
    assert(old >= 0 && before.files.nonEmpty)

    // compact: same rows, fewer files (write salt splits each bucket into ≤4 files)
    assert(before.files.groupBy(_.bucket).exists(_._2.size > 1), "fixture has small files")
    val after = lake.compact(spark, maxFilesPerBucket = 1)
    assert(after.version == vCur + 1)
    assert(after.files.size < before.files.size, s"${after.files.size} < ${before.files.size}")
    val stateAfter = lake.read(spark).collect().map(_.toString).sorted
    assert(stateAfter.sameElements(stateBefore), "compaction is read-equivalent")

    // vacuum: old files gone, head still reads, deep time travel pruned
    val deleted = lake.vacuum(keepVersions = 2)
    assert(deleted.nonEmpty, "vacuum removed superseded files")
    val stateVacuumed = lake.read(spark).collect().map(_.toString).sorted
    assert(stateVacuumed.sameElements(stateBefore), "vacuum keeps the head intact")
    intercept[Exception](lake.readVersion(spark, 2).count()) // pruned history
  }
}
