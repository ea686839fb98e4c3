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

    // manifest-list indirection: compaction consolidated the fragment list
    assert(after.fragments.size == 1, s"consolidated: ${after.fragments}")
    assert(before.fragments.size > after.fragments.size)

    // vacuum: old files gone, head still reads, deep time travel pruned;
    // keepVersions=1 drops the pre-compaction snapshot, so the fragments it
    // alone referenced become dead and are GC'd too
    val deleted = lake.vacuum(keepVersions = 1)
    assert(deleted.nonEmpty, "vacuum removed superseded files")
    assert(deleted.exists(_.contains("mf-")), "dead fragments GC'd")
    val stateVacuumed = lake.read(spark).collect().map(_.toString).sorted
    assert(stateVacuumed.sameElements(stateBefore), "vacuum keeps the head intact")
    intercept[Exception](lake.readVersion(spark, 2).count()) // pruned history
  }

  test("vacuum is safe to re-run and never touches uncommitted epoch files") {
    val root = tmpDir("graft-maint-vac2")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2))
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 400, nDocs = 80)),
      cfg.feedDir, nFiles = 4)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, ChangeFeed.seedSnapshot(spark, 20), cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val state = lake.read(spark).collect().map(_.toString).sorted

    // files of an epoch that is WRITTEN but not yet committed (the window
    // inside applyBatch, or a concurrent compaction) must survive vacuum
    val pendingDir = new java.io.File(lake.dataDir(999) + "/_bucket=0")
    pendingDir.mkdirs()
    val pending = new java.io.File(pendingDir, "part-pending.parquet")
    java.nio.file.Files.writeString(pending.toPath, "placeholder")

    assert(lake.vacuum(keepVersions = 1).nonEmpty)
    assert(pending.exists(), "uncommitted epoch files are not vacuum's to delete")
    // second run after history is pruned: must not throw, head intact
    val again = lake.vacuum(keepVersions = 1)
    assert(again.forall(!_.endsWith("part-pending.parquet")))
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state))

    // the orphan sweep is the tool that DOES reclaim it — but only past the
    // age horizon (a recent unreferenced file may be an in-flight write)
    assert(lake.removeOrphans(olderThanMs = 3600 * 1000L).isEmpty,
      "young unreferenced file is protected by the age guard")
    assert(pending.exists())
    assert(pending.setLastModified(System.currentTimeMillis() - 7200 * 1000L))
    val swept = lake.removeOrphans(olderThanMs = 3600 * 1000L)
    assert(swept.exists(_.endsWith("part-pending.parquet")) && !pending.exists())
    assert(!pendingDir.exists(), "emptied orphan epoch dir pruned")
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state),
      "live files untouched by the sweep")
  }

  test("numeric merge-key footer stats: bucket + range pruning, point lookup on bigint") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val root = tmpDir("graft-maint-numkey")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4, keyCols = Seq("doc_id")),
      payloadSchema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n", IntegerType))))
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake,
      spark.range(200).select(col("id").as("doc_id"),
        (col("id") % 7).cast(IntegerType).as("n")), cfg)
    val m = lake.manifest
    assert(m.files.forall(f => f.minKeyNum.isDefined && f.maxKeyNum.isDefined),
      "integral leading key gets numeric footer stats")
    assert(m.files.forall(f => f.minKey.isEmpty), "no string stats for a bigint key")
    val pruned = lake.lookupFilesNum(42L)
    assert(pruned.nonEmpty && pruned.size < m.files.size, "pruned to one bucket at most")
    val row = lake.lookupNum(spark, 42L).collect()
    assert(row.length == 1 && row(0).getAs[Long]("doc_id") == 42L)
    assert(lake.lookupNum(spark, 5000000L).isEmpty)
  }

  test("vacuum age-based retention keeps snapshots younger than the cutoff") {
    import org.apache.spark.sql.types._
    val lake = new graft.lake.LakeTable(tmpDir("graft-maint-age") + "/t")
    lake.create(StructType(Seq(StructField("doc_id", StringType))), buckets = 2,
      keyCols = Seq("doc_id"))
    (0L to 3L).foreach(e => lake.commit(e, Nil, Set.empty))
    assert(lake.manifest.committedAtMs > 0, "commits carry a wall-clock stamp")
    // every snapshot is younger than an epoch-0 cutoff → retention floor keeps all
    assert(lake.vacuum(keepVersions = 1, keepCommittedSinceMs = Some(0L)).isEmpty)
    // future cutoff: nothing is protected by age, version policy prunes history
    val deleted = lake.vacuum(keepVersions = 1,
      keepCommittedSinceMs = Some(System.currentTimeMillis() + 3600000L))
    assert(deleted.nonEmpty, "old manifests pruned once past the age floor")
  }

  test("reconcile: lineage re-sums to the manifest metrics; gaps and tampering flagged") {
    val root = tmpDir("graft-maint-rec")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2), maxFilesPerTrigger = 1)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 60)),
      cfg.feedDir, nFiles = 3)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, ChangeFeed.seedSnapshot(spark, 20), cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    assert(lake.reconcile().ok, s"clean table reconciles: ${lake.reconcile()}")

    // injected mismatch: tamper one epoch's lineage metrics + drop another's
    val lineageDir = new java.io.File(s"${cfg.tableDir}/lineage")
    val e1 = new java.io.File(lineageDir, "epoch=1.json")
    val tampered = java.nio.file.Files.readString(e1.toPath)
      .replaceFirst(""""applied_inserts"\s*:\s*(\d+)""", "\"applied_inserts\" : 999999")
    java.nio.file.Files.writeString(e1.toPath, tampered)
    assert(new java.io.File(lineageDir, "epoch=0.json").delete())
    val r = lake.reconcile()
    assert(r.missingLineage == Seq(0L), s"dropped epoch flagged: $r")
    assert(r.mismatchedMetrics.contains("applied_inserts"), s"tampered sum flagged: $r")
    assert(!r.ok)
  }

  test("CDC-only table (no fullLoad) advances the epoch watermark too") {
    import org.apache.spark.sql.types._
    val lake = new graft.lake.LakeTable(tmpDir("graft-maint-cdconly") + "/t")
    lake.create(StructType(Seq(StructField("doc_id", StringType))), buckets = 2,
      keyCols = Seq("doc_id"))
    // streaming epochs 0..4 arrive with no epoch -1 ever committed (CDC-only
    // start modes: startFromWal / startFromEnvelopes / replication_type=cdc)
    (0L to 4L).foreach(e => lake.commit(e, Nil, Set.empty))
    val m = lake.manifest
    assert(m.epochWatermark == 4 && m.recentEpochs.isEmpty,
      s"watermark absorbs from epoch 0 without a fullLoad: " +
        s"wm=${m.epochWatermark} recent=${m.recentEpochs}")
    assert((0L to 4L).forall(m.isCommittedEpoch) && !m.isCommittedEpoch(-1) &&
      !m.isCommittedEpoch(5))
    // an out-of-order straggler stays sparse until its gap fills
    lake.commit(7L, Nil, Set.empty)
    assert(lake.manifest.recentEpochs == Set(7L))
    lake.commit(5L, Nil, Set.empty)
    lake.commit(6L, Nil, Set.empty)
    val m2 = lake.manifest
    assert(m2.epochWatermark == 7 && m2.recentEpochs.isEmpty)
  }

  test("commit cost is O(epoch files): snapshot JSON carries no file list; " +
    "fragments are immutable; epoch watermark collapses the committed set") {
    val root = tmpDir("graft-maint-frag")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4), maxFilesPerTrigger = 1)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 600, nDocs = 100)),
      cfg.feedDir, nFiles = 5)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, ChangeFeed.seedSnapshot(spark, 30), cfg)
    CdcRunner.runAvailableNow(spark, cfg)

    val m = lake.manifest
    // watermark absorbed the contiguous streaming epochs 0,1,…; the fullLoad
    // epoch -1 stays as the single bounded sparse entry
    assert(m.epochWatermark >= 0 && m.recentEpochs == Set(-1L),
      s"wm=${m.epochWatermark} recent=${m.recentEpochs}")
    assert(m.isCommittedEpoch(-1) && m.isCommittedEpoch(0))
    assert(!m.isCommittedEpoch(m.epochWatermark + 1))
    // the snapshot file itself holds no data-file entries (only fragment names)
    val snapJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${cfg.tableDir}/manifests", f"v${m.version}%06d.json")))
    assert(!snapJson.contains(".parquet"), "snapshot JSON references no data file")
    assert(m.fragments.size.toLong == m.epochWatermark + 2,
      "one fragment per commit")
    // a fragment written by an early commit is byte-identical later (immutable)
    val frag0 = java.nio.file.Paths.get(s"${cfg.tableDir}/manifests", m.fragments.head)
    assert(java.nio.file.Files.exists(frag0))

    // per-file footer stats: exact rows and key ranges for the string key
    assert(m.files.forall(_.rows > 0), "exact row counts from footers")
    assert(m.files.forall(f => f.minKey.isDefined && f.maxKey.isDefined))

    // point lookup prunes by bucket + key range and returns the current row
    val someKey = lake.read(spark).select("doc_id").head().getString(0)
    val pruned = lake.lookupFiles(someKey)
    assert(pruned.nonEmpty &&
      pruned.forall(_.bucket == lake.bucketOfKey(someKey, m.buckets)))
    assert(pruned.size < m.files.size, "pruned to one bucket at most")
    val row = lake.lookup(spark, someKey).collect()
    assert(row.length == 1 && row(0).getAs[String]("doc_id") == someKey)
    assert(lake.lookup(spark, "doc-does-not-exist").isEmpty)

    // data files carry a parquet-native bloom filter on the merge key:
    // inside a bucket (hash-scattered keys defeat min/max) the row-group
    // bloom is what lets a point lookup skip data pages
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    import org.apache.parquet.hadoop.ParquetFileReader
    import scala.jdk.CollectionConverters._
    val footer = ParquetFileReader.readFooter(
      graft.lake.LakeTable.sharedHadoopConf,
      new org.apache.hadoop.fs.Path(m.files.head.path),
      ParquetMetadataConverter.NO_FILTER)
    val keyChunk = footer.getBlocks.asScala.head.getColumns.asScala
      .find(_.getPath.toDotString == "doc_id").get
    assert(keyChunk.getBloomFilterOffset >= 0, "bloom filter written for the merge key")
  }
}
