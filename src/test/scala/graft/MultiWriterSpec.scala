package graft

import org.apache.spark.sql.types._
import graft.lake._
import java.nio.file.{Files, Paths}

/** Cross-process optimistic concurrency: the version-file CAS serializes
  * committers from DIFFERENT JVMs (each test uses separate [[LakeTable]]
  * instances on one dir — in-process `synchronized` does not protect them),
  * the rebase guard refuses commits whose inputs moved under them, the
  * pointer is only a freshness hint, and vacuum sweeps lost-race fragments
  * without eating in-flight ones. Reference analogue: the reference runs one
  * process per task (`manager.py`) and serializes on the target DB; a lake
  * target needs the optimistic protocol the published formats use instead. */
class MultiWriterSpec extends SparkSpec {

  private def mkTable(dir: String, buckets: Int = 2): LakeTable = {
    val t = new LakeTable(dir)
    t.create(StructType(Seq(StructField("doc_id", StringType))), buckets,
      keyCols = Seq("doc_id"))
    t
  }

  private def add(path: String, bucket: Int = 0, spec: Int = 2): DataFile =
    DataFile(path, bucket, 1, 1L, spec = spec)

  test("concurrent committers on separate instances: every commit lands, none lost") {
    val dir = tmpDir("graft-mw-race") + "/t"
    mkTable(dir)
    val writers = 6
    val perWriter = 5
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          val mine = new LakeTable(dir) // own instance = own JVM stand-in
          (0 until perWriter).foreach { i =>
            val e = (w * perWriter + i).toLong
            mine.commit(e, Seq(add(s"w$w-$i.parquet")), Set.empty)
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"no writer lost its retry budget: ${errors.peek()}")
    val m = new LakeTable(dir).manifest
    assert(m.version == 1 + writers * perWriter,
      s"one snapshot per commit, no version reused: v${m.version}")
    assert(m.files.size == writers * perWriter, "no lost update: every file add survived")
    assert((0L until (writers * perWriter).toLong).forall(m.isCommittedEpoch),
      "every epoch recorded exactly once")
    // every snapshot file on disk is unique and the chain is gapless
    (1 to m.version).foreach(v => assert(Files.exists(
      Paths.get(dir, "manifests", f"v$v%06d.json")), s"v$v exists"))
  }

  test("pinned CoW merge: a data commit interleaved mid-merge is retried " +
    "over, not silently overwritten (the drain-vs-stream lost-update window)") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import org.apache.spark.sql.Row
    val root = tmpDir("graft-mw-pinned")
    val job = JobConfig(mode = CdcMode.Upsert, buckets = 1)
    val lake = CdcRunner.ensureTable(spark, RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table",
      checkpointDir = s"$root/cp", job = job))
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    def ev(lsn: Long, key: String, v: Int) =
      Row(lsn, 1L, ts(lsn), "INSERT", 1, key, Seq(v), Int.box(1), "web")
    def frame(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), ChangeEvent.schema())

    // the external writer (a quarantine drain, a second sync job) slips its
    // commit between the stream's pinned base read and its commit —
    // deterministically, via the test seam; self-clears so the inner
    // applyBatch (and the outer retry) see a no-op
    var fired = 0
    graft.apply.MergeApply.beforeCowCommit = () => {
      graft.apply.MergeApply.beforeCowCommit = () => ()
      fired += 1
      graft.apply.MergeApply.applyBatch(spark, lake,
        frame(Seq(ev(500L, "drained", 9))), 7777L, job): Unit
    }
    try
      graft.apply.MergeApply.applyBatch(spark, lake,
        frame(Seq(ev(100L, "k1", 1), ev(101L, "k2", 2))), 0L, job): Unit
    finally graft.apply.MergeApply.beforeCowCommit = () => ()

    assert(fired == 1)
    assert(lake.isCommitted(0L) && lake.isCommitted(7777L))
    val keys = lake.read(spark).select("doc_id").collect().map(_.getString(0)).sorted
    // before the pinning, epoch 0's unpinned commit replaced bucket 0 with a
    // merge computed from the PRE-7777 base — the drained row vanished and
    // re-running the drain was a no-op (its epoch already committed)
    assert(keys.sameElements(Array("drained", "k1", "k2")),
      s"no lost update across the interleave: ${keys.mkString(",")}")
  }

  test("rebase guard: disjoint-bucket commit attaches; overlapping one is refused") {
    val dir = tmpDir("graft-mw-rebase") + "/t"
    val a = mkTable(dir)
    a.commit(0L, Seq(add("seed-b0.parquet", 0), add("seed-b1.parquet", 1)), Set.empty)
    val readV = a.manifest.version
    // writer B lands a merge into bucket 0 AFTER A captured its snapshot
    new LakeTable(dir).commit(1L, Seq(add("b-merge.parquet", 0)), Set(0))
    // A's rewrite of bucket 1 attaches: nothing it replaces moved
    val a2 = new LakeTable(dir)
    val m = a2.commit(2L, Seq(add("a-b1.parquet", 1)), Set(1), readVersion = Some(readV))
    assert(m.files.exists(_.path == "b-merge.parquet") &&
      m.files.exists(_.path == "a-b1.parquet"),
      "both writers' work present after the rebase")
    // but a rewrite of bucket 0 prepared at readV is stale — refused loudly
    val ex = intercept[ConcurrentCommitException] {
      new LakeTable(dir).commit(3L, Seq(add("a-b0.parquet", 0)), Set(0),
        readVersion = Some(readV))
    }
    assert(ex.getMessage.contains("changed under it"), ex.getMessage)
  }

  test("consolidation (compaction) conflicts with ANY interleaved commit") {
    val dir = tmpDir("graft-mw-consolidate") + "/t"
    val a = mkTable(dir)
    a.commit(0L, Seq(add("f0.parquet")), Set.empty)
    val readV = a.manifest.version
    new LakeTable(dir).commit(1L, Seq(add("f1.parquet")), Set.empty)
    intercept[ConcurrentCommitException] {
      new LakeTable(dir).commit(2L, Seq(add("c.parquet")), Set(0, 1),
        consolidate = true, readVersion = Some(readV))
    }
  }

  test("concurrent rescale invalidates a stale bucket rewrite") {
    val dir = tmpDir("graft-mw-rescale") + "/t"
    val a = mkTable(dir)
    a.commit(0L, Seq(add("f0.parquet")), Set.empty)
    val readV = a.manifest.version
    new LakeTable(dir).rescale(4)
    val ex = intercept[ConcurrentCommitException] {
      new LakeTable(dir).commit(1L, Seq(add("r.parquet")), Set(0),
        readVersion = Some(readV))
    }
    assert(ex.getMessage.contains("rescale"), ex.getMessage)
  }

  test("stale _current pointer is a hint: readers probe forward to the true head") {
    val dir = tmpDir("graft-mw-pointer") + "/t"
    val a = mkTable(dir)
    (0L to 2L).foreach(e => a.commit(e, Seq(add(s"p$e.parquet")), Set.empty))
    val head = a.currentVersion
    // a committer that died between winning the CAS and moving the pointer
    Files.write(Paths.get(dir, "manifests", "_current"), "1".getBytes)
    val fresh = new LakeTable(dir)
    assert(fresh.currentVersion == head, "forward probe heals pointer lag")
    assert(fresh.manifest.files.size == 3, "reads resolve the true head")
    // the next commit re-advances the pointer monotonically
    fresh.commit(3L, Nil, Set.empty)
    assert(new String(Files.readAllBytes(Paths.get(dir, "manifests", "_current")))
      .trim.toInt == head + 1)
  }

  test("same-epoch retry across instances stays exactly-once") {
    val dir = tmpDir("graft-mw-idem") + "/t"
    mkTable(dir)
    new LakeTable(dir).commit(0L, Seq(add("once.parquet")), Set.empty)
    val v = new LakeTable(dir).currentVersion
    // a restarted driver re-delivers the epoch from a different process
    val m = new LakeTable(dir).commit(0L, Seq(add("dup.parquet")), Set.empty)
    assert(m.version == v && m.files.map(_.path) == Seq("once.parquet"),
      "already-committed epoch returns the head unchanged")
  }

  test("vacuum sweeps lost-race fragments, never in-flight ones") {
    val dir = tmpDir("graft-mw-vacfrag") + "/t"
    val a = mkTable(dir)
    (0L to 2L).foreach(e => a.commit(e, Nil, Set.empty))
    val cur = a.currentVersion
    val loser = Paths.get(dir, "manifests", "mf-000002-0000dead.json")
    val inflight = Paths.get(dir, "manifests", f"mf-${cur + 1}%06d-00aaaaaa.json")
    Files.write(loser, "{\"seq\":2,\"added\":[],\"replaced_buckets\":[]}".getBytes)
    Files.write(inflight,
      s"""{"seq":${cur + 1},"added":[],"replaced_buckets":[]}""".getBytes)
    val deleted = a.vacuum(keepVersions = cur) // keep everything committed
    assert(deleted.contains(loser.toString), "lost-race fragment (seq <= head) swept")
    assert(Files.exists(inflight),
      "fragment of an in-flight commit attempt (seq > head) survives")
  }

  test("racing table creation: second creator fails loudly, table intact") {
    val dir = tmpDir("graft-mw-create") + "/t"
    mkTable(dir)
    // the pre-check catches the sequential case (and, via the forward probe,
    // a table whose creator died before writing the pointer); the v1 CAS
    // inside writeManifest covers the true TOCTOU window with the same error
    intercept[IllegalArgumentException](mkTable(dir))
    assert(new LakeTable(dir).currentVersion == 1)
  }
}
