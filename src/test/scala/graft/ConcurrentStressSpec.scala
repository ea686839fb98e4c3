package graft

import org.apache.spark.sql.Row

import graft.apply.MergeApply
import graft.lake.{ConcurrentCommitException, LakeTable}
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Live multi-writer stress: two writer THREADS (separate [[LakeTable]]
 * instances — separate commit monitors, so the version-file CAS is the only
 * serialization point, as across JVMs) merge into ONE table concurrently
 * while a maintenance thread compacts, rescales and vacuums beside them.
 *
 * Writer A is copy-on-write, writer B merge-on-read; their key ranges are
 * disjoint but share the table's 4 buckets, so CoW rewrites, delta commits
 * and consolidating maintenance rewrites all collide on the same bucket set.
 * Conflicts must surface as [[ConcurrentCommitException]] and be resolved by
 * the documented runbooks — the writer replays its batch from the fresh head
 * (the stream-replay contract), maintenance defers to the next tick — and
 * the final state must be EXACTLY the union of both writers' LWW folds:
 * the concurrency protocol may cost retries, never rows.
 *
 * (MultiWriterSpec drives these interleavings deterministically via the test
 * seam; MultiProcessCommitSpec hammers the bare CAS across real JVMs. This
 * spec is the missing third leg: full merge-apply pipelines racing live.)
 */
class ConcurrentStressSpec extends SparkSpec {

  private val schema = ChangeEvent.schema()

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn / 3, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%04d",
      if (del) null else (0 until v).map(i => key * 7 + i),
      if (del) null else Int.box(v),
      if (del) null else s"s$v")
  }

  test("two live writers (CoW + MoR, separate instances) + concurrent " +
      "maintenance converge to the exact union fold — conflicts retry, " +
      "rows never vanish") {
    val root = tmpDir("graft-stress")
    val cfg = RunnerConfig(feedDir = s"$root/feed", tableDir = s"$root/table",
      checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4))
    CdcRunner.ensureTable(spark, cfg)

    val rnd = new scala.util.Random(31337L)
    // disjoint key ranges, shared buckets; per-writer monotone LSN spaces
    def mkBatches(keyBase: Int, lsnBase: Long, nBatches: Int): Seq[Seq[Row]] =
      (0 until nBatches).map { b =>
        (0 until 25).map { i =>
          val lsn = lsnBase + b * 25 + i
          val key = keyBase + rnd.nextInt(10)
          val op = rnd.nextInt(10) match {
            case 0 | 1 => "DELETE"
            case 2 | 3 | 4 => "UPDATE"
            case _ => "INSERT"
          }
          mkRow(lsn, key, op, 1 + rnd.nextInt(5))
        }
      }
    val aBatches = mkBatches(0, 1L, 4)
    val bBatches = mkBatches(100, 100001L, 4)

    // the stream-replay contract: on a conflict the batch recomputes from the
    // fresh head under the SAME epoch (idempotent skip once committed)
    def applyWithReplay(lake: LakeTable, rows: Seq[Row], epoch: Long,
        merge: MergeStrategy): Unit = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      var attempts = 0
      var done = false
      while (!done) {
        try {
          MergeApply.applyBatch(spark, lake, df, epoch,
            cfg.job.copy(merge = merge))
          done = true
        } catch {
          case e: ConcurrentCommitException =>
            attempts += 1
            if (attempts > 30) throw e
        }
      }
    }

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case e: Throwable => errors.add(e): Unit }, name)
      t.start(); t
    }

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writerA = thread("writer-a") {
      val lake = new LakeTable(cfg.tableDir) // own instance, own monitor
      aBatches.zipWithIndex.foreach { case (rows, i) =>
        applyWithReplay(lake, rows, i.toLong, MergeStrategy.CopyOnWrite)
      }
    }
    val writerB = thread("writer-b") {
      val lake = new LakeTable(cfg.tableDir)
      bBatches.zipWithIndex.foreach { case (rows, i) =>
        applyWithReplay(lake, rows, 1000L + i, MergeStrategy.MergeOnRead)
      }
    }
    val maintenance = thread("maintenance") {
      val lake = new LakeTable(cfg.tableDir)
      var rescaled = false
      def defer(body: => Unit): Unit =
        try body catch { case _: ConcurrentCommitException => () } // next tick
      while (!stop.get()) {
        defer(lake.compact(spark, maxFilesPerBucket = 2, maxDeltaFiles = 2): Unit)
        if (!rescaled && lake.exists && lake.manifest.version >= 3) {
          // rescale is metadata-only and CAS-retried internally; a writer
          // mid-batch sees it as a replay-the-batch conflict
          defer { lake.rescale(lake.manifest.buckets * 2); rescaled = true }
        }
        defer(lake.splitBuckets(spark, maxGroups = 2): Unit)
        // a window comfortably above the writers' commit rate: pruning a
        // snapshot a pinned CoW read is STILL SCANNING is out of contract in
        // every lake format (production windows are hours, not versions) —
        // the sweep logic (lost-race fragments, temps, superseded files)
        // still runs every tick
        lake.vacuum(keepVersions = 20)
        Thread.sleep(50)
      }
    }
    writerA.join(300000)
    writerB.join(300000)
    stop.set(true)
    maintenance.join(300000)
    assert(!writerA.isAlive && !writerB.isAlive && !maintenance.isAlive,
      "stress threads failed to finish inside the timeout")
    assert(errors.isEmpty, s"thread failures: ${errors.toArray.mkString("; ")}")

    // oracle: per-key max-LSN fold over BOTH streams — every committed batch
    // must be fully present, no matter how many retries it took
    val all = (aBatches.flatten ++ bBatches.flatten)
    val expected = all.groupBy(_.getString(5)).flatMap { case (id, rs) =>
      val w = rs.maxBy(_.getLong(0))
      if (w.getString(3) == "DELETE") None
      else Some(id -> ((w.getAs[scala.collection.Seq[Int]](6).toList,
        w.getInt(7), w.getString(8))))
    }
    val lake = new LakeTable(cfg.tableDir)
    val actual = lake.read(spark).collect().map { r =>
      r.getAs[String]("doc_id") -> ((
        r.getAs[scala.collection.Seq[Int]]("tokens").toList,
        r.getAs[Int]("n_tok"), r.getAs[String]("source")))
    }.toMap
    assert(actual == expected,
      s"diverged:\n missing=${expected.keySet -- actual.keySet}\n " +
        s"extra=${actual.keySet -- expected.keySet}")
    // every commit accounted — retries must not double-count metrics
    val rep = lake.reconcile()
    assert(rep.ok, s"reconcile after stress: $rep")
    val m = lake.manifest
    assert(m.metrics("events_received") == all.size.toLong,
      s"events_received=${m.metrics("events_received")} != ${all.size}")
  }
}
