package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.apply.MergeApply
import graft.feed.ChangeFeed
import graft.lake.{AddColumn, LakeSync, LakeTable, RenameColumn}
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/** Lake→lake replication: bootstrap fidelity, incremental convergence,
  * exactly-once cursor, order-tolerance, schema following, feed binding. */
class LakeSyncSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def morCfg(root: String, buckets: Int = 4): RunnerConfig =
    RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = buckets,
        merge = MergeStrategy.MergeOnRead))

  test("bootstrap mirrors engine state; windows converge; cursor is exactly-once") {
    val root = tmpDir("graft-lakesync")
    val cfg = morCfg(root)
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 600, nDocs = 90))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 300), cfg.feedDir, nFiles = 2)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, source, ChangeFeed.seedSnapshot(spark, 30), cfg)
    CdcRunner.runAvailableNow(spark, cfg)

    val targetDir = s"$root/mirror"
    val r1 = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(r1.bootstrapped && r1.toVersion == source.currentVersion)
    val target = new LakeTable(targetDir)
    // public fold equal AND engine state equal (per-row _lsn + tombstones
    // copied — the order-tolerance shield)
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    assert(sortedRows(target.readState(spark, target.currentVersion)) ==
      sortedRows(source.readState(spark, source.currentVersion)))
    assert(target.manifest.metrics(LakeSync.OFFSET_METRIC) == r1.toVersion.toLong)

    // second window (includes DELETE winners) applied incrementally
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 300), cfg.feedDir,
      nFiles = 2, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    val r2 = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(!r2.bootstrapped && r2.rows > 0 && r2.fromVersion == r1.toVersion)
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    assert(target.manifest.metrics(LakeSync.OFFSET_METRIC) ==
      source.currentVersion.toLong)

    // caught up → no-op, cursor unmoved (idempotent re-run)
    val r3 = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(r3.rows == 0 && r3.epoch == -2L)
    assert(target.manifest.metrics(LakeSync.OFFSET_METRIC) ==
      source.currentVersion.toLong)
  }

  test("a late lower-LSN change cannot regress the mirror") {
    import spark.implicits._
    val root = tmpDir("graft-lakesync-ooo")
    val sourceDir = s"$root/table"
    def ev(doc: String, toks: Seq[Int], lsn: Long, op: String) =
      (doc, toks, toks.size, "web", op, lsn)
    def frame(rows: Seq[(String, Seq[Int], Int, String, String, Long)]) =
      rows.toDF("doc_id", "tokens", "n_tok", "source", "op", "lsn")
        .withColumn("ts", lit(null).cast("timestamp"))
    val cfg = JobConfig(mode = CdcMode.Upsert, buckets = 2,
      merge = MergeStrategy.MergeOnRead)
    val source = new LakeTable(sourceDir)
    val tableSchema = org.apache.spark.sql.types.StructType(
      frame(Seq(ev("d1", Seq(1), 100L, "INSERT"))).schema
        .filterNot(f => Set("op", "lsn", "ts").contains(f.name))
        // toDF infers array<int> with containsNull=false; parquet reads come
        // back nullable — normalize so the merge's align-cast is a no-op
        .map(f => f.copy(dataType = f.dataType match {
          case org.apache.spark.sql.types.ArrayType(t, _) =>
            org.apache.spark.sql.types.ArrayType(t, containsNull = true)
          case t => t
        })) ++ Seq(
        org.apache.spark.sql.types.StructField("_lsn",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_deleted",
          org.apache.spark.sql.types.BooleanType)))
    source.create(tableSchema, buckets = 2, keyCols = Seq("doc_id"))

    // epoch 0: d1 at lsn=100 (value A) — then bootstrap the mirror
    MergeApply.applyBatch(spark, source,
      frame(Seq(ev("d1", Seq(1, 2, 3), 100L, "INSERT"),
        ev("d2", Seq(9), 50L, "INSERT"))), 0L, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, sourceDir, targetDir)

    // epoch 1: an OUT-OF-ORDER older change for d1 (lsn=5, value B) and a
    // genuinely newer one for d2 — the source's LWW keeps d1=A, updates d2
    MergeApply.applyBatch(spark, source,
      frame(Seq(ev("d1", Seq(7, 7), 5L, "UPDATE"),
        ev("d2", Seq(8, 8), 60L, "UPDATE"))), 1L, cfg)
    LakeSync.sync(spark, sourceDir, targetDir)

    val target = new LakeTable(targetDir)
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    val d1 = target.read(spark).filter(col("doc_id") === "d1")
      .select("tokens").as[Seq[Int]].head()
    assert(d1 == Seq(1, 2, 3), "the stale lsn=5 update must lose downstream too")
  }

  test("schema evolution inside a sync window follows the source") {
    import spark.implicits._
    val root = tmpDir("graft-lakesync-evo")
    val cfg = morCfg(root)
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40))
    ChangeFeed.writeFeed(feed, cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir)

    // source evolves: rename a payload column + add one, then more ingest
    source.evolve(Seq(RenameColumn("source", "origin"),
      AddColumn("lang", org.apache.spark.sql.types.StringType)))
    val extra = Seq(("doc-evo", Seq(1, 2), 2, "wiki", "en", "INSERT", 100000L))
      .toDF("doc_id", "tokens", "n_tok", "origin", "lang", "op", "lsn")
      .withColumn("ts", lit(null).cast("timestamp"))
    MergeApply.applyBatch(spark, source, extra,
      epoch = source.manifest.epochWatermark + 1,
      cfg = cfg.job.copy(keyCols = Seq("doc_id")))

    LakeSync.sync(spark, cfg.tableDir, targetDir)
    val target = new LakeTable(targetDir)
    assert(target.read(spark).columns.contains("origin") &&
      target.read(spark).columns.contains("lang") &&
      !target.read(spark).columns.contains("source"))
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    // idempotent evolution replay: syncing again (no new data) is a no-op
    val again = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(again.rows == 0)
  }

  test("interdependent evolution in one window: rename a→b plus add a NEW a") {
    import spark.implicits._
    val root = tmpDir("graft-lakesync-evo2")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40)), cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir)

    // one sync window spans BOTH: the old `source` column renamed away, and
    // a brand-new column REUSING the name `source` — the add is applicable
    // only once the rename has landed, so a filter judging every change
    // against the pre-evolution target schema would silently drop it
    source.evolve(Seq(RenameColumn("source", "origin")))
    source.evolve(Seq(AddColumn("source", org.apache.spark.sql.types.StringType)))
    val extra = Seq(("doc-evo2", Seq(4, 5), 2, "wiki", "crawl-7", "INSERT", 200000L))
      .toDF("doc_id", "tokens", "n_tok", "origin", "source", "op", "lsn")
      .withColumn("ts", lit(null).cast("timestamp"))
    MergeApply.applyBatch(spark, source, extra,
      epoch = source.manifest.epochWatermark + 1,
      cfg = cfg.job.copy(keyCols = Seq("doc_id")))

    LakeSync.sync(spark, cfg.tableDir, targetDir)
    val target = new LakeTable(targetDir)
    val cols = target.read(spark).columns.toSet
    assert(cols.contains("origin") && cols.contains("source"),
      s"mirror must carry BOTH the renamed and the re-added column: $cols")
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    assert(target.read(spark).filter(col("doc_id") === "doc-evo2")
      .select("source").as[String].head() == "crawl-7",
      "the new column's values must survive the mirror's align-to-schema")
  }

  test("rename chain in one window: field-position order ≠ temporal order " +
    "(the fixpoint re-orders; a blocked rename is NOT 'already applied')") {
    import spark.implicits._
    val root = tmpDir("graft-lakesync-evo3")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40)), cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir)

    // temporal order frees the name first: source→origin, THEN n_tok→source.
    // evolutionDiff emits by field POSITION (n_tok precedes source), so the
    // sync sees [n_tok→source (blocked: name taken), source→origin] — a
    // single-pass filter that treats "blocked" as "already applied" silently
    // drops the first rename and the mirror loses the column forever
    source.evolve(Seq(RenameColumn("source", "origin")))
    source.evolve(Seq(RenameColumn("n_tok", "source")))
    val extra = Seq(("doc-evo3", Seq(7, 8, 9), "wiki", 3, "INSERT", 300000L))
      .toDF("doc_id", "tokens", "origin", "source", "op", "lsn")
      .withColumn("ts", lit(null).cast("timestamp"))
    MergeApply.applyBatch(spark, source, extra,
      epoch = source.manifest.epochWatermark + 1,
      cfg = cfg.job.copy(keyCols = Seq("doc_id")))

    LakeSync.sync(spark, cfg.tableDir, targetDir)
    val target = new LakeTable(targetDir)
    val cols = target.read(spark).columns.toSet
    assert(Set("doc_id", "tokens", "origin", "source").subsetOf(cols) &&
      !cols.contains("n_tok"),
      s"both renames land despite the position-order conflict: $cols")
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    assert(target.read(spark).filter(col("doc_id") === "doc-evo3")
      .select("source").as[Int].head() == 3,
      "the re-used name carries the RENAMED column's values, not the old one's")
  }

  test("a source-accepted null-filled payload row syncs to the mirror: the " +
    "window is already validated, re-quarantining it would silently diverge") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val root = tmpDir("graft-lakesync-nullfill")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40)),
      cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    // mirror bootstrapped BEFORE the null-filled row exists, so the row
    // below arrives via an INCREMENTAL window (the applyBatch path where the
    // payload invariant used to re-fire)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir)
    // a batch whose frame LACKS tokens/n_tok (an older producer): the source
    // accepts it (the payload invariant only applies to frames that carry
    // the columns) and null-fills — its change-feed row has tokens = null
    val narrow = StructType(ChangeEvent.envelopeFields ++ Seq(
      StructField("doc_id", StringType), StructField("source", StringType)))
    val row = Row(9001L, 1L, new java.sql.Timestamp(1700000000000L), "UPDATE",
      1, "doc-000000001", "mail")
    MergeApply.applyBatch(spark, source,
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), narrow),
      500L, cfg.job)
    assert(source.read(spark).filter(col("doc_id") === "doc-000000001" &&
      col("tokens").isNull && col("source") === "mail").count() == 1)
    // the incremental window must APPLY the null-token change row on the
    // mirror, not re-quarantine it (the mirror would diverge while the
    // cursor advances past the window — the worst silent failure shape)
    val r = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(!r.bootstrapped && r.rows >= 1, r.toString)
    val target = new LakeTable(targetDir)
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    assert(!new java.io.File(s"$targetDir/quarantine").exists,
      "nothing quarantines on an already-validated sync window")
  }

  test("a crashed evolve mid-window plus a FURTHER source evolution of the " +
    "same field: the retry diffs from the target's actual shape, not the cursor") {
    val root = tmpDir("graft-lakesync-chain")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40)),
      cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir)
    // source evolves source→origin, streams a window...
    source.evolve(Seq(RenameColumn("source", "origin")))
    ChangeFeed.writeFeed(ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 100, nDocs = 40, startLsn = 201)),
      cfg.feedDir, nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    // ...crash simulation: a sync attempt evolved the TARGET but died before
    // committing the cursor...
    val target = new LakeTable(targetDir)
    target.evolve(Seq(RenameColumn("source", "origin")))
    // ...and the source evolves the SAME field again before the retry: the
    // cursor-version diff collapses the chain (source→origin2) and can never
    // apply to a target already holding `origin`
    source.evolve(Seq(RenameColumn("origin", "origin2")))
    val r = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(!r.bootstrapped && r.rows > 0, r.toString)
    assert(target.manifest.currentSchema.fields.map(_.name).contains("origin2"),
      target.manifest.currentSchema.fields.map(_.name).toSeq.toString)
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
  }

  test("bootstrap never overwrites a FOREIGN feed's committed epochs: a " +
    "marker left by a crashed attempt does not authorize it") {
    val root = tmpDir("graft-lakesync-foreign")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 100, nDocs = 20)),
      cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    // crash simulation: create + marker landed, bootstrap commit did not
    val targetDir = s"$root/mirror"
    val src = new LakeTable(cfg.tableDir)
    val t = new LakeTable(targetDir)
    t.create(src.manifest.currentSchema.sparkSchema, 2, keyCols = src.manifest.keyCols)
    val mk = java.nio.file.Paths.get(targetDir, "sync_source.json")
    java.nio.file.Files.writeString(mk,
      s"""{"source_dir":"${cfg.tableDir}"}""")
    // a foreign CDC feed then commits streaming epochs into the same dir
    val foreign = cfg.copy(tableDir = targetDir, checkpointDir = s"$root/cp2",
      feedDir = s"$root/feed2")
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 50, nDocs = 10)),
      foreign.feedDir, nFiles = 1)
    CdcRunner.runAvailableNow(spark, foreign)
    assert(t.manifest.committedEpochCount > 0)
    // the sync retry must REFUSE, not bootstrap-overwrite the foreign rows.
    // The default CoW sync already refuses at the change-feed guard; a
    // merge-on-read sync passes that guard and must hit the bootstrap's own
    // foreign-data check (which used to test only the full-load epoch)
    val e = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, targetDir,
        merge = MergeStrategy.MergeOnRead))
    assert(e.getMessage.contains("refusing to mix feeds"), e.getMessage)
  }

  test("buckets on an EXISTING mirror must match the table (config drift is " +
    "refused, not silently ignored)") {
    val root = tmpDir("graft-lakesync-buckets")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 100, nDocs = 20)),
      cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir, buckets = Some(2))
    val e = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, targetDir, buckets = Some(256)))
    assert(e.getMessage.contains("rescale"), e.getMessage)
    // same value → fine (idempotent config)
    LakeSync.sync(spark, cfg.tableDir, targetDir, buckets = Some(2))
  }

  test("merge strategy on an EXISTING mirror is pinned at creation: silent " +
    "drift to sidecar-less CoW would wedge the mirror's changeLog") {
    val root = tmpDir("graft-lakesync-merge")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 100, nDocs = 20)),
      cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    // created merge-on-read, feed explicitly off (delta epochs ARE the feed)
    LakeSync.sync(spark, cfg.tableDir, targetDir,
      merge = MergeStrategy.MergeOnRead, changeFeed = Some(false))
    // a later cron invocation dropping the merge key (CoW default) with the
    // feed still off would commit a sidecar-less base epoch — refused loudly
    val e = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, targetDir, changeFeed = Some(false)))
    assert(e.getMessage.contains("merge"), e.getMessage)
    // the pinned value keeps working (idempotent config)
    LakeSync.sync(spark, cfg.tableDir, targetDir,
      merge = MergeStrategy.MergeOnRead, changeFeed = Some(false))
  }

  test("feed binding: foreign sources and non-sync targets are refused") {
    val root = tmpDir("graft-lakesync-bind")
    val cfgA = morCfg(s"$root/a")
    val cfgB = morCfg(s"$root/b")
    for (c <- Seq(cfgA, cfgB)) {
      ChangeFeed.writeFeed(ChangeFeed.events(spark,
        ChangeFeed.FeedSpec(nEvents = 100, nDocs = 20)), c.feedDir, nFiles = 1)
      CdcRunner.ensureTable(spark, c)
      CdcRunner.runAvailableNow(spark, c)
    }
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfgA.tableDir, targetDir)
    val e = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfgB.tableDir, targetDir))
    assert(e.getMessage.contains("one upstream per target"))
    // a table that was never sync-created (has its own data) is not adoptable
    val e2 = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfgA.tableDir, cfgB.tableDir))
    assert(e2.getMessage.contains("refusing to adopt"))
  }

  test("CoW source without a recorded change feed fails loudly, not empty") {
    val root = tmpDir("graft-lakesync-cow")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2)) // CoW, changeFeed off
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 100), cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir) // bootstrap: fine (snapshot)
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 100), cfg.feedDir,
      nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    val e = intercept[IllegalStateException](
      LakeSync.sync(spark, cfg.tableDir, targetDir))
    assert(e.getMessage.contains("change"), e.getMessage)
  }

  test("bootstrap crash-retry across a source evolution replays the missed " +
    "schema changes (the cursor starts PAST the evolution)") {
    import spark.implicits._
    val root = tmpDir("graft-lakesync-bootevo")
    val cfg = morCfg(root)
    ChangeFeed.writeFeed(ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40)), cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)

    // simulate call 1 crashing BETWEEN create+marker and the bootstrap
    // commit: the target exists at the pre-evolution schema, cursor unset
    val targetDir = s"$root/mirror"
    val target = new LakeTable(targetDir)
    target.create(source.manifest.currentSchema.sparkSchema, buckets = 4,
      keyCols = source.manifest.keyCols, tableMode = graft.lake.Manifest.LWW)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(targetDir, "sync_source.json"),
      s"""{"source_dir":"${cfg.tableDir}"}""")

    // the source evolves AFTER the crash and ingests rows with the new column
    source.evolve(Seq(AddColumn("lang", org.apache.spark.sql.types.StringType)))
    val extra = Seq(("doc-boot", Seq(1, 2), 2, "web", "en", "INSERT", 500000L))
      .toDF("doc_id", "tokens", "n_tok", "source", "lang", "op", "lsn")
      .withColumn("ts", lit(null).cast("timestamp"))
    MergeApply.applyBatch(spark, source, extra,
      epoch = source.manifest.epochWatermark + 1,
      cfg = cfg.job.copy(keyCols = Seq("doc_id")))

    // the retried bootstrap sets the cursor past the evolution, so no later
    // window would ever replay the AddColumn — it must land NOW, or the
    // mirror silently lacks the column forever
    val r = LakeSync.sync(spark, cfg.tableDir, targetDir)
    assert(r.bootstrapped)
    assert(target.read(spark).columns.contains("lang"))
    assert(sortedRows(target.read(spark)) == sortedRows(source.read(spark)))
    assert(target.read(spark).filter(col("doc_id") === "doc-boot")
      .select("lang").as[String].head() == "en")
  }

  test("a default CoW mirror records its OWN change feed — chaining " +
    "lake_sync off the mirror works") {
    val root = tmpDir("graft-lakesync-chain")
    val cfg = morCfg(root)
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 60))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 150), cfg.feedDir, nFiles = 1)
    val source = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val m1 = s"$root/m1"
    val m2 = s"$root/m2"
    LakeSync.sync(spark, cfg.tableDir, m1) // CoW target by default
    LakeSync.sync(spark, m1, m2)           // chained mirror of the mirror

    ChangeFeed.writeFeed(feed.filter(col("lsn") > 150), cfg.feedDir,
      nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    // m1's incremental window is a CoW commit — without the default sidecar
    // this second hop would throw "no recorded change set" (a CDC-out dead
    // end the sync surface could not remedy)
    LakeSync.sync(spark, cfg.tableDir, m1)
    LakeSync.sync(spark, m1, m2)
    assert(new LakeTable(m1).recordsChangeFeed,
      "a CoW mirror records sidecars unless explicitly disabled")
    assert(sortedRows(new LakeTable(m2).read(spark)) ==
      sortedRows(source.read(spark)))
  }

  test("mirror change-feed identity is PINNED at creation — later calls' " +
    "arguments cannot drift it in either direction") {
    val root = tmpDir("graft-lakesync-pin")
    val cfg = morCfg(root)
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 60))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 100), cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)

    // ON-pinned mirror: the marker is durable from CREATION, before any
    // window — a crash-vacuumed or not-yet-synced mirror still knows
    val on = s"$root/on"
    LakeSync.sync(spark, cfg.tableDir, on) // default CoW → feed ON
    assert(new LakeTable(on).recordsChangeFeed, "pinned at creation")
    // explicit off on the pinned-ON mirror is refused loudly — honoring it
    // would commit sidecar-less CoW epochs that wedge changeLog forever
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 100 && col("lsn") <= 200),
      cfg.feedDir, nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    val e1 = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, on, changeFeed = Some(false)))
    assert(e1.getMessage.contains("pinned"), e1.getMessage)
    // dropping the flag (cron config drift) keeps recording — window applies
    val onTable = new LakeTable(on)
    val vBefore = onTable.currentVersion
    LakeSync.sync(spark, cfg.tableDir, on)
    assert(onTable.changeLog(spark, vBefore, onTable.currentVersion).count() > 0,
      "the feed kept recording through the flag-less call")

    // OFF-pinned mirror: once sidecar-less change windows committed, turning
    // the feed ON cannot backfill them — refused with a re-bootstrap remedy
    val off = s"$root/off"
    LakeSync.sync(spark, cfg.tableDir, off, changeFeed = Some(false))
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 200), cfg.feedDir,
      nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    LakeSync.sync(spark, cfg.tableDir, off, changeFeed = Some(false)) // window, no sidecar
    val e2 = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, off)) // drift: default would flip ON
    assert(e2.getMessage.toLowerCase.contains("re-bootstrap"), e2.getMessage)
  }

  test("PROPERTY: bootstrap crash-retry reaches the head schema under ANY " +
    "evolution history (adds, rename chains, name reuse, widens) at any " +
    "crash point — or fails loudly; never silent divergence") {
    import org.apache.spark.sql.types._
    val types = Seq(IntegerType, LongType, StringType)
    def shapeSet(m: graft.lake.Manifest) =
      m.currentSchema.fields.map(f => (f.name, f.dataType)).toSet
    var loud = 0
    (0 until 12).foreach { trial =>
      val rnd = new scala.util.Random(4242L + trial)
      val root = tmpDir(s"graft-lakesync-prop")
      val source = new LakeTable(s"$root/src")
      source.create(StructType(Seq(
        StructField("doc_id", StringType),
        StructField("c0", IntegerType),
        StructField("c1", StringType),
        StructField("_lsn", LongType),
        StructField("_deleted", BooleanType))),
        buckets = 2, keyCols = Seq("doc_id"), tableMode = graft.lake.Manifest.LWW)
      def payload = source.manifest.currentSchema.fields
        .filterNot(f => f.name == "doc_id" || f.name.startsWith("_"))
      val nSteps = rnd.nextInt(7)
      val crashAt = rnd.nextInt(nSteps + 1)
      var crashSchema: StructType = null
      if (crashAt == 0) crashSchema = source.manifest.currentSchema.sparkSchema
      var freed = Vector.empty[String] // names a rename vacated — reuse stress
      (1 to nSteps).foreach { i =>
        val cols = payload
        val op: graft.lake.SchemaChange = rnd.nextInt(3) match {
          case 0 =>
            val n = if (freed.nonEmpty && rnd.nextBoolean()) {
              val x = freed(rnd.nextInt(freed.size)); freed = freed.filterNot(_ == x); x
            } else s"n$i"
            AddColumn(n, types(rnd.nextInt(types.size)))
          case 1 =>
            val from = cols(rnd.nextInt(cols.size)).name
            val to = if (freed.nonEmpty && rnd.nextBoolean()) {
              val x = freed(rnd.nextInt(freed.size)); freed = freed.filterNot(_ == x); x
            } else s"r$i"
            freed = freed :+ from
            RenameColumn(from, to)
          case _ =>
            cols.find(_.dataType == IntegerType) match {
              case Some(f) => graft.lake.WidenColumn(f.name, LongType)
              case None    => AddColumn(s"n$i", types(rnd.nextInt(types.size)))
            }
        }
        source.evolve(Seq(op))
        if (crashAt == i) crashSchema = source.manifest.currentSchema.sparkSchema
      }
      // simulate the crashed first call: created + marked, nothing committed
      val targetDir = s"$root/mirror"
      val target = new LakeTable(targetDir)
      target.create(crashSchema, buckets = 2, keyCols = Seq("doc_id"),
        tableMode = graft.lake.Manifest.LWW)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(targetDir, "sync_source.json"),
        s"""{"source_dir":"$root/src"}""")
      scala.util.Try(LakeSync.sync(spark, s"$root/src", targetDir)) match {
        case scala.util.Success(r) =>
          assert(r.bootstrapped, s"trial $trial: expected a bootstrap")
          assert(shapeSet(target.manifest) == shapeSet(source.manifest),
            s"trial $trial (crash@$crashAt/$nSteps): silent schema divergence")
        case scala.util.Failure(e) =>
          // a circular rename swap the fixpoint cannot order fails LOUDLY
          // with the re-bootstrap remedy — the one acceptable non-success
          assert(e.isInstanceOf[IllegalStateException] ||
            e.isInstanceOf[IllegalArgumentException],
            s"trial $trial: unexpected ${e.getClass}: ${e.getMessage}")
          loud += 1
      }
    }
    assert(loud <= 3, s"loud failures should be the rare swap cases, got $loud/12")
  }

  test("a FULL LOAD (truncate-and-load) inside a sync window re-mirrors the " +
    "source state and PROPAGATES down a mirror chain via the reload counter") {
    val root = tmpDir("graft-lakesync-fl")
    val cfg = morCfg(root)
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 400, nDocs = 60))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 200), cfg.feedDir, nFiles = 2)
    val source = CdcRunner.ensureTable(spark, cfg)
    // CDC only — NO full load yet: both mirrors bootstrap before it exists
    CdcRunner.runAvailableNow(spark, cfg)
    val m1Dir = s"$root/mirror1"
    val m2Dir = s"$root/mirror2"
    assert(LakeSync.sync(spark, cfg.tableDir, m1Dir).bootstrapped)
    assert(LakeSync.sync(spark, m1Dir, m2Dir).bootstrapped)
    // the once-per-lifetime full load lands AFTER the bootstraps, alongside
    // more CDC — both inside the next window. The load TRUNCATES: rows from
    // the first CDC wave not re-delivered by the snapshot or the second
    // wave are GONE from the source, so no set of row changes can express
    // the window — sync must re-mirror state
    CdcRunner.fullLoad(spark, source, ChangeFeed.seedSnapshot(spark, 80), cfg)
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 200), cfg.feedDir,
      nFiles = 2, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    val r2 = LakeSync.sync(spark, cfg.tableDir, m1Dir)
    assert(!r2.bootstrapped && r2.rows > 0)
    val m1 = new LakeTable(m1Dir)
    // snapshot-only rows (ids 60-79, untouchable by the 60-doc feed) came
    // through, and whole-state equality holds — including the truncation
    assert(m1.read(spark).filter(col("_lsn") === 0L).count() > 0,
      "full-load rows reached the mirror")
    assert(sortedRows(m1.read(spark)) == sortedRows(source.read(spark)),
      "mirror == source across a reload-in-window sync")
    assert(sortedRows(m1.readState(spark, m1.currentVersion)) ==
      sortedRows(source.readState(spark, source.currentVersion)),
      "engine state (per-row _lsn + tombstones) equal too")
    // the reload PROPAGATES: the chained mirror detects mirror1's re-mirror
    // commit (reload counter bump) and re-mirrors in turn
    val r2b = LakeSync.sync(spark, m1Dir, m2Dir)
    assert(!r2b.bootstrapped && r2b.rows > 0)
    val m2 = new LakeTable(m2Dir)
    assert(sortedRows(m2.read(spark)) == sortedRows(source.read(spark)),
      "second-hop mirror == source after reload propagation")
    // steady state resumes: later windows ride the change feed again
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 100, nDocs = 60))
        .withColumn("lsn", col("lsn") + 1000), cfg.feedDir,
      nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    LakeSync.sync(spark, cfg.tableDir, m1Dir)
    LakeSync.sync(spark, m1Dir, m2Dir)
    assert(sortedRows(m2.read(spark)) == sortedRows(source.read(spark)),
      "chain converges incrementally after the reload")
  }

  test("a source REBUILT at the same path with the same schema is refused by " +
    "table identity, even once its new head passes the cursor") {
    val root = tmpDir("graft-lakesync-rebuild")
    val cfg = morCfg(root)
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 50))
    ChangeFeed.writeFeed(feed, cfg.feedDir, nFiles = 2)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val targetDir = s"$root/mirror"
    LakeSync.sync(spark, cfg.tableDir, targetDir)
    // rebuild: same path, same schema, UNRELATED history — and drive the new
    // head PAST the cursor so the `from <= head` guard alone cannot catch it
    CdcRunner.deleteRecursively(new java.io.File(cfg.tableDir))
    CdcRunner.deleteRecursively(new java.io.File(cfg.checkpointDir))
    CdcRunner.ensureTable(spark, cfg)
    ChangeFeed.writeFeed(feed, cfg.feedDir, nFiles = 4, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    val e = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, targetDir))
    assert(e.getMessage.contains("rebuilt"), e.getMessage)
  }

  test("scd2 sources are refused (no row-level feed contract)") {
    val root = tmpDir("graft-lakesync-scd2")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Scd2, buckets = 2))
    ChangeFeed.writeFeed(ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 100, nDocs = 20)), cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val e = intercept[IllegalArgumentException](
      LakeSync.sync(spark, cfg.tableDir, s"$root/mirror"))
    assert(e.getMessage.contains("LWW change feed"))
  }
}
