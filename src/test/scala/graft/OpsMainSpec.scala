package graft

import org.apache.spark.sql.functions._

/** The training-data ops CLI surface (`JobMain --op …`): a data engineer
  * drives dedup/ANN/text ops from JSON config + parquet paths, no Scala —
  * the same no-code contract the CDC side has via settings.json. */
class OpsMainSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"
  private val embs = "/root/testdata/sf0.001/embeddings.parquet"

  private def writeConfig(json: String): String = {
    val p = java.nio.file.Files.createTempFile("graft-opconf", ".json")
    java.nio.file.Files.writeString(p, json)
    p.toString
  }

  test("dedup_minhash from JSON config == direct API call") {
    val conf = writeConfig("""{"threshold": 0.7, "text_col": "text", "id_col": "doc_id"}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "dedup_minhash", "--in", docs, "--config", conf))
      .orderBy("id_a", "id_b").collect().map(_.toString)
    val direct = graft.ops.Dedup.minhashNearDups(
        spark.read.parquet(docs), threshold = 0.7)
      .orderBy("id_a", "id_b").collect().map(_.toString)
    assert(viaCli.nonEmpty && viaCli.sameElements(direct))
  }

  test("ann_ivf from JSON config == direct API call; defaults fill unset keys") {
    val conf = writeConfig("""{"k": 5, "cells": 8, "id_col": "vec_id"}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "ann_ivf", "--in", embs, "--config", conf))
      .orderBy("q_id", "rank").collect().map(_.toString)
    val direct = graft.ops.Similarity.ivfTopK(
        spark.read.parquet(embs), spark.read.parquet(embs), k = 5, cells = 8)
      .orderBy("q_id", "rank").collect().map(_.toString)
    assert(viaCli.nonEmpty && viaCli.sameElements(direct))
  }

  test("text_stats without config uses defaults; unknown op fails loudly") {
    val st = JobMain.runOp(spark, Seq("--op", "text_stats", "--in", docs))
    assert(st.count() == spark.read.parquet(docs).count())
    assert(st.columns.contains("ws_tokens"))
    val e = intercept[IllegalArgumentException](
      JobMain.runOp(spark, Seq("--op", "frobnicate", "--in", docs)))
    assert(e.getMessage.contains("unknown --op"))
    intercept[IllegalArgumentException](JobMain.runOp(spark, Seq("--op", "text_stats")))
  }

  test("ann with a distinct --queries table keeps corpus rows sharing a query id " +
    "(exclude_self defaults by query-side identity)") {
    // corpus == queries table content but loaded via --queries: ids overlap 1:1;
    // rank-1 for every query must be its identical twin (cosine 1), which
    // excludeSelf=true would silently drop
    val conf = writeConfig("""{"k": 1}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "ann_bruteforce", "--in", embs, "--queries", embs, "--config", conf))
      .collect()
    assert(viaCli.nonEmpty && viaCli.forall(r =>
      r.getAs[Long]("q_id") == r.getAs[Long]("c_id")),
      "rank-1 of each query against a distinct corpus table is its own id")
    // self-search (no --queries) still excludes the trivial match
    val self = JobMain.runOp(spark,
        Seq("--op", "ann_bruteforce", "--in", embs, "--config", conf)).collect()
    assert(self.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("c_id")))
  }

  test("maintenance verbs (compact | vacuum | rescale | split_buckets | " +
    "rewrite_manifests | remove_orphans | reconcile) from the CLI == direct " +
    "API effects") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-opsmain-maint")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, merge = MergeStrategy.MergeOnRead,
        buckets = 2),
      maxFilesPerTrigger = 1)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 400, nDocs = 80)),
      cfg.feedDir, nFiles = 4)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val state = lake.read(spark).collect().map(_.toString).sorted
    def tbl = Seq("--table", cfg.tableDir)

    // compact: deltas folded, report reflects the new manifest
    val conf = writeConfig("""{"max_files_per_bucket": 1, "max_delta_files": 1}""")
    val cRep = JobMain.runOp(spark,
      Seq("--op", "compact", "--config", conf) ++ tbl).head()
    assert(cRep.getAs[Int]("delta_files") == 0, s"deltas folded: $cRep")
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state))

    // rescale (default 2×) + bounded split + completing split
    val rRep = JobMain.runOp(spark, Seq("--op", "rescale") ++ tbl).head()
    assert(rRep.getAs[Int]("buckets") == 4)
    val sConf = writeConfig("""{"max_groups": 1}""")
    JobMain.runOp(spark, Seq("--op", "split_buckets", "--config", sConf) ++ tbl)
      .head()
    val s2 = JobMain.runOp(spark, Seq("--op", "split_buckets") ++ tbl).head()
    assert(s2.getAs[String]("specs") == "4", s"fully migrated: $s2")
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state))

    // vacuum: report lists the deleted paths, table reads intact
    val vConf = writeConfig("""{"keep_versions": 1}""")
    val vRep = JobMain.runOp(spark, Seq("--op", "vacuum", "--config", vConf) ++ tbl)
    assert(vRep.count() > 0, "superseded files deleted")
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state))

    // reconcile: clean audit
    val aRep = JobMain.runOp(spark, Seq("--op", "reconcile") ++ tbl).head()
    assert(aRep.getAs[Boolean]("ok"), s"audit: $aRep")

    // rewrite_manifests: fragment list (grown by the split commits above)
    // folds to one, reads intact
    assert(lake.manifest.fragments.size > 1, "fixture: several fragments to fold")
    val mRep = JobMain.runOp(spark, Seq("--op", "rewrite_manifests") ++ tbl).head()
    assert(lake.manifest.fragments.size == 1, "fragment list folded to one")
    assert(mRep.getAs[Int]("version") == lake.currentVersion)
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state))

    // remove_orphans: a planted unreferenced file is swept (horizon 0 for the
    // test — production passes hours), referenced files untouched
    val orphan = java.nio.file.Paths.get(lake.dataDir(9999L), "_bucket=0")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-orphan.parquet"), "x")
    // push the mtime safely past the cutoff (mtime == cutoff at ms precision
    // would not satisfy the strict < of the age guard)
    assert(orphan.resolve("part-orphan.parquet").toFile
      .setLastModified(System.currentTimeMillis() - 60000))
    val oConf = writeConfig("""{"older_than_ms": 0}""")
    val oRep = JobMain.runOp(spark,
      Seq("--op", "remove_orphans", "--config", oConf) ++ tbl)
    assert(oRep.collect().map(_.getString(0)).exists(_.contains("part-orphan")),
      "the planted orphan is swept")
    assert(lake.read(spark).collect().map(_.toString).sorted.sameElements(state))
    // the horizon is mandatory — a sweep without one could eat an in-flight epoch
    val oe = intercept[IllegalArgumentException](
      JobMain.runOp(spark, Seq("--op", "remove_orphans") ++ tbl))
    assert(oe.getMessage.contains("older_than_ms"))

    // --table missing fails loudly
    val e = intercept[IllegalArgumentException](
      JobMain.runOp(spark, Seq("--op", "compact")))
    assert(e.getMessage.contains("--table"))
  }

  test("read + change_log verbs: consumer bootstrap and incremental sync " +
    "from the CLI == direct API") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-opsmain-sync")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2, changeFeed = true))
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 60))
    ChangeFeed.writeFeed(feed, cfg.feedDir, nFiles = 2)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val v1 = lake.currentVersion
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 200, nDocs = 60, startLsn = 301)),
      cfg.feedDir, nFiles = 2, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    def tbl = Seq("--table", cfg.tableDir)

    val readCli = JobMain.runOp(spark, Seq("--op", "read") ++ tbl)
      .collect().map(_.toString).sorted
    assert(readCli.sameElements(lake.read(spark).collect().map(_.toString).sorted))
    // time travel via config
    val vConf = writeConfig(s"""{"version": $v1}""")
    val asOf = JobMain.runOp(spark, Seq("--op", "read", "--config", vConf) ++ tbl)
      .collect().map(_.toString).sorted
    assert(asOf.sameElements(lake.readVersion(spark, v1).collect().map(_.toString).sorted))
    assert(!asOf.sameElements(readCli), "the second wave changed the table")

    // change_log: `to` defaults to the current version
    val cConf = writeConfig(s"""{"from": $v1}""")
    val clCli = JobMain.runOp(spark, Seq("--op", "change_log", "--config", cConf) ++ tbl)
      .collect().map(_.toString).sorted
    assert(clCli.nonEmpty && clCli.sameElements(
      lake.changeLog(spark, v1, lake.currentVersion).collect().map(_.toString).sorted))
    intercept[IllegalArgumentException](
      JobMain.runOp(spark, Seq("--op", "change_log") ++ tbl))
  }

  test("lake_sync verb: bootstrap + incremental lake-to-lake mirror from the CLI") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-opsmain-lakesync")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2,
        merge = MergeStrategy.MergeOnRead))
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 60))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 150), cfg.feedDir, nFiles = 1)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val mirror = s"$root/mirror"
    def run() = JobMain.runOp(spark,
      Seq("--op", "lake_sync", "--in", cfg.tableDir, "--table", mirror)).head()

    val r1 = run()
    assert(r1.getAs[Boolean]("bootstrapped") &&
      r1.getAs[Int]("to_version") == lake.currentVersion)
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 150), cfg.feedDir,
      nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    val r2 = run()
    assert(!r2.getAs[Boolean]("bootstrapped") && r2.getAs[Long]("rows") > 0)
    val target = new graft.lake.LakeTable(mirror)
    assert(target.read(spark).collect().map(_.toString).sorted
      .sameElements(lake.read(spark).collect().map(_.toString).sorted))
    // caught up → no-op report
    assert(run().getAs[Long]("rows") == 0L)
  }

  test("lake_sync verb honors the canonical merge_on_read spelling and " +
    "rejects typos (no silent CoW fallback)") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-opsmain-lakesync-mor")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2,
        merge = MergeStrategy.MergeOnRead))
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 200, nDocs = 40))
    ChangeFeed.writeFeed(feed.filter(col("lsn") <= 100), cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val mirror = s"$root/mirror"
    def run(conf: String) = {
      val p = java.nio.file.Files.createTempFile("graft-lakesync-conf", ".json")
      java.nio.file.Files.writeString(p, conf)
      JobMain.runOp(spark, Seq("--op", "lake_sync",
        "--in", cfg.tableDir, "--table", mirror, "--config", p.toString))
    }
    run("""{"merge": "merge_on_read"}""")
    ChangeFeed.writeFeed(feed.filter(col("lsn") > 100), cfg.feedDir,
      nFiles = 1, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    run("""{"merge": "merge_on_read"}""")
    // an incremental window on a merge-on-read mirror commits DELTA files —
    // the old hand-rolled `case "mor"` match silently built CoW here
    assert(new graft.lake.LakeTable(mirror).manifest.files.exists(_.isDelta),
      "canonical spelling must build a merge-on-read mirror")
    intercept[IllegalArgumentException](run("""{"merge": "mergeonread"}"""))
  }

  test("jdbc_apply refuses an scd2 table: version rows are not row states") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-opsmain-jdbc-scd2")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Scd2, buckets = 2,
        merge = MergeStrategy.MergeOnRead))
    ChangeFeed.writeFeed(ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 100, nDocs = 20)), cfg.feedDir, nFiles = 1)
    CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    // collapsing SCD2 version rows per natural key would write "latest
    // version per key" to the JDBC target instead of the history — refused
    // before any connection is attempted
    val confP = java.nio.file.Files.createTempFile("graft-jdbc-scd2", ".json")
    java.nio.file.Files.writeString(confP, """{"from": 1}""")
    val e = intercept[IllegalArgumentException](JobMain.runOp(spark,
      Seq("--op", "jdbc_apply", "--table", cfg.tableDir,
        "--config", confP.toString)))
    assert(e.getMessage.contains("version rows"), e.getMessage)
  }

  test("sql verb: free-form SQL over the lake TVFs from the CLI") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-opsmain-sql")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2))
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 300, nDocs = 60)),
      cfg.feedDir, nFiles = 2)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val n = JobMain.runOp(spark, Seq("--op", "sql", "--sql",
      s"SELECT count(*) AS n FROM graft_table('${cfg.tableDir}')")).head().getLong(0)
    assert(n == lake.read(spark).count() && n > 0)
    // --sql-file path + composition with ordinary SQL on top of the TVF
    val f = java.nio.file.Files.createTempFile("graft-sql", ".sql")
    java.nio.file.Files.writeString(f,
      s"""SELECT source, count(*) AS docs
         |FROM graft_table('${cfg.tableDir}')
         |GROUP BY source ORDER BY source""".stripMargin)
    val bySource = JobMain.runOp(spark,
      Seq("--op", "sql", "--sql-file", f.toString)).collect()
    assert(bySource.map(_.getLong(1)).sum == n)
    intercept[IllegalArgumentException](JobMain.runOp(spark, Seq("--op", "sql")))
  }

  test("quarantine_list + quarantine_replay from the CLI drain the DLX " +
    "like the direct API") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import org.apache.spark.sql.Row
    val root = tmpDir("graft-opsmain-dlx")
    val job = JobConfig()
    val lake = CdcRunner.ensureTable(spark, RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table",
      checkpointDir = s"$root/cp", job = job))
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val poison = Seq(
      Row(1L, 1L, ts(1), "INSERT", 1, "k1", Seq(1, 2), Int.box(2), "web"),
      Row(2L, 1L, ts(2), "INSERT", 1, "k2", Seq(1, 2, 3), Int.box(99), "web"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(poison, 2), ChangeEvent.schema())
    graft.apply.MergeApply.applyBatch(spark, lake, df, 0L, job)
    def tbl = Seq("--table", s"$root/table")

    val listed = JobMain.runOp(spark, Seq("--op", "quarantine_list") ++ tbl).collect()
    assert(listed.length == 1 && listed(0).getAs[Long]("_epoch") == 0L &&
      listed(0).getAs[String]("_error_reason").startsWith("payload_invariant"))
    assert(listed.map(_.getAs[String]("doc_id")).toSeq == Seq("k2"))

    // drain epoch 0 unfixed: the bad row re-quarantines under the replay epoch
    val rConf = writeConfig("""{"epoch": 0}""")
    val rep = JobMain.runOp(spark,
      Seq("--op", "quarantine_replay", "--config", rConf) ++ tbl).head()
    assert(!rep.getAs[Boolean]("skipped"))
    assert(rep.getAs[String]("metrics").contains("events_quarantined=1"))
    val epochs = JobMain.runOp(spark, Seq("--op", "quarantine_list") ++ tbl)
      .select("_epoch").distinct().collect().map(_.getLong(0)).sorted
    assert(epochs.length == 2 && epochs.head == 0L, s"replay epoch listed: ${epochs.toSeq}")

    // the acknowledgement: clear the drained source epoch, replay epoch stays
    val clConf = writeConfig("""{"epoch": 0}""")
    val cleared = JobMain.runOp(spark,
      Seq("--op", "quarantine_clear", "--config", clConf) ++ tbl)
    assert(cleared.count() > 0, "deleted paths reported")
    val after = JobMain.runOp(spark, Seq("--op", "quarantine_list") ++ tbl)
      .select("_epoch").distinct().collect().map(_.getLong(0))
    assert(after.toSeq == Seq(epochs(1)), s"only the replay epoch remains: ${after.toSeq}")
    // clearing is explicit per-epoch — no epoch, loud failure
    intercept[IllegalArgumentException](
      JobMain.runOp(spark, Seq("--op", "quarantine_clear") ++ tbl))
  }

  test("quarantine_replay --settings re-runs the job's transform rules: an " +
    "externally-corrected row lands TRANSFORMED, like every ingested row") {
    import graft.model._
    import graft.runner.{CdcRunner, RunnerConfig}
    import org.apache.spark.sql.Row
    val root = tmpDir("graft-opsmain-drainrules")
    val settingsJson =
      """{
        |  "task": { "task_name": "drain_rules", "replication_type": "cdc",
        |    "start_mode": "reload", "cdc_settings": { "mode": "upsert" } },
        |  "tables": [ { "schema_name": "corpus", "table_name": "documents",
        |    "priority": 0 } ],
        |  "transformations": [
        |    { "table_info": { "schema_name": "corpus", "table_name": "documents" },
        |      "settings": { "transformation_type": "modify_column_value",
        |        "description": "upper", "contract": { "operation": "uppercase",
        |        "column_name": "source" }, "priority": 1 } } ]
        |}""".stripMargin
    val sp = java.nio.file.Files.createTempFile("graft-drain-settings", ".json")
    java.nio.file.Files.writeString(sp, settingsJson)
    val parsed = TaskSettings.parse(settingsJson)
    val job = JobConfig(transforms = parsed.tables.head.transforms)
    val lake = CdcRunner.ensureTable(spark, RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table",
      checkpointDir = s"$root/cp", job = job))
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val batch = Seq(
      Row(1L, 1L, ts(1), "INSERT", 1, "k1", Seq(1, 2), Int.box(2), "web"),
      Row(2L, 1L, ts(2), "INSERT", 1, "k2", Seq(1, 2, 3), Int.box(99), "web"))
    graft.apply.MergeApply.applyBatch(spark,
      lake, spark.createDataFrame(
        spark.sparkContext.parallelize(batch, 2), ChangeEvent.schema()), 0L, job)
    assert(lake.read(spark).select("source").collect().map(_.getString(0))
      .forall(_ == "WEB"), "ingested rows are transformed")
    // the operator's repair loop: fix the quarantined parquet in place
    // (n_tok 99 → the real size), then drain it from the CLI
    val qDir = lake.quarantineDir(0L)
    val fixed = spark.read.parquet(qDir)
      .withColumn("n_tok", org.apache.spark.sql.functions.size(col("tokens")))
    val tmpQ = s"$root/qfix"
    fixed.write.parquet(tmpQ)
    CdcRunner.deleteRecursively(new java.io.File(qDir))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmpQ),
      java.nio.file.Paths.get(qDir))
    val rConf = writeConfig("""{"epoch": 0}""")
    JobMain.runOp(spark, Seq("--op", "quarantine_replay", "--config", rConf,
      "--settings", sp.toString, "--table", s"$root/table"))
    val k2 = lake.read(spark).filter(col("doc_id") === "k2").head()
    assert(k2.getAs[String]("source") == "WEB",
      "the drained row went through the SAME rule pipeline as ingest — " +
        "without --settings it would land raw ('web') and silently diverge")
  }

  test("dedup_embedding honors vec_col/id_col overrides") {
    val renamed = spark.read.parquet(embs)
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val tmp = tmpDir("graft-opsmain") + "/renamed"
    renamed.write.parquet(tmp)
    val conf = writeConfig("""{"threshold": 0.9, "vec_col": "emb", "id_col": "vid"}""")
    val viaCli = JobMain.runOp(spark,
        Seq("--op", "dedup_embedding", "--in", tmp, "--config", conf))
      .orderBy("id_a", "id_b").collect().map(_.toString)
    val direct = graft.ops.Dedup.embeddingNearDups(
        spark.read.parquet(embs), threshold = 0.9)
      .orderBy("id_a", "id_b").collect().map(_.toString)
    assert(viaCli.sameElements(direct))
  }

  test("a config value of the WRONG JSON type fails loudly naming the key " +
    "instead of silently running the op with the default") {
    // {"bits": "64"} used to be swallowed by extractOpt to None → the op ran
    // with bits=32, the user's parameter ignored with no error
    val conf = writeConfig("""{"bits": "64"}""")
    val e = intercept[IllegalArgumentException](JobMain.runOp(spark,
      Seq("--op", "dedup_simhash", "--in", docs, "--config", conf)))
    assert(e.getMessage.contains("\"bits\""), e.getMessage)
    assert(e.getMessage.contains("integer"), e.getMessage)
  }
}
