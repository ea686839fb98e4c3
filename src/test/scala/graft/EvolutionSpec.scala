package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.feed.ChangeFeed
import graft.lake._
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * FIXTURES F5: schema evolution mid-feed — (a) add column `lang` (old rows read
 * as null), (b) rename `source` → `origin`, (c) widen `n_tok` int → long.
 * The stream is restarted with the evolved event schema (standard practice for
 * file-source schema changes); the lake evolves via the schema registry on the
 * first batch carrying the new schema_ver, and OLD data files are never
 * rewritten — reads project them onto the current schema by field id.
 */
class EvolutionSpec extends SparkSpec {

  test("parquet feed restarted with the evolved schema after a registry KEY " +
    "rename: the merge follows the key to its new name") {
    import org.apache.spark.sql.Row
    val root = tmpDir("graft-evo-keyrename")
    // the registry renames the MERGE KEY; the operator follows the guard's
    // instruction and restarts with the evolved payload schema — before the
    // fix the parquet path (unlike every wire path) kept merging on the
    // stale key name and wedged with an analysis error on every batch
    val evolved = StructType(Seq(
      StructField("document_id", StringType),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", IntegerType),
      StructField("source", StringType)))
    val registry = Map(2 -> Seq[SchemaChange](RenameColumn("doc_id", "document_id")))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
      payloadSchema = evolved, schemaRegistry = registry)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val rows = Seq(
      Row(1L, 1L, ts(1), "INSERT", 2, "d-1", Seq(1), Int.box(1), "web"),
      Row(2L, 1L, ts(2), "UPDATE", 2, "d-1", Seq(2, 3), Int.box(2), "web"),
      Row(3L, 1L, ts(3), "INSERT", 2, "d-2", Seq(4), Int.box(1), "web"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      ChangeEvent.schema(evolved.fields.toSeq)).coalesce(1)
      .write.parquet(cfg.feedDir)
    CdcRunner.runAvailableNow(spark, cfg)
    val lake = new graft.lake.LakeTable(cfg.tableDir)
    assert(lake.manifest.keyCols == Seq("document_id"), lake.manifest.keyCols)
    val got = lake.read(spark).select("document_id", "n_tok").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("d-1" -> 2, "d-2" -> 1), s"LWW on the renamed key: $got")
  }

  test("registry versions are applied cumulatively: a batch that starts at v3 " +
    "still applies v2's changes first") {
    val root = tmpDir("graft-evo-skip")
    // v2 renames source->origin; v3 renames origin->origin2 (chained on v2)
    // and adds lang. A stream starting after upstream reached v3 sees ONLY
    // schema_ver=3 batches — v2 must still apply or v3's rename filters out
    // silently and the column's values are lost to null-fill.
    val registry = Map(
      2 -> Seq(RenameColumn("source", "origin")),
      3 -> Seq(RenameColumn("origin", "origin2"), AddColumn("lang", StringType)))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4),
      payloadSchema = StructType(ChangeEvent.defaultPayloadFields),
      schemaRegistry = registry)
    val lake = CdcRunner.ensureTable(spark, cfg)
    val v3Batch = ChangeFeed.events(spark, ChangeFeed.FeedSpec(
        nEvents = 20, nDocs = 10, schemaVer = 3))
      .withColumnRenamed("source", "origin2")
      .withColumn("lang", lit("en"))
    CdcRunner.applySchemaRegistry(lake, registry, v3Batch)
    val names = lake.manifest.currentSchema.fields.map(_.name).toSet
    assert(names.contains("origin2") && !names.contains("source") &&
      !names.contains("origin") && names.contains("lang"),
      s"v2 then v3 applied in order: $names")
    // and the batch merges under the final names
    graft.apply.MergeApply.applyBatch(spark, lake, v3Batch, 0L, cfg.job)
    assert(lake.read(spark).filter(col("origin2").isNotNull).count() > 0)
  }

  test("registry rename against a batch still carrying the OLD column shape " +
    "fails loudly (fixed-schema feeds need a restart, not silent null-fill)") {
    val root = tmpDir("graft-evo-oldshape")
    val registry = Map(2 -> Seq(RenameColumn("source", "origin")))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
      schemaRegistry = registry)
    val lake = CdcRunner.ensureTable(spark, cfg)
    // v2-marked events that still carry `source` — the feed contract was NOT
    // evolved; before the guard this evolved the lake and every later batch
    // silently null-filled `origin` (a renamed KEY would instead wedge)
    val stale = ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 10, nDocs = 5, schemaVer = 2))
    val e = intercept[IllegalArgumentException](
      CdcRunner.applySchemaRegistry(lake, registry, stale))
    assert(e.getMessage.contains("old column shape"), e.getMessage)
    assert(lake.manifest.currentSchema.byName("source").isDefined,
      "the lake must NOT evolve on the refused batch")
  }

  test("name-reusing rename chain (v2 a→b, v3 b→a): a restarted stream at the " +
    "final shape neither wedges on the old-shape guard nor churns evolution " +
    "commits per batch") {
    val root = tmpDir("graft-evo-reuse")
    // v3 renames `origin` BACK to `source` — the final feed legitimately
    // carries `source`, the exact shape the v2 guard used to read as stale
    // (and the name-presence pending filter used to re-apply forever)
    val registry = Map(
      2 -> Seq(RenameColumn("source", "origin")),
      3 -> Seq(RenameColumn("origin", "source")))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
      schemaRegistry = registry)
    val lake = CdcRunner.ensureTable(spark, cfg)
    val batch = ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 10, nDocs = 5, schemaVer = 3))
    CdcRunner.applySchemaRegistry(lake, registry, batch) // old guard threw here
    val names = lake.manifest.currentSchema.fields.map(_.name)
    assert(names.contains("source") && !names.contains("origin"), names.mkString(","))
    assert(lake.manifest.metrics(LakeTable.RegistryVerMetric) == 3L,
      "watermark persisted in the manifest")
    val v = lake.currentVersion
    // replay on the next batch: the watermark makes it a pure no-op — the
    // pre-watermark code re-applied a→b→a (two evolution commits) per batch
    CdcRunner.applySchemaRegistry(lake, registry, batch)
    assert(lake.currentVersion == v, "no per-batch evolution churn")
    // and the batch merges under the final (reused) name
    graft.apply.MergeApply.applyBatch(spark, lake, batch, 0L, cfg.job)
    assert(lake.read(spark).filter(col("source").isNotNull).count() > 0)
    // the watermark is an ABSOLUTE metric with no lineage record — the audit
    // must exclude it, not report a registry-evolved table as tampered
    val rep = lake.reconcile()
    assert(rep.ok, s"reconcile must ignore the registry watermark: $rep")
  }

  test("net-no-op pending chain on an UNWATERMARKED table records the " +
    "watermark in ONE metadata commit, minting no spurious schema versions " +
    "(pre-watermark-table safety net at chain level)") {
    val root = tmpDir("graft-evo-noop-chain")
    val registry = Map(
      2 -> Seq(RenameColumn("source", "origin")),
      3 -> Seq(RenameColumn("origin", "source")))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
      schemaRegistry = registry)
    // models a table evolved by an OLDER build (no watermark metric, columns
    // already at the chain's final shape, which here equals the created shape)
    val lake = CdcRunner.ensureTable(spark, cfg)
    val v0 = lake.currentVersion
    val sid0 = lake.manifest.currentSchemaId
    val batch = ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 10, nDocs = 5, schemaVer = 3))
    CdcRunner.applySchemaRegistry(lake, registry, batch)
    // the per-version replay used to rename source→origin→source on the
    // already-final table: two schema versions of pure churn
    assert(lake.currentVersion == v0 + 1,
      s"one watermark-only commit expected, got ${lake.currentVersion - v0}")
    assert(lake.manifest.currentSchemaId == sid0, "schema untouched")
    assert(lake.manifest.metrics(LakeTable.RegistryVerMetric) == 3L)
  }

  test("the no-op-chain watermark skip still enforces the stale-batch-shape " +
    "guard: a batch carrying the pre-rename column wedges LOUDLY — skipping " +
    "would record the watermark and null-fill the renamed column forever") {
    val root = tmpDir("graft-evo-staleskip")
    val registry = Map(2 -> Seq(RenameColumn("source", "origin")))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
      schemaRegistry = registry)
    val lake = CdcRunner.ensureTable(spark, cfg)
    // the table was evolved by an OLDER build: column already 'origin', no
    // watermark metric — the rename SIMULATES as a no-op against this shape
    lake.evolve(Seq(RenameColumn("source", "origin")))
    // ...but the BATCH still carries 'source': the feed was never evolved.
    // Recording the watermark here would silently null-fill 'origin' on
    // every subsequent batch (the loud wedge turned into silent loss).
    val batch = ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 10, nDocs = 5, schemaVer = 2))
    val e = intercept[IllegalArgumentException](
      CdcRunner.applySchemaRegistry(lake, registry, batch))
    assert(e.getMessage.contains("still carries the old column shape"),
      e.getMessage)
    assert(lake.manifest.metrics.getOrElse(LakeTable.RegistryVerMetric, 0L) == 0L,
      "no watermark recorded on the refused path")
  }

  test("null schema_ver rows evolve nothing and do not crash the registry scan") {
    val root = tmpDir("graft-evo-nullver")
    val registry = Map(2 -> Seq(AddColumn("lang", StringType)))
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
      schemaRegistry = registry)
    val lake = CdcRunner.ensureTable(spark, cfg)
    val v0 = lake.currentVersion
    // a malformed feed file can carry null schema_ver (file sources do not
    // enforce nullable=false) — the old getInt(0) NPE'd inside foreachBatch
    // and wedged the stream on every replay of the same file
    val nullVer = ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 6, nDocs = 3))
      .withColumn(ChangeEvent.SCHEMA_VER,
        lit(null).cast(IntegerType))
    CdcRunner.applySchemaRegistry(lake, registry, nullVer) // must not throw
    assert(lake.currentVersion == v0, "nothing to evolve from null versions")
    // mixed: one real v2 row alongside nulls still applies v2
    val mixed = ChangeFeed.events(spark,
      ChangeFeed.FeedSpec(nEvents = 6, nDocs = 3))
      .withColumn(ChangeEvent.SCHEMA_VER,
        when(col(ChangeEvent.LSN) % 2 === 0, lit(2)).otherwise(lit(null)))
    CdcRunner.applySchemaRegistry(lake, registry, mixed)
    assert(lake.manifest.currentSchema.byName("lang").isDefined)
  }

  test("fullLoad runs the table's filter+transform rules (renamed/created " +
    "columns land under the table schema's names)") {
    val root = tmpDir("graft-evo-flrules")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4,
        filters = Seq(graft.rules.FilterCfg("n_tok", "greater_than", value = Some(0))),
        transforms = Seq(
          graft.rules.ModifyColumnName("source", "origin", priority = 0),
          graft.rules.CreateColumn("tag", "literal", value = Some("SEED"),
            valueType = Some("varchar")))))
    val lake = CdcRunner.ensureTable(spark, cfg)
    val snapNames = lake.manifest.currentSchema.fields.map(_.name).toSet
    assert(snapNames.contains("origin") && snapNames.contains("tag"))
    CdcRunner.fullLoad(spark, lake, ChangeFeed.seedSnapshot(spark, 25), cfg)
    val loaded = lake.read(spark)
    assert(loaded.count() == 25)
    assert(loaded.filter(col("origin").isNull).count() == 0,
      "renamed column carries the snapshot's values, not null-fill")
    assert(loaded.filter(col("tag") === "SEED").count() == 25,
      "created column materialized on the full load")
    assert(lake.manifest.metrics("full_load_rows") == 25L,
      "exact loaded-row count recorded")
  }

  test("add / rename / widen mid-stream; old rows preserved via field-id reads") {
    val root = tmpDir("graft-evo")
    val nDocs = 50L
    val v1Payload = StructType(ChangeEvent.defaultPayloadFields)
    val v2Payload = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", LongType),
      StructField("origin", StringType),
      StructField("lang", StringType)))
    val registry = Map(2 -> Seq(
      AddColumn("lang", StringType),
      RenameColumn("source", "origin"),
      WidenColumn("n_tok", LongType)))

    val cfg1 = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 8),
      payloadSchema = v1Payload, schemaRegistry = registry)

    // stage 1: v1 events
    val ev1 = ChangeFeed.events(spark, ChangeFeed.FeedSpec(
      nEvents = 300, nDocs = nDocs, schemaVer = 1))
    ChangeFeed.writeFeed(ev1, cfg1.feedDir, 3)
    val lake = CdcRunner.ensureTable(spark, cfg1)
    CdcRunner.runAvailableNow(spark, cfg1)
    val schemaIdV1 = lake.manifest.currentSchemaId

    // stage 2: restart with the evolved event schema; v2 events carry origin+lang,
    // n_tok as long, schema_ver=2
    // v2 touches only a sub-keyspace so v1-era rows survive for the null-fill check
    val ev2 = ChangeFeed.events(spark, ChangeFeed.FeedSpec(
      nEvents = 100, nDocs = 10, startLsn = 301, schemaVer = 2))
      .withColumnRenamed("source", "origin")
      .withColumn("n_tok", col("n_tok").cast(LongType))
      .withColumn("lang",
        when(col("op") === ChangeEvent.DELETE, lit(null))
          .otherwise(concat(lit("l"), pmod(xxhash64(col("doc_id")), lit(5)))))
    ChangeFeed.writeFeed(ev2, cfg1.feedDir, 2, append = true)
    val cfg2 = cfg1.copy(payloadSchema = v2Payload)
    CdcRunner.runAvailableNow(spark, cfg2)

    val m = lake.manifest
    assert(m.currentSchemaId == schemaIdV1 + 1, "schema id bumped once")
    val names = m.currentSchema.fields.map(_.name)
    assert(names.contains("origin") && !names.contains("source"))
    assert(names.contains("lang"))
    assert(m.currentSchema.byName("n_tok").get.dataType == LongType)
    // old data files at schema v1 still referenced (no rewrite of untouched buckets
    // is not guaranteed here since zipf may touch all; check mixed-schema readability)
    val state = lake.read(spark)
    assert(state.schema("n_tok").dataType == LongType)
    assert(state.schema.fieldNames.contains("lang"))

    // oracle: fold v1+v2 with evolved semantics
    val allEvents = ev1
      .withColumnRenamed("source", "origin")
      .withColumn("n_tok", col("n_tok").cast(LongType))
      .withColumn("lang", lit(null).cast(StringType))
      .select("lsn", "op", "doc_id", "tokens", "n_tok", "origin", "lang")
      .unionAll(ev2.select("lsn", "op", "doc_id", "tokens", "n_tok", "origin", "lang"))
      .collect().toSeq
    case class D(tokens: List[Int], nTok: Option[Long], origin: Option[String], lang: Option[String])
    val expected = allEvents.sortBy(_.getAs[Long]("lsn")).foldLeft(Map.empty[String, D]) { (st, r) =>
      val id = r.getAs[String]("doc_id")
      r.getAs[String]("op") match {
        case "DELETE" => st - id
        case _ =>
          val toks = Option(r.getAs[scala.collection.Seq[Int]]("tokens")).map(_.toList).orNull
          val nTok = Option(r.getAs[Any]("n_tok")).map(_.asInstanceOf[Long])
          if (toks == null || !nTok.contains(toks.size.toLong)) st
          else st + (id -> D(toks, nTok, Option(r.getAs[String]("origin")),
            Option(r.getAs[String]("lang"))))
      }
    }
    val actual = state.collect().map { r =>
      r.getAs[String]("doc_id") -> D(
        Option(r.getAs[scala.collection.Seq[Int]]("tokens")).map(_.toList).orNull,
        Option(r.getAs[Any]("n_tok")).map(_.asInstanceOf[Long]),
        Option(r.getAs[String]("origin")), Option(r.getAs[String]("lang")))
    }.toMap
    assert(actual.keySet == expected.keySet)
    // v1-era rows: lang must read as null; v2-updated rows carry lang
    actual.foreach { case (k, d) => assert(d == expected(k), s"mismatch $k") }
    assert(actual.values.exists(_.lang.isEmpty), "some v1-era rows survive with null lang")
    assert(actual.values.exists(_.lang.nonEmpty), "some v2 rows carry lang")
  }
}
