package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.model._
import graft.runner._

/**
 * spark-submit entry — the reference's manager.py / ReplicationManager
 * (trempy/Replication/ReplicationManager.py:37-71) as a single Spark job:
 * parse the reference-shaped settings.json, optionally full-load a snapshot,
 * then tail the change feed into the lake.
 *
 * {{{
 * runMain graft.JobMain <settings.json> <feedDir> <lakeRoot> <checkpointDir>
 *   [--snapshot <parquetPath>]   // full-load source (replication_type includes full_load)
 *   [--payloads <payloads.json>] // per-table payload decl (multi-table feeds, and
 *                                // required for non-parquet --source wire formats):
 *                                // {"schema.table": {"keys": ["k"], "columns": {"c": "ddl"}}}
 *   [--source parquet|wal|envelope|kafka] // feed wire format (default parquet)
 *   [--brokers host:port --topic t]       // with --source kafka
 *   [--continuous]               // ProcessingTime trigger instead of AvailableNow
 * }}}
 *
 * start_mode=reload drops table+checkpoint and starts fresh; continue resumes
 * from the checkpoint (ReplicationStrategy.py:248-270).
 *
 * Training-data ops mode — the dedup/ANN/text/multimodal family without
 * writing Scala (the CDC rules have had this since round 2 via settings.json):
 * {{{
 * runMain graft.JobMain --op <name> --in <parquet> --out <parquet>
 *   [--queries <parquet>]       // ANN query side (default: --in, self-query)
 *   [--config <json>]           // op parameters, e.g. {"threshold": 0.8}
 * // ops: dedup_exact | dedup_minhash | dedup_simhash | dedup_embedding |
 * //      ann_bruteforce | ann_lsh | ann_ivf | text_stats | multimodal_features
 * }}}
 *
 * Maintenance mode — the table-lifecycle runbooks (rescale, compaction,
 * vacuum, audit) and the dead-letter drain (reference: dlx.py:1-13) without
 * writing Scala; each verb writes a small report frame to `--out`:
 * {{{
 * runMain graft.JobMain --op <verb> --table <lakeDir> --out <parquet> [--config <json>]
 * // verbs (config keys):
 * //   compact           {max_files_per_bucket, max_delta_files, drop_tombstones_below}
 * //   vacuum            {keep_versions, keep_committed_since_ms}
 * //   rescale           {buckets}               // default: 2× current
 * //   split_buckets     {max_groups}            // bounded migration step
 * //   rewrite_manifests {}                      // fold fragment list to one
 * //   remove_orphans    {older_than_ms}         // GC crashed-epoch files
 * //   delivery_gap      {schema_name, table_name} // + --in <feedDir>:
 * //                     producer page manifests vs events_received audit
 * //   reconcile         {}                      // lineage-vs-manifest audit
 * //   quarantine_list   {epoch?}                // browse rows + reasons
 * //   quarantine_replay {epoch, attempt?, merge?} // re-drive one epoch's DLX
 * //   quarantine_clear  {epoch}                 // drop a drained epoch's rows
 * //   read              {version?}              // consumer bootstrap (time travel)
 * //   change_log        {from, to?}             // incremental CDC-out (from, to]
 * //   jdbc_apply        {url, target_table, from, to?, keys?, columns?,
 * //                      properties?, batch_size?} // lake → database sync
 * //   lake_sync         {merge?, buckets?}      // lake → lake replication:
 * //                     --in <sourceLakeDir> --table <targetLakeDir>; creates
 * //                     + bootstraps the mirror, then each run syncs the
 * //                     window since its exactly-once stored cursor
 * }}}
 */
object JobMain {

  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmt: Formats = DefaultFormats

  /** `--flag value` lookup with a loud error when the value is missing
    * (a flag as the last argument would otherwise throw a bare
    * IndexOutOfBoundsException). */
  private def optArg(args: Seq[String], flag: String): Option[String] =
    args.indexOf(flag) match {
      case -1 => None
      case i =>
        require(i + 1 < args.length, s"$flag needs a value")
        Some(args(i + 1))
    }

  /** Op-parameter JSON → typed lookups with defaults. Absent key → default;
    * PRESENT key of the wrong JSON type → loud error naming the key
    * (extractOpt alone swallows the type mismatch to None, silently running
    * the op with the default — `{"bits": "64"}` ignoring the user's value is
    * exactly the quiet-config-drift this CLI's settings parser refuses). */
  private final class OpConf(j: JValue) {
    private def get[A: Manifest](k: String, want: String): Option[A] =
      (j \ k) match {
        case JNothing => None
        case v => Some(v.extractOpt[A].getOrElse(throw new IllegalArgumentException(
          s"""config key "$k": expected $want, got ${JsonMethods.compact(JsonMethods.render(v))}""")))
      }
    def str(k: String, d: String): String = get[String](k, "a string").getOrElse(d)
    def int(k: String, d: Int): Int = get[Int](k, "an integer").getOrElse(d)
    def dbl(k: String, d: Double): Double = get[Double](k, "a number").getOrElse(d)
    def bool(k: String, d: Boolean): Boolean = get[Boolean](k, "a boolean").getOrElse(d)
    def boolOpt(k: String): Option[Boolean] = get[Boolean](k, "a boolean")
    def lng(k: String, d: Long): Long = get[Long](k, "an integer").getOrElse(d)
    def lngOpt(k: String): Option[Long] = get[Long](k, "an integer")
    def strSeq(k: String): Seq[String] = (j \ k) match {
      case JArray(vs) => vs.map(_.extract[String])
      case JNothing   => Nil
      case v => throw new IllegalArgumentException(
        s"""config key "$k": expected an array of strings, got ${JsonMethods.compact(JsonMethods.render(v))}""")
    }
    def strMap(k: String): Map[String, String] = (j \ k) match {
      case JObject(kvs) => kvs.map {
        case (n, JString(v)) => n -> v
        case (n, v) => throw new IllegalArgumentException(
          s"""config key "$k.$n": expected a string, got ${JsonMethods.compact(JsonMethods.render(v))}""")
      }.toMap
      case JNothing => Map.empty
      case v => throw new IllegalArgumentException(
        s"""config key "$k": expected an object of strings, got ${JsonMethods.compact(JsonMethods.render(v))}""")
    }
    /** A config version number as Int, range-checked like the SQL TVF's
      * intArg — a bare .toInt would silently WRAP 2^32+1 to 1 and time-travel
      * to the wrong snapshot. */
    def version(k: String, d: => Long): Int = {
      val v = lngOpt(k).getOrElse(d) // by-name default: a loud-throw default
                                     // must only fire when the key is absent
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"""config key "$k": $v is out of the snapshot-version range""")
      v.toInt
    }
  }

  /** `--config <json>` → [[OpConf]] (empty object when the flag is absent). */
  private def opConf(args: Seq[String]): OpConf =
    new OpConf(optArg(args, "--config") match {
      case Some(p) => JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
      case None => JObject()
    })

  /** Ops that act on a lake table (`--table <lakeDir>`) instead of a parquet
    * input — the maintenance/DLX lifecycle verbs plus the read-side pair a
    * downstream consumer needs (snapshot read + incremental change feed). */
  private val maintenanceOps = Set("compact", "vacuum", "rescale", "split_buckets",
    "rewrite_manifests", "remove_orphans", "delivery_gap",
    "reconcile", "quarantine_list", "quarantine_replay", "quarantine_clear",
    "read", "change_log", "jdbc_apply")

  /**
   * Maintenance + DLX verbs over a lake table — the reference drives its whole
   * lifecycle from settings.json + processes (manager.py, dlx.py:1-13); this
   * is the equivalent no-code surface for the engine's runbooks (rescale,
   * compaction, vacuum, audit, dead-letter drain). Each verb returns a small
   * report frame so `--out` lands an auditable artifact.
   */
  private def runMaintenanceOp(
      spark: SparkSession, op: String, args: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def opt(flag: String): Option[String] = optArg(args, flag)
    val tableDir = opt("--table").getOrElse(throw new IllegalArgumentException(
      s"--op $op needs --table <lakeDir>"))
    val lake = new graft.lake.LakeTable(tableDir)
    val c = opConf(args)
    def manifestReport(m: graft.lake.Manifest) =
      Seq((m.version, m.buckets, m.files.size, m.files.count(_.isDelta),
        m.files.map(_.spec).distinct.sorted.mkString(","), m.committedEpochCount))
        .toDF("version", "buckets", "files", "delta_files", "specs", "committed_epochs")
    op match {
      case "compact" =>
        manifestReport(lake.compact(spark,
          maxFilesPerBucket = c.int("max_files_per_bucket", 4),
          maxDeltaFiles = c.int("max_delta_files", 4),
          dropTombstonesBelow = c.lngOpt("drop_tombstones_below")))
      case "vacuum" =>
        lake.vacuum(
          keepVersions = c.int("keep_versions", 2),
          keepCommittedSinceMs = c.lngOpt("keep_committed_since_ms"))
          .toDF("deleted_path")
      case "rescale" =>
        manifestReport(lake.rescale(c.int("buckets",
          lake.manifest.buckets * 2)))
      case "split_buckets" =>
        manifestReport(lake.splitBuckets(spark,
          maxGroups = c.int("max_groups", Int.MaxValue)))
      case "rewrite_manifests" =>
        // fold the fragment list to one without touching data — bounds
        // reader-side fold cost between compactions (metadata-only commit)
        manifestReport(lake.rewriteManifests())
      case "remove_orphans" =>
        // GC data files no kept snapshot references (crashed epochs). The
        // age horizon is MANDATORY: an in-flight epoch write is also
        // unreferenced until its commit, so the caller must assert a horizon
        // comfortably above the longest epoch write
        val horizon = c.lngOpt("older_than_ms").getOrElse(
          throw new IllegalArgumentException(
            "--op remove_orphans needs config {\"older_than_ms\": N} — the " +
              "safety horizon above your longest epoch write (e.g. 86400000)"))
        lake.removeOrphans(horizon).toDF("deleted_path")
      case "delivery_gap" =>
        // producer-vs-consumer audit: summed page manifests on the bus minus
        // the table's cumulative events_received — a page dropped in transit
        // (invisible to consumer-side lineage) surfaces as a positive gap
        val feedDir = opt("--in").getOrElse(throw new IllegalArgumentException(
          "--op delivery_gap needs --in <feedDir> (the envelope bus)"))
        val sn = c.str("schema_name", "")
        val tn = c.str("table_name", "")
        require(sn.nonEmpty && tn.nonEmpty, "--op delivery_gap needs config " +
          """{"schema_name": "s", "table_name": "t"} (the published table id)""")
        val gap = graft.feed.EnvelopeSource.deliveryGap(lake, feedDir, sn, tn)
        Seq((gap.isDefined, gap.getOrElse(-1L), gap.contains(0L)))
          .toDF("producer_manifests_found", "gap_events", "clean")
      case "reconcile" =>
        val r = lake.reconcile()
        Seq((r.ok, r.missingLineage.mkString(","),
          r.mismatchedMetrics.toSeq.sortBy(_._1).map { case (k, (mf, ln)) =>
            s"$k:manifest=$mf,lineage=$ln"
          }.mkString(";")))
          .toDF("ok", "missing_lineage_epochs", "mismatched_metrics")
      case "quarantine_list" =>
        lake.quarantine(spark, c.lngOpt("epoch"))
      case "quarantine_clear" =>
        val epoch = c.lngOpt("epoch").getOrElse(throw new IllegalArgumentException(
          "--op quarantine_clear needs config {\"epoch\": N} — clearing is " +
            "an explicit per-epoch acknowledgement, never a sweep"))
        lake.clearQuarantine(epoch).toDF("deleted_path")
      case "read" =>
        // the consumer bootstrap: current state, or as-of a snapshot version
        if (c.lngOpt("version").isEmpty) lake.read(spark)
        else lake.readVersion(spark,
          c.version("version", sys.error("unreachable: key checked present")))
      case "change_log" =>
        // the consumer's incremental sync: changes in (from, to]; `to`
        // defaults to the current version so a cron'd sync passes only the
        // version it last saw
        val from = c.version("from", throw new IllegalArgumentException(
          "--op change_log needs config {\"from\": <last synced version>}"))
        lake.changeLog(spark, from, c.version("to", lake.currentVersion.toLong))
      case "jdbc_apply" =>
        // incremental lake → database sync: a changeLog window applied to a
        // keyed JDBC target with LWW delete+insert pages (the reference's
        // replication direction, batched). Bootstrap the target once with
        // `--op read` + a full load; a first window of (1, to] substitutes
        // for the bootstrap ONLY on CDC-only tables — the change feed
        // excludes the initial snapshot (epoch -1) by contract, so a
        // full-loaded table synced from version 1 would silently miss every
        // row the snapshot alone contributed (guarded below).
        import org.apache.spark.sql.functions.col
        // same guard LakeSync.sync enforces: an SCD2 table's change rows are
        // VERSION rows — collapsing them per natural key would silently write
        // "latest version per key" to the target instead of the history
        require(lake.manifest.tableMode != graft.lake.Manifest.SCD2,
          "jdbc_apply follows the row-level LWW change feed; this table is " +
            "tableMode=scd2, whose change rows are version rows, not row " +
            "states — export the history with --op read + a bulk load, or " +
            "sync the LWW table upstream of it instead")
        val url = c.str("url", "")
        require(url.nonEmpty, "--op jdbc_apply needs config {\"url\": \"jdbc:...\"}")
        val conn = graft.feed.JdbcEndpoint.Conn(url, c.strMap("properties"))
        val target = c.str("target_table", "")
        require(target.nonEmpty, "--op jdbc_apply needs config {\"target_table\": \"T\"}")
        val keys = c.strSeq("keys") match {
          case Nil => lake.manifest.keyCols
          case ks  => ks
        }
        val from = c.version("from", throw new IllegalArgumentException(
          "--op jdbc_apply needs config {\"from\": <last synced version>}"))
        val to = c.version("to", lake.currentVersion.toLong)
        require(from > 1 || !lake.manifest.isCommittedEpoch(-1L) ||
          c.bool("target_bootstrapped", false),
          "jdbc_apply from version 1 on a FULL-LOADED table: the change feed " +
            "excludes the initial snapshot, so rows only the snapshot " +
            "contributed would be silently missing from the target. Bootstrap " +
            "the target first (--op read + a bulk load), then sync from the " +
            "bootstrapped version — or pass {\"target_bootstrapped\": true} " +
            "to confirm the target already holds the snapshot")
        val changes0 = lake.changeLog(spark, from, to)
        // JDBC targets have no array type: the payload must be scalar. Fail
        // with the offending columns rather than silently dropping data —
        // declare the projection via config {"columns": [...]}.
        val payload = c.strSeq("columns") match {
          case Nil => changes0.schema.fields.filterNot(_.name.startsWith("_"))
            .map(_.name).toSeq
          case cs  => cs
        }
        val unmappable = payload.filter(n =>
          changes0.schema(n).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        require(unmappable.isEmpty,
          s"jdbc_apply: column(s) ${unmappable.mkString(", ")} are arrays — JDBC " +
            "targets need scalars; pass config {\"columns\": [...]} selecting " +
            "the scalar payload")
        val changes = changes0.select((payload ++ Seq("_lsn", "_deleted")).map(col): _*)
        graft.feed.JdbcEndpoint.ensureTable(conn, target,
          org.apache.spark.sql.types.StructType(
            payload.map(n => changes.schema(n)).toArray), keys)
        graft.feed.JdbcEndpoint.applyChanges(changes, conn, target, keys,
          c.int("batch_size", 10000))
        Seq((from, to, keys.mkString(","), target))
          .toDF("from_version", "to_version", "keys", "target_table")
      case "quarantine_replay" =>
        // the merge config is re-derived from the table's own manifest (mode,
        // keys, scd columns, delta history): a merge-on-read table drained
        // with a copy-on-write default would commit a sidecar-less BASE
        // epoch that wedges every changeLog window spanning it — the default
        // follows the table's storage evidence (deltaHistory is sticky, so a
        // momentarily fully-compacted MoR table still defaults right)
        val m = lake.manifest
        val epoch = c.lngOpt("epoch").getOrElse(throw new IllegalArgumentException(
          "--op quarantine_replay needs config {\"epoch\": N}"))
        val cfg = JobConfig(
          mode = if (m.tableMode == graft.lake.Manifest.SCD2) CdcMode.Scd2
                 else CdcMode.Upsert,
          merge = MergeStrategy.parse(c.str("merge", m.defaultMergeStrategy)),
          keyCols = m.keyCols,
          scdCols = m.scdCols match {
            case Seq(s, e, cur) => ScdCols(s, e, cur)
            case _              => ScdCols()
          },
          // default from the table's own on-disk evidence: a drain on a
          // feed-recording table MUST write the replay epoch's sidecar, or
          // every changeLog window spanning it throws forever after
          changeFeed = c.bool("change_feed", lake.recordsChangeFeed))
        // the manifest does NOT store filter/transform rules, and RAW-epoch
        // rows quarantine PRE-transform: a drain without the job's rule
        // pipeline re-drives RAW rows (renamed columns null-fill, filtered
        // rows apply). --settings <the task's settings.json> restores them.
        // Safe to pass unconditionally: POST-transform quarantine epochs
        // (marker file / the 2^39 band / the full-load sentinel −1, whose
        // snapshot rows also ran the pipeline before their key check) strip
        // the rules inside replayQuarantine — their rows already carry the
        // pipeline's output, and re-running it would double-apply modifiers.
        val cfgRules = opt("--settings").map { sp =>
          val parsed = TaskSettings.parse(new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sp))))
          val tr = parsed.tables match {
            case Seq(one) => one
            case many =>
              val want = c.str("table_rules", "")
              many.find(_.id == want).getOrElse(throw new IllegalArgumentException(
                s"--settings declares ${many.size} tables " +
                  s"(${many.map(_.id).mkString(", ")}): pick one via config " +
                  "{\"table_rules\": \"schema.table\"}"))
          }
          cfg.copy(filters = tr.filters, transforms = tr.transforms)
        }.getOrElse(cfg)
        val r = graft.apply.MergeApply.replayQuarantine(
          spark, lake, epoch, cfgRules, attempt = c.int("attempt", 0))
        Seq((r.epoch, r.skipped,
          r.metrics.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")))
          .toDF("replay_epoch", "skipped", "metrics")
      case other => throw new IllegalArgumentException(s"unknown maintenance op '$other'")
    }
  }

  /**
   * Run one training-data op from CLI-shaped arguments; returns the result
   * frame (written to `--out` by [[main]], left unwritten here so tests can
   * drive the exact CLI surface without a filesystem round-trip).
   */
  def runOp(spark: SparkSession, args: Seq[String]): org.apache.spark.sql.DataFrame = {
    def opt(flag: String): Option[String] = optArg(args, flag)
    val op = opt("--op").getOrElse(throw new IllegalArgumentException("--op missing"))
    if (op == "sql") {
      // free-form SQL over the lake's table functions (graft_table /
      // graft_changes / graft_quarantine) + the native kernels — the
      // engine's whole read surface from one verb, no Scala, no --table:
      // the TVF arguments name the lake dirs inside the statement itself
      GraftExtensions.register(spark)
      val stmt = opt("--sql")
        .orElse(opt("--sql-file").map(p => new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))))
        .getOrElse(throw new IllegalArgumentException(
          "--op sql needs --sql \"<statement>\" or --sql-file <path>"))
      return spark.sql(stmt)
    }
    if (op == "lake_sync") {
      // lake → lake incremental replication: --in names the UPSTREAM lake,
      // --table the downstream mirror (created + bootstrapped on first run);
      // config {merge: "cow"|"mor", buckets: N} shapes the target table
      import spark.implicits._
      val src = opt("--in").getOrElse(throw new IllegalArgumentException(
        "--op lake_sync needs --in <sourceLakeDir>"))
      val tgt = opt("--table").getOrElse(throw new IllegalArgumentException(
        "--op lake_sync needs --table <targetLakeDir>"))
      val c = opConf(args)
      // MergeStrategy.parse, not a hand-rolled match: a fallback-to-CoW
      // default would silently map the canonical "merge_on_read" spelling
      // (and any typo) to a copy-on-write mirror
      val merge = graft.model.MergeStrategy.parse(c.str("merge", "cow"))
      val r = graft.lake.LakeSync.sync(spark, src, tgt, merge,
        buckets = c.lngOpt("buckets").map(_.toInt),
        changeFeed = c.boolOpt("change_feed"))
      return Seq((r.fromVersion, r.toVersion, r.epoch, r.rows, r.bootstrapped))
        .toDF("from_version", "to_version", "epoch", "rows", "bootstrapped")
    }
    if (maintenanceOps.contains(op)) return runMaintenanceOp(spark, op, args)
    val in = opt("--in").getOrElse(throw new IllegalArgumentException(
      s"--op $op needs --in <parquet>"))
    val df = spark.read.parquet(in)
    val queries = opt("--queries").map(spark.read.parquet).getOrElse(df)
    val c = opConf(args)
    import graft.ops._
    val textCol = c.str("text_col", "text")
    val idCol = c.str("id_col", "doc_id")
    val vecCol = c.str("vec_col", "embedding")
    val vecId = c.str("id_col", "vec_id")
    val k = c.int("k", 10)
    // self-match exclusion is only valid when queries and corpus are the SAME
    // table (Similarity.notSelf contract): with a distinct --queries table,
    // dropping the corpus row that happens to share a query's id would
    // silently eat a legitimate top-k hit. Overridable via config.
    val excludeSelf = c.bool("exclude_self", opt("--queries").isEmpty)
    op match {
      case "dedup_exact" => Dedup.exact(df, textCol, idCol)
      case "dedup_minhash" =>
        Dedup.minhashNearDups(df, c.dbl("threshold", 0.8), textCol, idCol)
      case "dedup_simhash" =>
        Dedup.simhashExactDups(df, c.int("max_hamming", 3), c.int("bits", 32),
          c.int("bands", 4), textCol, idCol)
      case "dedup_embedding" =>
        Dedup.embeddingNearDups(df, c.dbl("threshold", 0.95), vecCol, vecId)
      case "ann_bruteforce" =>
        Similarity.bruteForceTopK(queries, df, k, vecCol, vecId, excludeSelf)
      case "ann_lsh" =>
        Similarity.lshTopK(queries, df, k, c.int("planes", 6), vecCol, vecId, excludeSelf)
      case "ann_ivf" =>
        Similarity.ivfTopK(queries, df, k, c.int("cells", 16), c.int("probes", 2),
          c.int("iters", 2), vecCol, vecId, excludeSelf)
      case "text_stats" => TextAnalysis.stats(df, textCol, idCol)
      case "multimodal_features" =>
        Multimodal.decodeFeatures(df, c.int("frame_count", 8), c.int("partitions", 0))
      case other => throw new IllegalArgumentException(
        s"unknown --op '$other' (dedup_exact | dedup_minhash | dedup_simhash | " +
          "dedup_embedding | ann_bruteforce | ann_lsh | ann_ivf | text_stats | " +
          "multimodal_features; maintenance, with --table: compact | vacuum | " +
          "rescale | split_buckets | rewrite_manifests | remove_orphans | " +
          "delivery_gap | reconcile | quarantine_list | quarantine_replay | " +
          "quarantine_clear | read | change_log | jdbc_apply | lake_sync | sql)")
    }
  }

  private def parsePayloads(path: String): Map[String, MultiTableRunner.TablePayload] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))) match {
      case JObject(tables) => tables.map { case (id, spec) =>
        val keys = (spec \ "keys").extract[Seq[String]]
        val cols = (spec \ "columns") match {
          case JObject(cs) => cs.map { case (n, t) =>
            StructField(n, DataType.fromDDL(t.extract[String]))
          }
          case _ => Nil
        }
        id -> MultiTableRunner.TablePayload(StructType(cols), keys)
      }.toMap
      case _ => Map.empty
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--op")) {
      def opt(flag: String): Option[String] = optArg(args.toSeq, flag)
      val out = opt("--out").getOrElse(throw new IllegalArgumentException(
        "--op needs --out <parquet>"))
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
        .appName(s"graft-op-${opt("--op").getOrElse("?")}")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val result = runOp(spark, args.toSeq)
      result.write.mode("overwrite").parquet(out)
      println(s"[op] ${opt("--op").get} rows=${spark.read.parquet(out).count()} out=$out")
      spark.stop()
      return
    }
    require(args.length >= 4,
      "usage: JobMain <settings.json> <feedDir> <lakeRoot> <checkpointDir> " +
        "[--snapshot p] [--payloads p] [--continuous] | " +
        "JobMain --op <name> --in <parquet> --out <parquet> [--config <json>]")
    val Array(settingsPath, feedDir, lakeRoot, checkpointDir) = args.take(4)
    def opt(flag: String): Option[String] = optArg(args.toSeq, flag)
    val continuous = args.contains("--continuous")

    val settings = TaskSettings.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(settingsPath))))
    val reload = settings.startMode == "reload"

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName(s"graft-${settings.taskName}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"[job] task=${settings.taskName} type=${settings.replicationType} " +
      s"mode=${settings.cdcMode} start=${settings.startMode} tables=${settings.tables.map(_.id)}")

    // wire format first: --payloads means "multi-table parquet feed" ONLY for
    // the parquet source — for wal/envelope/kafka it is the payload
    // DECLARATION the single-table wire parse needs
    val sourceKindTop = opt("--source").getOrElse("parquet")
    opt("--payloads") match {
      case Some(p) if sourceKindTop == "parquet" =>
        // multi-table: one feed routed per table in priority order
        val cfg = MultiTableRunner.Config(
          feedDir, lakeRoot, checkpointDir, settings, parsePayloads(p))
        if (reload) {
          CdcRunner.deleteRecursively(new java.io.File(lakeRoot))
          CdcRunner.deleteRecursively(new java.io.File(checkpointDir))
        }
        val jobs = MultiTableRunner.ensureTables(spark, cfg)
        // replication_type is honored like the single-table branch: the
        // composite's full load commits for EVERY table before CDC starts
        // (reference CompositeReplicationStrategy.py:8), and a pure
        // full_load task never tails the feed
        if (settings.replicationType.startsWith("full_load")) {
          // a missing --snapshot must fail fast: an Option.foreach here
          // silently skipped the load and CDC tailed a base-less table
          val snap = opt("--snapshot").getOrElse(throw new IllegalArgumentException(
            s"replication_type=${settings.replicationType} requires " +
              "--snapshot <parquet> (the full-load source)"))
          MultiTableRunner.fullLoad(spark, jobs, spark.read.parquet(snap))
        }
        if (settings.replicationType != "full_load") {
          val q = MultiTableRunner.startJobs(spark, cfg, jobs,
            availableNow = !continuous)
          q.awaitTermination()
        }
      case _ =>
        // single-table: payload inferred from the feed files themselves.
        // Refuse a multi-table settings.json here — silently merging only
        // tables.head would DROP the other tables' events with no hint
        require(settings.tables.size <= 1,
          s"settings.json declares ${settings.tables.size} tables " +
            s"(${settings.tables.map(_.id).mkString(", ")}): multi-table routing " +
            "needs --payloads (parquet feeds); wire-format sources run one job per table")
        val table = settings.tables.headOption.getOrElse(
          throw new IllegalArgumentException("settings.json declares no tables"))
        val sourceKind = sourceKindTop
        // parquet change-event feeds carry their payload schema; wire-format
        // feeds (wal/envelope/kafka) parse from text, so the payload must be
        // DECLARED via --payloads (the base/v1 schema when a registry evolves it)
        val (payload, payloadDeclKeys) = sourceKind match {
          case "parquet" =>
            val envelope = ChangeEvent.envelopeFields.map(_.name).toSet
            val feedSchema = spark.read.parquet(feedDir).schema
            (StructType(feedSchema.fields.filterNot(f => envelope.contains(f.name))), Nil)
          case _ =>
            val decls = opt("--payloads").map(parsePayloads).getOrElse(
              throw new IllegalArgumentException(
                s"--source $sourceKind needs --payloads with an entry for ${table.id}"))
            val tp = decls.getOrElse(table.id, throw new IllegalArgumentException(
              s"--payloads has no entry for ${table.id}"))
            (tp.schema, tp.keyCols)
        }
        // the merge key must be DECLARED, never guessed from column position:
        // --keys flag > payload decl > add_primary_key transformation > the
        // doc_id convention column if present; otherwise fail fast (a wrong
        // key would silently produce a wrong final state)
        val declaredKeys = table.transforms
          .collect { case graft.rules.AddPrimaryKey(cols, _) => cols }.flatten
        val keyCols = opt("--keys").map(_.split(",").toSeq.map(_.trim))
          .orElse(Option(payloadDeclKeys).filter(_.nonEmpty))
          .orElse(Option(declaredKeys).filter(_.nonEmpty))
          .getOrElse {
            if (payload.fieldNames.contains(ChangeEvent.DOC_ID)) Seq(ChangeEvent.DOC_ID)
            else throw new IllegalArgumentException(
              s"no merge key declared for ${table.id}: add an add_primary_key " +
                "transformation in settings.json or pass --keys c1[,c2]")
          }
        keyCols.foreach(k => require(payload.fieldNames.contains(k),
          s"declared merge key '$k' is not a feed payload column"))
        val cfg = RunnerConfig(
          feedDir, s"$lakeRoot/${table.id}", checkpointDir,
          job = JobConfig(
            mode = settings.cdcMode,
            merge = settings.mergeStrategy,
            keyCols = keyCols,
            buckets = settings.buckets,
            filters = table.filters,
            transforms = table.transforms,
            errorPolicy = settings.errorPolicy,
            scdCols = settings.scdCols,
            changeFeed = settings.changeFeed),
          payloadSchema = payload,
          schemaRegistry = settings.schemaRegistry,
          autoCompactEveryEpochs = settings.autoCompactEveryEpochs,
          autoCompactMaxDeltaFiles = settings.autoCompactMaxDeltaFiles,
          autoRescaleBytesPerBucket = settings.autoRescaleBytesPerBucket,
          autoRescaleMaxGroups = settings.autoRescaleMaxGroups,
          walOrphanEpochs = settings.walOrphanEpochs)
        val lake = CdcRunner.ensureTable(spark, cfg, reload = reload)
        if (settings.replicationType.startsWith("full_load")) {
          val snap = opt("--snapshot").getOrElse(throw new IllegalArgumentException(
            s"replication_type=${settings.replicationType} requires " +
              "--snapshot <parquet> (the full-load source)"))
          CdcRunner.fullLoad(spark, lake, spark.read.parquet(snap), cfg)
        }
        // composite ordering (CompositeReplicationStrategy.py:8): the full load
        // above completes before CDC starts tailing
        if (settings.replicationType != "full_load") {
          // --source selects the wire format of the feed: parquet change-event
          // files (default), test_decoding WAL text lines, envelope-JSON bus
          // files, or a Kafka topic of envelope messages
          val q = sourceKind match {
            case "parquet" =>
              CdcRunner.start(spark, cfg, availableNow = !continuous,
                intervalSeconds = settings.intervalSeconds)
            case "wal" =>
              CdcRunner.startFromWal(spark, cfg, table.schemaName, table.tableName,
                availableNow = !continuous, intervalSeconds = settings.intervalSeconds)
            case "envelope" =>
              CdcRunner.startFromEnvelopes(spark, cfg, table.schemaName, table.tableName,
                availableNow = !continuous, intervalSeconds = settings.intervalSeconds)
            case "kafka" =>
              CdcRunner.startFromKafka(spark, cfg,
                brokers = opt("--brokers").getOrElse(throw new IllegalArgumentException(
                  "--source kafka needs --brokers host:port")),
                topic = opt("--topic").getOrElse(throw new IllegalArgumentException(
                  "--source kafka needs --topic name")),
                schemaName = table.schemaName, tableName = table.tableName,
                availableNow = !continuous, intervalSeconds = settings.intervalSeconds)
            case other => throw new IllegalArgumentException(
              s"unknown --source '$other' (parquet | wal | envelope | kafka)")
          }
          q.awaitTermination()
        }
        val m = lake.manifest
        println(s"[job] done: snapshot v${m.version} " +
          s"epochs=${m.committedEpochCount} metrics=${m.metrics.toList.sortBy(_._1)}")
    }
    spark.stop()
  }
}
