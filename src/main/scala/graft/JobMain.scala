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
 *   [--payloads <payloads.json>] // per-table payload decl for multi-table feeds:
 *                                // {"schema.table": {"keys": ["k"], "columns": {"c": "ddl"}}}
 *   [--continuous]               // ProcessingTime trigger instead of AvailableNow
 * }}}
 *
 * start_mode=reload drops table+checkpoint and starts fresh; continue resumes
 * from the checkpoint (ReplicationStrategy.py:248-270).
 */
object JobMain {

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
    require(args.length >= 4,
      "usage: JobMain <settings.json> <feedDir> <lakeRoot> <checkpointDir> " +
        "[--snapshot p] [--payloads p] [--continuous]")
    val Array(settingsPath, feedDir, lakeRoot, checkpointDir) = args.take(4)
    def opt(flag: String): Option[String] =
      args.indexOf(flag) match { case -1 => None; case i => Some(args(i + 1)) }
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

    opt("--payloads") match {
      case Some(p) =>
        // multi-table: one feed routed per table in priority order
        val cfg = MultiTableRunner.Config(
          feedDir, lakeRoot, checkpointDir, settings, parsePayloads(p))
        if (reload) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit
          }
          rm(new java.io.File(lakeRoot)); rm(new java.io.File(checkpointDir))
        }
        val q = MultiTableRunner.start(spark, cfg, availableNow = !continuous)
        q.awaitTermination()
      case None =>
        // single-table: payload inferred from the feed files themselves
        val table = settings.tables.headOption.getOrElse(
          throw new IllegalArgumentException("settings.json declares no tables"))
        val envelope = ChangeEvent.envelopeFields.map(_.name).toSet
        val feedSchema = spark.read.parquet(feedDir).schema
        val payload = StructType(feedSchema.fields.filterNot(f => envelope.contains(f.name)))
        // the merge key must be DECLARED, never guessed from column position:
        // --keys flag > add_primary_key transformation > the doc_id convention
        // column if present; otherwise fail fast (a wrong key would silently
        // produce a wrong final state)
        val declaredKeys = table.transforms
          .collect { case graft.rules.AddPrimaryKey(cols, _) => cols }.flatten
        val keyCols = opt("--keys").map(_.split(",").toSeq.map(_.trim))
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
            filters = table.filters,
            transforms = table.transforms,
            errorPolicy = settings.errorPolicy,
            scdCols = settings.scdCols),
          payloadSchema = payload,
          schemaRegistry = settings.schemaRegistry)
        val lake = CdcRunner.ensureTable(spark, cfg, reload = reload)
        if (settings.replicationType.startsWith("full_load"))
          opt("--snapshot").foreach { snap =>
            CdcRunner.fullLoad(spark, lake, spark.read.parquet(snap), cfg)
          }
        // composite ordering (CompositeReplicationStrategy.py:8): the full load
        // above completes before CDC starts tailing
        if (settings.replicationType != "full_load") {
          val q = CdcRunner.start(spark, cfg, availableNow = !continuous,
            intervalSeconds = settings.intervalSeconds)
          q.awaitTermination()
        }
        val m = lake.manifest
        println(s"[job] done: snapshot v${m.version} " +
          s"epochs=${m.committedEpochCount} metrics=${m.metrics.toList.sortBy(_._1)}")
    }
    spark.stop()
  }
}
