package graft

import org.apache.spark.sql.SparkSession

import graft.feed.ChangeFeed
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * CLI demo / smoke entry: seed a token table, generate a change feed, run the
 * streaming CDC pipeline, print the resulting table + commit metrics.
 *
 * Usage: runMain graft.CdcDemo [workDir] [nDocs] [nEvents] [mode]
 */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val nDocs = if (args.length > 1) args(1).toLong else 20L
    val nEvents = if (args.length > 2) args(2).toLong else 100L
    val mode = if (args.length > 3) CdcMode.parse(args(3)) else CdcMode.Upsert

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cdc-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = RunnerConfig(
      feedDir = s"$workDir/feed", tableDir = s"$workDir/table",
      checkpointDir = s"$workDir/cp",
      job = JobConfig(mode = mode, buckets = 8))

    println(s"[demo] workDir=$workDir nDocs=$nDocs nEvents=$nEvents mode=$mode")
    // a re-run with the SAME args is the idempotence demo (checkpoint +
    // committed epochs make it a no-op). A re-run with DIFFERENT args would
    // be a silent lie: writeFeed reuses the same feed-NNNN names, the old
    // checkpoint has them marked processed, and the first run's table would
    // print as this run's result — so pin the args in a marker and refuse
    // loudly on mismatch.
    val marker = java.nio.file.Paths.get(workDir, ".demo-args")
    val argSig = s"$nDocs/$nEvents/$mode"
    if (java.nio.file.Files.exists(marker)) {
      val prev = java.nio.file.Files.readString(marker)
      require(prev == argSig,
        s"workDir $workDir was built with args $prev; re-running with " +
          s"$argSig would silently report the OLD run's table (the stream " +
          "checkpoint already processed those feed files) — delete the " +
          "workDir to start fresh")
    } else {
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.writeString(marker, argSig)
    }
    val seed = ChangeFeed.seedSnapshot(spark, nDocs)
    ChangeFeed.writeFeed(
      ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents, nDocs * 2, badPct = 3)),
      cfg.feedDir, nFiles = 4)

    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, seed, cfg)
    CdcRunner.runAvailableNow(spark, cfg)

    val state = lake.read(spark)
    println(s"[demo] final table rows=${state.count()}")
    state.orderBy("doc_id").show(10, truncate = 60)
    val m = lake.manifest
    println(s"[demo] snapshot v${m.version}, epochs=watermark ${m.epochWatermark} + ${m.recentEpochs.toList.sorted}")
    println(s"[demo] metrics=${m.metrics.toList.sortBy(_._1)}")
    spark.stop()
  }
}
