package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/** The bulk-batch LWW winner pre-filter (bloom over winner (keys, lsn)
  * hashes) must land the EXACT same lake state as the one-pass reduction —
  * including deletes, out-of-order LSNs and hot keys — because the true
  * winner always probes true and carries its key's maximal LSN. */
class LwwPrefilterSpec extends SparkSpec {

  private val PROP = "graft.lww.prefilter.minInputBytes"

  private def runOnce(root: String, feed: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table",
      checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4))
    graft.feed.ChangeFeed.writeFeed(feed, cfg.feedDir, nFiles = 3)
    val lake = CdcRunner.ensureTable(spark, cfg)
    // file-backed batch, exactly the foreachBatch shape
    val batch = spark.read.schema(CdcRunner.eventSchema(cfg)).parquet(cfg.feedDir)
    graft.apply.MergeApply.applyBatch(spark, lake, batch, 0L, cfg.job)
    lake.read(spark)
      .select(col("doc_id"), col("n_tok"), col("source"),
        array_join(col("tokens").cast("array<string>"), ",").as("t"))
      .collect().map(_.toString).sorted.toSeq
  }

  test("prefiltered bulk reduce == one-pass reduce, exact state") {
    // zipf-hot keys, ~29% deletes, out-of-order arrival (lsn order != file
    // order is already exercised by writeFeed's range partitioning)
    val feed = graft.feed.ChangeFeed.events(spark, graft.feed.ChangeFeed.FeedSpec(
      nEvents = 60000, nDocs = 5000, zipf = 1.0, maxTok = 16))
    val base = runOnce(tmpDir("graft-lwwpre-off"), feed)
    val old = sys.props.get(PROP)
    sys.props(PROP) = "1" // force the pre-filter on for any input size
    try {
      val fired0 = graft.apply.MergeApply.prefilterFired.get()
      val pre = runOnce(tmpDir("graft-lwwpre-on"), feed)
      // the equality below is vacuous unless the prefiltered path actually RAN
      assert(graft.apply.MergeApply.prefilterFired.get() > fired0,
        "forced pre-filter did not fire — the gate lost its size evidence")
      assert(pre == base, s"prefiltered state diverged: ${pre.size} vs ${base.size} rows")
      assert(base.nonEmpty)
    } finally {
      old match { case Some(v) => sys.props(PROP) = v
                  case None => sys.props.remove(PROP): Unit }
    }
  }
}
