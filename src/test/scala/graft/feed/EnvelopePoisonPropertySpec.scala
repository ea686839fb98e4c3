package graft.feed

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: ANY number of corrupt lines at ANY positions on the envelope
 * bus, split across ANY file boundaries, leave the merged state exactly
 * equal to a clean replay — every poison line quarantines as unknown_op
 * and is counted by the delivery audit; no batch crashes (the packed-LSN
 * budget guard used to raise_error on the marker row's NULL fields) and
 * nothing vanishes (the routing filter used to drop the NULL-route marker).
 */
class EnvelopePoisonPropertySpec extends SparkSpec {

  private val payload = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_tok",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("source",
      org.apache.spark.sql.types.StringType)))

  /** The corruption shapes a real bus produces: a publish cut mid-write, a
    * non-JSON frame, well-formed JSON that is not an envelope, an envelope
    * whose operations array is null (all four → the null-op marker row →
    * unknown_op), and an envelope with parseable operations but a missing
    * created_at (PERMISSIVE from_json keeps the row, the packed LSN nulls
    * out → null_lsn). The last shape used to raise_error in the budget
    * guard and re-crash the stream on every checkpoint replay. */
  private val poisonPool = Seq(
    """{"transaction_id": "t-9", "created""",
    "not json at all",
    "{}",
    """{"transaction_id":"x","created_at":1700000001,"batch_page":0,"operations":null}""",
    """{"transaction_id":"x","batch_page":0,"operations":[{"schema_name":"corpus",""" +
      """"table_name":"documents","operation":"INSERT","columns":[""" +
      """{"name":"doc_id","type":"varchar","value":"poisoned"}]}]}""",
    // parseable op, null ROUTE: unattributable — routed() nulls the op so the
    // merge quarantines it (payload+lsn intact) instead of merging it here
    """{"transaction_id":"x","created_at":1700000002,"batch_page":0,""" +
      """"operations":[{"operation":"INSERT","columns":[""" +
      """{"name":"doc_id","type":"varchar","value":"stray"}]}]}""")

  test("streamed poisoned bus == clean replay; every poison line quarantined " +
    "and counted, any corruption shape, any position, any file split") {
    val caseGen = for {
      nEvents <- Gen.choose(40, 120)
      k <- Gen.choose(1, 4)
      picks <- Gen.listOfN(4, Gen.choose(0, poisonPool.size - 1))
      positions <- Gen.listOfN(4, Gen.choose(0, 1000))
      cuts <- Gen.listOfN(3, Gen.choose(1, 50))
    } yield (nEvents, k, picks, positions, cuts)
    (1 to 3).foreach { i =>
      val (nEvents, k, picks, positions, cuts) =
        caseGen(Gen.Parameters.default, Seed(9900L + i)).get
      val root = tmpDir(s"graft-envpoisonprop-$i")
      val events = ChangeFeed.events(spark,
        ChangeFeed.FeedSpec(nEvents = nEvents, nDocs = 12))
        .select("lsn", "txn_id", "ts", "op", "schema_ver", "doc_id", "n_tok", "source")
      val clean = EnvelopeSource.toMessages(events, "corpus", "documents",
        batchSize = 16).collect().map(_.getString(0)).toVector
      var lines = clean
      (0 until k).foreach { j =>
        val pos = positions(j) % (lines.size + 1)
        lines = (lines.take(pos) :+ poisonPool(picks(j) % poisonPool.size)) ++
          lines.drop(pos)
      }
      // split into files at random cut points — batches deliberately NOT
      // message-aligned; a file can be poison-only (the all-bad-batch path)
      val bounds = (cuts.map(_ % math.max(lines.size - 1, 1)).filter(_ > 0)
        .distinct.sorted :+ lines.size).distinct
      import spark.implicits._
      (0 +: bounds).sliding(2).collect { case Seq(a, b) if b > a => lines.slice(a, b) }
        .foreach { chunk =>
          chunk.toDF("value").coalesce(1).write.mode("append").text(s"$root/bus")
        }
      val cfg = RunnerConfig(
        feedDir = s"$root/bus", tableDir = s"$root/table", checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
        payloadSchema = payload, maxFilesPerTrigger = 1)
      CdcRunner.startFromEnvelopes(spark, cfg, "corpus", "documents").awaitTermination()
      val lake = new graft.lake.LakeTable(cfg.tableDir)
      val streamed = lake.read(spark)
        .select("doc_id", "n_tok", "source").collect().map(_.toString).sorted

      // oracle: the SAME messages minus the poison, one batch, one merge
      val cfg2 = cfg.copy(tableDir = s"$root/table2", checkpointDir = s"$root/cp2")
      val lake2 = CdcRunner.ensureTable(spark, cfg2)
      graft.apply.MergeApply.applyBatch(spark, lake2,
        EnvelopeSource.parseForTable(clean.toDF("value"), payload,
          "corpus", "documents"),
        0L, cfg2.job)
      val oracle = lake2.read(spark)
        .select("doc_id", "n_tok", "source").collect().map(_.toString).sorted
      assert(streamed.sameElements(oracle),
        s"case $i (k=$k): poisoned state != clean replay")
      val q = lake.quarantine(spark).collect()
      assert(q.length == k, s"case $i: ${q.length} quarantined, want $k")
      assert(q.forall { r =>
        val reason = r.getAs[String](graft.apply.MergeApply.QUARANTINE_REASON)
        reason.startsWith("unknown_op") || reason.startsWith("null_lsn")
      }, q.mkString(";"))
      assert(lake.manifest.metrics("events_received") == nEvents + k,
        s"case $i: received ${lake.manifest.metrics("events_received")}, " +
          s"want ${nEvents + k}")
    }
  }
}
