package graft.feed

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: ANY number of corrupt slot rows (NULL xid, NULL data, or both —
 * file sources do not enforce the raw shape's nullability) at ANY positions
 * in the WAL feed, split across ANY file boundaries — including
 * mid-transaction cuts the pending stash must bridge — leave the merged
 * state exactly equal to a clean replay, with every corrupt row quarantined
 * EXACTLY ONCE (the stash must neither carry it forever nor re-quarantine a
 * fresh copy per epoch) and counted by the delivery audit.
 *
 * Companion to [[EnvelopePoisonPropertySpec]]: the two wires promise the
 * identical corruption contract (driver-oracled by q_source_envelope_poison
 * and q_source_wal_poison). Before the marker rows, both xid joins (the
 * parse's committed semi-join, the stash's anti-join) evaluated NULL ⇒ no
 * match: the line neither applied nor quarantined while the stash re-carried
 * it forever.
 */
class WalPoisonPropertySpec extends SparkSpec {

  private val payload = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_tok",
      org.apache.spark.sql.types.IntegerType)))

  private val nullableRaw =
    StructType(WalParser.rawSchema.fields.map(_.copy(nullable = true)))

  private case class Txn(xid: Long, keys: Seq[Int], committed: Boolean)

  private val txnGen: Gen[(Seq[Int], Boolean)] = for {
    n <- Gen.choose(1, 3)
    keys <- Gen.listOfN(n, Gen.choose(0, 9))
    committed <- Gen.frequency(9 -> true, 1 -> false)
  } yield (keys, committed)

  private def lines(txns: Seq[Txn]): Seq[Row] = {
    var lsn = 0L
    txns.flatMap { t =>
      val begin = { lsn += 1; Row(lsn, t.xid, s"BEGIN ${t.xid}") }
      val dml = t.keys.map { k =>
        lsn += 1
        Row(lsn, t.xid, "table corpus.documents: INSERT: doc_id[character " +
          f"varying]:'d-$k%03d' n_tok[integer]:${lsn % 7}")
      }
      val commit =
        if (t.committed) Seq({ lsn += 1; Row(lsn, t.xid, s"COMMIT ${t.xid}") })
        else Nil
      begin +: dml :++ commit
    }
  }

  /** The three corrupt shapes: null xid under parseable DML, null data under
    * a live xid, and both null. */
  private def corruptRow(j: Int, shape: Int): Row = shape % 3 match {
    case 0 => Row(100000L + j, null, "table corpus.documents: INSERT: " +
      s"doc_id[character varying]:'d-ghost-$j' n_tok[integer]:1")
    case 1 => Row(100000L + j, 500L + j, null)
    case _ => Row(100000L + j, null, null)
  }

  test("poisoned WAL feed == clean replay; every corrupt slot row " +
    "quarantined exactly once, any shape, any position, any file split") {
    val caseGen = for {
      txns <- Gen.listOfN(8, txnGen)
      k <- Gen.choose(1, 4)
      shapes <- Gen.listOfN(4, Gen.choose(0, 2))
      positions <- Gen.listOfN(4, Gen.choose(0, 1000))
      cuts <- Gen.listOfN(4, Gen.choose(1, 30))
    } yield (txns, k, shapes, positions, cuts)
    (1 to 3).foreach { i =>
      val (rawTxns, k, shapes, positions, cuts) =
        caseGen(Gen.Parameters.default, Seed(8800L + i)).get
      val txns = rawTxns.zipWithIndex.map { case ((ks, c), x) => Txn(100L + x, ks, c) }
      val clean = lines(txns)
      var all = clean
      (0 until k).foreach { j =>
        val pos = positions(j) % (all.size + 1)
        all = (all.take(pos) :+ corruptRow(j, shapes(j))) ++ all.drop(pos)
      }
      val root = tmpDir(s"graft-walpoisonprop-$i")
      val bounds = (cuts.map(_ % math.max(all.size - 1, 1)).filter(_ > 0)
        .distinct.sorted :+ all.size).distinct
      (0 +: bounds).sliding(2).collect { case Seq(a, b) if b > a => all.slice(a, b) }
        .foreach { chunk =>
          spark.createDataFrame(spark.sparkContext.parallelize(chunk, 1), nullableRaw)
            .coalesce(1).write.mode("append").parquet(s"$root/feed")
        }
      val cfg = RunnerConfig(
        feedDir = s"$root/feed", tableDir = s"$root/table",
        checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
        payloadSchema = payload, maxFilesPerTrigger = 1)
      CdcRunner.startFromWal(spark, cfg, "corpus", "documents").awaitTermination()
      val lake = new graft.lake.LakeTable(cfg.tableDir)
      val streamed = lake.read(spark)
        .select("doc_id", "n_tok").collect().map(_.toString).sorted

      // oracle: the CLEAN lines, one batch, one merge
      val oneBatch = WalParser.parseForTable(
        spark.createDataFrame(spark.sparkContext.parallelize(clean, 2),
          WalParser.rawSchema),
        payload, "corpus", "documents")
      val cfg2 = cfg.copy(tableDir = s"$root/table2", checkpointDir = s"$root/cp2")
      val lake2 = CdcRunner.ensureTable(spark, cfg2)
      graft.apply.MergeApply.applyBatch(spark, lake2, oneBatch, 0L, cfg2.job)
      val oracle = lake2.read(spark)
        .select("doc_id", "n_tok").collect().map(_.toString).sorted
      assert(streamed.sameElements(oracle),
        s"case $i (k=$k): poisoned state != clean replay")

      val q = lake.quarantine(spark).collect()
      assert(q.length == k,
        s"case $i: ${q.length} quarantined, want exactly $k (a stash " +
          s"re-carry would quarantine a fresh copy per epoch): ${q.mkString(";")}")
      assert(q.forall(_.getAs[String](graft.apply.MergeApply.QUARANTINE_REASON)
        .startsWith("unknown_op")), q.mkString(";"))
      // received = every committed DML (whenever its COMMIT finally arrived)
      // + each corrupt row once — the audit never double-counts a stashed line
      val expectReceived = oneBatch.count() + k
      assert(lake.manifest.metrics("events_received") == expectReceived,
        s"case $i: received ${lake.manifest.metrics("events_received")}, " +
          s"want $expectReceived")
    }
  }
}
