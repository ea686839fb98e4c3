package graft.feed

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: for ANY set of transactions and ANY split of their WAL lines
 * into feed files (micro-batches), the streamed parse+merge reaches the
 * same final state as parsing every line in one batch — i.e. the pending
 * stash makes transaction boundaries and batch boundaries fully
 * independent. Before the stash, a txn whose COMMIT landed in a later
 * batch lost its DML permanently.
 */
class WalStashPropertySpec extends SparkSpec {

  private val payload = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_tok",
      org.apache.spark.sql.types.IntegerType)))

  /** One txn: BEGIN, 1..3 DML lines on random keys, COMMIT (or, rarely, an
    * UNCOMMITTED tail — its rows must never apply). */
  private case class Txn(xid: Long, keys: Seq[Int], committed: Boolean)

  private val txnGen: Gen[(Seq[Int], Boolean)] = for {
    n <- Gen.choose(1, 3)
    keys <- Gen.listOfN(n, Gen.choose(0, 9))
    committed <- Gen.frequency(9 -> true, 1 -> false)
  } yield (keys, committed)

  private def lines(txns: Seq[Txn]): Seq[(Long, Long, String)] = {
    var lsn = 0L
    txns.flatMap { t =>
      val begin = { lsn += 1; (lsn, t.xid, s"BEGIN ${t.xid}") }
      val dml = t.keys.map { k =>
        lsn += 1
        (lsn, t.xid, "table corpus.documents: INSERT: doc_id[character " +
          f"varying]:'d-$k%03d' n_tok[integer]:${lsn % 7}")
      }
      val commit =
        if (t.committed) Seq({ lsn += 1; (lsn, t.xid, s"COMMIT ${t.xid}") })
        else Nil
      begin +: dml :++ commit
    }
  }

  test("streamed WAL merge == one-batch parse, any txn set, any file split") {
    val caseGen = for {
      txns <- Gen.listOfN(8, txnGen)
      // random cut points — files deliberately NOT txn-aligned
      cuts <- Gen.listOfN(4, Gen.choose(1, 30))
    } yield (txns, cuts)
    (1 to 4).foreach { i =>
      val (rawTxns, cuts) = caseGen(Gen.Parameters.default, Seed(7700L + i)).get
      val txns = rawTxns.zipWithIndex.map { case ((ks, c), x) => Txn(100L + x, ks, c) }
      val all = lines(txns)
      val root = tmpDir(s"graft-walprop-$i")
      // split into files at the random cut points (sorted, deduped, bounded)
      val bounds = (cuts.map(_ % math.max(all.size - 1, 1)).filter(_ > 0)
        .distinct.sorted :+ all.size).distinct
      val files = (0 +: bounds).sliding(2).collect {
        case Seq(a, b) if b > a => all.slice(a, b)
      }.toSeq
      files.zipWithIndex.foreach { case (chunk, fi) =>
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            chunk.map(r => Row(r._1, r._2, r._3)), 1),
          WalParser.rawSchema)
          .coalesce(1).write.mode("append").parquet(s"$root/feed")
        // one file per write; mtime order not needed (maxFilesPerTrigger=1
        // just forces MANY batch boundaries, order within the feed is by
        // LSN after parse)
        val _ = fi
      }
      val cfg = RunnerConfig(
        feedDir = s"$root/feed", tableDir = s"$root/table",
        checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 2),
        payloadSchema = payload, maxFilesPerTrigger = 1)
      CdcRunner.startFromWal(spark, cfg, "corpus", "documents").awaitTermination()
      val streamed = new graft.lake.LakeTable(cfg.tableDir).read(spark)
        .select("doc_id", "n_tok").collect().map(_.toString).sorted

      // oracle: parse EVERYTHING in one batch, merge once
      val oneBatch = WalParser.parseForTable(
        spark.createDataFrame(
          spark.sparkContext.parallelize(all.map(r => Row(r._1, r._2, r._3)), 2),
          WalParser.rawSchema),
        payload, "corpus", "documents")
      val cfg2 = cfg.copy(tableDir = s"$root/table2", checkpointDir = s"$root/cp2")
      val lake2 = CdcRunner.ensureTable(spark, cfg2)
      graft.apply.MergeApply.applyBatch(spark, lake2, oneBatch, 0L, cfg2.job)
      val oracle = lake2.read(spark)
        .select("doc_id", "n_tok").collect().map(_.toString).sorted

      assert(streamed.sameElements(oracle),
        s"case $i: streamed ${streamed.toSeq} != one-batch ${oracle.toSeq} " +
          s"(files=${files.map(_.size)}, txns=${txns.map(t => (t.xid, t.keys.size, t.committed))})")
    }
  }
}
