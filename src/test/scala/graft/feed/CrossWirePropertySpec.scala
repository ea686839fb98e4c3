package graft.feed

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: ONE logical change stream serialized through all three wire
 * formats — the LSN-ordered file feed, PostgreSQL `test_decoding` text, and
 * the queue envelope — merges to the IDENTICAL final table state. Each wire
 * re-derives its own per-row LSN (WAL line numbering, envelope packed LSN),
 * but every derivation is order-preserving, so the per-key LWW winner must
 * not depend on which wire carried the events. This is the reference's core
 * interoperability contract: the same replication task can be fed from a
 * slot read, a queue, or files without changing the replicated result.
 */
class CrossWirePropertySpec extends SparkSpec {

  // the ONE payload definition RunnerConfig's default already creates the
  // three tables from — a private re-declaration would silently diverge
  private val payload =
    org.apache.spark.sql.types.StructType(ChangeEvent.defaultPayloadFields)

  private def pgQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Serialize events as committed test_decoding transactions: BEGIN, the
    * txn's DML lines, COMMIT — key-only DELETEs (replica-identity default),
    * PG array literals for tokens. Line LSNs are a fresh strictly-ascending
    * counter (BEGIN/COMMIT consume LSNs, like a real slot read), so the
    * per-row LSN DIFFERS from the file wire's — only its ORDER agrees. */
  private def toWalLines(events: Seq[Row]): Seq[(Long, Long, String)] = {
    var lsn = 0L
    events.groupBy(_.getAs[Long](ChangeEvent.TXN_ID)).toSeq.sortBy(_._1)
      .flatMap { case (xid, evs) =>
        val begin = { lsn += 1; (lsn, xid, s"BEGIN $xid") }
        val dml = evs.sortBy(_.getAs[Long](ChangeEvent.LSN)).map { r =>
          lsn += 1
          val doc = r.getAs[String](ChangeEvent.DOC_ID)
          val op = r.getAs[String](ChangeEvent.OP)
          val cols =
            if (op == ChangeEvent.DELETE)
              s"doc_id[character varying]:${pgQuote(doc)}"
            else {
              val toks = Option(r.getAs[scala.collection.Seq[Int]]("tokens"))
                .map(t => s"'{${t.mkString(",")}}'").getOrElse("null")
              val nTok = Option(r.getAs[Any]("n_tok")).map(_.toString).getOrElse("null")
              val src = Option(r.getAs[String]("source")).map(pgQuote).getOrElse("null")
              s"doc_id[character varying]:${pgQuote(doc)} " +
                s"tokens[integer[]]:$toks n_tok[integer]:$nTok " +
                s"source[character varying]:$src"
            }
          (lsn, xid, s"table corpus.documents: $op: $cols")
        }
        val commit = { lsn += 1; (lsn, xid, s"COMMIT $xid") }
        (begin +: dml) :+ commit
      }
  }

  test("file feed == WAL text == envelope bus: identical final state from " +
    "one logical stream, several seeds and op mixes") {
    (1 to 3).foreach { i =>
      val root = tmpDir(s"graft-crosswire-$i")
      val spec = ChangeFeed.FeedSpec(
        nEvents = 60 + i * 30, nDocs = 15, seed = 1000L + i,
        insertPct = 50 - i * 5, updatePct = 25 + i * 5)
      val events = ChangeFeed.events(spark, spec)
        .select("lsn", "txn_id", "ts", "op", "schema_ver",
          "doc_id", "tokens", "n_tok", "source")
      val collected = events.collect().toSeq

      def mkLake(name: String) = CdcRunner.ensureTable(spark, RunnerConfig(
        feedDir = s"$root/$name-feed", tableDir = s"$root/$name-table",
        checkpointDir = s"$root/$name-cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 2)))
      def state(lake: graft.lake.LakeTable): Seq[String] =
        lake.read(spark).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.array_join(
            org.apache.spark.sql.functions.col("tokens").cast("array<string>"), ","),
          org.apache.spark.sql.functions.col("n_tok"),
          org.apache.spark.sql.functions.col("source"))
          .collect().map(_.toString).sorted.toSeq

      // wire A: the LSN-ordered file feed (events as-is)
      val lakeA = mkLake("direct")
      graft.apply.MergeApply.applyBatch(spark, lakeA, events, 0L,
        JobConfig(mode = CdcMode.Upsert, buckets = 2))

      // wire B: test_decoding text lines → WalParser
      val walRaw = spark.createDataFrame(
        spark.sparkContext.parallelize(
          toWalLines(collected).map(t => Row(t._1, t._2, t._3)), 2),
        WalParser.rawSchema)
      val lakeB = mkLake("wal")
      graft.apply.MergeApply.applyBatch(spark, lakeB,
        WalParser.parseForTable(walRaw, payload, "corpus", "documents"), 0L,
        JobConfig(mode = CdcMode.Upsert, buckets = 2))

      // wire C: queue envelope messages → EnvelopeSource
      val messages = EnvelopeSource.toMessages(events, "corpus", "documents",
        batchSize = 32)
      val lakeC = mkLake("env")
      graft.apply.MergeApply.applyBatch(spark, lakeC,
        EnvelopeSource.parseForTable(messages, payload, "corpus", "documents"),
        0L, JobConfig(mode = CdcMode.Upsert, buckets = 2))

      val (a, b, c) = (state(lakeA), state(lakeB), state(lakeC))
      assert(a == b, s"case $i: file wire != WAL wire\n${a.diff(b)}\n${b.diff(a)}")
      assert(a == c, s"case $i: file wire != envelope wire\n${a.diff(c)}\n${c.diff(a)}")
      assert(a.nonEmpty, s"case $i: degenerate empty state proves nothing")
    }
  }
}
