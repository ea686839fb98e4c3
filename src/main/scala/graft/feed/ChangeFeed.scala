package graft.feed

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.ChangeEvent

/**
 * Deterministic synthetic binlog/WAL stand-in (SURVEY §7.1.4): replaces the
 * reference's PG replication slot + RabbitMQ hop (trempy/.../CDCManager.py:116-186,
 * trempy/Messages/MessageProducer.py:18-62) with an append-only directory of
 * LSN-ranged Parquet files that a Structured Streaming file source tails.
 * Same envelope semantics: committed DML only, LSN-ordered, batched.
 *
 * Everything is generated with Catalyst expressions over `spark.range` — fully
 * distributed, no driver-side loops, and byte-deterministic from (seed, lsn):
 * no java.util.Random, tokens are `xxhash64(doc, version, position) % vocab`.
 */
object ChangeFeed {

  val VOCAB = 50257

  case class FeedSpec(
      nEvents: Long,
      nDocs: Long,
      seed: Long = 42L,
      /** 0 = uniform keys; >0 = zipf-ish skew exponent (hot keys near doc 0). */
      zipf: Double = 0.0,
      insertPct: Int = 60,
      updatePct: Int = 30, // rest = DELETE
      /** fraction (percent) of rows with a broken n_tok invariant → quarantine path */
      badPct: Int = 0,
      startLsn: Long = 1L,
      schemaVer: Int = 1,
      maxTok: Int = 64)

  // 9-digit pad is part of the fixture contract (every DuckDB oracle derives
  // the same ids); Spark's lpad TRUNCATES beyond the pad width, so indices
  // past 999,999,999 would silently alias onto lower ids — duplicate keys in
  // a seed snapshot, distinct docs merging. Guarded loudly in events()/
  // seedSnapshot() instead of widening the pad (which would break the oracles).
  private[feed] val MaxDocs = 1000000000L
  private def docId(idx: Column): Column =
    concat(lit("doc-"), lpad(idx.cast(StringType), 9, "0"))

  /** Deterministic payload for (doc, version): tokens / n_tok / source. */
  private def payload(doc: Column, version: Column, seed: Long, maxTok: Int)
      : (Column, Column, Column) = {
    val nTok = (pmod(xxhash64(doc, version, lit(seed)), lit(maxTok)) + 1).cast(IntegerType)
    val tokens = transform(
      sequence(lit(1), nTok),
      i => pmod(xxhash64(doc, version, i.cast(LongType)), lit(VOCAB)).cast(IntegerType))
    val source = element_at(
      array(lit("web"), lit("books"), lit("code"), lit("wiki")),
      (pmod(xxhash64(doc, lit(seed + 1)), lit(4)) + 1).cast(IntegerType))
    (tokens, nTok, source)
  }

  /** Initial snapshot (the reference's full load, FullLoadHandler.py:87-125):
    * docs 0..nDocs-1 at version 0. */
  def seedSnapshot(spark: SparkSession, nDocs: Long, seed: Long = 42L, maxTok: Int = 64): DataFrame = {
    require(nDocs <= MaxDocs,
      s"nDocs=$nDocs exceeds the $MaxDocs doc-id space (9-digit pad — wider " +
        "ids silently truncate, seeding DUPLICATE keys into the full load)")
    val doc = docId(col("id"))
    val (tokens, nTok, source) = payload(doc, lit(0L), seed, maxTok)
    spark.range(nDocs).select(
      doc.as(ChangeEvent.DOC_ID),
      tokens.as("tokens"),
      nTok.as("n_tok"),
      source.as("source"))
  }

  /** LSN-ordered event stream with configurable op mix / skew / error injection. */
  def events(spark: SparkSession, spec: FeedSpec): DataFrame = {
    require(spec.nDocs <= MaxDocs,
      s"nDocs=${spec.nDocs} exceeds the ${MaxDocs} doc-id space (9-digit pad " +
        "— wider ids silently truncate and alias)")
    require(spec.insertPct >= 0 && spec.updatePct >= 0 &&
      spec.insertPct + spec.updatePct <= 100 &&
      spec.badPct >= 0 && spec.badPct <= 100,
      s"FeedSpec percentages out of range: insert=${spec.insertPct} " +
        s"update=${spec.updatePct} bad=${spec.badPct} — an over-100 op mix " +
        "silently emits zero DELETEs")
    val lsn = (col("id") + spec.startLsn).as(ChangeEvent.LSN)
    val lsnC = col(ChangeEvent.LSN)
    val h = (salt: Long) => xxhash64(lsnC, lit(spec.seed + salt))
    // key choice: uniform, or zipf-ish via inverse-CDF power transform
    val u = pmod(h(10), lit(1000000L)).cast(DoubleType) / lit(1000000.0)
    val keyIdx =
      if (spec.zipf > 0.0)
        floor(lit(spec.nDocs.toDouble) * pow(u, lit(1.0 + spec.zipf))).cast(LongType)
      else pmod(h(10), lit(spec.nDocs))
    val doc = docId(keyIdx)
    val opRoll = pmod(h(20), lit(100L))
    val op = when(opRoll < spec.insertPct, ChangeEvent.INSERT)
      .when(opRoll < spec.insertPct + spec.updatePct, ChangeEvent.UPDATE)
      .otherwise(ChangeEvent.DELETE)
    val (tokens, nTok, source) = payload(doc, lsnC, spec.seed, spec.maxTok)
    val isDelete = op === ChangeEvent.DELETE
    val badRow = if (spec.badPct > 0) pmod(h(30), lit(100L)) < spec.badPct else lit(false)

    spark.range(spec.nEvents)
      .select(lsn)
      .select(
        lsnC,
        (lsnC / 5).cast(LongType).as(ChangeEvent.TXN_ID),
        timestamp_seconds(lit(1700000000L) + lsnC).as(ChangeEvent.TS),
        op.as(ChangeEvent.OP),
        lit(spec.schemaVer).as(ChangeEvent.SCHEMA_VER),
        doc.as(ChangeEvent.DOC_ID),
        when(isDelete, lit(null)).otherwise(tokens).as("tokens"),
        // bad rows violate n_tok == size(tokens) → quarantine fixture (FIXTURES F6)
        when(isDelete, lit(null))
          .otherwise(when(badRow, nTok + 1).otherwise(nTok)).cast(IntegerType).as("n_tok"),
        when(isDelete, lit(null)).otherwise(source).as("source"))
  }

  /**
   * Write the feed as `nFiles` LSN-range Parquet files with strictly ascending
   * mtimes in LSN order — the streaming file source processes oldest-first, so
   * arrival order matches binlog order (the reference's slot-read contract,
   * CDCManager.py:209 sort("lsn")). The upsert merge is additionally
   * order-tolerant via the stored per-row `_lsn` (see MergeApply), but SCD2
   * history chaining relies on ordered arrival, as the reference does.
   */
  def writeFeed(df: DataFrame, dir: String, nFiles: Int, append: Boolean = false): Unit = {
    val parts = math.max(1, nFiles)
    val tmp = s"$dir.__stage-${System.nanoTime()}"
    df.repartitionByRange(parts, col(ChangeEvent.LSN))
      .sortWithinPartitions(ChangeEvent.LSN)
      .write.mode("overwrite").parquet(tmp)
    val dirF = new java.io.File(dir)
    dirF.mkdirs()
    val existing = dirF.listFiles().filter(_.getName.matches("feed-\\d+\\.parquet"))
    if (!append) existing.foreach(_.delete())
    val startSeq = if (append && existing.nonEmpty)
      existing.map(_.getName.stripPrefix("feed-").stripSuffix(".parquet").toLong).max + 1
    else 0L
    val baseMtime = math.max(System.currentTimeMillis(),
      if (existing.isEmpty || !append) 0L else existing.map(_.lastModified()).max) + 1000L
    // range-partition index in the part-file name ⇒ name order == LSN order
    val staged = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    staged.zipWithIndex.foreach { case (f, i) =>
      val dest = new java.io.File(dirF, f"feed-${startSeq + i}%08d.parquet")
      // the mtime ENCODES arrival order (Spark's file source orders pending
      // files by modification time under maxFilesPerTrigger) — a filesystem
      // that silently refuses setLastModified would mis-order SCD2 history
      // chaining with no error anywhere, so fail loudly instead. Set it on
      // the STAGED file, BEFORE the move (rename preserves it): a live
      // stream listing between move and a post-move set would see the stale
      // staging mtime and process the new file before older pending ones.
      require(f.setLastModified(baseMtime + i * 1000L),
        s"cannot set mtime on $f — this filesystem cannot encode feed " +
          "arrival order; use a POSIX-mtime-capable feed directory")
      java.nio.file.Files.move(f.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    graft.runner.CdcRunner.deleteRecursively(new java.io.File(tmp))
  }

  /**
   * Append each chunk of a RAW WAL-line feed as ONE parquet file under
   * `dir`, mtimes stamped in chunk order (base + idx·step). The streaming
   * file source orders pending files by mtime and tie-breaks equal mtimes
   * by random UUID part-file name, so any fixture whose semantics depend on
   * BATCH ORDER (which epoch a split transaction's COMMIT lands in, which
   * epoch an orphan evicts in) must stamp explicitly — two writes landing
   * in one clock tick would otherwise process in random order. One recipe,
   * shared by the driver fixture and the WAL specs, so a change to the
   * ordering scheme can never leave a test encoding a different arrival
   * order than the fixture it mirrors.
   */
  def writeRawChunks(chunks: Seq[DataFrame], dir: String,
      baseMs: Long = 1700000000000L, stepMs: Long = 60000L): Unit = {
    // pre-existing part files are ALREADY stamped (an earlier call's chunks)
    // and must keep their order: seeding the stamped set with them stops a
    // second append call from collapsing every earlier file onto ITS
    // chunk-0 mtime — the exact mis-ordering this function exists to
    // prevent. An append also auto-continues AFTER the newest existing
    // stamp, so sequential calls encode sequential arrival without the
    // caller tracking a base offset.
    val existing = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("part-"))
    val stamped = scala.collection.mutable.Set[String](existing.map(_.getName): _*)
    val base =
      if (existing.isEmpty) baseMs
      else math.max(baseMs, existing.map(_.lastModified()).max + stepMs)
    chunks.zipWithIndex.foreach { case (df, idx) =>
      df.coalesce(1).write.mode("append").parquet(dir)
      new java.io.File(dir).listFiles().foreach { f =>
        if (f.getName.startsWith("part-") && stamped.add(f.getName))
          require(f.setLastModified(base + idx * stepMs),
            s"cannot set mtime on $f — this filesystem cannot encode feed " +
              "arrival order; use a POSIX-mtime-capable feed directory")
      }
    }
  }
}
