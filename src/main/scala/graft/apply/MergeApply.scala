package graft.apply

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.lake._
import graft.model._
import graft.rules._

/**
 * The merge-apply stage: one micro-batch of change events → one copy-on-write
 * commit on the lake table. This is the Spark re-expression of the reference's
 * consumer callback (trempy/Tasks/Task.py:153-204 →
 * trempy/.../CDCOperationsHandler.py:88-277) — its per-row SQL loops collapse into:
 *
 * {{{
 *   quarantine split → filter rules → transform rules
 *     → per-key max_by(lsn) reduction  (dedup by (doc_id, lsn) + last-writer-wins;
 *                                       partial aggregation bounds hot-key fan-in:
 *                                       each map task emits ≤1 row per key)
 *     → manifest-pruned read of affected buckets only
 *     → full-outer equi-join on the key (AQE picks broadcast when the reduced
 *       change set is small; skew-join handles hot buckets)
 *     → bucket-partitioned write + atomic manifest commit (exactly-once per epoch)
 * }}}
 *
 * Scale notes (100 TB / 10^10 events): the base table is never fully scanned —
 * reads prune to `O(affected buckets)` via the manifest; the reduction shuffles
 * only the batch (with map-side partial max_by, a hot key contributes at most one
 * row per map task to the shuffle); the join shuffles only batch + affected
 * buckets; the write re-shuffles merged rows by bucket so each bucket is written
 * by one task (bounded file counts).
 */
object MergeApply {

  case class BatchResult(epoch: Long, skipped: Boolean, metrics: Map[String, Long])

  /** Reason column appended to quarantined rows (engine column, `_` prefix). */
  val QUARANTINE_REASON = "_error_reason"

  /** Op prefix marking a WAL transaction evicted by timeout
    * ([[graft.runner.CdcRunner.startFromWal]] orphan eviction). Quarantine IS
    * the intended destination for these rows, so they are excluded from the
    * `stop_if_*_error` escalation below: eviction is a deterministic function
    * of the retained stash, and a stop here would re-fail identically on
    * every restart — permanently wedging the stream the eviction exists to
    * un-wedge. */
  val ORPHANED_OP_PREFIX = "orphaned_txn:"

  /** The full-load snapshot's sentinel epoch ([[graft.runner.CdcRunner
    * .fullLoad]]): its quarantine dir holds POST-transform SNAPSHOT rows —
    * no change envelope — which [[replayQuarantine]] must both recognize
    * (strip the already-run rules) and re-shape (synthesize the INSERT
    * envelope) before re-driving. */
  private[graft] val FULL_LOAD_EPOCH = -1L

  /** Replay epochs live far above any realistic streaming epoch count so they
    * can be recorded in the committed set (idempotence) without colliding. */
  private[graft] val REPLAY_EPOCH_BASE = 1L << 40

  /** Marker offset for POST-transform quarantine dirs (rows whose transform-
    * introduced merge key is null): distinct from streaming epochs (≪ 2^39)
    * and from replay epochs (≥ 2^40), browsable via LakeTable.quarantine. */
  private[graft] val POST_TRANSFORM_EPOCH_BASE = 1L << 39

  /** Marker file dropped in a quarantine dir whose rows are POST-transform
    * (the rule pipeline already ran on them): [[replayQuarantine]] must not
    * run it again — filters they already passed, modifiers that would
    * double-apply (a `price*2` math_expression run twice corrupts silently).
    * Underscore-prefixed so parquet readers ignore it. */
  private[graft] val POST_TRANSFORM_MARKER = "_post_transform"

  private def markPostTransform(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir, POST_TRANSFORM_MARKER)
    if (!java.nio.file.Files.exists(p))
      java.nio.file.Files.write(p, Array.emptyByteArray): Unit
  }

  /** `events_received` counts each event's ORIGINAL delivery only: a replay
    * epoch re-drives rows the original epoch already counted (quarantined ⊂
    * received), and double-counting them would mask an in-transit loss in
    * the producer-vs-consumer deliveryGap audit (published − received). */
  private def receivedDelta(epoch: Long, nReceived: Long): Long =
    if (epoch >= REPLAY_EPOCH_BASE) 0L else nReceived

  /**
   * Re-drive the quarantined rows of `sourceEpoch` through the merge under a
   * fresh replay epoch — the reference's dead-letter drain (dlx.py:1-13,
   * trempy/Messages/MessageDlx.py:27-87 reads the `dlx_message` table back
   * into the stream). `fix` corrects the rows first (e.g. repair `n_tok`,
   * map a bad op); rows STILL invalid after the fix re-quarantine under the
   * replay epoch with fresh reasons, so a partial fix is visible, not lost.
   * Replayed rows keep their original LSNs, so the LSN-gated merge stays
   * order-safe: a replayed change older than what already applied loses.
   * Idempotent per (sourceEpoch, attempt) — re-running the same drain is a
   * no-op; pass a new `attempt` to re-drive with a better fix.
   */
  def replayQuarantine(
      spark: SparkSession,
      lake: LakeTable,
      sourceEpoch: Long,
      cfg: JobConfig,
      fix: DataFrame => DataFrame = identity,
      attempt: Int = 0): BatchResult = {
    require(attempt >= 0 && attempt < 64, s"attempt $attempt out of range (0..63)")
    // the replay-epoch encoding multiplies the source epoch by 64 per drain
    // generation: a chain 4 deep on a post-transform band source (≥ 2^39)
    // wraps Long, and a wrapped (negative) epoch is never recorded in the
    // committed set — silently breaking the drain's idempotence contract.
    // Refuse loudly before the arithmetic.
    require(sourceEpoch <= (Long.MaxValue - REPLAY_EPOCH_BASE - 63) / 64 - 2,
      s"replayQuarantine($sourceEpoch): replay chain too deep to encode a " +
        "fresh replay epoch — fix the rows and re-drive an EARLIER dir in " +
        "the chain (e.g. the original epoch) with a new attempt instead")
    val dir = lake.quarantineDir(sourceEpoch)
    require(new java.io.File(dir).isDirectory,
      s"no quarantined rows for epoch $sourceEpoch at $dir")
    // Rows quarantined POST-transform (the transform-introduced-key split, or
    // a replay thereof) already carry the rule pipeline's OUTPUT: re-running
    // it would double-apply modifiers (a price*2 run twice) and re-filter rows
    // that already passed. Identified by the marker file (covers replay
    // generations) or the epoch band (covers pre-marker dirs); the pipeline is
    // stripped rather than refused because for these rows stripping IS the
    // faithful replay. Keys follow the table (the post-transform key set).
    // The raw payload invariant (n_tok == size(tokens)) is stripped with the
    // rules: it guards the FEED, and these rows passed it on original ingest —
    // a transform that legitimately rewrote n_tok (the user's explicit rule,
    // authoritative like on the normal path, which never re-checks post-
    // transform) would otherwise re-quarantine every drain attempt, forever.
    // A replay epoch encodes its source arithmetically (REPLAY_EPOCH_BASE +
    // (src+2)*64 + attempt), so post-transform LINEAGE is recoverable even
    // when a crash between a replay's re-quarantine write and the marker
    // write in the finally left the dir unmarked: walk the replay chain back
    // to the original epoch and test ITS band. The walk deliberately does
    // NOT try to decode COMPOSITE values (POST_TRANSFORM_EPOCH_BASE + a
    // replay epoch — the step-2b dir written during a replay): composites
    // overlap the replay value range at depth ≥ 2, so no arithmetic can
    // separate them — instead step-2b writes those dirs MARKER-FIRST
    // (delete, marker, append-mode parquet), leaving no unmarked-data crash
    // window to recover from. Depth-bounded — each replay level multiplies
    // the epoch by 64, so 8 levels is already beyond Long range.
    def postTransformLineage(e: Long): Boolean = {
      var cur = e
      var depth = 0
      while (cur >= REPLAY_EPOCH_BASE && depth < 8) {
        cur = (cur - REPLAY_EPOCH_BASE) / 64 - 2; depth += 1
      }
      // a chain rooted at the FULL-LOAD sentinel is post-transform too: its
      // snapshot rows ran the pipeline before their key check, so a replay
      // dir left unmarked by a crash must strip the rules like its source
      (cur >= POST_TRANSFORM_EPOCH_BASE && cur < REPLAY_EPOCH_BASE) ||
        cur == FULL_LOAD_EPOCH
    }
    // The full-load quarantine ([[graft.runner.CdcRunner.fullLoad]]) also
    // holds post-transform rows — the snapshot runs the rule pipeline before
    // its key check — recognized by its sentinel epoch (covers dirs written
    // before any marker existed).
    val postTransform = sourceEpoch == FULL_LOAD_EPOCH ||
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, POST_TRANSFORM_MARKER)) ||
        postTransformLineage(sourceEpoch)
    val effCfg =
      if (!postTransform) cfg
      else {
        if (cfg.filters.nonEmpty || cfg.transforms.nonEmpty)
          System.err.println(s"[graft] replayQuarantine($sourceEpoch): rows " +
            "were quarantined post-transform; the configured filter/transform " +
            "rules are skipped (they already ran before quarantine)")
        cfg.copy(filters = Nil, transforms = Nil,
          keyCols = lake.manifest.keyCols, validatePayload = false)
      }
    val rows0 = fix(spark.read.parquet(dir).drop(QUARANTINE_REASON))
    // Full-load quarantine rows are SNAPSHOT-shaped (no change envelope) —
    // applyBatch would fail on the missing op/lsn columns. Re-drive them as
    // the INSERTs the original snapshot would have written: lsn 0 and the
    // full-load batch timestamp, so a fixed row lands exactly as if the
    // original load had carried it (same LWW rank, same SCD2 start date).
    // Keyed on the EPOCH, not column presence: only the sentinel dir ever
    // holds envelope-less rows (its replay dirs carry the synthesized
    // envelope), while presence-probing would misfire on a snapshot payload
    // that legitimately contains a column named `op`.
    val rows =
      if (sourceEpoch != FULL_LOAD_EPOCH) rows0
      else rows0
        .withColumn(ChangeEvent.LSN, lit(0L))
        .withColumn(ChangeEvent.TS, batchTimestamp(FULL_LOAD_EPOCH))
        .withColumn(ChangeEvent.OP, lit(ChangeEvent.INSERT))
    val replayEpoch = REPLAY_EPOCH_BASE + (sourceEpoch + 2) * 64 + attempt
    // rows re-quarantined from a post-transform source stay post-transform:
    // propagate the marker so the NEXT drain attempt also strips the rules.
    // In a FINALLY, not after the return: applyBatch can throw AFTER the
    // re-quarantine write (stop_if_error fires post-write, a commit
    // conflict) and an unmarked replay dir would hand pipeline OUTPUT to the
    // next drain as raw input (lineage derivation above is the last-resort
    // net for a crash that skips even this)
    try applyBatch(spark, lake, rows, replayEpoch, effCfg)
    finally {
      // best-effort (Try): an IO failure here must not SUPERSEDE the real
      // batch exception in flight — the lineage derivation above still
      // recovers the unmarked dir on the next drain
      if (postTransform &&
          new java.io.File(lake.quarantineDir(replayEpoch)).isDirectory)
        scala.util.Try(markPostTransform(lake.quarantineDir(replayEpoch))): Unit
    }
  }

  /** set GRAFT_PHASE_TIMING=1 to print per-phase timings to stderr */
  private val phaseTiming = sys.props.get("graft.phase.timing").contains("1") ||
    sys.env.get("GRAFT_PHASE_TIMING").contains("1")
  /** Labels the phase's jobs in the UI (thread-local, guide §1.5 — one
    * setProperty call, negligible) and optionally times it to stderr. */
  @inline private def timed[T](label: String)(f: => T): T = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"merge: $label")
    try {
      if (!phaseTiming) f
      else {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(f"[phase] $label ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"end=${System.currentTimeMillis()}")
        r
      }
    } finally sc.setJobDescription(prev)
  }

  /** Deterministic per-batch "now" (replaces the reference's wall-clock NOW(),
    * SURVEY §7.4.3): derived from the epoch so replay is byte-stable. */
  def batchTimestamp(epoch: Long): Column =
    timestamp_seconds(lit(1700000000L + epoch))

  /** Null-fill lake-schema columns missing from the (older schema_ver) event frame
    * and cast widened ones — the reference's per-batch null-fill of missing source
    * columns (trempy/Tables/Table.py:73-100), done once per batch, columnar.
    * ONE select, not a withColumn per field: each withColumn stacks another
    * Project the analyzer re-walks on every per-epoch action — pure plan
    * bloat on the merge hot path (guide §7.3: analyzer time IS driver wall). */
  private def alignToSchema(df: DataFrame, target: GraftSchema): DataFrame = {
    val have = df.columns.toSet
    val byName = target.fields.map(f => f.name -> f).toMap
    val needsWork = target.fields.exists(f => !have(f.name) ||
      df.schema(f.name).dataType != f.dataType)
    if (!needsWork) df
    else {
      val existing = df.schema.fields.toSeq.map { c =>
        byName.get(c.name) match {
          case Some(f) if c.dataType != f.dataType =>
            col(c.name).cast(f.dataType).as(c.name)
          case _ => col(c.name)
        }
      }
      val missing = target.fields.filterNot(f => have(f.name))
        .map(f => lit(null).cast(f.dataType).as(f.name))
      df.select(existing ++ missing: _*)
    }
  }

  /** Plan-once seam (guide §3.3 "materialising an intermediate truncates the
    * plan"): compile `df`'s physical plan ONCE and hand every further
    * consumer a LogicalRDD over the compiled RDD. The persisted reduction is
    * consumed by up to three more actions per epoch (delta/sidecar write,
    * CoW merge+write, retry recomputes) and each would otherwise re-run the
    * analyzer/optimizer over the WHOLE upstream tree — source scan, wire
    * parse, rule pipeline — which thread-dump sampling showed to be the
    * largest driver-gap component on wire-fed streams. Data still flows
    * through the persisted cache exactly as before (the RDD reads the
    * InMemoryRelation; an evicted partition recomputes through the original
    * plan), so results and fault behavior are unchanged — only the repeated
    * driver-side re-analysis is gone. Callers must run the FIRST action (the
    * one that resolves observe() metrics) on the original frame. */
  private def planOnce(spark: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark, df.queryExecution.toRdd, df.schema)

  def applyBatch(
      spark: SparkSession,
      lake: LakeTable,
      batch: DataFrame,
      epoch: Long,
      cfg: JobConfig,
      /** Merged into THIS epoch's commit metrics — rides the same atomic
        * manifest write, so callers can persist their own cursor (e.g.
        * [[graft.lake.LakeSync]]'s synced-source-version offset) exactly-once
        * with the data it accounts for. Summed like every manifest metric. */
      extraMetrics: Map[String, Long] = Map.empty): BatchResult = {

    // exactly-once: a re-delivered epoch is a no-op (idempotent commit)
    if (lake.isCommitted(epoch)) return BatchResult(epoch, skipped = true, Map.empty)

    // loud, named — the invariant expressions below .reduce over the key set
    // and an empty one would surface as a bare `empty.reduce` from deep
    // inside plan construction (e.g. a caller passing a key-less manifest's
    // keyCols straight through)
    require(cfg.keyCols.nonEmpty,
      "applyBatch: cfg.keyCols is empty — LWW/SCD2 merge semantics need at " +
        "least one merge key column")

    // The rule pipeline is compiled HERE, ahead of the quarantine split,
    // because the split must know which key columns SURVIVE the pipeline
    // (filters never change the schema, so compiling against the raw batch
    // schema is exact); step 2 applies the same compile.
    val spec = TableSpec("lake", "t", cfg.keyCols)
    val compiled = TransformCompiler.compile(
      cfg.transforms, spec, batch.schema, batchTimestamp(epoch))
    val keys = compiled.outSpec.keyCols
    require(keys.nonEmpty,
      s"applyBatch: the transform pipeline removed every merge key " +
        s"(pre-transform keys ${cfg.keyCols.mkString(",")}) — add_primary_key " +
        "a replacement or drop the remove_primary_key rule")
    // pre-transform NAMES of the keys that are still merge keys after the
    // pipeline (renames preserve values, so checking the pre-name is exact)
    val renamedPre = cfg.transforms.sortBy(_.priority).foldLeft(cfg.keyCols) {
      case (ks, ModifyColumnName(from, to, _)) => ks.map(k => if (k == from) to else k)
      case (ks, _)                             => ks
    }
    // A pre-transform key REMOVED by remove_primary_key is NOT a key of the
    // table: its null is data, not corruption — the reference keys rows by
    // the FINAL key set only, so quarantining on it would silently diverge.
    // Keys the pipeline INTRODUCES are step 2b's check.
    val checkedKeys = cfg.keyCols.zip(renamedPre).collect {
      case (pre, post) if keys.contains(post) => pre
    }

    // ── 1. quarantine split (DLX analogue): bad op, or payload invariant broken ──
    val opCol = col(ChangeEvent.OP)
    // the tokens/n_tok consistency check only applies to payloads that carry them;
    // branch in Scala — a Column disjunct would still analyze col("tokens")
    val hasTokens = batch.columns.contains("tokens") && batch.columns.contains("n_tok")
    // every disjunct/conjunct below must be DETERMINATE (never NULL): a
    // three-valued invariant silently VANISHES rows — filter(NULL) drops them
    // from `good`, filter(NOT NULL) drops them from `bad`, and the when-sum
    // counts them 0 — neither applied nor quarantined nor failing the batch
    // under quarantine=false. Hence the explicit isNotNull guards: a null op
    // and a null n_tok beside non-null tokens are exactly the malformed-feed
    // rows this split exists to catch.
    val payloadOk =
      if (!hasTokens || !cfg.validatePayload) lit(true)
      else opCol === ChangeEvent.DELETE ||
        (col("tokens").isNotNull && col("n_tok").isNotNull &&
          col("n_tok") === size(col("tokens")))
    val opOk = opCol.isNotNull && opCol.isin(ChangeEvent.OPS.toSeq: _*)
    // a NULL LSN has no place in the LWW order (max_by over a null is
    // engine-defined, not replay semantics) — it is a malformed feed row
    // (a corrupt envelope whose message-level fields nulled out, a hand-made
    // parquet feed missing the column) and quarantines like the rest
    val lsnOk = col(ChangeEvent.LSN).isNotNull
    // a NULL merge key can never equi-match: the CoW full-outer join would
    // insert a fresh null-key row EVERY epoch (unbounded, undeletable —
    // tombstones don't match either) while the MoR fold's sameKey dedupes
    // them — divergent results per storage strategy. Quarantine instead.
    // Only the SURVIVING keys (checkedKeys) are checked; when the pipeline
    // replaces the whole key set the raw split has nothing to check.
    val keyOk =
      if (checkedKeys.isEmpty) lit(true)
      else checkedKeys.map(col(_).isNotNull).reduce(_ && _)
    val invariantOk = opOk && lsnOk && keyOk && payloadOk
    // A DELETE carrying NO key at all is a WELL-FORMED protocol message, not
    // a malformed row: logical decoding emits key-less tombstones when the
    // source lacks replica identity, and the reference skips them
    // (no-tuple-data, CDCManager.py:305-307). Skip-and-COUNT here — the one
    // shared choke point for every ingest path (file feed, wal, envelope,
    // kafka) — so the delivery audit still accounts for them; quarantining
    // would pollute the DLX with valid messages, dropping them pre-merge
    // (the old wire-starter filter) made every published tombstone a
    // permanent false positive in deliveryGap. A PARTIAL composite key stays
    // a quarantined invariant violation (null_merge_key) — that row is
    // malformed, not protocol.
    val keylessDelete =
      if (checkedKeys.isEmpty) lit(false)
      else opCol.isNotNull && opCol === ChangeEvent.DELETE &&
        checkedKeys.map(col(_).isNull).reduce(_ && _)
    val isBad = !invariantOk && !keylessDelete
    // Bad-row detection piggybacks on the first scan via observe(): no extra
    // pass over the batch when the feed is clean (the common case). Only when
    // the observed count is non-zero does the quarantine path re-scan.
    val obs = new org.apache.spark.sql.Observation(s"graft-bad-$epoch-${System.nanoTime()}")
    val good = batch
      .observe(obs,
        sum(when(isBad, 1L).otherwise(0L)).as("n_bad"),
        sum(when(keylessDelete, 1L).otherwise(0L)).as("n_skipped"),
        // received = every event entering the merge, BEFORE rule filters and
        // reduction — the consumer half of the reference's published/received/
        // processed counters (stats_message, MessageProducer.py:18-62); the
        // producer half (EnvelopeSource.writeFeed page manifests) diffs
        // against the cumulative metric to detect in-transit loss
        count(lit(1)).as("n_received"))
      .filter(invariantOk)
    lazy val bad = batch.filter(isBad)
    // invoked after the mode's first action (observation complete, pre-commit);
    // returns (quarantined, received, skipped) for metrics. Rare path re-scans
    // the batch.
    val onStats: () => (Long, Long, Long) = () => {
      val observed = obs.get
      // AQE reads observed metrics from the FINAL physical plan: when EVERY
      // row of the batch quarantines/filters away, empty-stage propagation can
      // replace the subtree holding the CollectMetrics node and the metrics
      // vanish (empty map) even though the rows were scanned — which would
      // silently drop an all-bad batch with no quarantine and undercount
      // events_received in the delivery audit. Recount directly in that case;
      // the batch reduced to nothing, so one extra scan is the audit's cost.
      val (nReceived, nBad, nSkipped) =
        if (observed.nonEmpty) (
          observed.get("n_received").collect { case v: Long => v }.getOrElse(0L),
          // n_bad/n_skipped are null for an empty batch (sum over zero rows)
          observed.get("n_bad").collect { case v: Long => v }.getOrElse(0L),
          observed.get("n_skipped").collect { case v: Long => v }.getOrElse(0L))
        else {
          val r = batch.agg(
            count(lit(1)).as("n_received"),
            sum(when(isBad, 1L).otherwise(0L)).as("n_bad"),
            sum(when(keylessDelete, 1L).otherwise(0L)).as("n_skipped")).head()
          (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
            if (r.isNullAt(2)) 0L else r.getLong(2))
        }
      if (nBad > 0) {
        // quarantine=false means "bad rows fail the batch" (JobConfig contract),
        // NOT "skip detection" — detection always runs, only routing differs
        if (!cfg.quarantine)
          throw new IllegalStateException(
            s"$nBad invalid event(s) in epoch $epoch and quarantine is disabled")
        val badByOp = timed("quarantine-scan")(bad.groupBy(ChangeEvent.OP).count().collect())
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        // per-row failure reason rides with the quarantined row (the
        // reference's apply_exceptions stores the row + exception message,
        // Metadata/Query.py:66-81) — when 3 ops fail for 3 different reasons,
        // the operator can tell which was which and fix selectively
        val reason = when(!opOk,
            concat(lit("unknown_op: "), coalesce(opCol, lit("null"))))
          .when(!lsnOk, lit("null_lsn: every change event must carry an LSN " +
            "(LWW ordering is undefined without one)"))
          .when(!keyOk, lit("null_merge_key: " +
            s"key column(s) ${checkedKeys.mkString(",")} must be non-null"))
          .otherwise(lit("payload_invariant: tokens null or n_tok != size(tokens)"))
        bad.withColumn(QUARANTINE_REASON, reason)
          .write.mode("overwrite").parquet(lake.quarantineDir(epoch))
        // per-op stop-or-continue flags — reference: stop_if_*_error
        // (trempy/Tasks/Task.py:43-99, CDCOperationsHandler.py:783-801)
        val p = cfg.errorPolicy
        def stop(op: String, flag: Boolean): Unit =
          if (flag && badByOp.getOrElse(op, 0L) > 0)
            throw new IllegalStateException(
              s"stop_if_error: ${badByOp(op)} bad $op event(s) in epoch $epoch " +
                s"(quarantined at ${lake.quarantineDir(epoch)})")
        stop(ChangeEvent.INSERT, p.stopOnInsertError || p.stopOnUpsertError || p.stopOnScd2Error)
        stop(ChangeEvent.UPDATE, p.stopOnUpdateError || p.stopOnUpsertError || p.stopOnScd2Error)
        stop(ChangeEvent.DELETE, p.stopOnDeleteError)
        // deliberate timeout evictions (ORPHANED_OP_PREFIX) never escalate —
        // see the constant's doc: stopping on one wedges the stream forever.
        // (the key set can hold null: corrupt rows group under op = NULL)
        val unknownOps = (badByOp.keySet -- ChangeEvent.OPS)
          .filterNot(op => op != null && op.startsWith(ORPHANED_OP_PREFIX))
        if (unknownOps.nonEmpty &&
            (p.stopOnInsertError || p.stopOnUpdateError || p.stopOnDeleteError ||
              p.stopOnUpsertError || p.stopOnScd2Error))
          throw new IllegalStateException(
            s"stop_if_error: unknown op(s) $unknownOps in epoch $epoch")
      }
      (nBad, nReceived, nSkipped)
    }

    // ── 2. rule pipeline: filters (DELETE passthrough) then transforms ──
    // (compiled above, ahead of step 1, so the split knows the key fate)
    val filtered =
      if (cfg.filters.isEmpty) good
      else good.filter(FilterCompiler.cdcPredicate(cfg.filters, good.schema, opCol))
    val transformed = compiled.apply(filtered)

    // ── 2b. post-transform key check: (a) keys INTRODUCED by the rule
    // pipeline (add_primary_key, a created key) escape the step-1 split,
    // which can only check the PRE-transform key set; (b) a SURVIVING key
    // whose VALUE a modifier nulled (math_expression 1/0 under non-ANSI
    // Divide, a format miss) escapes it too — "renames preserve values"
    // covers renames only. A null key on INSERT/UPDATE makes the CoW
    // full-outer join insert a FRESH row every epoch (never matched, never
    // deletable) while MoR's fold groups nulls together — the exact
    // per-strategy divergence the raw null_merge_key guard exists to stop.
    // DELETEs keep flowing: the routing contract folds key-only DELETEs by
    // whatever key they carry, and a null-key tombstone is invisible to
    // public reads on every storage strategy (driver-oracled by
    // q_multitable_routing's remove/add_primary_key route). Checking every
    // final key costs nothing extra (one fused observe scan) and cannot
    // double-quarantine: raw nulls on pre-checked keys already left in
    // step 1, so this predicate only fires on transform-produced nulls.
    val introduced = if (cfg.transforms.isEmpty) Nil else keys
    // Like step 1, detection piggybacks on the merge's first scan via
    // observe() — an eager count() here would re-evaluate the whole batch
    // pipeline once per epoch just to learn n==0 in the common clean case.
    // The filter always applies (fused into the same scan); only a non-zero
    // count pays the quarantine re-scan. Resolution happens pre-commit via
    // the by-name extraMetrics the modes thread into commitCommon.
    val (mergeInput, postStats) =
      if (introduced.isEmpty)
        (transformed, () => Map.empty[String, Long])
      else {
        val nullKey = introduced.map(col(_).isNull).reduce(_ || _) &&
          opCol =!= ChangeEvent.DELETE
        val postObs = new org.apache.spark.sql.Observation(
          s"graft-postbad-$epoch-${System.nanoTime()}")
        val observed = transformed.observe(postObs,
          // count(when), not sum(when): count never returns null on an empty
          // frame, so the clean-empty case needs no special-casing
          count(when(nullKey, lit(1))).as("n_post_bad"))
        val resolve = () => {
          // same AQE caveat as step 1: an all-pruned plan can drop the
          // CollectMetrics node — recount directly in that rare case
          val n = postObs.get.get("n_post_bad").collect { case v: Long => v }
            .getOrElse(transformed.filter(nullKey).count())
          if (n == 0) Map.empty[String, Long]
          else {
            if (!cfg.quarantine)
              throw new IllegalStateException(
                s"$n event(s) with null post-transform merge key(s) " +
                  s"${introduced.mkString(",")} in epoch $epoch and quarantine " +
                  "is disabled")
            // POST-transform rows can't share the raw quarantine dir (different
            // schema); a marker-offset epoch keeps them browsable + drainable,
            // and the marker file tells the drain NOT to re-run the rules.
            // MARKER-FIRST (delete for retry idempotence, marker, then
            // append-mode parquet — overwrite mode would wipe the marker):
            // data never exists without the marker, so a crash at ANY point
            // cannot leave pipeline OUTPUT that the next drain would treat
            // as raw input. During a replay, `epoch` here is a replay epoch
            // and this composite value is arithmetically ambiguous — the
            // marker is the ONLY signal for these dirs (see
            // postTransformLineage in replayQuarantine).
            val qDir = lake.quarantineDir(POST_TRANSFORM_EPOCH_BASE + epoch)
            graft.runner.CdcRunner.deleteRecursively(new java.io.File(qDir))
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(qDir))
            markPostTransform(qDir)
            transformed.filter(nullKey)
              .withColumn(QUARANTINE_REASON, lit("null_merge_key: " +
                s"post-transform key(s) ${introduced.mkString(",")} must " +
                "be non-null for INSERT/UPDATE (rows are POST-transform)"))
              .write.mode("append").parquet(qDir)
            Map("events_quarantined_post_transform" -> n)
          }
        }
        (observed.filter(!nullKey), resolve)
      }

    // Observe-free twin of the merge input for the LWW winner pre-pass
    // (lwwPrefilter): the pre-pass projects ONLY (keys, lsn), but a
    // CollectMetrics node forces every column its metric expressions touch
    // (tokens, for the payload invariant) to be read — the twin keeps the
    // pre-pass scan column-pruned. Predicates/transforms are the exact same
    // Column expressions, so the two lineages can never disagree on a row.
    lazy val mergeInputLean: DataFrame = {
      val goodLean = batch.filter(invariantOk)
      val filteredLean =
        if (cfg.filters.isEmpty) goodLean
        else goodLean.filter(FilterCompiler.cdcPredicate(cfg.filters, good.schema, opCol))
      val transformedLean = compiled.apply(filteredLean)
      if (introduced.isEmpty) transformedLean
      else transformedLean.filter(!(introduced.map(col(_).isNull).reduce(_ || _) &&
        opCol =!= ChangeEvent.DELETE))
    }

    cfg.mode match {
      case CdcMode.Scd2 =>
        applyScd2(spark, lake, mergeInput, epoch, cfg, keys, onStats,
          postStats() ++ extraMetrics)
      case _ =>
        applyLww(spark, lake, mergeInput, mergeInputLean, epoch, cfg, keys, onStats,
          postStats() ++ extraMetrics)
    }
  }

  /** Input-size floor for the LWW winner pre-pass
    * (-Dgraft.lww.prefilter.minInputBytes=N; <=0 disables — the DEFAULT).
    *
    * OFF by default, deliberately: the pre-pass is a measured 1.7–2× ingest
    * win here (MoR 25.4→16–19 s at 32M events; results hash-identical) and
    * its whole point — shuffled payload bytes cut from O(events) to O(keys),
    * ~7× at the bench shape — is THE lever guide §2.2–2.3 prescribes for
    * network-shuffle clusters, where it should be enabled (≥256 MB is a
    * sensible floor). But it reads the batch twice, and whether the second
    * full scan is cheaper than the payload shuffle it replaces depends on
    * storage the engine cannot observe (page-cache/tmpfs: yes, measured;
    * cold object store: not necessarily). The conservative default keeps
    * the one-pass plan; the knob, the spec pinning equality
    * (LwwPrefilterSpec), and the measurements ship with it. */
  private def lwwPrefilterMinBytes: Long =
    sys.props.get("graft.lww.prefilter.minInputBytes").map(_.toLong)
      .getOrElse(0L)

  /**
   * Winner pre-filter for bulk LWW batches (guide §8 "decide with small
   * rows, move big rows once" + §3.2 bloom pre-filtering). The per-key
   * max_by reduction carries the whole payload as its aggregation buffer —
   * a struct, which HashAggregateExec cannot hold, so the reduction plans
   * as SortAggregate: BOTH sides of the shuffle SORT every event row with
   * its payload (measured: the sort is ~20 s of the 25 s reduce phase at
   * 32M events / 8 cores). Instead:
   *
   *   1. decide winners on narrow rows: groupBy(keys).max(lsn) — primitive
   *      buffer, codegen'd HashAggregate, column-pruned scan of (keys, lsn)
   *      only (4.4 s measured for the same 32M);
   *   2. bloom the winner (keys, lsn) hashes (~1 byte/key, exact count from
   *      the cached winner set — no false negatives by construction);
   *   3. re-scan the batch keeping only rows that MIGHT be winners, and run
   *      the original max_by over that ~keyspace-sized survivor set.
   *
   * Results are identical: the true winner row always probes true (its
   * exact hash is in the set) and carries its key's maximal LSN, so the
   * final max_by picks it regardless of which false positives rode along;
   * LSN ties keep the same arbitrary-pick semantics because every row of a
   * tied (key, lsn) shares one hash and is admitted together. Shuffle bytes
   * drop from O(events × payload) to O(events × ~24B) + O(keys × payload).
   */
  /** Returns (frame, fired): `fired` tells the caller the frame is the
    * bloom-filtered survivor set, whose final reduction should use the
    * hash-aggregable [[graft.functions.LwwWinner]] (measured better there;
    * measured WORSE as the top-level aggregate over raw bulk rows, where
    * per-row object-buffer churn loses to the declarative sort). */
  private def lwwPrefilter(
      spark: SparkSession, lean: => DataFrame, observed: DataFrame,
      keys: Seq[String]): (DataFrame, Boolean) = {
    val minBytes = lwwPrefilterMinBytes
    if (minBytes <= 0) return (observed, false)
    // Batch size from the best available evidence: exact file bytes when the
    // frame is file-backed, otherwise the optimizer's own size estimate —
    // a foreachBatch frame is a LogicalRDD (inputFiles empty) whose stats
    // Spark 4 seeds from the source batch, so streaming bulk loads gate
    // correctly too. Estimates can only mis-gate the SHAPE (both shapes are
    // exact), and the floor keeps micro-batches on the one-pass plan.
    val fileBytes = scala.util.Try {
      observed.inputFiles.map { f =>
        val (fs, p) = graft.runner.CdcRunner.hadoopFs(spark, f)
        fs.getFileStatus(p).getLen
      }.sum
    }.getOrElse(0L)
    val statBytes = scala.util.Try(
      observed.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).toLong).getOrElse(0L)
    // a stats DEFAULT (no real estimate) is the huge defaultSizeInBytes
    // sentinel — treat it as unknown, not as a bulk batch
    val defaultSize = spark.sessionState.conf.defaultSizeInBytes
    val bytes = math.max(fileBytes,
      if (statBytes >= defaultSize) 0L else statBytes)
    // gate BEFORE touching `lean`: the micro-batch steady state must not
    // even pay the twin lineage's plan construction
    if (bytes < minBytes) return (observed, false)
    timed("lww-prefilter") {
      prefilterFired.incrementAndGet(): Unit
      val lsnC = col(ChangeEvent.LSN)
      val winners = lean.groupBy(keys.map(col): _*)
        .agg(max(lsnC).as("_w_lsn"))
        .select(xxhash64(keys.map(col) :+ col("_w_lsn"): _*).as("_kh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = math.max(1L, winners.count())
        val bf = winners.stat.bloomFilter("_kh", n, 0.02)
        val bc = spark.sparkContext.broadcast(bf)
        (observed.filter(graft.functions.BloomProbe.bloom_key_might_contain(
          xxhash64(keys.map(col) :+ lsnC: _*), bc)), true)
      } finally { winners.unpersist(); () } // bloom already built eagerly
    }
  }

  /** Shared commit scaffolding for BOTH modes: metrics assembly (op counts +
    * quarantine/received/skipped accounting), the empty-batch feed-marker
    * commit, and the merge-on-read delta commit — ONE definition. The two
    * hand-kept copies had already drifted twice (a committed map smaller
    * than the returned one; delta_commits in the manifest but not the
    * BatchResult). Returns (metrics, Some(result)) when the epoch is fully
    * handled here; (metrics, None) hands the caller on to its copy-on-write
    * path with the assembled base metrics. */
  private def commitCommon(
      spark: SparkSession,
      lake: LakeTable,
      epoch: Long,
      cfg: JobConfig,
      m: Manifest,
      affected: Set[Int],
      opCounts: Map[String, Long],
      onStats: () => (Long, Long, Long),
      /** by-name: carries the post-transform quarantine resolution, which may
        * only run AFTER the mode's first action (its observation completes
        * with it) and must run pre-commit; evaluated exactly once, here */
      extraMetrics: => Map[String, Long],
      deltaRows: => DataFrame,
      /** largest per-bucket row count of `deltaRows` (known exactly from the
        * stats collect) — sizes the delta write's adaptive salt. */
      maxDeltaRowsPerBucket: Long = Long.MaxValue): (() => Map[String, Long], Option[BatchResult]) = {
    // LAZY, evaluated once, always PRE-commit: onStats blocks on the
    // observation listener, and the shared listener bus lags behind the
    // thousands of task events a bulk epoch just posted — resolving it
    // AFTER the epoch's write job lets the bus drain in the shadow of real
    // work instead of stalling the driver between jobs (a fixed cost that
    // taxes exactly the high-core wall the scaling pair divides by).
    lazy val metrics: Map[String, Long] = timed("stats-resolve") {
      val (nQuarantined, nReceived, nSkipped) = onStats()
      val extra = extraMetrics
      Map(
        "batches" -> 1L,
        "events_quarantined" -> nQuarantined,
        "events_received" -> receivedDelta(epoch, nReceived),
        "applied_inserts" -> opCounts.getOrElse(ChangeEvent.INSERT, 0L),
        "applied_updates" -> opCounts.getOrElse(ChangeEvent.UPDATE, 0L),
        "applied_deletes" -> opCounts.getOrElse(ChangeEvent.DELETE, 0L)) ++
        // key present only when non-zero: a clean feed's manifests stay lean
        (if (nSkipped > 0) Map("skipped_keyless_deletes" -> nSkipped)
         else Map.empty[String, Long]) ++
        extra
    }
    if (affected.isEmpty) {
      // an empty batch still commits (and still carries extraMetrics): a
      // sync window whose changes all reduce away must advance its cursor.
      // A feed-recording CoW table still plants the durable `changes/_feed`
      // marker — it must exist from the FIRST feed-enabled epoch, or an
      // all-quarantined first batch leaves recordsChangeFeed false and the
      // later drain defaults to a sidecar-less commit that wedges every
      // changeLog window spanning it. Marker only, no sidecar: changeLog
      // never demands a sidecar from a file-less commit.
      if (cfg.changeFeed && cfg.merge != MergeStrategy.MergeOnRead)
        lake.enableChangeFeed()
      lake.commit(epoch, Nil, Set.empty, metrics)
      (() => metrics, Some(BatchResult(epoch, skipped = false, metrics)))
    } else if (cfg.merge == MergeStrategy.MergeOnRead) {
      // merge-on-read: the change set IS the commit — per-bucket delta
      // files, no base read, no join, no bucket rewrite; O(batch) bytes per
      // epoch regardless of how many buckets the batch touches. Commit and
      // return the SAME map (delta_commits included).
      val files = timed("delta-write")(
        writeEpoch(spark, lake, deltaRows, epoch, m, kind = DataFile.DELTA,
          maxRowsPerBucket = maxDeltaRowsPerBucket))
      val morMetrics = metrics + ("delta_commits" -> 1L)
      timed("commit")(lake.commit(epoch, files, Set.empty, morMetrics))
      (() => morMetrics, Some(BatchResult(epoch, skipped = false, morMetrics)))
    } else (() => metrics, None)
  }

  /** default/upsert modes: final state ≡ last-writer-wins fold (reference's literal
    * replay collapses to LWW after per-key reduction — SURVEY §2.4). */
  private def applyLww(
      spark: SparkSession,
      lake: LakeTable,
      events: DataFrame,
      eventsLean: => DataFrame,
      epoch: Long,
      cfg: JobConfig,
      keys: Seq[String],
      onStats: () => (Long, Long, Long),
      extraMetrics: => Map[String, Long]): BatchResult = {

    val m = lake.manifest
    val buckets = m.buckets
    // engine-internal columns (leading underscore, e.g. the stored per-row _lsn)
    // are never payload — FIXTURES F1
    val payloadCols = m.currentSchema.fields.map(_.name).filterNot(_.startsWith("_"))
    val nonKeyPayload = payloadCols.filterNot(keys.contains)
    val alignSchema =
      GraftSchema(m.currentSchemaId, m.currentSchema.fields.filterNot(_.name.startsWith("_")))
    val aligned0 = alignToSchema(events, alignSchema)
    // bulk batches (opt-in): decide winners on narrow rows first
    // (HashAggregate over (keys, lsn)), bloom-prefilter the payload scan —
    // see lwwPrefilter. Alignment runs on BOTH lineages so a widened key
    // hashes identically; lean is by-name, so below the gate the twin
    // lineage is never even constructed.
    val (aligned, prefiltered) = lwwPrefilter(spark,
      alignToSchema(eventsLean, alignSchema), aligned0, keys)

    // ── per-key LWW reduction: dedup by (key, lsn), keep max-lsn record ──
    // groupBy does map-side partial aggregation: a hot key contributes at
    // most one row per map task to the shuffle (skew-safe without salting).
    // Over the bloom-filtered survivor set the reduction runs as the
    // hash-aggregable lww_winner (≡ max_by value-for-value — see
    // graft.functions.LwwWinner); over a raw bulk batch the declarative
    // max_by stays: its SortAggregate beat lww_winner's per-row object
    // buffers there (measured 69–84 s vs 24 s at 32M events / 8 cores).
    // -Dgraft.lww.agg=maxby|winner overrides for comparison.
    val packed = struct((Seq(ChangeEvent.OP, ChangeEvent.LSN, ChangeEvent.TS) ++
      nonKeyPayload).map(col): _*)
    val winner = sys.props.get("graft.lww.agg") match {
      case Some("maxby")  => max_by(packed, col(ChangeEvent.LSN))
      case Some("winner") => graft.functions.LwwWinner.lww_winner(packed, col(ChangeEvent.LSN))
      case _ =>
        if (prefiltered) graft.functions.LwwWinner.lww_winner(packed, col(ChangeEvent.LSN))
        else max_by(packed, col(ChangeEvent.LSN))
    }
    val reduced = aligned
      .groupBy(keys.map(col): _*)
      .agg(winner.as("_r"))
      .select(keys.map(col) :+ col("_r.*"): _*)
      .withColumn("_bucket", lake.bucketExpr(keys, buckets))
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      // one small job on the cached reduction yields op metrics AND affected
      // buckets — the FIRST action, on the original frame, so the fused
      // observe() metrics resolve here
      val opByBucket = timed("reduce+stats")(
        reduced.groupBy("_bucket", ChangeEvent.OP).count().collect())
      // every FURTHER consumer (delta/sidecar write, the CoW change side)
      // plans over the compiled reduction instead of re-analyzing the whole
      // source→parse→rules tree per action
      val changes = planOnce(spark, reduced)
      val affected = opByBucket.map(_.getInt(0)).toSet
      val opCounts = opByBucket.groupBy(_.getString(1))
        .map { case (op, rows) => op -> rows.map(_.getLong(2)).sum }
      // per-bucket change rows — already collected above; sizes the adaptive
      // write salt (small epochs write one file per bucket, not WRITE_SALT)
      val changeRowsByBucket = opByBucket.groupBy(_.getInt(0))
        .map { case (b, rows) => b -> rows.map(_.getLong(2)).sum }
      // the reduced change set in delta-row shape — the MoR commit itself, and
      // the CoW change sidecar when the table records a change feed
      def deltaRows = {
        val cOp = col(ChangeEvent.OP)
        changes.select(
          (payloadCols.map { c =>
            if (keys.contains(c)) col(c)
            else when(cOp === ChangeEvent.DELETE, lit(null)).otherwise(col(c)).as(c)
          } :+
            col(ChangeEvent.LSN).as("_lsn") :+
            (cOp === ChangeEvent.DELETE).as("_deleted") :+
            col("_bucket")): _*)
      }

      val (baseMetricsFn, early) = commitCommon(spark, lake, epoch, cfg, m,
        affected, opCounts, onStats, extraMetrics, deltaRows,
        maxDeltaRowsPerBucket =
          if (changeRowsByBucket.isEmpty) 0L else changeRowsByBucket.values.max)
      early.foreach(r => return r)

      // CoW change sidecar (LakeTable.changeLog's CDC-out source for CoW
      // tables) — written BEFORE the commit so a committed epoch always has
      // its change set; a crash in between leaves an orphan sidecar the
      // retried epoch overwrites
      if (cfg.changeFeed)
        timed("change-sidecar")(
          lake.writeChangeSet(deltaRows.drop("_bucket"), epoch, m.currentSchemaId))

      // ── copy-on-write: manifest-pruned base read — only affected buckets
      // (closure-expanded: after a rescale a coarser pre-split file covers
      // sibling buckets too, which must be read and rewritten together).
      // OPTIMISTIC AND PINNED: the base is read at the SAME snapshot the
      // commit declares as its readVersion, so a concurrent DATA commit into
      // an overlapping bucket (a quarantine drain, a maintenance rewrite,
      // another sync job from a second JVM) raises ConcurrentCommitException
      // instead of being silently folded over — the loop then recomputes the
      // whole merge from the fresh head and retries (bounded), exactly the
      // published lake formats' optimistic write loop. ──
      def cowAttempt(mAt: Manifest): BatchResult = {
        val affectedC = lake.bucketClosure(mAt, affected)
        val base = lake.readBuckets(spark, affectedC, Some(mAt))

        // ── full-outer merge on the key; AQE broadcasts the reduced side when small ──
        // True last-writer-wins: the change side wins only if its LSN is newer than
        // the row's stored _lsn, so re-ordered/re-delivered batches cannot regress
        // the table to an older version (order-tolerant upsert).
        val cPrefix = "_c_"
        val changeSide = changes.select(
          keys.map(col) ++
            (Seq(ChangeEvent.OP, ChangeEvent.LSN) ++ nonKeyPayload)
              .map(c => col(c).as(cPrefix + c)): _*)
        val joined = base.join(changeSide, keys, "full_outer")
        val cOp = col(cPrefix + ChangeEvent.OP)
        val cLsn = col(cPrefix + ChangeEvent.LSN)
        val changeWins = cOp.isNotNull && (col("_lsn").isNull || cLsn > col("_lsn"))
        // DELETEs leave a tombstone row (_deleted=true) instead of vanishing, so
        // an out-of-order older INSERT loses the LSN comparison and cannot
        // resurrect the key. Public reads filter tombstones (LakeTable.read);
        // compaction/vacuum carry them until GC'd.
        val merged = joined
          .select((payloadCols.map { c =>
            if (keys.contains(c)) col(c)
            else when(changeWins, col(cPrefix + c)).otherwise(col(c)).as(c)
          } :+
            when(changeWins, cLsn).otherwise(col("_lsn")).as("_lsn") :+
            when(changeWins, cOp === ChangeEvent.DELETE)
              .otherwise(coalesce(col("_deleted"), lit(false))).as("_deleted")): _*)
          .withColumn("_bucket", lake.bucketExpr(keys, buckets))

        // adaptive-salt sizing: merged rows per bucket ≤ base rows (exact
        // manifest footer counts) + change rows (the stats collect); a
        // stats-less file (rows = -1) degrades to unknown = full salt
        val mergedMax: Long = {
          val fs = mAt.files.filter(f => affectedC.exists(b => b % f.spec == f.bucket))
          if (fs.exists(_.rows < 0)) Long.MaxValue
          else {
            val baseRows = scala.collection.mutable.Map.empty[Int, Long]
              .withDefaultValue(0L)
            fs.foreach(f => f.coveredBuckets(mAt.buckets).foreach { b =>
              if (affectedC.contains(b)) baseRows(b) += f.rows })
            affectedC.iterator
              .map(b => baseRows(b) + changeRowsByBucket.getOrElse(b, 0L)).max
          }
        }
        val files = timed("merge+write")(writeEpoch(spark, lake, merged, epoch, mAt,
          maxRowsPerBucket = mergedMax))
        // metrics resolve HERE, after the epoch's write job — the observe
        // listener lag drains in the shadow of the write (see commitCommon)
        val baseMetrics = baseMetricsFn()
        beforeCowCommit()
        timed("commit")(lake.commit(epoch, files, affectedC, baseMetrics,
          readVersion = Some(mAt.version)))
        BatchResult(epoch, skipped = false, baseMetrics)
      }
      retryCow(lake, m, epoch)(cowAttempt)
    } finally reduced.unpersist()
  }

  /** Bounded optimistic retry around one pinned CoW merge attempt: on
    * [[graft.lake.ConcurrentCommitException]] the attempt is recomputed from
    * the fresh head — UNLESS the conflict changed something the cached
    * reduction itself depends on (bucket spec, schema), where a retry would
    * mis-bucket or mis-name the rows; those rethrow and the stream replays
    * the batch from the checkpoint against the new table shape. */
  private def retryCow(lake: LakeTable, m0: Manifest, epoch: Long)(
      attempt: Manifest => BatchResult): BatchResult = {
    var mAt = m0
    var tries = 0
    while (true) {
      try return attempt(mAt)
      catch {
        case e: graft.lake.ConcurrentCommitException =>
          tries += 1
          if (tries > 3) throw e
          val fresh = lake.manifest
          if (fresh.buckets != m0.buckets)
            throw new graft.lake.ConcurrentCommitException(
              s"commit(epoch=$epoch): a concurrent rescale changed the bucket " +
                s"spec ${m0.buckets} -> ${fresh.buckets} mid-batch; the batch " +
                s"reduction is bucketed at the old spec — replay the batch " +
                s"(cause: ${e.getMessage})")
          if (fresh.currentSchemaId != m0.currentSchemaId)
            throw new graft.lake.ConcurrentCommitException(
              s"commit(epoch=$epoch): the schema evolved concurrently " +
                s"(id ${m0.currentSchemaId} -> ${fresh.currentSchemaId}) " +
                s"mid-batch; the merge frame carries the old column set — " +
                s"replay the batch (cause: ${e.getMessage})")
          mAt = fresh
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Test seam: runs after a CoW attempt's files are written, right before
    * its pinned commit — specs use it to interleave a conflicting external
    * commit deterministically. No-op in production. */
  private[graft] var beforeCowCommit: () => Unit = () => ()

  /** Test/diagnostic seam: how many times the LWW winner pre-filter actually
    * fired (gate passed AND the bloom was built) — a spec asserting the
    * prefiltered path's equality must also prove the path RAN, or it
    * compares the default path against itself. */
  private[graft] val prefilterFired = new java.util.concurrent.atomic.AtomicLong(0)

  /**
   * SCD2 mode: every change produces/closes a version row
   * (reference: CDCOperationsHandler.py:216-277).
   *
   * Out-of-order-safe by construction: every version row stores its event's
   * `_lsn`, DELETEs persist as hidden marker rows (`_deleted`, filtered from
   * public reads), and each batch REBUILDS the chain of every key in the
   * affected buckets from the union of existing rows + new events — end_date =
   * next version's start, current = last-by-LSN unless it is a delete marker.
   * A late event therefore splices into its correct historical position
   * instead of silently corrupting the chain (the reference's row-serial
   * close-then-insert assumes ordered arrival). Cost is the same
   * affected-bucket CoW rewrite the mode already paid; the window adds no I/O.
   */
  private def applyScd2(
      spark: SparkSession,
      lake: LakeTable,
      events: DataFrame,
      epoch: Long,
      cfg: JobConfig,
      naturalKeys: Seq[String],
      onStats: () => (Long, Long, Long),
      extraMetrics: => Map[String, Long]): BatchResult = {

    val m = lake.manifest
    val buckets = m.buckets
    val scd = cfg.scdCols
    val payloadCols = m.currentSchema.fields.map(_.name)
      .filterNot(c => c == scd.startDate || c == scd.endDate || c == scd.current)
      .filterNot(_.startsWith("_"))

    val alignSchema = GraftSchema(m.currentSchemaId,
      m.currentSchema.fields.filter(f => payloadCols.contains(f.name)))
    val withBucket = alignToSchema(events, alignSchema)
      .withColumn("_bucket", lake.bucketExpr(naturalKeys, buckets))
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      // first action on the original frame (observe resolves here); further
      // consumers plan over the compiled reduction — see applyLww
      val stats = withBucket.groupBy("_bucket", ChangeEvent.OP).count().collect()
      val changes = planOnce(spark, withBucket)
      val affected = stats.map(_.getInt(0)).toSet
      val opCounts = stats.groupBy(_.getString(1))
        .map { case (op, rows) => op -> rows.map(_.getLong(2)).sum }
      val changeRowsByBucket = stats.groupBy(_.getInt(0))
        .map { case (b, rows) => b -> rows.map(_.getLong(2)).sum }
      // incoming events as version rows; DELETEs become hidden marker rows
      def evRows = changes.select(
        (payloadCols.map(col) :+
          col(ChangeEvent.TS).cast(TimestampType).as(scd.startDate) :+
          lit(null).cast(TimestampType).as(scd.endDate) :+
          lit(0).as(scd.current) :+
          col(ChangeEvent.LSN).as("_lsn") :+
          (col(ChangeEvent.OP) === ChangeEvent.DELETE).as("_deleted") :+
          col("_bucket")): _*)

      // empty / merge-on-read handled by the shared scaffolding (for scd2
      // the version rows themselves are the delta commit — the chain
      // (end_date/current) is rebuilt at read time / folded by compaction,
      // so history ingest never rewrites the hot buckets either)
      val (metricsFn, early) = commitCommon(spark, lake, epoch, cfg, m,
        affected, opCounts, onStats, extraMetrics, evRows,
        maxDeltaRowsPerBucket =
          if (changeRowsByBucket.isEmpty) 0L else changeRowsByBucket.values.max)
      early.foreach(r => return r)

      // CoW change sidecar: scd2's change set is its version rows (same shape
      // merge-on-read commits as deltas)
      if (cfg.changeFeed)
        timed("change-sidecar")(
          lake.writeChangeSet(evRows.drop("_bucket"), epoch, m.currentSchemaId))

      // pinned optimistic CoW, same loop as applyLww: base read, rewrite and
      // commit all speak the one snapshot `mAt` declares as readVersion
      def cowAttempt(mAt: Manifest): BatchResult = {
        val affectedC = lake.bucketClosure(mAt, affected)
        val base = lake.readBuckets(spark, affectedC, Some(mAt))
          .withColumn("_bucket", lake.bucketExpr(naturalKeys, buckets))

        // rebuild every affected key's chain from ALL its versions, LSN-ordered;
        // dropDuplicates tolerates upstream at-least-once re-delivery
        val all = base.unionByName(evRows)
          .dropDuplicates(naturalKeys :+ "_lsn")
        val w = Window.partitionBy(naturalKeys.map(col): _*).orderBy(col("_lsn"))
        val nextStart = lead(col(scd.startDate), 1).over(w)
        // current = no next ROW (marker lead), matching the bucket-local fold:
        // a null next-start must not leave two current versions of one key
        val hasNext = lead(lit(1), 1).over(w).isNotNull
        val rebuilt = all
          .withColumn(scd.endDate, nextStart)
          .withColumn(scd.current,
            when(!hasNext && !col("_deleted"), lit(1)).otherwise(lit(0)))

        // same adaptive-salt sizing as the LWW path: versions per bucket ≤
        // base rows (manifest footer counts) + this batch's version rows
        val mergedMax: Long = {
          val fs = mAt.files.filter(f => affectedC.exists(b => b % f.spec == f.bucket))
          if (fs.exists(_.rows < 0)) Long.MaxValue
          else {
            val baseRows = scala.collection.mutable.Map.empty[Int, Long]
              .withDefaultValue(0L)
            fs.foreach(f => f.coveredBuckets(mAt.buckets).foreach { b =>
              if (affectedC.contains(b)) baseRows(b) += f.rows })
            affectedC.iterator
              .map(b => baseRows(b) + changeRowsByBucket.getOrElse(b, 0L)).max
          }
        }
        val files = writeEpoch(spark, lake, rebuilt, epoch, mAt,
          maxRowsPerBucket = mergedMax)
        val metrics = metricsFn() // after the write — see commitCommon
        beforeCowCommit()
        lake.commit(epoch, files, affectedC, metrics,
          readVersion = Some(mAt.version))
        BatchResult(epoch, skipped = false, metrics)
      }
      retryCow(lake, m, epoch)(cowAttempt)
    } finally withBucket.unpersist()
  }

  /** Bucket-partitioned epoch write. The epoch dir is overwritten wholesale on a
    * task/batch retry, keeping (epoch, partition) file sets idempotent.
    *
    * The shuffle key is (bucket, small salt): a plain repartition(bucket) hashes
    * whole buckets onto shuffle.partitions slots — at low bucket:core ratios the
    * Poisson collisions leave cores idle and a hot (zipf) bucket becomes one
    * straggler task. The salt splits each bucket across up to WRITE_SALT tasks
    * (bounded: ≤ WRITE_SALT files per bucket per epoch).
    *
    * Salt input = ALL merge-key columns (hashing only the first schema field
    * would collapse the salt whenever that field isn't part of a composite
    * key), plus `_lsn` for scd2 version rows so one hot key's version HISTORY
    * — many rows, same key — spreads across salt tasks too.
    *
    * `maxRowsPerBucket` (when the caller knows it — merge stats + manifest
    * footer counts) sizes the salt ADAPTIVELY: a bucket under
    * [[writeSaltRowsPerTask]] rows needs no splitting, so a small epoch
    * writes one file per bucket instead of WRITE_SALT — 4× fewer files to
    * write, footer-read, track in manifests and later compact — while a
    * bucket past the threshold still fans out to the full salt. Unknown
    * (Long.MaxValue) keeps the conservative full salt: the full load — the
    * biggest write of a table's life — stays maximally spread. */
  private val WRITE_SALT = 4
  /** Rows one write task is allowed before the salt splits its bucket —
    * settable for tests/ops (`-Dgraft.write.salt.rows.per.task=`). */
  private def writeSaltRowsPerTask: Long =
    sys.props.get("graft.write.salt.rows.per.task").map(_.toLong)
      .getOrElse(2000000L)
  private[graft] def writeEpoch(
      spark: SparkSession,
      lake: LakeTable,
      merged: DataFrame,
      epoch: Long,
      m: Manifest,
      kind: String = DataFile.BASE,
      maxRowsPerBucket: Long = Long.MaxValue): Seq[DataFile] = {
    val keyCols =
      if (m.keyCols.nonEmpty) m.keyCols else Seq(m.currentSchema.fields.head.name)
    val saltCols = keyCols ++
      (if (m.tableMode == Manifest.SCD2 && merged.columns.contains("_lsn"))
        Seq("_lsn") else Nil)
    val salt =
      if (maxRowsPerBucket >= writeSaltRowsPerTask * WRITE_SALT) WRITE_SALT
      else math.max(1L,
        (maxRowsPerBucket + writeSaltRowsPerTask - 1) / writeSaltRowsPerTask).toInt
    val keyed =
      if (salt <= 1) merged.repartition(col("_bucket"))
      else merged
        // extra lit distinguishes the salt hash from the bucket hash (which
        // also hashes the keys — salt would otherwise be a pure function of
        // bucket)
        .withColumn("_wsalt",
          pmod(xxhash64(saltCols.map(col) :+ lit(7919): _*), lit(salt)))
        .repartition(col("_bucket"), col("_wsalt"))
        .drop("_wsalt")
    keyed
      .write.mode("overwrite")
      .options(lake.bloomOptions(m.keyCols))
      .partitionBy("_bucket")
      .parquet(lake.dataDir(epoch))
    lake.listEpochFiles(epoch, m, Map.empty, kind)
  }
}
