package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.apply.MergeApply
import graft.lake.{AddColumn, LakeSync, LakeTable, WidenColumn}
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: a mirror CONVERGES to its source under ANY interleaving of source
 * batches (shuffled LSNs, re-deliveries), source maintenance (compact,
 * rescale, splitBuckets, vacuum), source schema evolution, target
 * maintenance, and sync calls — `target.read == source.read` (engine `_lsn`
 * included) after every sync, with the source's own public read as the
 * oracle.
 *
 * This is the adversarial path for [[LakeTable.changeLog]]'s fragment-diff:
 * compaction and rescale CONSOLIDATE the fragment list mid-window (every live
 * file re-appears in one new fragment), deltas folded away inside a window
 * must still be served from their original files, maintenance commits must
 * contribute nothing, and vacuum must never prune a version a sync cursor
 * still needs (the test holds the retention floor at the cursor, per the
 * documented contract). LakeSyncSpec holds the directed cases; this drives
 * the composition randomly, for both source storage modes × both target
 * storage modes.
 */
class LakeSyncPropertySpec extends SparkSpec {

  private val schema = ChangeEvent.schema()

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn / 3, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%04d",
      if (del) null else (0 until v).map(i => key * 17 + i),
      if (del) null else Int.box(v),
      if (del) null else s"s$v")
  }

  private sealed trait Step
  private case class SrcBatch(events: List[(Int, String, Int)],
      redeliver: Boolean) extends Step
  private case object SrcCompact extends Step
  private case object SrcRescale extends Step
  private case object SrcSplit extends Step
  private case class SrcVacuum(keep: Int) extends Step
  private case object SrcEvolve extends Step
  private case object Sync extends Step
  private case object TgtCompact extends Step
  private case class TgtVacuum(keep: Int) extends Step

  private val eventGen: Gen[(Int, String, Int)] = for {
    key <- Gen.choose(0, 15)
    op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    v <- Gen.choose(1, 6)
  } yield (key, op, v)

  private val stepGen: Gen[Step] = Gen.frequency(
    5 -> (for {
      n <- Gen.choose(4, 14)
      evs <- Gen.listOfN(n, eventGen)
      re <- Gen.oneOf(true, false)
    } yield SrcBatch(evs, re)),
    4 -> Gen.const(Sync),
    2 -> Gen.const(SrcCompact),
    1 -> Gen.const(SrcRescale),
    1 -> Gen.const(SrcSplit),
    1 -> Gen.choose(2, 4).map(SrcVacuum(_)),
    1 -> Gen.const(SrcEvolve),
    1 -> Gen.const(TgtCompact),
    1 -> Gen.choose(2, 4).map(TgtVacuum(_)))

  /** Public state, every column (engine `_lsn` included — the mirror must
    * carry it exactly or a later out-of-order window would diverge). */
  private def state(lake: LakeTable): Seq[String] = {
    val df = lake.read(spark)
    df.select(df.columns.sorted.map(col).toSeq: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("sync converges under ANY interleaving of source batches, source/" +
      "target maintenance, evolution and sync calls — both storage modes each side") {
    (0 until 4).foreach { trial =>
      val steps = Gen.listOfN(14, stepGen)(
        Gen.Parameters.default, Seed(9300L + trial)).get
      val srcMor = trial % 2 == 0
      val tgtMerge =
        if (trial / 2 % 2 == 0) MergeStrategy.CopyOnWrite else MergeStrategy.MergeOnRead
      val root = tmpDir("graft-sync-prop")
      val srcDir = s"$root/src"
      val tgtDir = s"$root/tgt"
      val cfg = RunnerConfig(feedDir = s"$root/feed", tableDir = srcDir,
        checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 4,
          merge = if (srcMor) MergeStrategy.MergeOnRead else MergeStrategy.CopyOnWrite,
          // a CoW source must record sidecars from epoch 0 or changeLog
          // (sync's window read) refuses — the documented feed contract
          changeFeed = !srcMor))
      val source = CdcRunner.ensureTable(spark, cfg)
      val target = new LakeTable(tgtDir)
      val rnd = new scala.util.Random(5800L + trial)

      var nextLsn = 1L
      var epoch = 0L
      var delivered = Vector.empty[Row]
      var widened = false
      var evolveN = 0
      // vacuum floor: the source must retain every version from the sync
      // cursor forward — the standard lake retention contract a production
      // deployment sizes its vacuum window around
      def syncCursor: Int =
        if (!target.exists) source.currentVersion
        else target.manifest.metrics.getOrElse(LakeSync.OFFSET_METRIC, 0L).toInt

      def runSync(): Unit = {
        LakeSync.sync(spark, srcDir, tgtDir, merge = tgtMerge)
        assert(state(target) == state(source),
          s"trial=$trial srcMor=$srcMor tgt=$tgtMerge diverged after sync")
      }

      steps.foreach {
        case SrcBatch(evs, re) =>
          val fresh = evs.map { case (k, op, v) =>
            val l = nextLsn; nextLsn += 1; mkRow(l, k, op, v)
          }
          val redelivered =
            if (re && delivered.nonEmpty) rnd.shuffle(delivered).take(1 + rnd.nextInt(3))
            else Nil
          val rows = rnd.shuffle(fresh ++ redelivered)
          delivered ++= fresh
          val df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 2), schema)
          MergeApply.applyBatch(spark, source, df, epoch, cfg.job)
          epoch += 1
        case SrcCompact =>
          source.compact(spark, maxFilesPerBucket = 1 + rnd.nextInt(3),
            maxDeltaFiles = 1 + rnd.nextInt(3))
        case SrcRescale =>
          val b = source.manifest.buckets
          if (b < 32) source.rescale(b * 2)
        case SrcSplit =>
          source.splitBuckets(spark, maxGroups = 1 + rnd.nextInt(3))
        case SrcVacuum(k) =>
          source.vacuum(keepVersions =
            math.max(k, source.currentVersion - syncCursor + 1))
        case SrcEvolve =>
          if (!widened && rnd.nextBoolean()) {
            source.evolve(Seq(WidenColumn("n_tok", LongType)))
            widened = true
          } else {
            evolveN += 1
            source.evolve(Seq(AddColumn(s"extra_$evolveN", StringType)))
          }
        case Sync => runSync()
        case TgtCompact =>
          if (target.exists)
            target.compact(spark, maxFilesPerBucket = 1 + rnd.nextInt(3),
              maxDeltaFiles = 1 + rnd.nextInt(3))
        case TgtVacuum(k) =>
          if (target.exists) target.vacuum(keepVersions = k)
      }
      // always end caught-up, and a caught-up re-sync is a no-op
      runSync()
      val r = LakeSync.sync(spark, srcDir, tgtDir, merge = tgtMerge)
      assert(r.epoch == -2L && r.rows == 0L,
        s"trial=$trial caught-up re-sync was not a no-op: $r")
    }
  }
}
