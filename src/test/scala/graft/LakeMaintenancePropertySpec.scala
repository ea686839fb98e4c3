package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.apply.MergeApply
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: the maintenance surface is INVISIBLE to readers. Under any
 * interleaving of data batches — copy-on-write and merge-on-read mixed on one
 * table, shuffled (out-of-order) LSN delivery, at-least-once re-deliveries —
 * with the full maintenance state machine (compact, rescale, splitBuckets,
 * rewriteManifests, vacuum, removeOrphans):
 *
 *   1. the public read always equals the per-key max-LSN fold of every event
 *      delivered so far (the replay-semantics oracle);
 *   2. a point lookup agrees with that fold for present AND absent keys;
 *   3. time travel to any version inside vacuum's retention window still
 *      returns the exact state recorded when that version was committed
 *      (snapshot isolation survives every later rewrite);
 *   4. the lineage audit stays clean at the end (every commit accounted).
 *
 * MaintenanceSpec holds the directed versions of these transitions; this spec
 * drives the transition GRAPH randomly — the mixed-spec windows, delta-over-
 * coarse-base reads and fragment sweeps that only emerge from composition.
 */
class LakeMaintenancePropertySpec extends SparkSpec {

  private val schema = ChangeEvent.schema()

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn / 3, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%04d",
      if (del) null else (0 until v).map(i => key * 13 + i),
      if (del) null else Int.box(v),
      if (del) null else s"s$v")
  }

  private sealed trait Step
  private case class Batch(events: List[(Int, String, Int)], mor: Boolean,
      redeliver: Boolean) extends Step
  private case object Compact extends Step
  private case object Rescale extends Step
  private case object Split extends Step
  private case object Rewrite extends Step
  private case class Vacuum(keep: Int) extends Step
  private case object Orphans extends Step

  private val eventGen: Gen[(Int, String, Int)] = for {
    key <- Gen.choose(0, 19)
    op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    v <- Gen.choose(1, 6)
  } yield (key, op, v)

  private val stepGen: Gen[Step] = Gen.frequency(
    6 -> (for {
      n <- Gen.choose(4, 16)
      evs <- Gen.listOfN(n, eventGen)
      mor <- Gen.oneOf(true, false)
      re <- Gen.oneOf(true, false)
    } yield Batch(evs, mor, re)),
    2 -> Gen.const(Compact),
    1 -> Gen.const(Rescale),
    2 -> Gen.const(Split),
    1 -> Gen.const(Rewrite),
    2 -> Gen.choose(2, 4).map(Vacuum(_)),
    1 -> Gen.const(Orphans))

  test("maintenance is invisible: ANY interleaving of CoW+MoR batches " +
      "(shuffled LSNs, re-delivery) with compact/rescale/split/rewrite/" +
      "vacuum/orphans preserves the LWW fold, lookups, and retained snapshots") {
    (0 until 3).foreach { trial =>
      val steps = Gen.listOfN(12, stepGen)(
        Gen.Parameters.default, Seed(7100L + trial)).get
      val root = tmpDir("graft-maint-prop")
      val cfg = RunnerConfig(feedDir = s"$root/feed", tableDir = s"$root/table",
        checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 4))
      val lake = CdcRunner.ensureTable(spark, cfg)
      val rnd = new scala.util.Random(4200L + trial)

      var nextLsn = 1L
      var epoch = 0L
      // replay-semantics oracle: per key, the max-LSN event wins
      var best = Map.empty[String, (Long, String, Row)]
      var delivered = Vector.empty[Row]
      def foldEvent(r: Row): Unit = {
        val id = r.getString(5); val lsn = r.getLong(0)
        if (!best.get(id).exists(_._1 >= lsn)) best += id -> ((lsn, r.getString(3), r))
      }
      def expectedState: Map[String, (List[Int], Int, String)] =
        best.collect { case (id, (_, op, r)) if op != ChangeEvent.DELETE =>
          id -> ((r.getAs[scala.collection.Seq[Int]](6).toList, r.getInt(7),
            r.getString(8)))
        }
      def stateOf(rows: Array[Row]): Map[String, (List[Int], Int, String)] =
        rows.map { r =>
          r.getAs[String]("doc_id") -> ((
            r.getAs[scala.collection.Seq[Int]]("tokens").toList,
            r.getAs[Int]("n_tok"), r.getAs[String]("source")))
        }.toMap
      // version -> state recorded at commit time, pruned on vacuum
      var recorded = Map.empty[Int, Map[String, (List[Int], Int, String)]]

      steps.foreach { step =>
        step match {
          case Batch(evs, mor, re) =>
            // fresh global LSNs, then SHUFFLED delivery (order-tolerance), plus
            // a few re-delivered rows from earlier batches (at-least-once)
            val fresh = evs.map { case (k, op, v) =>
              val l = nextLsn; nextLsn += 1; mkRow(l, k, op, v)
            }
            val redelivered =
              if (re && delivered.nonEmpty) rnd.shuffle(delivered).take(1 + rnd.nextInt(3))
              else Nil
            val rows = rnd.shuffle(fresh ++ redelivered)
            fresh.foreach(foldEvent)
            delivered ++= fresh
            val df = spark.createDataFrame(
              spark.sparkContext.parallelize(rows, 2), schema)
            MergeApply.applyBatch(spark, lake, df, epoch, cfg.job.copy(
              merge = if (mor) MergeStrategy.MergeOnRead else MergeStrategy.CopyOnWrite))
            epoch += 1
            recorded += lake.currentVersion -> expectedState
          case Compact =>
            lake.compact(spark, maxFilesPerBucket = 1 + rnd.nextInt(3),
              maxDeltaFiles = 1 + rnd.nextInt(3))
          case Rescale =>
            val b = lake.manifest.buckets
            if (b < 32) lake.rescale(b * 2)
          case Split =>
            lake.splitBuckets(spark, maxGroups = 1 + rnd.nextInt(3))
          case Rewrite =>
            lake.rewriteManifests()
          case Vacuum(keep) =>
            val cur = lake.currentVersion
            lake.vacuum(keepVersions = keep)
            recorded = recorded.filter { case (v, _) => v >= cur - keep + 1 }
          case Orphans =>
            lake.removeOrphans(olderThanMs = 0L)
        }

        // 1. public read == oracle fold, after EVERY transition
        val actual = stateOf(lake.read(spark).collect())
        assert(actual == expectedState,
          s"trial=$trial after $step:\n actual=$actual\n expected=$expectedState")

        // 2. one point lookup per step: a key the oracle knows (present or
        // deleted) — exercises footer-range + bucket pruning on whatever
        // mixed-spec file layout this step left behind
        if (best.nonEmpty) {
          val id = best.keys.toSeq(rnd.nextInt(best.size))
          val got = lake.lookup(spark, id).collect()
          expectedState.get(id) match {
            case Some(exp) =>
              assert(got.length == 1 && stateOf(got)(id) == exp,
                s"trial=$trial lookup($id) after $step: got ${got.toSeq}")
            case None =>
              assert(got.isEmpty,
                s"trial=$trial lookup($id) after $step: expected deleted, got ${got.toSeq}")
          }
        }

        // 3. snapshot isolation: one RETAINED recorded version still reads
        // exactly the state it committed, no matter what rewrote the table since
        if (recorded.nonEmpty) {
          val (v, exp) = recorded.toSeq(rnd.nextInt(recorded.size))
          val tt = stateOf(lake.readVersion(spark, v).collect())
          assert(tt == exp,
            s"trial=$trial time travel v$v after $step:\n got=$tt\n expected=$exp")
        }
      }

      // 4. the audit trail survived every maintenance pass
      val rep = lake.reconcile()
      assert(rep.ok, s"trial=$trial reconcile: $rep")
    }
  }
}
