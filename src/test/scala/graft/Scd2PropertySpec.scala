package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.apply.MergeApply
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: SCD2 batched apply equals the reference's sequential row-at-a-time
 * history fold (CDCOperationsHandler.py:216-277) for ANY event stream and ANY
 * batch split — version chains must be identical whether updates arrive in one
 * batch (lead() chaining) or across batches (close-current-then-append).
 */
class Scd2PropertySpec extends SparkSpec {

  case class Version(start: Long, end: Option[Long], current: Boolean, v: Int)

  private val eventGen: Gen[(Int, String, Int)] = for {
    key <- Gen.choose(0, 7)
    op <- Gen.frequency(4 -> "INSERT", 4 -> "UPDATE", 2 -> "DELETE")
    v <- Gen.choose(1, 9)
  } yield (key, op, v)

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%09d",
      if (del) null else Seq(v),
      if (del) null else Int.box(1),
      if (del) null else s"s$v")
  }

  /** Sequential fold: the reference's per-row close-then-insert semantics. */
  private def oracle(rows: Seq[Row]): Map[String, List[Version]] = {
    val hist = scala.collection.mutable.Map.empty[String, List[Version]]
    rows.foreach { r =>
      val id = r.getString(5); val lsn = r.getLong(0); val op = r.getString(3)
      val versions = hist.getOrElse(id, Nil)
      val closed = versions.map(v =>
        if (v.current) v.copy(end = Some(lsn), current = false) else v)
      op match {
        case "DELETE" => hist(id) = closed
        case _ =>
          hist(id) = closed :+ Version(lsn, None, current = true,
            r.getAs[scala.collection.Seq[Int]](6).head)
      }
    }
    hist.toMap.filter(_._2.nonEmpty)
  }

  /** Compare the table's full history against the LSN-ordered sequential
    * fold of `rows` (arrival order is irrelevant by design). */
  private def verify(lake: graft.lake.LakeTable, rows: Seq[Row], label: String): Unit = {
    val expected = oracle(rows.sortBy(_.getLong(0)))
    val actual = lake.read(spark).collect()
      .groupBy(_.getAs[String]("doc_id"))
      .view.mapValues(_.map { r =>
        val start = r.getAs[java.sql.Timestamp]("scd_start_date").getTime / 1000 - 1700000000L
        val end = Option(r.getAs[java.sql.Timestamp]("scd_end_date"))
          .map(_.getTime / 1000 - 1700000000L)
        Version(start, end, r.getAs[Int]("scd_current") == 1,
          r.getAs[scala.collection.Seq[Int]]("tokens").head)
      }.sortBy(_.start).toList).toMap
    assert(actual == expected, s"$label\n actual=$actual\n expected=$expected")
  }

  private def runTrial(rows: Seq[Row], batches: Seq[Seq[Row]], label: String): Unit = {
    val root = tmpDir("graft-scd2prop")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Scd2, buckets = 4))
    val lake = CdcRunner.ensureTable(spark, cfg)
    batches.zipWithIndex.foreach { case (chunk, epoch) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(chunk, 2), ChangeEvent.schema())
      MergeApply.applyBatch(spark, lake, df, epoch.toLong, cfg.job)
    }
    verify(lake, rows, label)
  }

  test("scd2 batched apply == sequential history fold, any stream, any batch split") {
    val caseGen = for {
      evs <- Gen.listOfN(60, eventGen)
      nBatches <- Gen.choose(1, 4)
    } yield (evs, nBatches)
    (0 until 6).foreach { trial =>
      val (evs, nBatches) = caseGen(Gen.Parameters.default, Seed(7L + trial)).get
      val rows = evs.zipWithIndex.map { case ((k, op, v), i) => mkRow(i + 1L, k, op, v) }
      val per = math.max(1, rows.size / nBatches)
      runTrial(rows, rows.grouped(per).toSeq, s"trial=$trial nBatches=$nBatches")
    }
  }

  test("scd2 OUT-OF-ORDER arrival: shuffled batches splice into the same history") {
    val caseGen = Gen.listOfN(50, eventGen)
    (0 until 4).foreach { trial =>
      val evs = caseGen(Gen.Parameters.default, Seed(101L + trial)).get
      val rows = evs.zipWithIndex.map { case ((k, op, v), i) => mkRow(i + 1L, k, op, v) }
      // adversarial arrival: shuffle the whole stream, then batch — late events
      // (lower LSN in a later epoch) must splice, not corrupt
      val shuffled = new scala.util.Random(trial).shuffle(rows)
      runTrial(rows, shuffled.grouped(17).toSeq, s"ooo-trial=$trial")
    }
  }

  test("scd2 history survives ANY maintenance interleaving: shuffled CoW+MoR " +
      "batches with re-delivery, compact/rescale/split/rewrite/vacuum/orphans " +
      "between them — the chain rebuild is fold-equivalent on every layout") {
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(640L + trial)
      val evs = Gen.listOfN(70, eventGen)(Gen.Parameters.default, Seed(211L + trial)).get
      val rows = evs.zipWithIndex.map { case ((k, op, v), i) => mkRow(i + 1L, k, op, v) }
      val shuffled = rnd.shuffle(rows)
      val root = tmpDir("graft-scd2maint")
      val cfg = RunnerConfig(
        feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Scd2, buckets = 4))
      val lake = CdcRunner.ensureTable(spark, cfg)
      var epoch = 0L
      var seen = Vector.empty[Row]
      shuffled.grouped(12).foreach { chunk =>
        // at-least-once upstream: re-deliver a few already-applied version rows
        val redelivered =
          if (seen.nonEmpty) rnd.shuffle(seen).take(rnd.nextInt(3)) else Nil
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rnd.shuffle(chunk ++ redelivered), 2),
          ChangeEvent.schema())
        MergeApply.applyBatch(spark, lake, df, epoch, cfg.job.copy(
          merge = if (rnd.nextBoolean()) MergeStrategy.MergeOnRead
                  else MergeStrategy.CopyOnWrite))
        seen ++= chunk
        epoch += 1
        // a burst of 0-2 random maintenance transitions between batches:
        // version-row deltas fold / migrate / GC on whatever layout they're in
        (0 until rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(6) match {
            case 0 => lake.compact(spark, maxFilesPerBucket = 1 + rnd.nextInt(3),
              maxDeltaFiles = 1 + rnd.nextInt(3))
            case 1 => val b = lake.manifest.buckets; if (b < 32) lake.rescale(b * 2)
            case 2 => lake.splitBuckets(spark, maxGroups = 1 + rnd.nextInt(3))
            case 3 => lake.rewriteManifests()
            case 4 => lake.vacuum(keepVersions = 2 + rnd.nextInt(3))
            case 5 => lake.removeOrphans(olderThanMs = 0L)
          }
        }
        verify(lake, seen, s"maint-trial=$trial epoch=$epoch")
      }
    }
  }
}
