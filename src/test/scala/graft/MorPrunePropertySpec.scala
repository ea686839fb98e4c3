package graft

import org.apache.spark.sql.Row

import graft.apply.MergeApply
import graft.lake.LakeTable
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: untouched-base pruning (LakeTable.pruneUntouchedBase) is invisible
 * to readers on the workload shape where it actually FIRES — monotone-key
 * insert waves (the common CDC shape: auto-increment PKs, doc batches arriving
 * in id order) with sparse random touches of old keys, random compaction
 * points, merge-on-read storage. The zipf-keyed property suites exercise the
 * no-prune path (full-range files never prune); this one drives layouts where
 * whole base generations leave the fold, a random old-key update pulls one
 * bucket back in, and a compaction re-folds everything — asserting the read
 * equals the sequential fold at EVERY layout, and that pruning really fired
 * (a vacuous pass would silently test nothing).
 */
class MorPrunePropertySpec extends SparkSpec {

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%09d",
      if (del) null else Seq(v),
      if (del) null else Int.box(1),
      if (del) null else s"s$v")
  }

  /** The prune decision exactly as readResolved computes it: only groups
    * that carry deltas are candidates. */
  private def pruneFired(lake: LakeTable): Boolean = {
    val m = lake.manifest
    if (!m.files.exists(_.isDelta)) return false
    val (gran, hot, _) = lake.hotFileSplit(m.files)
    lake.pruneUntouchedBase(hot, m, gran)._2.nonEmpty
  }

  /** One randomized run: `waves` monotone insert waves + sparse old-key
    * touches, compaction at random points, `check(lake, rowsSoFar, label)`
    * after every layout change. Returns whether pruning ever fired. */
  private def drive(mode: CdcMode, root: String, rnd: scala.util.Random,
      touchOps: Seq[String], check: (LakeTable, Seq[Row], String) => Unit): Boolean = {
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = mode, merge = MergeStrategy.MergeOnRead, buckets = 4))
    val lake = CdcRunner.ensureTable(spark, cfg)
    var rows = Vector.empty[Row]
    var lsn = 0L
    var nextKey = 0
    var fired = false
    (0 until 5).foreach { wave =>
      val inserts = (0 until 25).map { _ =>
        lsn += 1; nextKey += 1; mkRow(lsn, nextKey, "INSERT", rnd.nextInt(9) + 1)
      }
      val touches = (0 until rnd.nextInt(3)).flatMap { _ =>
        if (nextKey <= 25) Nil
        else {
          lsn += 1
          Seq(mkRow(lsn, rnd.nextInt(nextKey - 25) + 1,
            touchOps(rnd.nextInt(touchOps.size)), rnd.nextInt(9) + 1))
        }
      }
      val chunk = inserts ++ touches
      rows ++= chunk
      MergeApply.applyBatch(spark, lake,
        spark.createDataFrame(spark.sparkContext.parallelize(chunk, 2),
          ChangeEvent.schema()),
        wave.toLong, cfg.job)
      fired ||= pruneFired(lake)
      check(lake, rows, s"wave=$wave")
      if (rnd.nextBoolean()) {
        lake.compact(spark, maxFilesPerBucket = Int.MaxValue, maxDeltaFiles = 1)
        check(lake, rows, s"wave=$wave post-compact")
      }
    }
    fired
  }

  test("LWW merge-on-read under monotone waves: read == sequential fold at " +
    "every pruned layout; the prune demonstrably fires") {
    var fired = false
    (0 until 4).foreach { trial =>
      val rnd = new scala.util.Random(4800L + trial)
      fired |= drive(CdcMode.Upsert, tmpDir("graft-pruneprop-lww"), rnd,
        Seq("UPDATE", "UPDATE", "DELETE"), (lake, rows, label) => {
          val expected = rows.foldLeft(Map.empty[String, (Int, String)]) { (st, r) =>
            val id = r.getString(5)
            if (r.getString(3) == "DELETE") st - id
            else st + (id -> ((r.getAs[scala.collection.Seq[Int]](6).head, r.getString(8))))
          }
          val actual = lake.read(spark).collect().map { r =>
            r.getAs[String]("doc_id") -> ((
              r.getAs[scala.collection.Seq[Int]]("tokens").head,
              r.getAs[String]("source")))
          }.toMap
          assert(actual == expected, s"lww trial=$trial $label")
        })
    }
    assert(fired, "no trial ever pruned — the property tested nothing")
  }

  test("SCD2 merge-on-read under monotone waves: history == sequential fold " +
    "at every pruned layout (chains never split across the prune)") {
    case class Version(start: Long, end: Option[Long], current: Boolean, v: Int)
    def oracle(rows: Seq[Row]): Map[String, List[Version]] = {
      val hist = scala.collection.mutable.Map.empty[String, List[Version]]
      rows.sortBy(_.getLong(0)).foreach { r =>
        val id = r.getString(5); val lsn = r.getLong(0)
        val closed = hist.getOrElse(id, Nil).map(v =>
          if (v.current) v.copy(end = Some(lsn), current = false) else v)
        r.getString(3) match {
          case "DELETE" => hist(id) = closed
          case _ => hist(id) = closed :+ Version(lsn, None, current = true,
            r.getAs[scala.collection.Seq[Int]](6).head)
        }
      }
      hist.toMap.filter(_._2.nonEmpty)
    }
    var fired = false
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(9100L + trial)
      fired |= drive(CdcMode.Scd2, tmpDir("graft-pruneprop-scd2"), rnd,
        Seq("UPDATE"), (lake, rows, label) => {
          val expected = oracle(rows)
          val actual = lake.read(spark).collect()
            .groupBy(_.getAs[String]("doc_id"))
            .view.mapValues(_.map { r =>
              val start =
                r.getAs[java.sql.Timestamp]("scd_start_date").getTime / 1000 - 1700000000L
              val end = Option(r.getAs[java.sql.Timestamp]("scd_end_date"))
                .map(_.getTime / 1000 - 1700000000L)
              Version(start, end, r.getAs[Int]("scd_current") == 1,
                r.getAs[scala.collection.Seq[Int]]("tokens").head)
            }.sortBy(_.start).toList).toMap
          assert(actual == expected, s"scd2 trial=$trial $label")
        })
    }
    assert(fired, "no trial ever pruned — the property tested nothing")
  }
}
