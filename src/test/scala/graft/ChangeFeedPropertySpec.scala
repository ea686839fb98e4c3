package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.apply.MergeApply
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: for ANY event stream and ANY batch split, the change feed a
 * copy-on-write table records via its per-epoch sidecars is IDENTICAL to the
 * change feed a merge-on-read table serves from its delta files — per-epoch
 * per-key winners with `_lsn` and delete markers. One storage path must never
 * tell a downstream consumer a different change history than the other.
 */
class ChangeFeedPropertySpec extends SparkSpec {

  private val eventGen: Gen[(Int, String, Int)] = for {
    key <- Gen.choose(0, 11)
    op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    v <- Gen.choose(1, 6)
  } yield (key, op, v)

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn / 3, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%09d",
      if (del) null else (1 to v).map(i => (key * 31 + i) % 997),
      if (del) null else Int.box(v),
      if (del) null else s"s$v")
  }

  test("CoW sidecar feed == MoR delta feed, any stream, any batch split") {
    val caseGen = for {
      evs <- Gen.listOfN(90, eventGen)
      nBatches <- Gen.choose(1, 5)
    } yield (evs, nBatches)
    (0 until 6).foreach { trial =>
      val (evs, nBatches) = caseGen(Gen.Parameters.default, Seed(1042L + trial)).get
      val root = tmpDir("graft-cfprop")
      def mkCfg(sub: String, merge: MergeStrategy, changeFeed: Boolean) = RunnerConfig(
        feedDir = s"$root/$sub/feed", tableDir = s"$root/$sub/table",
        checkpointDir = s"$root/$sub/cp",
        job = JobConfig(mode = CdcMode.Upsert, merge = merge, buckets = 4,
          changeFeed = changeFeed))
      val cow = mkCfg("cow", MergeStrategy.CopyOnWrite, changeFeed = true)
      val mor = mkCfg("mor", MergeStrategy.MergeOnRead, changeFeed = false)
      val rows = evs.zipWithIndex.map { case ((k, op, v), i) => mkRow(i + 1L, k, op, v) }
      val schema = ChangeEvent.schema()
      val per = math.max(1, rows.size / nBatches)
      val feeds = Seq(cow, mor).map { c =>
        val lake = CdcRunner.ensureTable(spark, c)
        val v0 = lake.currentVersion
        rows.grouped(per).zipWithIndex.foreach { case (chunk, epoch) =>
          val df = spark.createDataFrame(
            spark.sparkContext.parallelize(chunk, 2), schema)
          MergeApply.applyBatch(spark, lake, df, epoch.toLong, c.job)
        }
        (lake.changeLog(spark, v0, lake.currentVersion)
          .collect().map(_.toString).sorted, lake)
      }
      assert(feeds(0)._1.sameElements(feeds(1)._1),
        s"trial=$trial nBatches=$nBatches:\n cow=${feeds(0)._1.toSeq}\n mor=${feeds(1)._1.toSeq}")
      // and both storage paths read to the same final state
      assert(feeds(0)._2.read(spark).collect().map(_.toString).sorted
        .sameElements(feeds(1)._2.read(spark).collect().map(_.toString).sorted))
    }
  }
}
