package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.apply.MergeApply
import graft.lake.LakeTable
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * Property: for ANY event stream and ANY batch split, batched merge-apply
 * reaches the same final state as the sequential per-event fold (the
 * reference's literal row-at-a-time replay, CDCOperationsHandler.py:125-214).
 * Seeded ScalaCheck generators, driven directly (no scalatestplus bridge
 * in the offline cache).
 */
class MergePropertySpec extends SparkSpec {

  private val eventGen: Gen[(Int, String, Int)] = for {
    key <- Gen.choose(0, 15)
    op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    v <- Gen.choose(1, 8)
  } yield (key, op, v)

  private def mkRow(lsn: Long, key: Int, op: String, v: Int): Row = {
    val del = op == "DELETE"
    Row(lsn, lsn / 3, new java.sql.Timestamp(1700000000000L + lsn * 1000), op, 1,
      f"doc-$key%09d",
      if (del) null else (1 to v).map(i => (key * 31 + i) % 997),
      if (del) null else Int.box(v),
      if (del) null else s"s$v")
  }

  test("batched merge-apply == sequential fold, any stream, any batch split") {
    val caseGen = for {
      evs <- Gen.listOfN(120, eventGen)
      nBatches <- Gen.choose(1, 5)
    } yield (evs, nBatches)
    (0 until 8).foreach { trial =>
      val (evs, nBatches) = caseGen(Gen.Parameters.default, Seed(42L + trial)).get
      val root = tmpDir("graft-prop")
      val cfg = RunnerConfig(
        feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
        job = JobConfig(mode = CdcMode.Upsert, buckets = 4))
      val lake = CdcRunner.ensureTable(spark, cfg)
      val rows = evs.zipWithIndex.map { case ((k, op, v), i) => mkRow(i + 1L, k, op, v) }
      val schema = ChangeEvent.schema()
      // arbitrary contiguous batch split
      val per = math.max(1, rows.size / nBatches)
      rows.grouped(per).zipWithIndex.foreach { case (chunk, epoch) =>
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(chunk, 2), schema)
        MergeApply.applyBatch(spark, lake, df, epoch.toLong, cfg.job)
      }
      // oracle: sequential fold
      val expected = rows.foldLeft(Map.empty[String, (List[Int], Int, String)]) { (st, r) =>
        val id = r.getString(5)
        r.getString(3) match {
          case "DELETE" => st - id
          case _ => st + (id -> ((r.getAs[scala.collection.Seq[Int]](6).toList,
            r.getInt(7), r.getString(8))))
        }
      }
      val actual = lake.read(spark).collect().map { r =>
        r.getAs[String]("doc_id") -> ((
          r.getAs[scala.collection.Seq[Int]]("tokens").toList,
          r.getAs[Int]("n_tok"), r.getAs[String]("source")))
      }.toMap
      assert(actual == expected,
        s"trial=$trial nBatches=$nBatches\n actual=$actual\n expected=$expected")
    }
  }
}
