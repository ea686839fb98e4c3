package graft

import org.apache.spark.sql.Row

import graft.apply.MergeApply
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/** Per-op stop-or-continue error flags — reference: stop_if_*_error
  * (trempy/Tasks/Task.py:43-99; CDCOperationsHandler.py:25-30,783-801).
  * continue → bad rows quarantined, good rows commit; stop → batch fails. */
class ErrorPolicySpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
  private val schema = ChangeEvent.schema()

  // one good INSERT + one bad INSERT (n_tok mismatch) + one good UPDATE
  private def rows = Seq(
    Row(1L, 1L, ts(1), "INSERT", 1, "k1", Seq(1, 2), Int.box(2), "web"),
    Row(2L, 1L, ts(2), "INSERT", 1, "k2", Seq(1, 2, 3), Int.box(99), "web"), // bad
    Row(3L, 1L, ts(3), "UPDATE", 1, "k1", Seq(7), Int.box(1), "web"))

  private def mkLake(job: JobConfig) = {
    val root = tmpDir("graft-errpol")
    CdcRunner.ensureTable(spark, RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table",
      checkpointDir = s"$root/cp", job = job))
  }

  test("continue (default): bad row quarantined, good rows commit") {
    val job = JobConfig()
    val lake = mkLake(job)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val res = MergeApply.applyBatch(spark, lake, df, 0L, job)
    assert(res.metrics("events_quarantined") == 1L)
    assert(lake.read(spark).count() == 1) // k1 upserted; k2 quarantined
    assert(spark.read.parquet(lake.quarantineDir(0L)).count() == 1)
  }

  test("stop_if_insert_error: batch fails, nothing commits") {
    val job = JobConfig(errorPolicy = ErrorPolicy(stopOnInsertError = true))
    val lake = mkLake(job)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val ex = intercept[IllegalStateException](
      MergeApply.applyBatch(spark, lake, df, 0L, job))
    assert(ex.getMessage.contains("stop_if_error"))
    assert(!lake.isCommitted(0L))
    assert(lake.read(spark).count() == 0)
  }

  test("quarantine=false: invariant violations fail the batch, never merge silently") {
    val job = JobConfig(quarantine = false)
    val lake = mkLake(job)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val ex = intercept[IllegalStateException](
      MergeApply.applyBatch(spark, lake, df, 0L, job))
    assert(ex.getMessage.contains("quarantine is disabled"))
    assert(!lake.isCommitted(0L))
    assert(lake.read(spark).count() == 0)
  }

  test("stop flag for a different op does not fire") {
    val job = JobConfig(errorPolicy = ErrorPolicy(stopOnDeleteError = true))
    val lake = mkLake(job)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val res = MergeApply.applyBatch(spark, lake, df, 0L, job)
    assert(!res.skipped && lake.isCommitted(0L))
  }
}
