package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Optimization-round measurement harness (guide §1) — SEPARATE from the frozen
 * [[Bench]] driver contract. Times individual SparkEntry queries with the same
 * session config and `.count()` action as Bench, so numbers are comparable,
 * and adds the diagnostics Bench deliberately omits:
 *
 *  - per-query min-of-N walls over an explicit query list (fast iteration);
 *  - a job-level breakdown (job wall + description + count) so driver-side
 *    gaps between jobs are visible;
 *  - `.explain("formatted")` dumps per query (GRAFT_EXPLAIN_DIR) for the
 *    plans/r06 evidence files.
 *
 * Usage: sbt "runMain graft.BenchExtra q_cdc_pipeline_upsert q_dedup_minhash"
 *        (no args = all queries). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
 *        GRAFT_BENCH_SAMPLES (default 2), GRAFT_EXPLAIN_DIR, GRAFT_JOB_LOG=1.
 */
object BenchExtra {

  private final class JobLog extends SparkListener {
    case class J(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new scala.collection.mutable.ArrayBuffer[J]()
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs += J(e.jobId, desc, System.nanoTime())
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
    }
    def reset(): Unit = synchronized(jobs.clear())
    def report(queryWallNs: Long): String = synchronized {
      val done = jobs.filter(_.end > 0)
      val jobNs = done.map(j => j.end - j.start).sum
      val lines = done.map { j =>
        f"    job ${j.id}%4d ${(j.end - j.start) / 1e9}%7.3f s  ${j.desc.take(90)}"
      }
      f"  jobs=${done.size} jobTime=${jobNs / 1e9}%.3f s wall=${queryWallNs / 1e9}%.3f s " +
        f"driverGap=${(queryWallNs - jobNs) / 1e9}%.3f s\n" + lines.mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val samples = sys.env.getOrElse("GRAFT_BENCH_SAMPLES", "2").toInt
    val explainDir = sys.env.get("GRAFT_EXPLAIN_DIR")
    val jobLogOn = sys.env.get("GRAFT_JOB_LOG").contains("1")

    // session config mirrors Bench.newSession so walls are comparable
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val log = new JobLog
    if (jobLogOn) spark.sparkContext.addSparkListener(log)

    // same warm-up as Bench: absorb one-time stream-exec + codegen init
    try SparkEntry.queries("q_cdc_pipeline_upsert")(spark, sfDir).count()
    catch { case e: Throwable => System.err.println(s"[extra] warm-up: ${e.getMessage}") }

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      explainDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"$name.txt"), plan)
      }
      val walls = (1 to samples).map { i =>
        if (jobLogOn) log.reset()
        spark.sparkContext.setJobDescription(s"$name pass $i")
        import org.apache.spark.metrics.source.CodegenMetrics
        val cg0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val cgT0 = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[extra] $name: ${e.getMessage}"); false }
        val w = System.nanoTime() - t0
        val cgN = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - cg0
        val cgMs = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum - cgT0
        spark.sparkContext.setJobDescription(null)
        System.err.println(f"[extra] $name pass $i codegenCompiles=$cgN sumMs=$cgMs")
        if (jobLogOn) System.err.println(s"[extra] $name pass $i\n" + log.report(w))
        if (ok) w / 1e9 else -1.0
      }
      val good = walls.filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0, walls)
    }
    results.foreach { case (n, (best, walls)) =>
      println(f"$n%-28s ${best}%8.3f s   samples=" +
        walls.map(w => f"$w%.3f").mkString(","))
    }
    println(f"TOTAL ${results.map(_._2._1).filter(_ >= 0).sum}%.3f s over ${results.size} queries")
    spark.stop()
  }
}
