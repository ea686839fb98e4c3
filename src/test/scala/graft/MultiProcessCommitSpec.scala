package graft

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.lake.LakeTable

/**
 * The commit protocol's headline claim is CROSS-PROCESS safety ("a
 * version-file CAS serializes committers across processes") — an in-JVM
 * thread test cannot prove it (threads share the JVM's view of the
 * filesystem and the table handle's locks). This spec spawns REAL sibling
 * JVMs hammering metrics-only commits at one table: every commit must land
 * exactly once — no lost metric updates (a torn read-modify-write), no
 * double-published versions (a broken CAS), no lost epochs.
 */
class MultiProcessCommitSpec extends SparkSpec {

  test("version-file CAS serializes committers across PROCESSES: " +
    "3 JVMs x 30 contended commits, every one lands exactly once") {
    val dir = s"${tmpDir("graft-multiproc")}/table"
    new LakeTable(dir).create(
      StructType(Seq(StructField("doc_id", StringType))), buckets = 2)
    // the forked test JVM's classpath IS the full test classpath
    // (build.sbt: Test / fork := true), so plain `java -cp` reaches the
    // compiled engine; the hammer never creates a SparkSession
    val cp = System.getProperty("java.class.path")
    // THIS JVM's binary, not PATH's: the classes are built for its class-file
    // version, and CI images routinely put an older JRE (or nothing) on PATH
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val procs = 3
    val n = 30
    val ps = (1 to procs).map { pid =>
      new ProcessBuilder(javaBin, "-cp", cp, "-Xmx512m",
        "graft.tools.CommitStressMain", dir, pid.toString, n.toString)
        .redirectErrorStream(true).start()
    }
    val outs = ps.map { p =>
      // bounded wait BEFORE draining: a wedged hammer (the hang a protocol
      // regression would cause without its retry cap) fails in 120 s with
      // whatever it printed, instead of blocking the suite forever
      val done = p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) p.destroyForcibly(): Unit
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(done, s"hammer did not finish in 120s:\n${out.takeRight(2000)}")
      (p.waitFor(), out)
    }
    outs.foreach { case (rc, out) =>
      assert(rc == 0, s"hammer process failed:\n${out.takeRight(2000)}")
    }
    val lake = new LakeTable(dir)
    val m = lake.manifest
    // no lost updates: the summed metric counts every commit exactly once
    assert(m.metrics("stress") == (procs * n).toLong, m.metrics.toString)
    // no double-publishes: create = v1, then exactly one version per commit
    assert(m.version == 1 + procs * n, s"head v${m.version}")
    // no lost epochs: every (pid, i) epoch is committed
    (1 to procs).foreach { pid =>
      (0 until n).foreach { i =>
        assert(lake.isCommitted(pid * 100000L + i), s"epoch $pid/$i missing")
      }
    }
  }
}
