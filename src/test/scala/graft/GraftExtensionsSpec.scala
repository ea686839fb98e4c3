package graft

import org.apache.spark.sql.functions._

/** The SQL surface (spark.sql.extensions=graft.GraftExtensions, active on the
  * shared test session) must plan the same native expressions as the Column
  * API — value parity checked per function, plus literal-argument validation. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    ("a", Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
    ("b", Array(-1.0f, 0.0f, 4.0f), Array(2.0f, 2.0f, 2.0f))
  ).toDF("id", "x", "y")

  test("vec_dot / vec_cosine SQL == Column API") {
    vecs.createOrReplaceTempView("ext_vecs")
    val sql = spark.sql(
      "SELECT id, vec_dot(x, y) AS d, vec_cosine(x, y) AS c FROM ext_vecs ORDER BY id")
      .collect()
    val api = vecs.select($"id",
        graft.functions.VectorOps.vec_dot($"x", $"y").as("d"),
        graft.functions.VectorOps.vec_cosine($"x", $"y").as("c"))
      .orderBy("id").collect()
    assert(sql.toSeq == api.toSeq)
    assert(math.abs(sql(0).getDouble(1) - (0.5 - 2.0 + 6.0)) < 1e-9)
    // zero-norm → NULL on the SQL path too (the Column API's nullif guard):
    // a raw Divide dies with ANSI DIVIDE_BY_ZERO — one all-zero embedding
    // must never kill the whole query
    val z = spark.sql(
      "SELECT vec_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c").head()
    assert(z.isNullAt(0), "zero-norm cosine is NULL, not a crash")
  }

  test("integer table-function args are validated, never wrapped/truncated") {
    // fractional version: named error, not a silent 1.9 → 1 truncation
    val e = intercept[IllegalArgumentException](
      spark.sql("SELECT * FROM graft_table('/nonexistent', 1.9)"))
    assert(e.getMessage.contains("integral"), e.getMessage)
    // out-of-int-range version: named error, not a 2^32 wrap to version 1
    val e2 = intercept[IllegalArgumentException](
      spark.sql("SELECT * FROM graft_table('/nonexistent', 4294967297)"))
    assert(e2.getMessage.contains("out of int range"), e2.getMessage)
    // null centroid entries: named error, not a bare NPE
    val e3 = intercept[IllegalArgumentException](
      spark.sql("SELECT nearest_cells(array(1.0D), " +
        "array(array(1.0D), CAST(NULL AS ARRAY<DOUBLE>)), 1)"))
    assert(e3.getMessage.contains("centroids[1] is null"), e3.getMessage)
  }

  test("hyperplane_sig SQL == Column API; rejects non-literal planes") {
    vecs.createOrReplaceTempView("ext_vecs")
    val sql = spark.sql(
      "SELECT id, hyperplane_sig(x, 16) AS sig FROM ext_vecs ORDER BY id").collect()
    val api = vecs.select($"id",
        graft.functions.VectorOps.hyperplane_sig($"x", 16).as("sig"))
      .orderBy("id").collect()
    assert(sql.toSeq == api.toSeq)
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_sig(x, length(id)) FROM ext_vecs").collect()
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("foldable"), messages)
  }

  test("nearest_cells SQL: centroid literal matrix, best-first probes") {
    vecs.createOrReplaceTempView("ext_vecs")
    // cells: c0 points along +z, c1 along -x → vector "a"=(1,2,3) prefers c0
    val rows = spark.sql(
      """SELECT id, nearest_cells(x, array(array(0.0d, 0.0d, 1.0d),
        |                                  array(-1.0d, 0.0d, 0.0d)), 2) AS cells
        |FROM ext_vecs ORDER BY id""".stripMargin).collect()
    assert(rows(0).getSeq[Int](1) == Seq(0, 1)) // a=(1,2,3): z-dot 3 > -x-dot -1
    assert(rows(1).getSeq[Int](1) == Seq(0, 1)) // b=(-1,0,4): z-dot 4 > x-dot 1
  }

  test("DESCRIBE FUNCTION surfaces the registered usage text") {
    val desc = spark.sql("DESCRIBE FUNCTION vec_dot")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("dot product"), s"usage must reach the catalog:\n$desc")
  }

  test("rolling_hash SQL == Column API, optional prime/mod") {
    val df = Seq("graft", "spark").toDF("t")
    df.createOrReplaceTempView("ext_txt")
    val sql = spark.sql("SELECT rolling_hash(t) AS h FROM ext_txt ORDER BY t").collect()
    val api = df.select(graft.functions.RollingHash.rolling_hash($"t").as("h"))
      .orderBy("t").collect()
    assert(sql.toSeq == api.toSeq)
    // custom prime/mod: h("ab") = (('a'*7 + 'b') mod 97)
    val custom = spark.sql("SELECT rolling_hash('ab', 7, 97) AS h").head().getLong(0)
    assert(custom == (('a'.toLong * 7 + 'b'.toLong) % 97))
  }

  test("graft_table / graft_changes / graft_quarantine: the lake as pure SQL") {
    import graft.model._
    import graft.feed.ChangeFeed
    import graft.runner.{CdcRunner, RunnerConfig}
    val root = tmpDir("graft-ext-tvf")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4, changeFeed = true))
    val feed = ChangeFeed.events(spark, ChangeFeed.FeedSpec(nEvents = 400, nDocs = 80))
    ChangeFeed.writeFeed(feed.filter(col("lsn") % 2 === 0), cfg.feedDir, nFiles = 2)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, ChangeFeed.seedSnapshot(spark, 20), cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val v1 = lake.currentVersion
    ChangeFeed.writeFeed(feed.filter(col("lsn") % 2 =!= 0), cfg.feedDir,
      nFiles = 2, append = true)
    CdcRunner.runAvailableNow(spark, cfg)

    val dir = cfg.tableDir
    // current read == the Scala reader
    val sqlNow = spark.sql(s"SELECT * FROM graft_table('$dir')")
      .collect().map(_.toString).sorted
    assert(sqlNow.sameElements(lake.read(spark).collect().map(_.toString).sorted))
    // time travel == readVersion
    val sqlV1 = spark.sql(s"SELECT * FROM graft_table('$dir', $v1)")
      .collect().map(_.toString).sorted
    assert(sqlV1.sameElements(lake.readVersion(spark, v1).collect().map(_.toString).sorted))
    assert(!sqlV1.sameElements(sqlNow), "the two snapshots differ")
    // change feed == changeLog, composable with plain SQL on top
    val to = lake.currentVersion
    val nChanges = spark.sql(
      s"SELECT count(*) AS n FROM graft_changes('$dir', $v1, $to)").head().getLong(0)
    assert(nChanges == lake.changeLog(spark, v1, to).count() && nChanges > 0)
    // quarantine browse (empty on this clean run, but resolvable with schema)
    val q = spark.sql(s"SELECT * FROM graft_quarantine('$dir')")
    assert(q.columns.contains("_error_reason") && q.count() == 0)
    // non-literal args fail at analysis, like a bad table reference
    intercept[Exception](
      spark.sql("SELECT * FROM graft_table(string(rand()))").collect())
  }
}
