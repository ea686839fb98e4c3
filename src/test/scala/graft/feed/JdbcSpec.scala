package graft.feed

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model._
import graft.runner.{CdcRunner, RunnerConfig}

/**
 * JDBC endpoints against an embedded Derby database (in-JVM — the sandbox has
 * no server): source snapshot (plain + partitioned parallel read) → lake full
 * load → CDC merge → bulk-insert export of the final state back over JDBC.
 * This is the reference's full_load_and_cdc path with real database endpoints
 * on both ends (QueryPostgreSQL.py:78-81; FullLoadHandler.py:32-78).
 */
class JdbcSpec extends SparkSpec {

  private val dbDir = tmpDir("graft-derby") + "/db"
  private val conn = JdbcEndpoint.Conn(
    s"jdbc:derby:$dbDir;create=true",
    Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  private val payload = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  test("jdbc snapshot → full load → merge → jdbc bulk-insert export") {
    // seed a source table over JDBC (50 docs)
    val seed = spark.range(50).select(
      concat(lit("d-"), lpad(col("id").cast(StringType), 4, "0")).as("doc_id"),
      (col("id") % 7 + 1).cast(IntegerType).as("n_tok"),
      lit("web").as("source"),
      col("id").as("seq"))
    JdbcEndpoint.bulkInsert(seed, conn, "SRC_DOCS")

    // S1: plain and partitioned snapshots agree
    val snap = JdbcEndpoint.snapshot(spark, conn, "SRC_DOCS")
    val snapPar = JdbcEndpoint.snapshotPartitioned(spark, conn, "SRC_DOCS",
      partitionColumn = "seq", numPartitions = 4)
    assert(snap.count() == 50 && snapPar.count() == 50)
    assert(snapPar.rdd.getNumPartitions == 4, "parallel range scan")
    assert(snap.collect().map(_.toString).sorted
      .sameElements(snapPar.collect().map(_.toString).sorted))

    // full load into the lake, then a CDC batch on top
    val root = tmpDir("graft-jdbc-e2e")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, buckets = 4),
      payloadSchema = payload)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.fullLoad(spark, lake, snap.drop("seq").select("doc_id", "n_tok", "source"), cfg)
    assert(lake.read(spark).count() == 50)

    val evSchema = ChangeEvent.schema(payload.fields.toSeq)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val batch = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 1L, ts(1), "UPDATE", 1, "d-0001", Int.box(99), "books"),
      Row(2L, 1L, ts(2), "DELETE", 1, "d-0002", null, null),
      Row(3L, 1L, ts(3), "INSERT", 1, "d-9999", Int.box(5), "code")), 2), evSchema)
    graft.apply.MergeApply.applyBatch(spark, lake, batch, 0L, cfg.job)

    // S6: export the merged state back over JDBC and read it back
    val state = lake.read(spark).select("doc_id", "n_tok", "source")
    JdbcEndpoint.bulkInsert(state, conn, "TGT_DOCS", batchSize = 16)
    val exported = JdbcEndpoint.snapshot(spark, conn, "TGT_DOCS")
    assert(exported.count() == 50) // 50 - 1 delete + 1 insert
    val byId = exported.collect().map(r => r.getAs[String]("doc_id") ->
      (r.getAs[Int]("n_tok"), r.getAs[String]("source"))).toMap
    assert(byId("d-0001") == ((99, "books")))
    assert(byId("d-9999") == ((5, "code")))
    assert(!byId.contains("d-0002"))

    // truncate-mode overwrite re-export is idempotent
    JdbcEndpoint.bulkInsert(state, conn, "TGT_DOCS", overwrite = true)
    assert(JdbcEndpoint.snapshot(spark, conn, "TGT_DOCS").count() == 50)
  }

  test("target DDL: CREATE TABLE with PRIMARY KEY + varchar lengths, then full load") {
    val df = spark.range(20).select(
      concat(lit("k-"), lpad(col("id").cast(StringType), 3, "0")).as("doc_id"),
      col("id").cast(IntegerType).as("n_tok"),
      lit("web").as("source"))
    JdbcEndpoint.fullLoadTo(df, conn, "KEYED_T", keyCols = Seq("doc_id"), varcharLen = 64)
    val c = java.sql.DriverManager.getConnection(conn.url, conn.props)
    try {
      // the PRIMARY KEY clause landed in the Derby catalog
      val rs = c.getMetaData.getPrimaryKeys(null, null, "KEYED_T")
      val pkCols = scala.collection.mutable.ListBuffer.empty[String]
      while (rs.next()) pkCols += rs.getString("COLUMN_NAME")
      rs.close()
      assert(pkCols.toList == List("doc_id"), s"pk columns: $pkCols")
      // explicit varchar length materialized (writer default would be CLOB-ish)
      val cols = c.getMetaData.getColumns(null, null, "KEYED_T", "doc_id")
      assert(cols.next() && cols.getInt("COLUMN_SIZE") == 64)
      cols.close()
      // key column is NOT NULL
      val nn = c.getMetaData.getColumns(null, null, "KEYED_T", "doc_id")
      assert(nn.next() && nn.getString("IS_NULLABLE") == "NO")
      nn.close()
    } finally c.close()
    assert(JdbcEndpoint.snapshot(spark, conn, "KEYED_T").count() == 20)
    // ensure is idempotent (no duplicate-table error on restart)
    assert(!JdbcEndpoint.ensureTable(conn, "KEYED_T", df.schema, Seq("doc_id")))
  }

  test("ensureTable: schema-qualified targets and LIKE-wildcard names probe " +
    "exactly; doubles land as DOUBLE PRECISION") {
    val df = spark.range(3).select(
      concat(lit("q-"), col("id").cast(StringType)).as("doc_id"),
      (col("id") * 1.5).as("score"))
    // schema-qualified: before the (schemaPattern, tablePattern) split the
    // whole "app.qualified_t" string was passed as the table-NAME pattern,
    // matched nothing, and every rerun re-issued CREATE TABLE
    assert(JdbcEndpoint.ensureTable(conn, "app.qualified_t", df.schema, Seq("doc_id")))
    assert(!JdbcEndpoint.ensureTable(conn, "app.qualified_t", df.schema, Seq("doc_id")),
      "rerun must find the table through the split schema/name probe")
    // '_' is a LIKE wildcard in getTables: a sibling MY1DATA must not
    // false-match MY_DATA's probe and skip its creation
    JdbcEndpoint.fullLoadTo(df, conn, "MY1DATA", Seq("doc_id"))
    assert(JdbcEndpoint.ensureTable(conn, "MY_DATA", df.schema, Seq("doc_id")),
      "MY_DATA must be created even though MY1DATA matches the unescaped pattern")
    val c = java.sql.DriverManager.getConnection(conn.url, conn.props)
    try {
      // DOUBLE PRECISION, not bare DOUBLE — PostgreSQL (the reference's
      // target) rejects the latter; Derby accepts both spellings
      val cols = c.getMetaData.getColumns(null, null, "MY_DATA", "score")
      assert(cols.next() &&
        cols.getString("TYPE_NAME").toUpperCase.startsWith("DOUBLE"))
      cols.close()
    } finally c.close()
  }

  test("per-row apply exceptions: PK collisions are captured with messages, " +
    "good rows land (reference apply_exceptions)") {
    val good = spark.range(30).select(
      concat(lit("p-"), lpad(col("id").cast(StringType), 3, "0")).as("doc_id"),
      col("id").cast(IntegerType).as("n_tok"),
      lit("web").as("source"))
    // target with a primary key, pre-seeded with 5 of the 30 ids → those 5
    // violate the constraint on the bulk load; the other 25 must still land
    JdbcEndpoint.fullLoadTo(good.filter(col("n_tok") < 5), conn, "CAPT_T",
      keyCols = Seq("doc_id"))
    val errors = JdbcEndpoint.bulkInsertCapturing(good, conn, "CAPT_T", batchSize = 8)
    try {
      val errs = errors.collect()
      assert(errs.length == 5, s"exactly the PK collisions captured: ${errs.length}")
      assert(errs.forall(r => r.getAs[String]("error") != null &&
        r.getAs[String]("error").nonEmpty), "driver message carried per row")
      assert(errs.forall(_.getAs[String]("row_json").contains("doc_id")),
        "the failing row rides with its exception (apply_exceptions shape)")
      // good rows all landed exactly once; bad rows did not duplicate
      val landed = JdbcEndpoint.snapshot(spark, conn, "CAPT_T")
      assert(landed.count() == 30, "5 pre-seeded + 25 newly inserted")
      assert(landed.groupBy("doc_id").count()
        .filter(col("count") > 1).count() == 0, "no duplicates")
    } finally errors.unpersist()
    // a fully-clean batch captures nothing and inserts everything
    val clean = spark.range(30, 40).select(
      concat(lit("p-"), lpad(col("id").cast(StringType), 3, "0")).as("doc_id"),
      col("id").cast(IntegerType).as("n_tok"),
      lit("web").as("source"))
    val none = JdbcEndpoint.bulkInsertCapturing(clean, conn, "CAPT_T", batchSize = 8)
    try assert(none.isEmpty &&
      JdbcEndpoint.snapshot(spark, conn, "CAPT_T").count() == 40)
    finally none.unpersist()
  }

  test("incremental lake → database sync: bootstrap full load, then applyChanges " +
    "of a changeLog window == lake state (deletes included); CLI jdbc_apply agrees") {
    import graft.feed.ChangeFeed
    val root = tmpDir("graft-jdbc-sync")
    val cfg = RunnerConfig(
      feedDir = s"$root/feed", tableDir = s"$root/table", checkpointDir = s"$root/cp",
      job = JobConfig(mode = CdcMode.Upsert, merge = MergeStrategy.MergeOnRead,
        buckets = 4),
      payloadSchema = payload)
    def events(n: Int, startLsn: Long) = ChangeFeed.events(spark,
        ChangeFeed.FeedSpec(nEvents = n, nDocs = 60, startLsn = startLsn))
      .select("lsn", "txn_id", "ts", "op", "schema_ver", "doc_id", "n_tok", "source")
    ChangeFeed.writeFeed(events(300, 1), cfg.feedDir, nFiles = 2)
    val lake = CdcRunner.ensureTable(spark, cfg)
    CdcRunner.runAvailableNow(spark, cfg)
    val v1 = lake.currentVersion
    // bootstrap the target from the v1 snapshot (keyed DDL + bulk insert)
    JdbcEndpoint.fullLoadTo(lake.read(spark).select("doc_id", "n_tok", "source"),
      conn, "SYNC_T", keyCols = Seq("doc_id"))
    // second wave: updates + deletes land in the lake only
    ChangeFeed.writeFeed(events(200, 301), cfg.feedDir, nFiles = 2, append = true)
    CdcRunner.runAvailableNow(spark, cfg)
    // incremental apply of the (v1, current] window
    JdbcEndpoint.applyChanges(
      lake.changeLog(spark, v1, lake.currentVersion)
        .select("doc_id", "n_tok", "source", "_lsn", "_deleted"),
      conn, "SYNC_T", keyCols = Seq("doc_id"), batchSize = 32)
    val target = JdbcEndpoint.snapshot(spark, conn, "SYNC_T")
      .collect().map(_.toString).sorted
    val lakeState = lake.read(spark).select("doc_id", "n_tok", "source")
      .collect().map(_.toString).sorted
    assert(target.nonEmpty && target.sameElements(lakeState),
      "the synced target equals the lake after the window (upserts AND deletes)")
    // re-applying the same window converges to the same state (at-least-once safe)
    JdbcEndpoint.applyChanges(
      lake.changeLog(spark, v1, lake.currentVersion)
        .select("doc_id", "n_tok", "source", "_lsn", "_deleted"),
      conn, "SYNC_T", keyCols = Seq("doc_id"), batchSize = 32)
    assert(JdbcEndpoint.snapshot(spark, conn, "SYNC_T")
      .collect().map(_.toString).sorted.sameElements(lakeState))

    // the no-code route: jdbc_apply into a fresh target from the same window
    val confP = java.nio.file.Files.createTempFile("graft-jdbcapply", ".json")
    java.nio.file.Files.writeString(confP,
      s"""{"url": "${conn.url.replace("\\", "\\\\")}",
         |"properties": {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"},
         |"target_table": "SYNC_CLI_T", "from": 1,
         |"columns": ["doc_id", "n_tok", "source"]}""".stripMargin)
    graft.JobMain.runOp(spark, Seq("--op", "jdbc_apply",
      "--table", cfg.tableDir, "--config", confP.toString))
    // window (1, current] covers everything → fresh target == lake state
    assert(JdbcEndpoint.snapshot(spark, conn, "SYNC_CLI_T")
      .collect().map(_.toString).sorted.sameElements(lakeState))

    // a FULL-LOADED lake refuses the same from=1 shortcut: the change feed
    // excludes the snapshot, so the target would silently miss snapshot-only
    // rows — explicit bootstrap acknowledgement required
    val root2 = tmpDir("graft-jdbc-sync-fl")
    val cfg2 = cfg.copy(feedDir = s"$root2/feed", tableDir = s"$root2/table",
      checkpointDir = s"$root2/cp")
    val lake2 = CdcRunner.ensureTable(spark, cfg2)
    CdcRunner.fullLoad(spark, lake2,
      lake.read(spark).select("doc_id", "n_tok", "source"), cfg2)
    val conf2 = java.nio.file.Files.createTempFile("graft-jdbcapply2", ".json")
    java.nio.file.Files.writeString(conf2,
      s"""{"url": "${conn.url}", "target_table": "SYNC_FL_T", "from": 1,
         |"columns": ["doc_id", "n_tok", "source"]}""".stripMargin)
    val e = intercept[IllegalArgumentException](graft.JobMain.runOp(spark,
      Seq("--op", "jdbc_apply", "--table", cfg2.tableDir, "--config", conf2.toString)))
    assert(e.getMessage.contains("snapshot"), e.getMessage)
  }

  test("partitioned snapshot of an empty table: bounds are NULL, falls back clean") {
    JdbcEndpoint.bulkInsert(
      spark.range(0).select(col("id").as("seq"), lit("x").as("v")), conn, "EMPTY_T")
    val df = JdbcEndpoint.snapshotPartitioned(spark, conn, "EMPTY_T",
      partitionColumn = "seq", numPartitions = 4)
    assert(df.count() == 0, "empty table reads as empty, no NPE on NULL min/max")
  }

  test("per-row capture classifies SQLSTATEs: deterministic rejections " +
    "record, transients rethrow (silently ledgering a deadlock would drop " +
    "good rows behind a successful job)") {
    def ex(state: String) = new java.sql.SQLException("boom", state)
    // the reference's apply_exceptions classes: cardinality/data/integrity/CHECK
    assert(Seq("21000", "22001", "23505", "44000").forall(s =>
      JdbcEndpoint.isRowRejection(ex(s))))
    // connection loss, deadlock/serialization, resource, cancel: NOT the
    // row's fault — must escape to the task for Spark's retry to own
    assert(Seq("08003", "40001", "53200", "57014").forall(s =>
      !JdbcEndpoint.isRowRejection(ex(s))))
    assert(!JdbcEndpoint.isRowRejection(new java.sql.SQLException("no state")),
      "a missing SQLSTATE is unknown, not a rejection")
  }
}
