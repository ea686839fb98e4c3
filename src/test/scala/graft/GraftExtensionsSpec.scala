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
}
