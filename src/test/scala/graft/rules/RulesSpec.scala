package graft.rules

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class MathExprSpec extends SparkSpec {
  import spark.implicits._

  private def eval(expr: String, v: Double): Double =
    Seq(v).toDF("x").select(MathExpr.compile(expr, col("x")).as("y"))
      .head().getDouble(0)

  test("arithmetic precedence and associativity") {
    assert(eval("value + 2 * 3", 1.0) == 7.0)
    assert(eval("(value + 2) * 3", 1.0) == 9.0)
    assert(eval("value / 4 - 1", 8.0) == 1.0)
    assert(eval("2 ^ value ^ 2", 3.0) == 512.0) // right-assoc: 2^(3^2)
    assert(eval("value ^ 2 * 3", 2.0) == 12.0)  // ^ binds tighter than *
  }

  test("unary minus and decimals") {
    assert(eval("-value + 1.5", 2.0) == -0.5)
    assert(eval("2 * -value", 3.0) == -6.0)
  }

  test("unary minus vs '^' matches Python/Polars (reference eval semantics)") {
    assert(eval("-2 ^ 2", 0.0) == -4.0)        // -(2**2), not (-2)**2
    assert(eval("2 ^ -3", 0.0) == 0.125)       // unary minus in the exponent
    assert(eval("value * -2 ^ 2", 3.0) == -12.0) // 3 * -(2**2)
    assert(eval("-value ^ 2", 3.0) == -9.0)    // -(value**2)
  }

  test("rejects illegal characters (no eval sandbox needed)") {
    intercept[IllegalArgumentException](MathExpr.tokenize("value; drop"))
    intercept[IllegalArgumentException](MathExpr.compile("value +", col("x")))
    intercept[IllegalArgumentException](MathExpr.compile("(value + 1", col("x")))
  }

  test("rejects postfix/adjacent forms the stack machine would silently " +
    "accept — Python raises SyntaxError on these, so must we") {
    // 'value value *' would otherwise compute value² with no error
    intercept[IllegalArgumentException](MathExpr.compile("value value *", col("x")))
    intercept[IllegalArgumentException](MathExpr.compile("1 2 +", col("x")))
    intercept[IllegalArgumentException](MathExpr.compile("value 2", col("x")))
    intercept[IllegalArgumentException](MathExpr.compile("* value", col("x")))
    intercept[IllegalArgumentException](MathExpr.compile("value (2 + 1)", col("x")))
    intercept[IllegalArgumentException](MathExpr.compile("value + ()", col("x")))
    // the valid forms around them still parse
    assert(eval("value * (2 + 1)", 2.0) == 6.0)
    assert(eval("-(value + 1)", 2.0) == -3.0)
  }
}

class FilterCompilerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "alpha", 10.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
    (2L, "beta", 20.0, java.sql.Timestamp.valueOf("2024-06-15 12:30:00")),
    (3L, null.asInstanceOf[String], 30.0, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
  ).toDF("id", "name", "score", "at")

  private def ids(f: FilterCfg): Set[Long] =
    df.filter(FilterCompiler.compile(f, df.schema)).select("id").as[Long].collect().toSet

  test("comparison filters") {
    assert(ids(FilterCfg("score", "equals", value = Some(20.0))) == Set(2L))
    assert(ids(FilterCfg("score", "not_equals", value = Some(20.0))) == Set(1L, 3L))
    assert(ids(FilterCfg("score", "greater_than", value = Some(10.0))) == Set(2L, 3L))
    assert(ids(FilterCfg("score", "greater_than_or_equal", value = Some(20.0))) == Set(2L, 3L))
    assert(ids(FilterCfg("score", "less_than", value = Some(20.0))) == Set(1L))
    assert(ids(FilterCfg("score", "less_than_or_equal", value = Some(20.0))) == Set(1L, 2L))
    assert(ids(FilterCfg("score", "between", lower = Some(15.0), upper = Some(30.0))) == Set(2L, 3L))
    assert(ids(FilterCfg("score", "not_between", lower = Some(15.0), upper = Some(30.0))) == Set(1L))
    assert(ids(FilterCfg("id", "in", values = Seq(1L, 3L))) == Set(1L, 3L))
    assert(ids(FilterCfg("id", "not_in", values = Seq(1L, 3L))) == Set(2L))
  }

  test("null and string filters") {
    assert(ids(FilterCfg("name", "is_null")) == Set(3L))
    assert(ids(FilterCfg("name", "is_not_null")) == Set(1L, 2L))
    assert(ids(FilterCfg("name", "starts_with", value = Some("al"))) == Set(1L))
    assert(ids(FilterCfg("name", "ends_with", value = Some("ta"))) == Set(2L))
    assert(ids(FilterCfg("name", "contains", value = Some("lph"))) == Set(1L))
    assert(ids(FilterCfg("name", "not_contains", value = Some("lph"))) == Set(2L))
  }

  test("date filters parse per column dtype and compare") {
    assert(ids(FilterCfg("at", "date_equals", value = Some("2024-01-01 00:00:00"))) == Set(1L))
    assert(ids(FilterCfg("at", "date_not_equals", value = Some("2024-01-01 00:00:00"))) == Set(2L, 3L))
    assert(ids(FilterCfg("at", "date_greater_than", value = Some("2024-06-15 12:30:00"))) == Set(3L))
    assert(ids(FilterCfg("at", "date_greater_than_or_equal", value = Some("2024-06-15 12:30:00"))) == Set(2L, 3L))
    assert(ids(FilterCfg("at", "date_less_than", value = Some("2024-06-15 12:30:00"))) == Set(1L))
    assert(ids(FilterCfg("at", "date_less_than_or_equal", value = Some("2024-06-15 12:30:00"))) == Set(1L, 2L))
    assert(ids(FilterCfg("at", "date_between",
      lower = Some("2024-01-01"), upper = Some("2024-12-31"))) == Set(1L, 2L))
    assert(ids(FilterCfg("at", "date_not_between",
      lower = Some("2024-01-01"), upper = Some("2024-12-31"))) == Set(3L))
  }

  test("unparseable date literal fails at compile time, never drop-all-rows") {
    // an ISO 'T' value would make to_timestamp yield NULL and the filter
    // silently drain the table — the reference's strptime raises; so do we
    val e = intercept[IllegalArgumentException] {
      FilterCompiler.compile(
        FilterCfg("at", "date_equals", value = Some("2024-01-01T00:00:00")), df.schema)
    }
    assert(e.getMessage.contains("does not match"))
    intercept[IllegalArgumentException] {
      FilterCompiler.compile(
        FilterCfg("at", "date_equals", value = Some("01/02/2024")), df.schema)
    }
    // day-overflow typos: java.time's default SMART resolver quietly rounds
    // '2024-02-31' to Feb 29 while Spark's STRICT parser rejects it at
    // runtime — the guard must be as strict as the engine it fronts
    Seq("2024-02-31", "2024-04-31", "2023-02-29").foreach { bad =>
      val e2 = intercept[IllegalArgumentException] {
        FilterCompiler.compile(
          FilterCfg("at", "date_equals", value = Some(bad)), df.schema)
      }
      assert(e2.getMessage.contains(bad), e2.getMessage)
    }
    // a real leap day still passes
    FilterCompiler.compile(
      FilterCfg("at", "date_equals", value = Some("2024-02-29")), df.schema)
  }

  test("EVERY filter validates its column at compile time with the rule " +
    "named; resolution is case-insensitive like Spark's") {
    val e = intercept[IllegalArgumentException] {
      FilterCompiler.compile(
        FilterCfg("pricee", "equals", value = Some(1)), df.schema)
    }
    assert(e.getMessage.contains("equals") && e.getMessage.contains("pricee"),
      e.getMessage)
    // 'SCORE' resolves to 'score' (Spark is case-insensitive by default) —
    // date ops used to reject the very spelling equals accepted
    df.filter(FilterCompiler.compile(
      FilterCfg("SCORE", "equals", value = Some(1)), df.schema)).count()
    df.filter(FilterCompiler.compile(
      FilterCfg("AT", "date_equals", value = Some("2024-01-01")), df.schema)).count()
  }

  test("date filters reject non-date columns (reference dtype validation)") {
    intercept[IllegalArgumentException] {
      df.filter(FilterCompiler.compile(
        FilterCfg("score", "date_equals", value = Some("2024-01-01")), df.schema)).count()
    }
  }

  test("cdcPredicate passes DELETEs through payload filters") {
    val ev = Seq(("INSERT", 5.0), ("INSERT", 50.0), ("DELETE", 0.0))
      .toDF("op", "score")
    val kept = ev.filter(FilterCompiler.cdcPredicate(
      Seq(FilterCfg("score", "greater_than", value = Some(10.0))), ev.schema, col("op")))
    assert(kept.count() == 2) // the 50.0 INSERT and the DELETE
  }
}

class FilterGuardSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1L, "alpha", 10.0)).toDF("id", "name", "score")

  test("empty in/not_in values list fails at compile — isin() would " +
    "silently drain (or keep) the ENTIRE table") {
    val e = intercept[IllegalArgumentException](
      FilterCompiler.compile(FilterCfg("name", "in"), df.schema))
    assert(e.getMessage.contains("empty values"), e.getMessage)
    intercept[IllegalArgumentException](
      FilterCompiler.compile(FilterCfg("name", "not_in"), df.schema))
    // non-empty still compiles and matches
    assert(df.filter(FilterCompiler.compile(
      FilterCfg("name", "in", values = Seq("alpha")), df.schema)).count() == 1)
  }

  test("string ops validate the column dtype with the rule named, like the " +
    "date ops — not a later unnamed DATATYPE_MISMATCH or an implicit cast") {
    Seq("starts_with", "ends_with", "contains", "not_contains").foreach { op =>
      val e = intercept[IllegalArgumentException](FilterCompiler.compile(
        FilterCfg("score", op, value = Some("1")), df.schema))
      assert(e.getMessage.contains("must be string") && e.getMessage.contains(op),
        s"$op: ${e.getMessage}")
    }
    assert(df.filter(FilterCompiler.compile(
      FilterCfg("name", "starts_with", value = Some("al")), df.schema)).count() == 1)
  }
}

class TransformCompilerSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", "  Mixed Case  ", 4.0,
      java.sql.Timestamp.valueOf("2020-03-04 05:06:07"),
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
  ).toDF("k", "s", "x", "t0", "t1")
  private val spec = TableSpec("src", "tbl", Seq("k"))

  private def run(ts: Seq[TransformCfg]) = {
    val c = TransformCompiler.compile(ts, spec, df.schema, lit("2024-06-01 00:00:00").cast("timestamp"))
    (c.apply(df), c.outSpec)
  }

  test("create literal / date_now / datetime_now / concat / date_diff_years") {
    val (out, _) = run(Seq(
      CreateColumn("lit_i", "literal", value = Some(7), valueType = Some("integer")),
      CreateColumn("today", "date_now"),
      CreateColumn("now_ts", "datetime_now"),
      CreateColumn("joined", "concat", dependsOn = Seq("k", "s"), separator = "|"),
      CreateColumn("age_y", "date_diff_years", dependsOn = Seq("t0", "t1")),
      CreateColumn("age_r", "date_diff_years", dependsOn = Seq("t0", "t1"), round = true)))
    val r = out.head()
    assert(r.getAs[Int]("lit_i") == 7)
    assert(r.getAs[java.sql.Date]("today").toString == "2024-06-01")
    assert(r.getAs[String]("joined") == "a|  Mixed Case  ")
    assert(r.getAs[Double]("age_y") == 4.0)
    assert(r.getAs[Long]("age_r") == 4L)
  }

  test("strftime translation: %% escapes, literal runs quoted, unmapped " +
    "directives fail at compile") {
    assert(TransformCompiler.strftimeToJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    // alphabetic literals MUST be quoted: unquoted they are pattern letters —
    // the ISO 'T' crashes ('Unknown pattern letter'), 'days' silently misparses
    assert(TransformCompiler.strftimeToJava("%Y-%m-%dT%H:%M:%S") ==
      "yyyy-MM-dd'T'HH:mm:ss")
    assert(TransformCompiler.strftimeToJava("%d days") == "dd' days'")
    assert(TransformCompiler.strftimeToJava("%%Y") == "'%Y'",
      "%% escapes before %Y could mangle it; the Y literal needs quoting")
    val e = intercept[IllegalArgumentException](TransformCompiler.strftimeToJava("%d-%b-%Y"))
    assert(e.getMessage.contains("%b"), "unmapped directive named in the error")
    intercept[IllegalArgumentException](TransformCompiler.strftimeToJava("trailing %"))
  }

  test("format_date with an ISO 'T' literal formats instead of crashing") {
    val (out, _) = run(Seq(
      ModifyColumn("t0", "format_date", format = Some("%Y-%m-%dT%H:%M:%S"), priority = 0)))
    assert(out.head().getAs[String]("t0") == "2020-03-04T05:06:07")
  }

  test("modify uppercase / lowercase / trim / extracts / format_date / math") {
    val (out, _) = run(Seq(
      ModifyColumn("s", "trim", priority = 0),
      ModifyColumn("s", "uppercase", priority = 1),
      ModifyColumn("t0", "format_date", format = Some("%Y/%m/%d %H:%M:%S"), priority = 2),
      ModifyColumn("t1", "extract_year", priority = 2),
      ModifyColumn("x", "math_expression", expression = Some("(value + 2) ^ 2 / 4"), priority = 2)))
    val r = out.head()
    assert(r.getAs[String]("s") == "MIXED CASE")
    assert(r.getAs[String]("t0") == "2020/03/04 05:06:07")
    assert(r.getAs[Int]("t1") == 2024)
    assert(r.getAs[Double]("x") == 9.0)
  }

  test("structural transforms evolve the spec; priority orders execution") {
    val (out, outSpec) = run(Seq(
      ModifyColumnName("s", "name", priority = 0),
      ModifyColumn("name", "trim", priority = 1),
      ModifySchemaName("tgt_schema"),
      ModifyTableName("tgt_table"),
      AddPrimaryKey(Seq("name"))))
    assert(outSpec.targetSchemaName == "tgt_schema")
    assert(outSpec.targetTableName == "tgt_table")
    assert(outSpec.keyCols == Seq("k", "name"))
    assert(out.columns.contains("name") && !out.columns.contains("s"))
  }

  test("validations: duplicate names, missing deps, dtype checks") {
    intercept[IllegalArgumentException](run(Seq(
      CreateColumn("s", "literal", value = Some("x"), valueType = Some("varchar")))))
    intercept[IllegalArgumentException](run(Seq(
      CreateColumn("c2", "concat", dependsOn = Seq("nope")))))
    intercept[IllegalArgumentException](run(Seq(
      ModifyColumn("x", "uppercase")))) // numeric col
    intercept[IllegalArgumentException](run(Seq(
      ModifyColumn("s", "extract_year")))) // string col
  }

  test("name-uniqueness guards are CASE-INSENSITIVE like Spark's resolver: " +
    "a same-name-different-case create would silently REPLACE the column " +
    "while the tracked schema appended a second field") {
    val e = intercept[IllegalArgumentException](run(Seq(
      CreateColumn("S", "literal", value = Some("x"), valueType = Some("varchar")))))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // rename onto an existing name differing only in case → AMBIGUOUS later
    intercept[IllegalArgumentException](run(Seq(
      ModifyColumnName("s", "K", priority = 0))))
    // a pure case-change rename of the SAME column is legitimate
    val (out, _) = run(Seq(ModifyColumnName("s", "S", priority = 0)))
    assert(out.columns.contains("S"))
  }

  test("remove_primary_key validates its names like add_primary_key: a typo " +
    "must not silently keep merging on the key it claimed to remove") {
    val e = intercept[IllegalArgumentException](run(Seq(
      RemovePrimaryKey(Seq("kk"), priority = 0))))
    assert(e.getMessage.contains("not a current key column"), e.getMessage)
    val (_, outSpec) = run(Seq(
      AddPrimaryKey(Seq("s"), priority = 0),
      RemovePrimaryKey(Seq("k"), priority = 1)))
    assert(outSpec.keyCols == Seq("s"))
  }

  test("pgType: length-qualified varchar and USER-DEFINED degrade to string " +
    "(reference Column.py:31-33)") {
    import org.apache.spark.sql.types._
    assert(TransformCompiler.pgType("character varying(255)") == StringType)
    assert(TransformCompiler.pgType("varchar(40)") == StringType)
    assert(TransformCompiler.pgType("USER-DEFINED") == StringType)
    assert(TransformCompiler.pgType("numeric") == DecimalType(38, 18))
  }
}
