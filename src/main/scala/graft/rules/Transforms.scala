package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Transformation rules — the reference's 7 transform types × 13 scalar ops
 * (dispatcher trempy/Transformations/Transformation.py:159-210; column creators
 * trempy/Transformations/ColumnCreator.py:278-323; modifiers
 * trempy/Transformations/ColumnModifier.py:223-260; scalar exprs in
 * FunctionColumnCreator.py / FunctionColumnModifier.py).
 *
 * Executed in ascending priority (0=HIGHEST .. 4=LOWEST, trempy/Shared/Types.py:89-94;
 * trempy/Tables/Table.py:215-234). All compile to Catalyst `Column`s once at job
 * start — not re-validated per batch like the reference (ColumnCreator.py:278-323).
 *
 * Determinism: `date_now`/`datetime_now` take the batch's deterministic timestamp
 * instead of wall clock (reference uses datetime.now(), FunctionColumnCreator.py:31-38)
 * so replay from checkpoint is byte-stable — documented deviation (SURVEY §7.4.3).
 */
sealed trait TransformCfg { def priority: Int }

// ── structural (mutate the spec, not rows) — Transformation.py:55-131 ──
case class ModifySchemaName(targetSchemaName: String, priority: Int = 0) extends TransformCfg
case class ModifyTableName(targetTableName: String, priority: Int = 0) extends TransformCfg
case class ModifyColumnName(columnName: String, targetColumnName: String, priority: Int = 0) extends TransformCfg
case class AddPrimaryKey(columnNames: Seq[String], priority: Int = 0) extends TransformCfg
case class RemovePrimaryKey(columnNames: Seq[String], priority: Int = 0) extends TransformCfg

/** Column creators — ColumnCreator.create_column; ops literal | date_now |
  * datetime_now | concat | date_diff_years (FunctionColumnCreator.py:23-55). */
case class CreateColumn(
    newColumnName: String,
    operation: String,
    value: Option[Any] = None,
    valueType: Option[String] = None,       // PG type name, SURVEY §1.2 mapping
    dependsOn: Seq[String] = Nil,
    separator: String = "",
    round: Boolean = false,
    priority: Int = 2) extends TransformCfg

/** Column modifiers — ColumnModifier.modify_column; ops format_date | uppercase |
  * lowercase | trim | extract_year/month/day | math_expression
  * (FunctionColumnModifier.py:26-158). */
case class ModifyColumn(
    columnName: String,
    operation: String,
    format: Option[String] = None,
    expression: Option[String] = None,
    priority: Int = 2) extends TransformCfg

/** Target identity + merge keys of one replicated table —
  * reference: trempy/Tables/Table.py:30-54. */
case class TableSpec(
    schemaName: String,
    tableName: String,
    targetSchemaName: String,
    targetTableName: String,
    keyCols: Seq[String])
object TableSpec {
  def apply(schema: String, table: String, keys: Seq[String]): TableSpec =
    TableSpec(schema, table, schema, table, keys)
}

/** Result of compiling a rule set: a row mapper + the evolved spec/schema. */
case class CompiledTransforms(
    apply: DataFrame => DataFrame,
    outSpec: TableSpec,
    outSchema: StructType)

object TransformCompiler {

  /** PG type-name → Spark type (reference mapping trempy/Shared/DataTypes/Datatype.py:38-68).
    * `character varying(n)` keeps its length only as documentation (Spark
    * strings are unbounded); `USER-DEFINED` degrades to varchar exactly like
    * the reference (trempy/Columns/Column.py:31-33). */
  def pgType(name: String): DataType = name.toLowerCase(java.util.Locale.ROOT) match {
    case "smallint"                      => ShortType
    case "integer" | "int"               => IntegerType
    case "bigint"                        => LongType
    case "real"                          => FloatType
    case "double precision" | "double"   => DoubleType
    case "character varying" | "varchar" | "text" | "string" => StringType
    case s if s.startsWith("character varying(") || s.startsWith("varchar(") => StringType
    case "user-defined"                  => StringType
    case "boolean"                       => BooleanType
    case "date"                          => DateType
    case "timestamp"                     => TimestampType
    case "numeric"                       => DecimalType(38, 18)
    case other => throw new IllegalArgumentException(s"unknown value_type: $other")
  }

  /** strftime → java.time.DateTimeFormatter pattern (reference emits strftime,
    * FunctionColumnModifier.py:26-28). Token-wise, not global replace: `%%`
    * must win over `%Y` inside `%%Y` (global replace mangled it), and an
    * UNMAPPED directive fails at rule-compile time with its name — the raw
    * letter would otherwise reach DateTimeFormatter and throw an opaque
    * 'Unknown pattern letter' on every batch. */
  def strftimeToJava(fmt: String): String = {
    val map = Map('Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS")
    val out = new StringBuilder
    // literal runs must be QUOTED when they contain letters: an unquoted
    // alphabetic literal (the ISO 'T' in %Y-%m-%dT%H:%M:%S, the 'days' in
    // '%d days') is read as a pattern letter downstream — either an opaque
    // 'Unknown pattern letter: T' crash on the first batch or a silently
    // wrong format. Single quotes escape as '' per the pattern grammar.
    val litBuf = new StringBuilder
    def flushLit(): Unit = if (litBuf.nonEmpty) {
      val s = litBuf.toString
      if (s.exists(_.isLetter)) out ++= "'" + s.replace("'", "''") + "'"
      else out ++= s.replace("'", "''")
      litBuf.clear(): Unit
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"format_date: dangling '%' in '$fmt'")
        val d = fmt.charAt(i + 1)
        if (d == '%') litBuf += '%'
        else {
          flushLit()
          out ++= map.getOrElse(d, throw new IllegalArgumentException(
            s"format_date: unsupported strftime directive '%$d' in '$fmt' " +
              s"(supported: ${map.keys.toSeq.sorted.map("%" + _).mkString(" ")} %%)"))
        }
        i += 2
      } else { litBuf += c; i += 1 }
    }
    flushLit()
    out.toString
  }

  private def requireCols(schema: StructType, cols: Seq[String], rule: String): Unit =
    cols.foreach { c =>
      require(schema.fieldNames.contains(c), s"$rule: dependency column '$c' not found")
    }

  private def requireDtype(schema: StructType, c: String, ok: DataType => Boolean, rule: String): Unit = {
    val dt = schema.fields.find(_.name == c).get.dataType
    require(ok(dt), s"$rule: column '$c' has unsupported dtype $dt")
  }

  /** Compile one creator to (name, Column). `batchTs` = deterministic now. */
  /** Returns (expression, result dtype) so the tracked schema is stated ONCE
    * beside the expression — a second hand-kept dtype table in compile()
    * silently diverged the moment an op's return type changed. */
  private def compileCreate(
      t: CreateColumn, schema: StructType, batchTs: Column): (Column, DataType) =
    t.operation match {
      case "literal" =>
        val dt = pgType(t.valueType.getOrElse("varchar"))
        (lit(t.value.orNull).cast(dt), dt)
      case "date_now"     => (batchTs.cast(DateType), DateType)
      case "datetime_now" => (batchTs.cast(TimestampType), TimestampType)
      case "concat" =>
        requireCols(schema, t.dependsOn, "concat")
        (concat_ws(t.separator, t.dependsOn.map(col): _*), StringType)
      case "date_diff_years" =>
        // year(end) - year(start) as double; optional round→long
        // (FunctionColumnCreator.py:46-55)
        require(t.dependsOn.size == 2, "date_diff_years: needs [start, end] columns")
        requireCols(schema, t.dependsOn, "date_diff_years")
        t.dependsOn.foreach(c => requireDtype(schema, c,
          d => d == DateType || d == TimestampType || d == TimestampNTZType,
          "date_diff_years"))
        val diff = (year(col(t.dependsOn(1))) - year(col(t.dependsOn(0)))).cast(DoubleType)
        if (t.round) (round(diff).cast(LongType), LongType) else (diff, DoubleType)
      case other => throw new IllegalArgumentException(s"unknown create operation: $other")
    }

  /** Compile one modifier to (replacement Column, result dtype) for
    * `t.columnName` — dtype stated once, beside the expression. */
  private def compileModify(t: ModifyColumn, schema: StructType): (Column, DataType) = {
    val c = col(t.columnName)
    requireCols(schema, Seq(t.columnName), t.operation)
    def isStr(d: DataType) = d == StringType
    def isDate(d: DataType) = d == DateType || d == TimestampType || d == TimestampNTZType
    def isNum(d: DataType) = d.isInstanceOf[NumericType]
    def keep = schema.fields.find(_.name == t.columnName).get.dataType
    t.operation match {
      case "format_date" =>
        requireDtype(schema, t.columnName, isDate, "format_date")
        (date_format(c, strftimeToJava(t.format.getOrElse("%Y-%m-%d"))), StringType)
      case "uppercase" =>
        requireDtype(schema, t.columnName, isStr, "uppercase"); (upper(c), keep)
      case "lowercase" =>
        requireDtype(schema, t.columnName, isStr, "lowercase"); (lower(c), keep)
      case "trim" =>
        requireDtype(schema, t.columnName, isStr, "trim"); (trim(c), keep)
      case "extract_year" =>
        requireDtype(schema, t.columnName, isDate, "extract_year"); (year(c), IntegerType)
      case "extract_month" =>
        requireDtype(schema, t.columnName, isDate, "extract_month"); (month(c), IntegerType)
      case "extract_day" =>
        requireDtype(schema, t.columnName, isDate, "extract_day"); (dayofmonth(c), IntegerType)
      case "math_expression" =>
        requireDtype(schema, t.columnName, isNum, "math_expression")
        (MathExpr.compile(t.expression.getOrElse(
          throw new IllegalArgumentException("math_expression: missing expression")), c),
          DoubleType)
      case other => throw new IllegalArgumentException(s"unknown modify operation: $other")
    }
  }

  /**
   * Compile a rule set against an input schema. Returns a single DataFrame mapper
   * (all rules fused into chained projections, priority-ordered) + the evolved spec.
   *
   * `batchTs` supplies the deterministic "now" for date_now/datetime_now.
   */
  def compile(
      transforms: Seq[TransformCfg],
      spec: TableSpec,
      inputSchema: StructType,
      batchTs: Column = current_timestamp()): CompiledTransforms = {

    var schema = inputSchema
    var outSpec = spec
    val steps = scala.collection.mutable.ListBuffer.empty[DataFrame => DataFrame]

    transforms.sortBy(_.priority).foreach {
      case ModifySchemaName(t, _) => outSpec = outSpec.copy(targetSchemaName = t)
      case ModifyTableName(t, _)  => outSpec = outSpec.copy(targetTableName = t)
      case ModifyColumnName(from, to, _) =>
        requireCols(schema, Seq(from), "modify_column_name")
        // CASE-INSENSITIVE uniqueness: Spark resolves names case-insensitively
        // by default, so renaming to a name differing only in case from an
        // existing column yields AMBIGUOUS_REFERENCE on the next resolution —
        // a case-sensitive guard here would wave it through
        require(!schema.fieldNames.exists(n => n.equalsIgnoreCase(to) && n != from),
          s"modify_column_name: '$to' already exists")
        schema = StructType(schema.fields.map(f => if (f.name == from) f.copy(name = to) else f))
        outSpec = outSpec.copy(keyCols = outSpec.keyCols.map(k => if (k == from) to else k))
        steps += (_.withColumnRenamed(from, to))
      case AddPrimaryKey(cols, _) =>
        requireCols(schema, cols, "add_primary_key")
        outSpec = outSpec.copy(keyCols = (outSpec.keyCols ++ cols).distinct)
      case RemovePrimaryKey(cols, _) =>
        // a typo'd name would filter nothing and silently keep merging on
        // the key the operator believed was removed — validate like
        // add_primary_key does
        cols.foreach(c => require(outSpec.keyCols.contains(c),
          s"remove_primary_key: '$c' is not a current key column " +
            s"(keys: ${outSpec.keyCols.mkString(", ")})"))
        outSpec = outSpec.copy(keyCols = outSpec.keyCols.filterNot(cols.contains))
      case t: CreateColumn =>
        // name uniqueness — ColumnCreator.py:86-108. Case-insensitive:
        // withColumn resolves case-insensitively, so a same-name-different-
        // case create would silently REPLACE the existing column while the
        // tracked schema appended a new field — every later write would see
        // a schema that no longer matches the frame
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(t.newColumnName)),
          s"create_column: '${t.newColumnName}' already exists")
        val (expr, fieldType) = compileCreate(t, schema, batchTs)
        schema = StructType(schema.fields :+ StructField(t.newColumnName, fieldType))
        steps += (_.withColumn(t.newColumnName, expr))
      case t: ModifyColumn =>
        val (expr, newType) = compileModify(t, schema)
        schema = StructType(schema.fields.map(f =>
          if (f.name == t.columnName) f.copy(dataType = newType) else f))
        steps += (_.withColumn(t.columnName, expr))
    }

    val fused: DataFrame => DataFrame = df => steps.foldLeft(df)((d, s) => s(d))
    CompiledTransforms(fused, outSpec, schema)
  }
}
