package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Row-level filter rules — the full 24-op surface of the reference
 * (dispatch table trempy/Filters/Filter.py:633-657; arity contract
 * trempy/Shared/FilterDefinitions.py:9-38; enum trempy/Shared/Types.py:62-87).
 *
 * Filters are conjunctive and applied in declaration order, each shrinking the
 * frame (reference: trempy/Tables/Table.py:236-253). Here all filters of a table
 * compile to ONE Catalyst predicate (`and`-fold), so Catalyst can push the whole
 * conjunction into the scan (PushedFilters) instead of running N sequential passes.
 *
 * DELETE passthrough: the reference's DELETE events carry only the key
 * (`(no-tuple-data)`, CDCManager.py:94-95), so filters on payload columns cannot
 * see them; DELETEs flow through unfiltered (README.md:154-156 documents the
 * consequence). `FilterCompiler.cdcPredicate` reproduces exactly that rule.
 */
case class FilterCfg(
    columnName: String,
    filterType: String,
    value: Option[Any] = None,
    values: Seq[Any] = Nil,
    lower: Option[Any] = None,
    upper: Option[Any] = None)

object FilterCompiler {

  val dateOnlyFmt = "yyyy-MM-dd"
  val dateTimeFmt = "yyyy-MM-dd HH:mm:ss"

  /** Parse the rule's date string per target column dtype — reference:
    * Filter.__convert_str_to_date (Filter.py:167-193; formats at Shared/DataTypes/Datatype.py:10-13).
    * The literal is VALIDATED driver-side at rule-compile time: a value the
    * format cannot parse (e.g. ISO-8601 with a 'T') would otherwise make
    * to_timestamp yield NULL and the conjunctive filter silently drop EVERY
    * row — a drained table with no error, where the reference's strptime
    * raises. */
  private def dateLit(v: Any, dt: DataType): Column = {
    val s = v.toString
    val fmt = if (s.length > 10) dateTimeFmt else dateOnlyFmt
    // STRICT resolution to match Spark's own parser: java.time's default
    // SMART resolver quietly rounds day-overflow typos ('2024-02-31' →
    // Feb 29), so the guard would pass and the job still hit the very
    // failure it documents — an ANSI parse exception per batch, or with
    // ANSI off a NULL literal whose conjunctive filter drains every row.
    // STRICT needs era-free 'u' year patterns.
    val javaFmt = java.time.format.DateTimeFormatter
      .ofPattern(fmt.replace("yyyy", "uuuu"))
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)
    val ok = scala.util.Try {
      if (s.length > 10) java.time.LocalDateTime.parse(s, javaFmt)
      else java.time.LocalDate.parse(s, javaFmt)
    }.isSuccess
    require(ok, s"date filter value '$s' does not match '$fmt' " +
      s"or is not a real calendar date " +
      s"(supported: '$dateOnlyFmt' or '$dateTimeFmt')")
    dt match {
      case DateType =>
        to_date(lit(s), fmt)
      case TimestampType | TimestampNTZType =>
        to_timestamp(lit(s), fmt)
      case other =>
        throw new IllegalArgumentException(
          s"date filter requires a date/timestamp column, got $other")
    }
  }

  /** Resolve the filter's column like Spark does (exact name first, then
    * case-insensitive) — EVERY filter validates at compile time with the
    * rule named, not just the date ops: a typo'd column otherwise surfaces
    * later as Spark's generic UNRESOLVED_COLUMN with no hint which
    * settings.json rule is broken. */
  private def resolveCol(f: FilterCfg, schema: StructType): StructField =
    schema.fields.find(_.name == f.columnName)
      .orElse(schema.fields.find(_.name.equalsIgnoreCase(f.columnName)))
      .getOrElse(throw new IllegalArgumentException(
        s"filter ${f.filterType}: column not found: ${f.columnName} " +
          s"(schema: ${schema.fieldNames.mkString(", ")})"))

  private def requireDateCol(f: FilterCfg, schema: StructType): DataType =
    resolveCol(f, schema).dataType match {
      case dt @ (DateType | TimestampType | TimestampNTZType) => dt
      case other => throw new IllegalArgumentException(
        s"filter ${f.filterType} on ${f.columnName}: column must be date/timestamp, got $other")
    }

  /** The string ops' sibling of [[requireDateCol]]: startsWith on a numeric
    * column either dies later as an unnamed DATATYPE_MISMATCH or implicitly
    * casts and matches against the stringified value — both violate this
    * file's fail-at-compile-with-the-rule-named contract. */
  private def requireStringCol(f: FilterCfg, schema: StructType): Unit =
    resolveCol(f, schema).dataType match {
      case StringType => ()
      case other => throw new IllegalArgumentException(
        s"filter ${f.filterType} on ${f.columnName}: column must be string, got $other")
    }

  /** Compile one filter rule to a Catalyst predicate. */
  def compile(f: FilterCfg, schema: StructType): Column = {
    val c = col(resolveCol(f, schema).name)
    // every missing-operand path fails with the filter named — a bare
    // None.get gives the operator no hint which settings.json rule is broken
    def rawV = f.value.getOrElse(
      throw new IllegalArgumentException(s"filter ${f.filterType}: missing value"))
    def rawLo = f.lower.getOrElse(
      throw new IllegalArgumentException(s"filter ${f.filterType}: missing lower"))
    def rawHi = f.upper.getOrElse(
      throw new IllegalArgumentException(s"filter ${f.filterType}: missing upper"))
    def v = lit(rawV)
    def lo = lit(rawLo)
    def hi = lit(rawHi)
    def dv = dateLit(rawV, requireDateCol(f, schema))

    f.filterType match {
      case "equals"                      => c === v
      case "not_equals"                  => c =!= v
      case "greater_than"                => c > v
      case "greater_than_or_equal"       => c >= v
      case "less_than"                   => c < v
      case "less_than_or_equal"          => c <= v
      // empty `values` would compile to drop-EVERYTHING (isin() is false for
      // every row) / keep-everything — the silent-drain failure mode, from
      // nothing more than writing `value` instead of `values` in settings
      case "in"                          => require(f.values.nonEmpty,
                                              s"filter in on ${f.columnName}: empty values list")
                                            c.isin(f.values: _*)
      case "not_in"                      => require(f.values.nonEmpty,
                                              s"filter not_in on ${f.columnName}: empty values list")
                                            !c.isin(f.values: _*)
      case "is_null"                     => c.isNull
      case "is_not_null"                 => c.isNotNull
      case "starts_with"                 => requireStringCol(f, schema)
                                            c.startsWith(rawV.toString)
      case "ends_with"                   => requireStringCol(f, schema)
                                            c.endsWith(rawV.toString)
      // literal substring match — the reference's Polars str.contains is regex by
      // accident (Filter.py:388-422); we match the documented intent (SURVEY §2.2).
      case "contains"                    => requireStringCol(f, schema)
                                            c.contains(rawV.toString)
      case "not_contains"                => requireStringCol(f, schema)
                                            !c.contains(rawV.toString)
      case "between"                     => c.between(lo, hi)
      case "not_between"                 => !c.between(lo, hi)
      case "date_equals"                 => c === dv
      case "date_not_equals"             => c =!= dv
      case "date_greater_than"           => c > dv
      case "date_greater_than_or_equal"  => c >= dv
      case "date_less_than"              => c < dv
      case "date_less_than_or_equal"     => c <= dv
      case "date_between" =>
        val dt = requireDateCol(f, schema)
        c.between(dateLit(rawLo, dt), dateLit(rawHi, dt))
      case "date_not_between" =>
        val dt = requireDateCol(f, schema)
        !c.between(dateLit(rawLo, dt), dateLit(rawHi, dt))
      case other =>
        throw new IllegalArgumentException(s"unknown filter_type: $other")
    }
  }

  /** All filters of a table folded to one conjunctive predicate. */
  def compileAll(filters: Seq[FilterCfg], schema: StructType): Column =
    filters.map(compile(_, schema)).foldLeft(lit(true))(_ && _)

  /** CDC variant: payload filters apply to INSERT/UPDATE; DELETE passes by key. */
  def cdcPredicate(filters: Seq[FilterCfg], schema: StructType, opCol: Column): Column =
    opCol === graft.model.ChangeEvent.DELETE || compileAll(filters, schema)
}
