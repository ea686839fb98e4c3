package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass `test_decoding` tuple tokenizer: the line's `name[type]:value`
 * tokens as a name → CLEANED-value map, LAST occurrence winning on duplicate
 * names (a primary-key UPDATE emits old-key then new-tuple under the same
 * name; the reference's dict building keeps the later assignment,
 * CDCManager.py:100-110).
 *
 * This replaces a Catalyst-expression tokenizer (regexp_extract_all + a
 * per-field interpreted higher-order filter chain) whose TREE was the cost:
 * ~50 expression nodes per payload field made every micro-batch pay seconds
 * of analysis/optimization/codegen on the driver before a single row moved,
 * and the per-field filters re-scanned the token array per column. Here the
 * whole tokenize is ONE expression node evaluated once per row — the same
 * compiled [[graft.feed.WalParser.COL_RE]] pattern, one matcher pass —
 * and each payload field is a plain map lookup. CodegenFallback is fine:
 * the single eval call per row is dwarfed by the regex work it wraps, and
 * the surrounding projection still whole-stage-codegens.
 *
 * Values are stored CLEANED (what the old per-field cleanToken column tree
 * computed, fused into the same matcher pass): outer quotes stripped with
 * doubled quotes unescaped (''→' — test_decoding's escape), and the literal
 * unquoted `null` stored as a NULL value (a quoted 'null' stays the string).
 * Storing the null (valueContainsNull = true), not skipping the put, keeps
 * last-wins exact: a later `col[int]:null` must override an earlier value,
 * not resurrect it.
 */
case class WalTokens(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def prettyName: String = "wal_tokens"

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(graft.feed.WalParser.COL_RE)

  private def clean(v: String): String = {
    if (v == "null") return null
    val n = v.length
    if (n >= 2 && v.charAt(0) == '\'' && v.charAt(n - 1) == '\'') {
      val body = v.substring(1, n - 1)
      // the '' unescape only when present — the common token has none
      if (body.contains("''")) body.replace("''", "'") else body
    } else v
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = pattern.matcher(s)
    // LinkedHashMap: duplicate names overwrite in place (last wins) without
    // growing the entry array
    val entries = new java.util.LinkedHashMap[String, String]()
    while (m.find()) entries.put(m.group(1), clean(m.group(3)))
    val keys = new Array[Any](entries.size)
    val vals = new Array[Any](entries.size)
    var i = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = if (e.getValue == null) null else UTF8String.fromString(e.getValue)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): WalTokens =
    copy(child = newChild)
}

/**
 * One-pass `test_decoding` LINE match: `table <schema>.<table>: <OP>: <rest>`
 * as a struct, or NULL for a non-DML line. The old shape ran the anchored
 * [[graft.feed.WalParser.LINE_RE]] matcher FIVE times per line — an rlike
 * prefilter plus one regexp_extract per group — where one pass yields all
 * four groups. `rest` is NULL for a truncated line (`table s.t: INSERT:`
 * with nothing after the op colon): it matches the DML prefix but carries no
 * tuple data — the caller quarantines it as unknown_op, exactly like the
 * old "full LINE_RE fails ⇒ every group extracts empty" path.
 */
case class WalLine(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("schema", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("rest", StringType, nullable = true)))
  override def prettyName: String = "wal_line"

  /** NULL for every non-DML line regardless of input nullability — without
    * this override UnaryExpression would inherit the (non-null) child's
    * nullability and generated consumers would skip the null check (NPE). */
  override def nullable: Boolean = true

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(graft.feed.WalParser.LINE_OPT_RE)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = pattern.matcher(s)
    if (!m.find()) null
    else InternalRow(
      UTF8String.fromString(m.group(1)),
      UTF8String.fromString(m.group(2)),
      UTF8String.fromString(m.group(3)),
      if (m.group(4) == null) null else UTF8String.fromString(m.group(4)))
  }

  override protected def withNewChildInternal(newChild: Expression): WalLine =
    copy(child = newChild)
}

object WalTokens {
  def wal_tokens(c: Column): Column =
    Bridge.column(WalTokens(Bridge.expression(c)))

  def wal_line(c: Column): Column =
    Bridge.column(WalLine(Bridge.expression(c)))
}
