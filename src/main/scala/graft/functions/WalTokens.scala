package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass `test_decoding` tuple tokenizer: the line's `name[type]:value`
 * tokens as a name → raw-value map, LAST occurrence winning on duplicate
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
 */
case class WalTokens(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "wal_tokens"

  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(graft.feed.WalParser.COL_RE)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = pattern.matcher(s)
    // LinkedHashMap: duplicate names overwrite in place (last wins) without
    // growing the entry array
    val entries = new java.util.LinkedHashMap[String, String]()
    while (m.find()) entries.put(m.group(1), m.group(3))
    val keys = new Array[Any](entries.size)
    val vals = new Array[Any](entries.size)
    var i = 0
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = UTF8String.fromString(e.getValue)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(newChild: Expression): WalTokens =
    copy(child = newChild)
}

object WalTokens {
  def wal_tokens(c: Column): Column =
    Bridge.column(WalTokens(Bridge.expression(c)))
}
