package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Polynomial rolling hash over a string — document fingerprinting for the
 * training-data pipeline (whole-stage-codegen'd native Catalyst expression,
 * not a UDF: stays inside WholeStageCodegen spans on the hot path).
 *
 * h = fold(c in chars): (h * prime + c) mod m   (m = 1e9+7, products < 2^63)
 */
case class RollingHash(child: Expression, prime: Long = 31L, mod: Long = 1000000007L)
    extends UnaryExpression {
  // caller-supplied (prime, mod) — reachable from SQL rolling_hash(s, p, m) —
  // must keep h * prime + c inside a signed 64-bit long (h ≤ mod-1, c ≤
  // 0xFFFF), or the fold wraps and the "plain-integer-arithmetic SQL oracle
  // reproduces it" contract silently breaks with wrap-dependent fingerprints
  require(prime >= 2 && mod >= 2 &&
    mod - 1 <= (Long.MaxValue - 0xFFFFL) / prime,
    s"rolling_hash: (prime=$prime, mod=$mod) out of range — need prime ≥ 2, " +
      "mod ≥ 2, and (mod-1)*prime + 65535 ≤ 2^63-1 so the fold never " +
      "overflows Long")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * prime + s.charAt(i)) % mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * ${prime}L + $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** input is cast to string so the expression's StringType contract holds */
  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c.cast(StringType))))
}
