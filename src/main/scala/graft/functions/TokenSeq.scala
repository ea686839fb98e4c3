package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native token-array derivation for the fixture feeds:
 * `transform(sequence(1, nTok), x -> cast(((eid % vocab) * a + x * b) % vocab as int))`
 * as ONE codegen'd loop.
 *
 * The `transform`/`sequence` higher-order formulation evaluates its lambda
 * INTERPRETED per element (guide §4.1's "prefer built-ins" is about exactly
 * this class of expression) and sits inside `feedFromEvents` — the feed
 * derivation every CDC pipeline/lake query evaluates one to three times per
 * run (write-feed sampling pass + write pass, WAL fixture rendering).
 * Measured with a noop sink at sf0.1: the token column alone is 0.32 s per
 * evaluation, ~60% of the whole feed derivation.
 *
 * Value contract: bit-identical to the HOF form (same Long arithmetic, same
 * Java `%` sign semantics, same Long→Int cast), which is itself mirrored 1:1
 * in the DuckDB oracle (`Queries.tokensSql`). The never-hit `nTok < 1` edge
 * replicates `sequence(1, n)`'s descending step so the two forms cannot
 * diverge on ANY input. Null semantics match the composition exactly too:
 * NULL nTok → NULL (sequence(1, null) is null), but NULL eid with a real
 * nTok → an array of nTok NULL elements (transform's lambda nulls out per
 * element while the array itself stays non-null) — TokenSeqSpec pins both.
 */
case class TokenSeq(left: Expression, right: Expression,
    a: Long, b: Long, vocab: Long) extends BinaryExpression {
  require(vocab != 0, "TokenSeq: vocab must be non-zero")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = left.nullable)
  override def prettyName: String = "token_seq"
  override def nullable: Boolean = right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(e: Expression): Boolean = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral(left))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: eid must be integral, got ${left.dataType.catalogString}")
    else if (!integral(right))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: nTok must be integral, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case ByteType    => v.asInstanceOf[Byte].toLong
    case ShortType   => v.asInstanceOf[Short].toLong
    case IntegerType => v.asInstanceOf[Int].toLong
    case LongType    => v.asInstanceOf[Long]
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }

  private def countOf(n: Long): Int = {
    val step = if (n >= 1L) 1L else -1L
    ((n - 1L) * step + 1L).toInt
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val nAny = right.eval(input)
    if (nAny == null) return null
    val n = asLong(right, nAny)
    val count = countOf(n)
    val eidAny = left.eval(input)
    if (eidAny == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](count))
    val eid = asLong(left, eidAny)
    val step = if (n >= 1L) 1L else -1L
    val base = (eid % vocab) * a
    val out = new Array[Int](count)
    var i = 0
    var x = 1L
    while (i < count) {
      out(i) = ((base + x * b) % vocab).toInt
      x += step
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i"); val x = ctx.freshName("x")
    val n = ctx.freshName("n"); val count = ctx.freshName("count")
    val step = ctx.freshName("step"); val base = ctx.freshName("base")
    val out = ctx.freshName("out")
    val nullFill =
      if (!left.nullable) ""
      else
        s"""if (${leftGen.isNull}) {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |    new Object[$count]);
           |} else""".stripMargin
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
         |${rightGen.code}
         |boolean ${ev.isNull} = ${rightGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  long $n = (long) ${rightGen.value};
         |  long $step = ($n >= 1L) ? 1L : -1L;
         |  int $count = (int) (($n - 1L) * $step + 1L);
         |  ${leftGen.code}
         |  $nullFill {
         |    long $base = (((long) ${leftGen.value}) % ${vocab}L) * ${a}L;
         |    int[] $out = new int[$count];
         |    long $x = 1L;
         |    for (int $i = 0; $i < $count; $i++) {
         |      $out[$i] = (int) (($base + $x * ${b}L) % ${vocab}L);
         |      $x += $step;
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenSeq =
    copy(left = l, right = r)
}
