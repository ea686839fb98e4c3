package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Compiler for the reference's `math_expression` rule DSL —
 * reference: trempy/Transformations/FunctionColumnModifier.py:61-158, which
 * charset-validates an arithmetic string over the placeholder `value` and the
 * operators `+ - * / ^`, then `eval`s a Polars method chain.
 *
 * Here: a shunting-yard parser producing a Catalyst `Column` tree (no eval,
 * codegen-friendly, constant-folded by Catalyst). `^` is exponentiation
 * (right-associative, highest precedence), matching the reference's mapping
 * of `^` to `pow` (FunctionColumnModifier.py:131-141).
 */
object MathExpr {

  sealed trait Tok
  private case class Num(v: Double) extends Tok
  private case object Value extends Tok
  private case class Op(c: Char) extends Tok
  private case object LPar extends Tok
  private case object RPar extends Tok

  private val allowed = "0123456789. +-*/^()value".toSet

  def tokenize(s: String): List[Tok] = {
    val bad = s.filterNot(allowed.contains)
    require(bad.isEmpty, s"math_expression: illegal characters '$bad' in '$s'")
    val toks = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || c == '.') {
        val j = s.indexWhere(ch => !(ch.isDigit || ch == '.'), i) match {
          case -1 => s.length; case k => k
        }
        val raw = s.substring(i, j)
        // '1.2.3' passes the charset check; name the expression instead of
        // leaking a bare NumberFormatException like no other path here does
        toks += Num(raw.toDoubleOption.getOrElse(throw new IllegalArgumentException(
          s"math_expression: malformed number '$raw' in '$s'")))
        i = j
      } else if (s.startsWith("value", i)) { toks += Value; i += 5 }
      else c match {
        case '(' => toks += LPar; i += 1
        case ')' => toks += RPar; i += 1
        case '+' | '-' | '*' | '/' | '^' =>
          // unary minus: distinct high-precedence operator '~'
          val unary = c == '-' && (toks.isEmpty || (toks.last match {
            case Op(_) | LPar => true; case _ => false
          }))
          toks += Op(if (unary) '~' else c); i += 1
        case other => throw new IllegalArgumentException(s"math_expression: unexpected '$other'")
      }
    }
    toks.toList
  }

  /** Python/Polars semantics (the reference evals there): `**` binds TIGHTER
    * than unary minus on its base (`-2**2 == -4`), while a unary minus in the
    * exponent still binds to its operand (`2**-3` parses). Hence '^' above
    * '~'; '~' is pushed without popping (prefix — its operand is unread). */
  private def prec(c: Char): Int = c match {
    case '^' => 4; case '~' => 3; case '*' | '/' => 2; case '+' | '-' => 1
  }
  private def rightAssoc(c: Char): Boolean = c == '^' || c == '~'

  /** Infix-shape validation: each token must arrive where the grammar allows
    * it. The stack machine below happily ACCEPTS postfix/adjacent forms —
    * 'value value *' evaluates to value² with only the leftover-count check —
    * while the reference's Python eval raises SyntaxError on the same string;
    * a typo'd rule must fail at compile, not silently compute something
    * plausible. */
  private def validateInfix(toks: List[Tok], expr: String): Unit = {
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"math_expression: $what in '$expr'")
    var expectOperand = true
    toks.foreach {
      case Num(_) | Value =>
        if (!expectOperand) fail("two adjacent operands (missing operator)")
        expectOperand = false
      case LPar =>
        if (!expectOperand) fail("'(' after an operand (missing operator)")
      case RPar =>
        if (expectOperand) fail("')' after an operator (missing operand)")
      case Op('~') =>
        if (!expectOperand) fail("misplaced unary '-'")
      case Op(c) =>
        if (expectOperand) fail(s"operator '$c' missing its left operand")
        expectOperand = true
    }
    if (expectOperand) fail("dangling trailing operator")
  }

  /** Compile the DSL string to a Column over `valueCol` (the `value` placeholder). */
  def compile(expr: String, valueCol: Column): Column = {
    val out = scala.collection.mutable.Stack.empty[Column]
    val ops = scala.collection.mutable.Stack.empty[Tok]

    def applyOp(c: Char): Unit = {
      if (c == '~') {
        require(out.nonEmpty, s"math_expression: malformed expression '$expr'")
        out.push(negate(out.pop()))
        return
      }
      require(out.size >= 2, s"math_expression: malformed expression '$expr'")
      val r = out.pop(); val l = out.pop()
      out.push(c match {
        case '+' => l + r
        case '-' => l - r
        case '*' => l * r
        case '/' => l / r
        case '^' => pow(l, r)
      })
    }

    val toks = tokenize(expr)
    validateInfix(toks, expr)
    toks.foreach {
      case Num(v)  => out.push(lit(v))
      case Value   => out.push(valueCol.cast("double"))
      case LPar    => ops.push(LPar)
      case RPar =>
        while (ops.nonEmpty && ops.top != LPar) ops.pop() match { case Op(c) => applyOp(c); case _ => }
        require(ops.nonEmpty, s"math_expression: unbalanced ')' in '$expr'")
        ops.pop()
      case o @ Op('~') =>
        // prefix operator: its operand hasn't been read yet, so nothing on
        // the stack can apply before it (popping '^' here would mis-parse
        // the valid exponent form `2^-3`)
        ops.push(o)
      case o @ Op(c) =>
        while (ops.nonEmpty && (ops.top match {
          case Op(t) => prec(t) > prec(c) || (prec(t) == prec(c) && !rightAssoc(c))
          case _     => false
        })) ops.pop() match { case Op(t) => applyOp(t); case _ => }
        ops.push(o)
    }
    while (ops.nonEmpty) ops.pop() match {
      case Op(c) => applyOp(c)
      case LPar  => throw new IllegalArgumentException(s"math_expression: unbalanced '(' in '$expr'")
      case _     =>
    }
    require(out.size == 1, s"math_expression: malformed expression '$expr'")
    out.pop()
  }
}
