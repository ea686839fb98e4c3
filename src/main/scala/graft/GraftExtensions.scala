package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StringType}

import graft.functions.{CosineSim, DotProduct, HyperplaneSig, NearestCells, RollingHash}

/**
 * SQL surface for the native kernels: `--conf
 * spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions(new
 * GraftExtensions)`) registers them in the session's function registry, so
 * `spark.sql("SELECT vec_dot(emb, q) ...")` plans the same whole-stage-codegen
 * expressions as the Column API in [[graft.functions.VectorOps]] /
 * [[graft.functions.RollingHash]]. The reference exposes its transforms only
 * through task JSON (`trempy/Tasks/Task.py`); on Spark the equivalent
 * first-class citizenship is SQL-callable Catalyst expressions.
 *
 * Registered functions:
 *   - `vec_dot(a, b)`                      — dot product over numeric arrays
 *   - `vec_cosine(a, b)`                   — cosine similarity
 *   - `hyperplane_sig(v, planes)`          — 64-bit random-hyperplane LSH signature
 *   - `nearest_cells(v, centroids, probes)`— IVF probe list (centroids = foldable
 *                                            array<array<double>> literal)
 *   - `rolling_hash(s[, prime, mod])`      — polynomial fingerprint hash
 *
 * Registered TABLE functions (the lake as a pure-SQL surface — reads,
 * time travel, CDC-out and DLX browse without a line of Scala; arguments
 * must be literals, resolved at analysis time like any table reference):
 *   - `graft_table('dir')`                 — current snapshot (tombstone-free,
 *                                            merge-on-read deltas resolved)
 *   - `graft_table('dir', version)`        — time travel to a snapshot
 *   - `graft_changes('dir', from, to)`     — change feed over (from, to]
 *   - `graft_quarantine('dir'[, epoch])`   — quarantined rows + reasons
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach(ext.injectFunction)
    tableFunctions.foreach(ext.injectTableFunction)
  }
}

object GraftExtensions {

  /** (name, usage, builder) triples shared by the extension injection and
    * [[register]] (for an already-built session, e.g. the test fixture). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      fn("vec_dot", "_FUNC_(a, b) - dot product of two numeric arrays") { args =>
        arity("vec_dot", args, 2)
        DotProduct(args(0), args(1))
      },
      fn("vec_cosine", "_FUNC_(a, b) - cosine similarity of two numeric arrays") { args =>
        arity("vec_cosine", args, 2)
        // the SAME fused kernel as the Column API (zero-norm / null-element /
        // length-mismatch → NULL, single pass over both arrays)
        CosineSim(args(0), args(1))
      },
      fn("hyperplane_sig",
        "_FUNC_(v, planes) - 64-bit random-hyperplane LSH signature of a numeric array") { args =>
        arity("hyperplane_sig", args, 2)
        HyperplaneSig(args(0), intArg("hyperplane_sig", "planes", args(1)))
      },
      fn("nearest_cells",
        "_FUNC_(v, centroids, probes) - best-first IVF probe cells; centroids is a " +
          "foldable array<array<double>> literal") { args =>
        arity("nearest_cells", args, 3)
        NearestCells(args(0), centroidsArg(args(1)),
          intArg("nearest_cells", "probes", args(2)))
      },
      fn("rolling_hash",
        "_FUNC_(s[, prime, mod]) - polynomial rolling hash fingerprint of a string") { args =>
        if (args.size < 1 || args.size > 3)
          fail(s"rolling_hash expects 1 to 3 arguments, got ${args.size}")
        val s = Cast(args(0), StringType)
        args.size match {
          case 1 => RollingHash(s)
          case 2 => RollingHash(s, longArg("rolling_hash", "prime", args(1)))
          case _ => RollingHash(s, longArg("rolling_hash", "prime", args(1)),
            longArg("rolling_hash", "mod", args(2)))
        }
      }
    )

  /** The lake surfaces as SQL table functions. Builders run at ANALYSIS time
    * (like resolving any table reference): literal args are evaluated, the
    * manifest is resolved once, and the returned plan is the same
    * bucket-pruned, delta-resolving plan the Scala readers build — so
    * `spark.sql("SELECT … FROM graft_table('…')")` costs what
    * `lake.read(spark)` costs, no extra indirection. */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      tvf("graft_table",
        "_FUNC_(dir[, version]) - lake snapshot read; 2-arg form time-travels") { args =>
        if (args.isEmpty || args.size > 2)
          fail(s"graft_table expects 1 or 2 arguments, got ${args.size}")
        val lake = new graft.lake.LakeTable(stringArg("graft_table", "dir", args(0)))
        val spark = org.apache.spark.sql.SparkSession.active
        val df =
          if (args.size == 2) lake.readVersion(spark, intArg("graft_table", "version", args(1)))
          else lake.read(spark)
        df.queryExecution.logical
      },
      tvf("graft_changes",
        "_FUNC_(dir, from, to) - change feed over the version window (from, to]") { args =>
        arity("graft_changes", args, 3)
        val lake = new graft.lake.LakeTable(stringArg("graft_changes", "dir", args(0)))
        lake.changeLog(org.apache.spark.sql.SparkSession.active,
          intArg("graft_changes", "from", args(1)),
          intArg("graft_changes", "to", args(2)))
          .queryExecution.logical
      },
      tvf("graft_quarantine",
        "_FUNC_(dir[, epoch]) - quarantined rows with per-row reasons") { args =>
        if (args.isEmpty || args.size > 2)
          fail(s"graft_quarantine expects 1 or 2 arguments, got ${args.size}")
        val lake = new graft.lake.LakeTable(stringArg("graft_quarantine", "dir", args(0)))
        val epoch = if (args.size == 2)
          Some(longArg("graft_quarantine", "epoch", args(1))) else None
        lake.quarantine(org.apache.spark.sql.SparkSession.active, epoch)
          .queryExecution.logical
      }
    )

  /** Register on a live session (same builders as the extension path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    tableFunctions.foreach { case (ident, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
    }
  }

  // usage threads into the catalog so DESCRIBE FUNCTION answers (every usage
  // string follows the _FUNC_(args) - description contract the constructor's
  // replaceFunctionName expects)
  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val info = new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")
    (FunctionIdentifier(name), info, builder)
  }

  private def tvf(name: String, usage: String)(builder: Seq[Expression] => LogicalPlan)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = {
    val info = new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")
    (FunctionIdentifier(name), info, builder)
  }

  private def stringArg(name: String, arg: String, e: Expression): String =
    Cast(foldableArg(name, arg, e), StringType).eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => fail(s"$name: $arg must be a string literal, got $other")
    }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.size != n) fail(s"$name expects $n arguments, got ${args.size}")

  private def foldableArg(name: String, arg: String, e: Expression): Expression = {
    if (!e.foldable) fail(s"$name: $arg must be a foldable literal, got ${e.sql}")
    e
  }

  /** Int via the LONG path with an explicit range check: a straight cast to
    * IntegerType silently wraps out-of-range values in non-ANSI sessions
    * (graft_table('dir', 2^32+1) would time-travel to version 1) and throws
    * a raw CAST_OVERFLOW instead of a named error under ANSI. */
  private def intArg(name: String, arg: String, e: Expression): Int = {
    val l = longArg(name, arg, e)
    if (l < Int.MinValue || l > Int.MaxValue)
      fail(s"$name: $arg out of int range: $l")
    l.toInt
  }

  private def longArg(name: String, arg: String, e: Expression): Long = {
    e.dataType match {
      // a cast would silently TRUNCATE 1.9 → 1 in both ANSI modes
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType |
           (_: org.apache.spark.sql.types.DecimalType) =>
        fail(s"$name: $arg must be an integral literal, got ${e.sql}")
      case _ =>
    }
    Cast(foldableArg(name, arg, e), LongType).eval() match {
      case l: Long => l
      case other   => fail(s"$name: $arg must be a long literal, got $other")
    }
  }

  /** Evaluate a foldable array<array<numeric>> literal into the centroid matrix. */
  private def centroidsArg(e: Expression): Array[Array[Double]] = {
    if (!e.foldable)
      fail(s"nearest_cells: centroids must be a foldable array<array<double>> literal")
    val elemT = e.dataType match {
      case ArrayType(ArrayType(t @ (DoubleType | FloatType | IntegerType | LongType), _), _) => t
      case other => fail(s"nearest_cells: centroids must be array<array<numeric>>, got $other")
    }
    val outer = e.eval() match {
      case a: ArrayData => a
      case _ => fail("nearest_cells: centroids literal evaluated to null")
    }
    Array.tabulate(outer.numElements()) { c =>
      // the type pattern admits containsNull=true literals: a null inner
      // array (or null element) would otherwise surface as a bare NPE / a
      // 0.0-substituted centroid component with no hint which literal is bad
      if (outer.isNullAt(c)) fail(s"nearest_cells: centroids[$c] is null")
      val row = outer.getArray(c)
      Array.tabulate(row.numElements()) { i =>
        if (row.isNullAt(i))
          fail(s"nearest_cells: centroids[$c][$i] is null")
        elemT match {
          case DoubleType  => row.getDouble(i)
          case FloatType   => row.getFloat(i).toDouble
          case IntegerType => row.getInt(i).toDouble
          case LongType    => row.getLong(i).toDouble
          case other       => fail(s"unreachable centroid element type $other")
        }
      }
    }
  }
}
