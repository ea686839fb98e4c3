package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/**
 * Native codegen'd vector kernels for the similarity/dedup ops.
 *
 * Spark's higher-order functions (`aggregate`, `zip_with`) evaluate the lambda
 * interpreted, per element — measured ~50× slower than generated code on the
 * all-pairs cosine workload. These expressions emit a tight double-precision
 * while-loop instead, keeping the whole stage codegen'd.
 *
 * Numeric contract: strict sequential left fold, products in double — exactly
 * the fold order of the SQL oracle (DuckDB list_reduce) and of the HOF
 * formulation they replace, so results are bit-identical.
 */
/** Numeric-array element access shared by the vector kernels: every numeric
  * element type reads as double (the old HOF formulations cast too); anything
  * else is rejected at ANALYSIS ([[check]], wired into every kernel's
  * checkInputDataTypes), not at execution mid-job — elemType's throw is only
  * the unreachable backstop behind it. */
private[functions] object VecElem {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  private def supported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType | ShortType, _) => true
    case _ => false
  }

  /** Analysis-time input contract: without it a `vec_dot(array(0.1, 0.2), e)`
    * (array<decimal> — numeric but unsupported) passes analysis and kills the
    * job at execution with a misleading runtime error. */
  def check(children: Seq[Expression], what: String): TypeCheckResult =
    children.zipWithIndex.collectFirst {
      case (e, i) if !supported(e.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$what: argument ${i + 1} must be array<float|double|int|bigint|" +
            s"smallint>, got ${e.dataType.catalogString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  def elemType(e: Expression, what: String): DataType = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType | IntegerType | LongType | ShortType), _) => et
    case other => throw new IllegalArgumentException(
      s"$what requires an array<numeric> input, got $other")
  }
  def read(et: DataType, x: ArrayData, i: Int): Double = et match {
    case FloatType   => x.getFloat(i).toDouble
    case DoubleType  => x.getDouble(i)
    case IntegerType => x.getInt(i).toDouble
    case LongType    => x.getLong(i).toDouble
    case ShortType   => x.getShort(i).toDouble
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }
  def getter(et: DataType, arr: String, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case other       => throw new IllegalStateException(s"unreachable: $other")
  }
  /** does the array type admit null ELEMENTS (ArrayData reads them as 0)? */
  def containsNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  }
}

/** Null contract (all three kernels, matching the HOF formulations they
  * replaced): a NULL input array → NULL (nullSafeEval); mismatched lengths or
  * a NULL ELEMENT → NULL result, never a silent partial/zero-substituted
  * value. `zip_with` pads the shorter array with nulls and `aggregate`'s sum
  * absorbs them to null — truncating to the shorter array instead would
  * return a plausible-looking similarity for a corrupted embedding row. The
  * per-element null branch is emitted only when the array type says
  * containsNull, so clean schemas keep the tight loop. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // length mismatch → null even when inputs are non-null
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecElem.check(children, prettyName)

  private lazy val leftET = VecElem.elemType(left, prettyName)
  private lazy val rightET = VecElem.elemType(right, prettyName)
  private lazy val anyCN = VecElem.containsNull(left) || VecElem.containsNull(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (anyCN && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += VecElem.read(leftET, x, i) * VecElem.read(rightET, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = VecElem.getter(leftET, a, i)
      val getY = VecElem.getter(rightET, b, i)
      // the null scan is a SEPARATE cheap loop, never a branch inside the
      // multiply loop: an inline check-and-break defeats the JIT's
      // vectorization of the fold (measured ~3.7× on the all-pairs cosine)
      val nullScan =
        if (anyCN) {
          val j = ctx.freshName("j")
          s"""for (int $j = 0; $j < $n; $j++) {
             |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += ($getX) * ($getY);
         |    }
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/**
 * Fused single-pass cosine similarity: dot(a,b), ‖a‖², ‖b‖² accumulate in ONE
 * loop over both arrays (the composed vec_dot formulation walks them three
 * times, and a zero-norm guard wrapped AROUND it re-evaluates the norm
 * product — measured ~4.5× on the all-pairs near-dup workload). Zero-norm,
 * null-element, and length-mismatch inputs all yield NULL (never an ANSI
 * DIVIDE_BY_ZERO, never a NaN that out-sorts every real score). Fold order
 * per accumulator is the same strict left-to-right sequence as the SQL
 * oracle — results stay bit-identical.
 */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecElem.check(children, prettyName)

  private lazy val leftET = VecElem.elemType(left, prettyName)
  private lazy val rightET = VecElem.elemType(right, prettyName)
  private lazy val anyCN = VecElem.containsNull(left) || VecElem.containsNull(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (anyCN) {
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = VecElem.read(leftET, x, i)
      val yv = VecElem.read(rightET, y, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      val getX = VecElem.getter(leftET, a, i)
      val getY = VecElem.getter(rightET, b, i)
      // null scan split from the fold loop — see DotProduct
      val nullScan =
        if (anyCN) {
          val j = ctx.freshName("j")
          s"""for (int $j = 0; $j < $n; $j++) {
             |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $xv = $getX;
         |      double $yv = $getY;
         |      $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |    }
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/**
 * Deterministic random-hyperplane LSH signature: bit h = sign of <v, p_h>,
 * where plane p_h's component at dimension i is ±1 taken from bit h of
 * xxhash64(i) — one hash per element covers up to 64 planes. No stored model,
 * reproducible across jobs (replay-safe).
 *
 * Native codegen'd replacement for the aggregate/zip_with HOF formulation,
 * which evaluates its lambda interpreted per element × per plane (measured
 * ~50× slower on this repo's corpus workloads — BASELINE.md).
 */
case class HyperplaneSig(child: Expression, planes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 64, s"planes must be in [1,64], got $planes")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  // a null ELEMENT poisons the signature → null (see DotProduct's contract)
  override def nullable: Boolean = child.nullable || VecElem.containsNull(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecElem.check(children, prettyName)

  private lazy val elemT = VecElem.elemType(child, prettyName)
  private lazy val cn = VecElem.containsNull(child)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Double](planes)
    val hvs = HyperplaneSig.hashesUpTo(n)
    var i = 0
    while (i < n) {
      if (cn && x.isNullAt(i)) return null
      val v = VecElem.read(elemT, x, i)
      val hv = hvs(i)
      var h = 0
      while (h < planes) {
        acc(h) += (if (((hv >>> h) & 1L) == 0L) v else -v)
        h += 1
      }
      i += 1
    }
    var sig = 0L
    var h = 0
    while (h < planes) {
      if (acc(h) > 0) sig |= (1L << h)
      h += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val hv = ctx.freshName("hv")
      val hvs = ctx.freshName("hvs")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val getV = VecElem.getter(elemT, a, i)
      val nullScan =
        if (cn) {
          val j = ctx.freshName("j")
          s"""for (int $j = 0; $j < $n; $j++) {
             |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        } else ""
      s"""
         |int $n = $a.numElements();
         |$nullScan
         |if (!${ev.isNull}) {
         |  double[] $acc = new double[$planes];
         |  long[] $hvs = graft.functions.HyperplaneSig.hashesUpTo($n);
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $getV;
         |    long $hv = $hvs[$i];
         |    for (int $h = 0; $h < $planes; $h++) {
         |      $acc[$h] += ((($hv >>> $h) & 1L) == 0L) ? $v : -$v;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $h = 0; $h < $planes; $h++) {
         |    if ($acc[$h] > 0) $sig |= (1L << $h);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
}

object HyperplaneSig {
  /** Per-dimension plane hashes, shared by eval and codegen: the hash
    * depends ONLY on the dimension index, so recomputing it per row spent
    * (rows × dims) identical XXH64 calls on the declared hot path. Grown on
    * demand, published by volatile reference swap — a racing grower at worst
    * recomputes the same deterministic values; readers always hold a fully
    * initialized array (each grow fills a fresh copy before publishing). */
  @volatile private var hashCache: Array[Long] = Array.emptyLongArray

  def hashesUpTo(n: Int): Array[Long] = {
    var a = hashCache
    if (a.length < n) {
      val old = a.length
      a = java.util.Arrays.copyOf(a, n)
      var i = old
      while (i < n) { a(i) = XXH64.hashLong(i.toLong, 42L); i += 1 }
      hashCache = a
    }
    a
  }
}

/**
 * Probe cells for IVF ANN: the `probes` centroid indices with the highest
 * dot(v, ĉ) (centroids pre-normalized, so the ranking equals cosine ranking),
 * best-first. The centroid matrix rides along as a codegen reference object —
 * one tight double loop per row, no per-element lambda, no join against a
 * centroid table.
 */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], probes: Int)
  extends UnaryExpression {
  require(probes >= 1 && probes <= centroids.length)
  // ragged centroids would make the dimension contract below unstatable
  require(centroids.forall(_.length == centroids(0).length),
    "nearest_cells: centroids must share one dimensionality")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  // a null ELEMENT poisons every dot score → null probe list (the caller's
  // explode() then yields no rows: the vector simply joins nothing).
  // Same for a DIMENSION MISMATCH (wrong codebook / wrong model config):
  // truncating the dot to the shorter prefix would rank every row by a
  // plausible-looking but wrong score — the exact silent-partial result
  // vec_dot/vec_cosine's null contract exists to prevent.
  // Always true: the mismatch null is data-dependent (array LENGTH, which
  // the type system can't see), so even a non-nullable containsNull=false
  // child can produce null — deriving this from the child would make the
  // codegen write an isNull that is a constant-false literal.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecElem.check(children, prettyName)

  private val dim = centroids(0).length

  private lazy val elemT = VecElem.elemType(child, prettyName)
  private lazy val cn = VecElem.containsNull(child)

  /** Selection of the top-`probes` cells by score, best-first. Seeded with the
    * first unused cell so an all-NaN score vector (a NaN embedding element
    * poisons every dot product) still yields a valid — if arbitrary — probe
    * list instead of indexing with -1. A PARTIALLY-NaN vector (one poisoned
    * centroid, e.g. a NaN corpus embedding averaged into a cell) must not
    * hijack selection: once a NaN seeds bestScore, `x > NaN` is false for
    * every real score, so without the explicit displace-NaN clause the
    * lowest-indexed NaN cell would win every probe and IVF recall would
    * silently collapse. */
  private def topCells(scores: Array[Double]): Array[Int] = {
    val out = new Array[Int](probes)
    val used = new Array[Boolean](scores.length)
    var p = 0
    while (p < probes) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < scores.length) {
        if (!used(c) && (best < 0 || scores(c) > bestScore ||
          (bestScore.isNaN && !scores(c).isNaN))) {
          best = c; bestScore = scores(c)
        }
        c += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != dim) return null
    if (cn) {
      var i = 0
      while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += VecElem.read(elemT, x, i) * cent(i)
        i += 1
      }
      scores(c) = acc
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(topCells(scores))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val n = ctx.freshName("n"); val scores = ctx.freshName("scores")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val used = ctx.freshName("used"); val p = ctx.freshName("p")
      val best = ctx.freshName("best"); val bs = ctx.freshName("bs")
      val getV = VecElem.getter(elemT, a, i)
      val nullScan =
        if (cn) {
          val j = ctx.freshName("j")
          s"for (int $j = 0; $j < $n; $j++) { if ($a.isNullAt($j)) { ${ev.isNull} = true; break; } }"
        } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) { ${ev.isNull} = true; }
         |$nullScan
         |if (!${ev.isNull}) {
         |double[] $scores = new double[$mat.length];
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $acc += ($getV) * $mat[$c][$i]; }
         |  $scores[$c] = $acc;
         |}
         |int[] $out = new int[$probes];
         |boolean[] $used = new boolean[$mat.length];
         |for (int $p = 0; $p < $probes; $p++) {
         |  int $best = -1; double $bs = 0.0;
         |  for (int $c = 0; $c < $mat.length; $c++) {
         |    if (!$used[$c] && ($best < 0 || $scores[$c] > $bs ||
         |        (Double.isNaN($bs) && !Double.isNaN($scores[$c])))) {
         |      $best = $c; $bs = $scores[$c];
         |    }
         |  }
         |  $used[$best] = true; $out[$p] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** Serializable numeric-array element readers for partition-local folds that
  * run below the row codec (e.g. the all-pairs cosine scan) — the same
  * element coverage as [[VecElem.read]], as a closure-safe function. */
object VecElemAccess {
  def reader(et: DataType): (ArrayData, Int) => Double = et match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case ShortType   => (a, i) => a.getShort(i).toDouble
    case other => throw new IllegalArgumentException(
      s"unsupported numeric array element type: $other")
  }
}

object VectorOps {
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def hyperplane_sig(v: Column, planes: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(v), planes))

  def nearest_cells(v: Column, centroids: Array[Array[Double]], probes: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(v), centroids, probes))

  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Fused single-pass kernel ([[CosineSim]]): zero-norm inputs yield NULL,
    * not an ANSI DIVIDE_BY_ZERO crash (Spark 4 default) and not the non-ANSI
    * 0/0 NaN that would out-sort every real score — one all-zero embedding
    * in 10^10 rows must degrade that one row, never kill or poison the job. */
  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
