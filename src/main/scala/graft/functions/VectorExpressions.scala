package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The naive formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * runs interpreted (higher-order functions have no codegen) and allocates
  * an intermediate array per row-pair. [[DotProduct]] generates a tight
  * primitive loop inside whole-stage codegen instead: no boxing, no
  * allocation, and the same strictly-sequential accumulation order, so
  * results are bit-identical to the fold (and to DuckDB's list iteration,
  * which the oracle relies on).
  */
object VectorExpressions {

  /** Sequential-order dot product of two float/double array columns. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** L2 norm with the exact IEEE op sequence sqrt(dot(a, a)). */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity mirroring DuckDB list_cosine_similarity:
    * dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))). Prefer hoisting the two
    * norms out of a join (see SimilarityQueries) — this form recomputes
    * them per pair.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** All L random-hyperplane LSH bucket keys of a vector in one pass —
    * see [[HyperplaneSignatures]]. `planes` is the flattened
    * (L·r) × dim matrix, row-major.
    */
  def hyperplaneSigs(e: Column, planes: Array[Double], numTables: Int,
      bitsPerTable: Int): Column =
    GraftColumnBridge.column(HyperplaneSignatures(
      GraftColumnBridge.expression(e), planes, numTables, bitsPerTable))
}

/** `sum_{i} (double) a(i) * (double) b(i)` over two arrays, accumulated in
  * ascending index order. Null if either array is null, lengths differ, or
  * any element is null — identical to the zip_with+aggregate fold it
  * replaces (null element ⇒ null product ⇒ null running sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rf) bb.getFloat(i).toDouble else bb.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = (e: Expression, arr: String, i: String) =>
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** The L bucket keys of OR-amplified random-hyperplane LSH, computed in
  * ONE tight loop over a constant plane matrix: key t has bit j set iff
  * `planes[t·r+j] · e > 0`. Composing this from per-plane `DotProduct`s
  * against array literals generates L·r inlined loops plus L·r·dim literal
  * expressions — a codegen blob that blows past JIT inlining budgets and
  * costs seconds to compile; here the matrix lives in a single referenced
  * `double[]` and the generated code is three nested loops. Null if the
  * input is null, its length differs from the plane dimension, or any
  * element is null (mirrors [[DotProduct]]).
  */
case class HyperplaneSignatures(child: Expression, planes: Array[Double],
    numTables: Int, bitsPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val dim = planes.length / (numTables * bitsPerTable)
  require(planes.length == numTables * bitsPerTable * dim)

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_sigs"

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val f = isFloat
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var key = 0L
      var j = 0
      while (j < bitsPerTable) {
        var dot = 0.0
        val off = (t * bitsPerTable + j) * dim
        var d = 0
        while (d < dim) {
          if (arr.isNullAt(d)) return null
          dot += planes(off + d) * (if (f) arr.getFloat(d).toDouble else arr.getDouble(d))
          d += 1
        }
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val getter = (arr: String, i: String) =>
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, e => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val key = ctx.freshName("key")
      val off = ctx.freshName("off")
      s"""
         |if ($e.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$numTables];
         |  outer: for (int $t = 0; $t < $numTables; $t++) {
         |    long $key = 0L;
         |    for (int $j = 0; $j < $bitsPerTable; $j++) {
         |      double $dot = 0.0;
         |      int $off = ($t * $bitsPerTable + $j) * $dim;
         |      for (int $d = 0; $d < $dim; $d++) {
         |        if ($e.isNullAt($d)) { ${ev.isNull} = true; break outer; }
         |        $dot += $planesRef[$off + $d] * ${getter(e, d)};
         |      }
         |      if ($dot > 0) $key |= (1L << $j);
         |    }
         |    $out[$t] = $key;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}
