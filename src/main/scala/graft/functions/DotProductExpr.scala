package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two float-array columns — the ANN hot
  * loop (custom-operator tier (b): a codegen'd `Expression` where the
  * built-ins genuinely fall short).
  *
  * The Column-algebra form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * CORRECT but cold: Spark's higher-order functions are `CodegenFallback`
  * — every row leaves whole-stage codegen, allocates the zipped product
  * array, and interprets the lambda per element. For brute/IVF cosine
  * search that is the inner loop over |corpus| × |queries| rows. This
  * expression generates a single fused Java loop: no intermediate array,
  * no per-element lambda dispatch, stays inside WholeStageCodegen.
  *
  * Null semantics mirror the HOF form exactly (verified by spec):
  * different lengths → null (zip_with pads with null, which nulls the
  * aggregate); any null element → null; accumulation order is left-to-
  * right, so results are bit-identical to the HOF form and the DuckDB
  * oracle's list_sum(list_apply(list_zip(...))).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elementOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got ${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_f"

  // element accessors chosen by child type: float elements are widened to
  // double exactly (IEEE), so mixed float/double inputs (e.g. a float
  // corpus against a double-typed trained codebook) stay bit-identical to
  // the all-double oracle form
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getL * $getR;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
