package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-to-right double dot product of two numeric arrays as a native
  * codegen expression.
  *
  * The HOF composition `aggregate(sequence(1, size(a)), 0.0, acc + a[i]*b[i])`
  * computes the same value but evaluates interpreted (higher-order
  * functions don't participate in whole-stage codegen) and allocates a
  * sequence array per row. This expression is the tier-(b) upgrade the
  * build guidelines prescribe for hot scalar kernels: a tight fused loop
  * over the two `ArrayData`, no allocation, inside the codegen stage.
  *
  * Semantics: for equal-length non-empty arrays (the embedding case) the
  * value is BIT-IDENTICAL to the HOF form the DuckDB oracles mirror
  * (`list_sum(list_transform(...))`): accumulate in double, left to right,
  * seed 0.0, each float element promoted to double before the multiply.
  * A null element, an empty left array, or a right array shorter than the
  * left yields null — matching the HOF's null poisoning (element_at past
  * the end), never a silent partial sum. Mixed float/double element types
  * are read natively per side — no array cast, no copy.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  private def elemFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  // always nullable: length-mismatched or empty inputs yield null (below)
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // mirror the HOF form, which iterates over a's indices: any index past
    // b's end (element_at null) or an empty a poisons the sum — null, never
    // a silent partial result
    if (n == 0 || b.numElements() < n) return null
    val af = elemFloat(left)
    val bf = elemFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xa = if (elemFloat(left)) s"(double) $a.getFloat($i)"
               else s"$a.getDouble($i)"
      val xb = if (elemFloat(right)) s"(double) $b.getFloat($i)"
               else s"$b.getDouble($i)"
      val nullGuard =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n == 0 || $b.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    $s += $xa * $xb;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
