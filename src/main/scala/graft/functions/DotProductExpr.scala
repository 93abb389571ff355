package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two ArrayType(DoubleType) columns —
  * the hot inner loop of every similarity operator (SURVEY.md §2 H2).
  *
  * The built-in HOF formulation (`aggregate(zip_with(a,b,*),0d,+)`) is
  * interpreted per element (ArrayTransform/ArrayAggregate don't codegen)
  * and allocates an intermediate product array per pair; this expression
  * compiles to a tight primitive loop inside whole-stage codegen.
  *
  * Determinism contract: strict left-to-right summation — identical fold
  * order to both the HOF version and DuckDB's list_dot_product, so oracle
  * comparisons stay bit-exact. Inputs are dense vectors (null ELEMENTS are
  * not supported — embedding columns are dense by contract); a null ARRAY
  * on either side yields null like any binary expression, and a LENGTH
  * MISMATCH yields null (matching the HOF, whose zip_with null-pads the
  * shorter side and poisons the sum) — a corrupt embedding must surface
  * as null, never as a plausible-looking partial dot product.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // mis-dimensioned -> null, like the HOF
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName is mandatory: fixed locals collide when two DotProducts
      // land in one codegen unit (non-nullable inputs inline unbraced) and
      // Janino fails the whole unit into interpreted fallback.
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point for the native expression. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(DotProduct(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
