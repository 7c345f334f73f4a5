package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd sequential-fold dot product over two `array<double>` columns.
  *
  * The one place SURVEY §7.5's "built-ins only" stance genuinely breaks
  * down at scale: Spark's higher-order functions (`zip_with` +
  * `aggregate`) evaluate interpreted, per element, per row — the hot loop
  * of every similarity operator — and unrolling the fold into an
  * `element_at` chain trades that for multi-second Janino compiles of
  * ~200-term methods. A native expression keeps the loop INSIDE one
  * compact generated method: whole-stage codegen, no per-element
  * expression dispatch, constant compile cost at any dimension.
  *
  * Fold order is `((0 + p0) + p1) + ...` — identical to the HOF form and
  * DuckDB's `list_reduce`, so results stay bit-equal (asserted in
  * SimilaritySpec). The null contract also matches both: a null ARRAY
  * input yields null, and a LENGTH MISMATCH yields null (zip_with /
  * list_zip pad the shorter side with null, poisoning the fold) — a
  * ragged embedding row drops out of scoring identically on all three
  * paths instead of silently scoring a common prefix here. Array
  * elements themselves must be non-null (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column wrapper: `dot_product(a, b)` as a usable Column. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
