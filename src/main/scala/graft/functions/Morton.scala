package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low 31 bits of two longs — the
  * space-filling-curve key behind multi-column data clustering: sorting a
  * table by `morton(a, b)` keeps rows close in BOTH dimensions close in
  * the file order, so per-file min/max ranges tighten on a AND b at once
  * and scans filtered on either (or both) prune files that a
  * single-column sort could only prune for its leading column.
  *
  * Third custom codegen'd Catalyst expression (after [[DotProduct]] and
  * [[Hash60]]): the magic-number bit-spread is 5 shift-or-mask steps per
  * operand — branchless, whole-stage-codegen-friendly — where the
  * equivalent built-in-expression formulation would be a 64-term tree.
  * The identical mask chain written as SQL bitwise ops is the DuckDB
  * oracle formulation ([[Morton.duckSql]]), generated from the same
  * constants.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"morton expects (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Morton.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)
}

object Morton {

  /** (shift, mask) steps spreading a 32-bit value to even bit positions;
    * both the JVM path and the SQL oracle derive from this list. */
  val spreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of `v` to even bit positions. 31, not 32:
    * the odd-position operand shifts left once more, and bit 31 would
    * land on the sign bit — fine for the JVM's wrapping shift, but a
    * signed-overflow hazard in SQL engines. 31+31 bits keeps the code
    * positive everywhere. */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    spreadSteps.foreach { case (s, m) => x = (x | (x << s)) & m }
    x
  }

  /** Morton code: bits of `a` on even positions, bits of `b` on odd. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  def morton(a: Column, b: Column): Column =
    Bridge.column(MortonInterleave(Bridge.expression(a), Bridge.expression(b)))

  /** DuckDB SQL computing the same spread for expression `e`. */
  private def spreadSql(e: String): String =
    spreadSteps.foldLeft(s"($e & 2147483647)") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }

  /** DuckDB SQL for [[interleave]] of column expressions `a`, `b`. */
  def duckSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
