package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.functions._

/** 2-D Hilbert-curve index (the xy2d bit fold) — the locality-
  * preserving layout key next to [[Morton]]'s Z-order: consecutive
  * Hilbert indices are ALWAYS 4-neighbor-adjacent cells, where the
  * Z-curve jumps across the grid at every power-of-two boundary, so
  * range scans over a Hilbert-clustered table touch strictly fewer
  * file extents for 2-D range predicates (the classic data-layout
  * result; HilbertSpec measures the locality win against Morton
  * directly).
  *
  * Spark side: one per-row `aggregate` fold over the `order` bit
  * planes, state (x, y, d) — branch-free of UDFs, codegen'd. Oracle
  * side: the SAME recurrence UNROLLED one CTE per bit plane — NOT
  * `list_reduce`, whose row-varying-accumulator form returns
  * cross-row-corrupted results (DuckDB bug found while building this;
  * single-row probes pass, multi-row queries interleave states).
  * Inputs are taken mod 2^order on both engines.
  */
/** NINTH custom codegen'd Catalyst expression: the xy2d bit loop
  * compiled as one static-call per row — the `aggregate` HOF fold
  * ([[Hilbert.hilbertFold]], kept as the value-parity reference) is
  * INTERPRETED per element in Spark, which is the wrong cost model for
  * a layout key evaluated once per row of a 100 TB table. Order is
  * fixed at 16 (the q64 Morton width convention: 2×16 bits of key). */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (BIGINT, BIGINT), got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Hilbert.xy2d($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object Hilbert {

  /** The order every surface shares (16 → 2^16 × 2^16 grid, 32-bit
    * keys — the Morton convention). */
  val ORDER = 16

  /** JVM xy2d at [[ORDER]] — the single source the codegen'd
    * expression, the fold, and the spec reference all agree with.
    * Inputs are masked mod 2^ORDER. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = ((x0 % 65536) + 65536) % 65536
    var y = ((y0 % 65536) + 65536) % 65536
    var d = 0L
    var s = 1L << (ORDER - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert index of (x, y) on the 2^ORDER grid — the codegen'd
    * expression. */
  def hilbert(xc: Column, yc: Column): Column =
    Bridge.column(HilbertKey(
      Bridge.expression(xc.cast("long")),
      Bridge.expression(yc.cast("long"))))

  /** The same recurrence as an `aggregate` HOF fold — interpreted,
    * kept as the in-plan parity reference (HilbertSpec asserts fold ==
    * native == JVM loop) and as the form a Spark-API-only consumer
    * could copy. */
  def hilbertFold(xc: Column, yc: Column, order: Int = ORDER): Column = {
    require(order >= 1 && order <= 31)
    val side = 1L << order
    val ss = (order - 1 to 0 by -1).map(i => 1L << i)
    aggregate(
      array(ss.map(lit): _*),
      struct(pmod(xc.cast("long"), lit(side)).as("x"),
        pmod(yc.cast("long"), lit(side)).as("y"),
        lit(0L).as("d")),
      (acc, s) => {
        val x = acc.getField("x")
        val y = acc.getField("y")
        val rx = x.bitwiseAND(s) > 0
        val ry = y.bitwiseAND(s) > 0
        val nd = acc.getField("d") + s * s *
          when(rx, lit(3L)).otherwise(lit(0L))
            .bitwiseXOR(when(ry, lit(1L)).otherwise(lit(0L)))
        val nx = when(!ry, when(rx, s - 1 - y).otherwise(y)).otherwise(x)
        val ny = when(!ry, when(rx, s - 1 - x).otherwise(x)).otherwise(y)
        struct(nx.as("x"), ny.as("y"), nd.as("d"))
      }).getField("d")
  }

  /** DuckDB oracle: the identical recurrence unrolled one CTE round per
    * bit plane. `innerSql` yields `keyCols` plus x0/y0 (already any
    * width — they are masked here); result adds `hkey`. */
  def duckOracleSql(innerSql: String, keyCols: Seq[String],
      order: Int = 16): String = {
    require(order >= 1 && order <= 31)
    val side = 1L << order
    val keys = keyCols.mkString(", ")
    val rounds = (order - 1 to 0 by -1).zipWithIndex.map {
      case (i, r) =>
        val s = 1L << i
        s"""h${r + 1} AS (
           |  SELECT $keys,
           |         CASE WHEN (y & $s) = 0
           |              THEN CASE WHEN (x & $s) > 0
           |                        THEN $s - 1 - y ELSE y END
           |              ELSE x END AS x,
           |         CASE WHEN (y & $s) = 0
           |              THEN CASE WHEN (x & $s) > 0
           |                        THEN $s - 1 - x ELSE x END
           |              ELSE y END AS y,
           |         d + $s * $s * xor(
           |           CASE WHEN (x & $s) > 0 THEN 3 ELSE 0 END,
           |           CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
           |  FROM h$r
           |)""".stripMargin
    }.mkString(", ")
    s"""WITH h0 AS (
       |  SELECT $keys,
       |         CAST(x0 % $side AS BIGINT) AS x,
       |         CAST(y0 % $side AS BIGINT) AS y,
       |         CAST(0 AS BIGINT) AS d
       |  FROM ($innerSql)
       |), $rounds
       |SELECT $keys, d AS hkey FROM h$order""".stripMargin
  }
}
