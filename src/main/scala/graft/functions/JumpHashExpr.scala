package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Jump-consistent hashing (Lamping & Veach 2014): key → bucket in
  * `[0, n)` with the rendezvous stability guarantee (n → n+1 moves only
  * ~1/(n+1) of keys) at O(ln n) time and ZERO space — no per-shard hash
  * evaluation, which is what makes it the
  * [[graft.ops.Sharding.rendezvousAssign]] escape hatch at shard counts
  * in the thousands (rendezvous is O(n) hashes per key).
  *
  * The recurrence is the published one, verbatim semantics:
  * {{{
  *   b = -1; j = 0
  *   while (j < n) { b = j; key = key·2862933555777941757 + 1
  *                   j = ⌊(b+1) · (2³¹ / ((key >>> 33) + 1))⌋ }
  *   return b
  * }}}
  * The multiply wraps mod 2⁶⁴ (Java long semantics) and the shift is
  * UNSIGNED — the DuckDB oracle replays both exactly via HUGEINT
  * arithmetic (`% 2⁶⁴`, `// 2³³`) in a recursive CTE
  * ([[JumpHash.duckSql]]), so bucket assignments hash-match
  * cross-engine. `j` strictly increases each step, so the loop (and the
  * CTE) always terminates.
  *
  * Codegen'd like [[Hash60]]; seed with a well-mixed key ([[Hash64]]) —
  * the recurrence assumes uniform input bits.
  */
case class JumpHash(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == LongType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jump_hash expects (BIGINT key, n >= 1), got ${child.dataType}, n=$n")

  override protected def nullSafeEval(input: Any): Any =
    JumpHash.hash(input.asInstanceOf[Long], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.JumpHash.hash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): JumpHash =
    copy(child = newChild)
}

object JumpHash {

  /** The published loop; Java's wrapping `*` and `>>>` are the paper's
    * unsigned semantics. */
  def hash(key0: Long, n: Int): Long = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < n) {
      b = j
      key = key * 2862933555777941757L + 1L
      j = ((b + 1) * (2147483648.0 / (((key >>> 33) + 1).toDouble))).toLong
    }
    b
  }

  def jumpHash(c: Column, n: Int): Column =
    Bridge.column(JumpHash(Bridge.expression(c), n))

  /** DuckDB replay as a recursive CTE over `innerSql`'s (`idName`,
    * key) rows — key must be a non-negative BIGINT (interpreted
    * unsigned, matching Java's wrap/`>>>` via HUGEINT `% 2⁶⁴`).
    * Yields (`idName`, bucket). */
  def duckSql(innerSql: String, idName: String, n: Int): String =
    s"""WITH RECURSIVE jstep AS (
       |  SELECT $idName, CAST(-1 AS BIGINT) AS b, CAST(0 AS BIGINT) AS j,
       |         CAST(key AS HUGEINT) AS k
       |  FROM ($innerSql)
       |  UNION ALL
       |  SELECT $idName, j AS b,
       |    CAST(trunc(CAST(j + 1 AS DOUBLE) * (2147483648.0 /
       |      CAST((k * 2862933555777941757 + 1) % 18446744073709551616
       |           // 8589934592 + 1 AS DOUBLE))) AS BIGINT) AS j,
       |    (k * 2862933555777941757 + 1) % 18446744073709551616 AS k
       |  FROM jstep WHERE j < $n
       |)
       |SELECT $idName, b AS bucket FROM jstep WHERE j >= $n""".stripMargin
}
