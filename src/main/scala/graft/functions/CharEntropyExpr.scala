package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression #10: `char_entropy_stats(text)` →
  * `[n_chars, n_distinct, h_q]` — the q176 character-entropy integers
  * in ONE pass over the row, no explode, no (doc, char) shuffle, no
  * per-doc rollup. The relational formulation
  * ([[graft.text.TextAnalysis.charEntropyRelational]]) explodes every
  * document into |text| rows and aggregates twice; this computes the
  * same `h_q = n·blog(n) − Σ_c k_c·blog(k_c)` (blog(x) = ⌊log2 x⌋+1,
  * the house integer-log) from a per-row frequency table — at 100 TB
  * that is a scan-bound projection instead of a corpus-sized shuffle.
  *
  * Char identity = Unicode CODE POINTS, exactly what the relational
  * `substr(pos, 1)` enumerates on both engines (astral chars count
  * once). ASCII fast path: a 128-slot array over the raw UTF-8 bytes;
  * multi-byte rows fall back to a code-point hash map. Value parity
  * with the relational form (which stays the DuckDB-oracle
  * formulation) is spec-asserted over edge, Unicode, and astral
  * inputs, plus the SQL-registered route.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy_stats expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : CharEntropyStats = copy(child = newChild)
}

object CharEntropyStats {

  private def blog(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  /** [n, distinct, h_q] for the code points of `s`; [0, 0, 0] when empty. */
  def stats(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    var n = 0L
    var distinct = 0L
    var sum = 0L
    if (ascii) {
      val counts = new Array[Long](128)
      i = 0
      while (i < bytes.length) { counts(bytes(i)) += 1; i += 1 }
      n = bytes.length.toLong
      var j = 0
      while (j < 128) {
        val k = counts(j)
        if (k > 0L) { distinct += 1L; sum += k * blog(k) }
        j += 1
      }
    } else {
      val str = s.toString
      val m = new java.util.HashMap[Integer, Array[Long]]()
      var off = 0
      while (off < str.length) {
        val cp = str.codePointAt(off)
        off += Character.charCount(cp)
        n += 1L
        val cur = m.get(cp)
        if (cur == null) m.put(cp, Array(1L)) else cur(0) += 1L
      }
      val it = m.values().iterator()
      while (it.hasNext) {
        val k = it.next()(0)
        distinct += 1L
        sum += k * blog(k)
      }
    }
    val hq = if (n == 0L) 0L else n * blog(n) - sum
    new GenericArrayData(Array(n, distinct, hq))
  }

  def charEntropyStats(c: Column): Column =
    Bridge.column(CharEntropyStats(Bridge.expression(c)))
}
