package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression #11: `unicode_token_stats(text)` →
  * `[n_tokens, sum_len]` — the letter-class word-segmentation counts
  * ([[graft.text.TextAnalysis.unicodeTokens]]' `size` and Σ length) in
  * ONE pass over the row's code points, with no token-array
  * materialization. The array formulation splits, allocates every
  * token string, and folds; at 100 TB a profile that only needs the
  * COUNTS (Gopher length/mean-length rules, fertility denominators,
  * token accounting) should be a scan-bound projection — the
  * [[TokenCount]]-vs-`size(tokens)` relationship, extended to the
  * round-9 multilingual family.
  *
  * Token identity: maximal runs of `\p{L}\p{M}\p{N}` CODE POINTS —
  * exactly the Java-regex classes the array form splits on
  * ([[java.lang.Character]] general categories; case folding is
  * irrelevant to counts). `sum_len` counts code points per token, the
  * same unit Spark's `length()` reports, so parity with
  * `aggregate(transform(unicodeTokens(t), length), ...)` is exact —
  * astral included (both count a surrogate pair once). ASCII fast path
  * over raw UTF-8 bytes; any high bit falls back to the code-point
  * walk. Value parity with the array form (which stays the
  * DuckDB-oracle formulation, q396) is spec-asserted over the
  * multilingual fixtures, NFD marks, and astral edges, plus the
  * SQL-registered route.
  */
case class UnicodeTokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_token_stats expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    UnicodeTokenStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeTokenStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeTokenStats = copy(child = newChild)
}

object UnicodeTokenStats {

  /** Java-regex `\p{L}\p{M}\p{N}`: the eleven general categories those
    * three classes name (Character.getType is the regex engine's own
    * classifier, so this cannot drift from the array form's split). */
  private def inTokenClass(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
    t == Character.TITLECASE_LETTER || t == Character.MODIFIER_LETTER ||
    t == Character.OTHER_LETTER ||
    t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
    t == Character.COMBINING_SPACING_MARK ||
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
    t == Character.OTHER_NUMBER
  }

  /** [n_tokens, sum_len] over `s`'s code points; [0, 0] when empty or
    * separator-only. */
  def stats(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    var nTokens = 0L
    var sumLen = 0L
    var in = false
    if (ascii) {
      i = 0
      while (i < bytes.length) {
        val b = bytes(i)
        val tok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9')
        if (tok) {
          if (!in) nTokens += 1L
          sumLen += 1L
        }
        in = tok
        i += 1
      }
    } else {
      val str = s.toString
      var off = 0
      while (off < str.length) {
        val cp = str.codePointAt(off)
        off += Character.charCount(cp)
        val tok = inTokenClass(cp)
        if (tok) {
          if (!in) nTokens += 1L
          sumLen += 1L
        }
        in = tok
      }
    }
    new GenericArrayData(Array(nTokens, sumLen))
  }

  def unicodeTokenStats(c: Column): Column =
    Bridge.column(UnicodeTokenStats(Bridge.expression(c)))
}
