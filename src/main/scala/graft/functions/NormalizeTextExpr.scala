package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization — native expression #8, the standard FIRST
  * stage of a web-corpus pipeline (C4/CCNet run exactly this before any
  * dedup): NFC canonical composition, then fullwidth→ASCII width folding,
  * then simple (1:1) lowercase. Without it every downstream
  * fingerprint/minhash/shingle operator treats `café` (NFC) and `café`
  * (NFD, e + combining acute) — byte-identical ON SCREEN — as distinct
  * documents, silently under-deduplicating real corpora. No Spark
  * built-in expresses NFC, hence a native expression rather than a
  * function composition.
  *
  * Exact semantics (each step mirrored by the DuckDB oracle in
  * [[NormalizeText.oracleSql]], same order):
  *  1. NFC (`java.text.Normalizer` / DuckDB `nfc_normalize` — both
  *     implement UAX #15 canonical composition, stable for assigned
  *     code points);
  *  2. width fold: U+FF01..U+FF5E → U+0021..U+007E (cp − 0xFEE0) and
  *     ideographic space U+3000 → U+0020 (DuckDB: `translate` over the
  *     same two shared literal strings). Deliberately NOT full NFKC:
  *     NFKC also rewrites ligatures/superscripts/fractions, which is
  *     lossy for quality scoring and inexpressible in the oracle;
  *  3. SIMPLE per-code-point lowercase (`Character.toLowerCase(int)` /
  *     DuckDB utf8proc `lower` — both the UnicodeData 1:1 simple
  *     mapping, so `İ` → `i` on BOTH engines; Java's full-mapping
  *     `String.toLowerCase` would emit `i̇` and diverge).
  *
  * ASCII fast path: a byte scan falls through to in-place ASCII
  * lowercasing (no String materialization, no Normalizer call) — on the
  * mostly-ASCII bulk of a 100 TB web corpus the expression costs the
  * same one pass `lower()` costs. Codegen'd like [[TokenCount]]; stays
  * inside whole-stage codegen.
  *
  * Reference behavior note: the reference pipeline lowercases ad hoc at
  * each use site (e.g. spark_apps/advanced_analytics.py quality stages);
  * canonicalization is hoisted here into one typed stage instead. */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_text expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** Width-fold source/image alphabets — the SAME two strings feed the
    * expression's fold table and the oracle's `translate` literals, so
    * the mapping cannot drift between engines. */
  val widthFrom: String = (0xFF01 to 0xFF5E).map(_.toChar).mkString + "　"
  val widthTo: String = (0x21 to 0x7E).map(_.toChar).mkString + " "

  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    // ASCII fast path: NFC and width folding are identities on ASCII;
    // lowercase is the in-place A-Z fold
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if (bytes(i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      var changed = false
      var j = 0
      while (j < bytes.length) {
        if (bytes(j) >= 'A' && bytes(j) <= 'Z') changed = true
        j += 1
      }
      if (!changed) return s
      val out = new Array[Byte](bytes.length)
      var k = 0
      while (k < bytes.length) {
        val b = bytes(k)
        out(k) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        k += 1
      }
      return UTF8String.fromBytes(out)
    }
    val str = s.toString
    val nfc =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) str
      else Normalizer.normalize(str, Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var p = 0
    while (p < nfc.length) {
      val cp = nfc.codePointAt(p)
      val folded =
        if (cp >= 0xFF01 && cp <= 0xFF5E) cp - 0xFEE0
        else if (cp == 0x3000) 0x20
        else cp
      sb.appendCodePoint(Character.toLowerCase(folded))
      p += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def normalizeText(c: Column): Column =
    Bridge.column(NormalizeText(Bridge.expression(c)))

  private def sqlQuote(lit: String): String =
    "'" + lit.replace("'", "''") + "'"

  /** DuckDB formulation of [[normalize]] over SQL expression `x` —
    * same three steps, same order, literals generated from the shared
    * alphabets. */
  def oracleSql(x: String): String =
    s"lower(translate(nfc_normalize($x), " +
      s"${sqlQuote(widthFrom)}, ${sqlQuote(widthTo)}))"
}
