package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte count of a string's UTF-8 bytes — the
  * kernel of the compression-ratio quality signal (Gopher's repetition
  * filters, Dolma's "mostly boilerplate?" screen): templated or
  * repetitive text compresses several-fold, natural prose sits near
  * 2×, and high-entropy junk near 1×, so
  * `octet_length(text) / deflate_len(text)` separates all three with
  * ONE streaming pass and no tokenization. Composes in-plan with the
  * other signals (q20 ratios, q54 n-gram repetition, q116 LM bits) as
  * a plain codegen'd column.
  *
  * Raw-deflate (nowrap, no zlib header/checksum — 11 fixed overhead
  * bytes would drown short documents), level 6, per-thread `Deflater`
  * reused via reset() (allocation-free steady state; the output buffer
  * is drained for its COUNT only, never copied out). Deterministic for
  * a fixed zlib/JDK, which is what the spec pins. There is no DuckDB
  * deflate, so the corpus-wide q118 is rows-only BY DESIGN; the kernel
  * itself IS oracle-gated: q310's literal parity table compares this
  * expression against raw-deflate lengths precomputed at
  * oracle-generation time by an independent tiny-buffer Deflater drain
  * (the q112 precomputed-literal pattern), plus [[graft.TextOpsSpec]]
  * invariants.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_len expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.len(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.len($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  private final class State {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    val buf = new Array[Byte](8192)
  }

  private val local = ThreadLocal.withInitial[State](() => new State)

  /** Raw-deflate output size in bytes of the string's UTF-8 encoding. */
  def len(s: UTF8String): Int = {
    val st = local.get()
    val d = st.deflater
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(st.buf)
    total
  }

  def deflateLen(c: Column): Column = Bridge.column(DeflateLen(Bridge.expression(c)))
}
