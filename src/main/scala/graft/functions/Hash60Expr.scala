package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of [[Hash64.hash60]]: the same 60-bit md5-prefix value,
  * computed directly from the digest bytes instead of the built-in
  * `conv(substring(md5(s), 1, 15), 16, 10)` chain — which materializes a
  * 32-char hex string per call and re-parses 15 chars of it in base 16.
  * The first 15 hex chars are exactly the top 60 bits of the digest's
  * first 8 bytes, so the value is `bigEndian(bytes[0..8)) >>> 4`.
  *
  * Bit-identical to the SQL chain (asserted in SimilaritySpec against the
  * DuckDB-mirroring formulation), codegen'd like [[DotProduct]], with a
  * thread-local digest to avoid per-row instantiation. The SQL chain
  * remains the ORACLE formulation — this is the same-value fast path for
  * Spark-side hashing. */
case class Hash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash60 expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5, as a non-negative long — equals
    * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`. */
  def hash(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val w =
      ((b(0) & 0xFFL) << 56) | ((b(1) & 0xFFL) << 48) |
      ((b(2) & 0xFFL) << 40) | ((b(3) & 0xFFL) << 32) |
      ((b(4) & 0xFFL) << 24) | ((b(5) & 0xFFL) << 16) |
      ((b(6) & 0xFFL) << 8) | (b(7) & 0xFFL)
    w >>> 4
  }

  def hash60(c: Column): Column = Bridge.column(Hash60(Bridge.expression(c)))
}
