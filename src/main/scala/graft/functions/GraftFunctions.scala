package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions.
  *
  * Two registration routes, same builder:
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.functions.GraftExtensions`
  *    — the deployment-config route, applied at session build.
  *  - [[GraftFunctions.register]] — the runtime route for an existing
  *    session (tests, notebooks).
  *
  * Either way `SELECT dot_product(a, b)` resolves to the codegen'd
  * [[DotProduct]] Catalyst expression — NOT a Scala UDF: SQL-text users
  * get the same whole-stage-codegen plan as the DataFrame API's
  * `DotProduct.dot`. */
object GraftFunctions {

  private[functions] val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"dot_product expects 2 arguments, got ${exprs.length}")
      DotProduct(exprs.head, exprs(1))
    })

  private[functions] val hash60: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hash60"),
    new ExpressionInfo(classOf[Hash60].getName, "hash60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, s"hash60 expects 1 argument, got ${exprs.length}")
      Hash60(exprs.head)
    })

  private[functions] val mortonInterleave: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("morton_interleave"),
    new ExpressionInfo(classOf[MortonInterleave].getName, "morton_interleave"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"morton_interleave expects 2 arguments, got ${exprs.length}")
      MortonInterleave(exprs.head, exprs(1))
    })

  private[functions] val tokenCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_count"),
    new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"token_count expects 1 argument, got ${exprs.length}")
      TokenCount(exprs.head)
    })

  private[functions] val deflateLen: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("deflate_len"),
    new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"deflate_len expects 1 argument, got ${exprs.length}")
      DeflateLen(exprs.head)
    })

  private[functions] val jumpHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jump_hash"),
    new ExpressionInfo(classOf[JumpHash].getName, "jump_hash"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"jump_hash expects 2 arguments, got ${exprs.length}")
      val n = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
          v.toInt
        case _ => throw new IllegalArgumentException(
          "jump_hash: n must be an integer literal")
      }
      JumpHash(exprs.head, n)
    })

  private[functions] val jaroWinkler: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"jaro_winkler expects 2 arguments, got ${exprs.length}")
      JaroWinkler(exprs.head, exprs(1))
    })

  private[functions] val normalizeText: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("normalize_text"),
    new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"normalize_text expects 1 argument, got ${exprs.length}")
      NormalizeText(exprs.head)
    })

  private[functions] val hilbertKey: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_key"),
    new ExpressionInfo(classOf[HilbertKey].getName, "hilbert_key"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"hilbert_key expects 2 arguments, got ${exprs.length}")
      HilbertKey(exprs.head, exprs(1))
    })

  private[functions] val charEntropyStats: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_entropy_stats"),
    new ExpressionInfo(classOf[CharEntropyStats].getName,
      "char_entropy_stats"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"char_entropy_stats expects 1 argument, got ${exprs.length}")
      CharEntropyStats(exprs.head)
    })

  private[functions] val unicodeTokenStats: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unicode_token_stats"),
    new ExpressionInfo(classOf[UnicodeTokenStats].getName,
      "unicode_token_stats"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"unicode_token_stats expects 1 argument, got ${exprs.length}")
      UnicodeTokenStats(exprs.head)
    })

  private[functions] val all =
    Seq(dotProduct, hash60, mortonInterleave, tokenCount, deflateLen,
      jumpHash, jaroWinkler, normalizeText, hilbertKey, charEntropyStats,
      unicodeTokenStats)

  /** Register into a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
      val _ = info
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}
