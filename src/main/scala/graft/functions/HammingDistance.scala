package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: popcount(a XOR b) over two int64
  * SimHash signatures. Codegen'd (stays inside WholeStageCodegen) so
  * the near-dup candidate filter never falls back to an interpreted
  * UDF on the hot path.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming64 requires (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(long) java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GraftFunctions {
  /** Register graft SQL functions on a session (idempotent); afterwards
    * `expr("hamming64(a, b)")` / `expr("word_shingles3(text)")` resolve
    * to the codegen'd expressions. */
  /** widen integral args so int literals work ergonomically */
  private[functions] def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case _ => org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64", exprs => HammingDistance(asLong(exprs(0)), asLong(exprs(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles3", exprs => WordShingles(exprs.head, 3), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles2", exprs => WordShingles(exprs.head, 2), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash128", exprs => MinHash128(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash128", exprs => SimHash128(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_profile", exprs => TextProfile(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_profile", exprs => TokenProfile(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_tokens", exprs => WordTokens(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => VecNorm(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2(asLong(exprs(0)), asLong(exprs(1))), "built-in")
  }
}
