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
  /** Widen INTEGRAL args so int literals work ergonomically. Anything
    * else is left uncast so the expression's checkInputDataTypes
    * reports the real offending type — an unconditional cast would
    * silently truncate fractions (hamming64(sig, 3.7) → 3) or turn
    * strings into nulls, and the TypeCheckFailure paths could never
    * fire through SQL registration. */
  private[functions] def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.NullType =>
      org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
    case _ => e
  }

  /** Single source of truth — (name, usage, builder) for every graft
    * SQL function. Both registration paths (register() on a live
    * session, GraftExtensions at session build time) iterate this
    * table, so they cannot drift apart. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("hamming64", "hamming64(a, b) - popcount(a XOR b) over two int64 signatures",
      exprs => HammingDistance(asLong(exprs(0)), asLong(exprs(1)))),
    ("word_shingles3", "word_shingles3(text) - distinct 3-word shingles",
      exprs => WordShingles(exprs.head, 3)),
    ("word_shingles2", "word_shingles2(text) - distinct 2-word shingles",
      exprs => WordShingles(exprs.head, 2)),
    ("minhash128", "minhash128(shingles) - 128-slot MinHash signature in one pass",
      exprs => MinHash128(exprs.head)),
    ("minhash_affine128", "minhash_affine128(xs) - 128-slot MinHash over pre-hashed values, affine perms",
      exprs => MinHashAffine128(exprs.head)),
    ("simhash_roll64", "simhash_roll64(tokens) - 64-bit SimHash with the arithmetic rolling token hash",
      exprs => SimHashRoll64(exprs.head)),
    ("simhash64", "simhash64(tokens) - 64-bit SimHash signature in one pass",
      exprs => SimHash64(exprs.head)),
    ("simhash128", "simhash128(tokens) - 128-bit SimHash signature [w0, w1] in one pass",
      exprs => SimHash128(exprs.head)),
    ("text_profile", "text_profile(text) - (n_chars, n_words, n_punct, n_stop) in one scan",
      exprs => TextProfile(exprs.head)),
    ("token_profile", "token_profile(text) - (n_chars, n_ws_tokens, n_re_tokens) in one scan",
      exprs => TokenProfile(exprs.head)),
    ("word_tokens", "word_tokens(text) - lowercase a-z word tokens",
      exprs => WordTokens(exprs.head)),
    ("vec_dot", "vec_dot(a, b) - sequential double dot product of two vectors",
      exprs => VecDot(exprs(0), exprs(1))),
    ("vec_l2sq_long", "vec_l2sq_long(a, b) - exact Σ(a_i − b_i)² over two bigint arrays",
      exprs => VecL2SqLong(exprs(0), exprs(1))),
    ("vec_dot_long", "vec_dot_long(a, b) - exact Σ a_i·b_i over two bigint arrays",
      exprs => VecDotLong(exprs(0), exprs(1))),
    ("vec_norm", "vec_norm(a) - L2 norm of a vector",
      exprs => VecNorm(exprs.head)),
    ("rolling_hash", "rolling_hash(text) - Karp-Rabin fingerprint of normalized text",
      exprs => RollingHash(exprs.head)),
    ("winnow_fps", "winnow_fps(text) - winnowing fingerprint keys (k=3, w=4, rightmost-min)",
      exprs => WinnowFps(exprs.head)),
    ("sorted_intersect_count", "sorted_intersect_count(a, b) - |A∩B| of two sorted int64 arrays, allocation-free",
      exprs => SortedIntersectCount(exprs(0), exprs(1))),
    ("sorted_dot", "sorted_dot(ts1, ws1, ts2, ws2) - sparse integer dot over sorted key arrays with parallel weights",
      exprs => SortedDot(exprs(0), exprs(1), exprs(2), exprs(3))),
    ("zorder2", "zorder2(x, y) - Morton interleave of two 16-bit coordinates",
      exprs => ZOrder2(asLong(exprs(0)), asLong(exprs(1)))),
    ("kll_agg", "kll_agg(value) - KLL quantile sketch of a double column",
      exprs => KllAgg(asDouble(exprs.head))),
    ("kll_merge_agg", "kll_merge_agg(sk) - union of KLL sketch byte images",
      exprs => KllMergeAgg(exprs.head)),
    ("kll_quantile", "kll_quantile(sk, rank) - INCLUSIVE-rank quantile from a KLL sketch",
      exprs => KllQuantile(exprs(0), asDouble(exprs(1)))),
    ("kll_n", "kll_n(sk) - total update count absorbed by a KLL sketch",
      exprs => KllN(exprs.head)),
    ("theta_agg", "theta_agg(key) - theta sketch of distinct int64 keys",
      exprs => ThetaAgg(asLong(exprs.head))),
    ("theta_union_agg", "theta_union_agg(sk) - union of theta sketch byte images",
      exprs => ThetaUnionAgg(exprs.head)),
    ("theta_estimate", "theta_estimate(sk) - distinct-count estimate",
      exprs => ThetaEstimate(exprs.head)),
    ("theta_intersect", "theta_intersect(a, b) - |A intersect B| estimate",
      exprs => ThetaIntersect(exprs(0), exprs(1))),
    ("theta_diff", "theta_diff(a, b) - |A minus B| estimate",
      exprs => ThetaDiff(exprs(0), exprs(1))),
    ("theta_union2", "theta_union2(a, b) - |A union B| estimate",
      exprs => ThetaUnion2(exprs(0), exprs(1))))

  /** Widen numerics to DOUBLE for the sketch inputs (ints and floats
    * are legal quantile-sketch feeds; anything else surfaces as a
    * resolution error rather than a silent cast). */
  private[functions] def asDouble(e: Expression): Expression = e.dataType match {
    case org.apache.spark.sql.types.DoubleType => e
    case _: org.apache.spark.sql.types.NumericType | org.apache.spark.sql.types.NullType =>
      org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.DoubleType)
    case _ => e
  }

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
