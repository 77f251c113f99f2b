package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: lets a deployment register graft's
  * SQL functions at session build time instead of calling
  * GraftFunctions.register —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(a, b) - popcount(a XOR b) over two int64 signatures"),
      (exprs: Seq[Expression]) => HammingDistance(
        GraftFunctions.asLong(exprs(0)), GraftFunctions.asLong(exprs(1)))))
    e.injectFunction((FunctionIdentifier("word_shingles3"),
      info("word_shingles3", "word_shingles3(text) - distinct 3-word shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head, 3)))
    e.injectFunction((FunctionIdentifier("word_shingles2"),
      info("word_shingles2", "word_shingles2(text) - distinct 2-word shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head, 2)))
    e.injectFunction((FunctionIdentifier("minhash128"),
      info("minhash128", "minhash128(shingles) - 128-slot MinHash signature in one pass"),
      (exprs: Seq[Expression]) => MinHash128(exprs.head)))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash signature in one pass"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("simhash128"),
      info("simhash128", "simhash128(tokens) - 128-bit SimHash signature [w0, w1] in one pass"),
      (exprs: Seq[Expression]) => SimHash128(exprs.head)))
    e.injectFunction((FunctionIdentifier("text_profile"),
      info("text_profile", "text_profile(text) - (n_chars, n_words, n_punct, n_stop) in one scan"),
      (exprs: Seq[Expression]) => TextProfile(exprs.head)))
    e.injectFunction((FunctionIdentifier("token_profile"),
      info("token_profile", "token_profile(text) - (n_chars, n_ws_tokens, n_re_tokens) in one scan"),
      (exprs: Seq[Expression]) => TokenProfile(exprs.head)))
    e.injectFunction((FunctionIdentifier("word_tokens"),
      info("word_tokens", "word_tokens(text) - lowercase a-z word tokens"),
      (exprs: Seq[Expression]) => WordTokens(exprs.head)))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential double dot product of two vectors"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a vector"),
      (exprs: Seq[Expression]) => VecNorm(exprs.head)))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(text) - Karp-Rabin fingerprint of normalized text"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((FunctionIdentifier("zorder2"),
      info("zorder2", "zorder2(x, y) - Morton interleave of two 16-bit coordinates"),
      (exprs: Seq[Expression]) => ZOrder2(
        GraftFunctions.asLong(exprs(0)), GraftFunctions.asLong(exprs(1)))))
    // whole-operator surface: the heap top-k strategy plus the
    // optimizer rule that rewrites row_number-top-k windows onto it
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
