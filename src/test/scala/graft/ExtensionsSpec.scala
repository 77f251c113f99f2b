package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.GraftExtensionsProbe

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects all graft SQL functions") {
    val names = GraftExtensionsProbe.injectedFunctionNames(new GraftExtensions)
    assert(names == Set("hamming64", "word_shingles3", "word_shingles2",
      "word_tokens", "vec_dot", "vec_norm", "vec_l2sq_long", "vec_dot_long",
      "rolling_hash", "winnow_fps",
      "sorted_intersect_count", "sorted_dot", "minhash128",
      "minhash_affine128", "simhash_roll64",
      "simhash64", "simhash128", "text_profile", "token_profile", "zorder2",
      "kll_agg", "kll_merge_agg", "kll_quantile", "kll_n",
      "theta_agg", "theta_union_agg", "theta_estimate", "theta_intersect",
      "theta_diff", "theta_union2"))
  }

  test("injected builders produce working expressions") {
    // the registry path (same builders) is exercised on the live session
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT hamming64(5, 6) AS h, size(word_shingles3('a b c d')) AS s, " +
        "size(word_tokens('A b-c')) AS t").collect().head
    assert(r.getLong(0) == 2)   // 101 xor 110 = 011
    assert(r.getInt(1) == 2)    // 'a b c', 'b c d'
    assert(r.getInt(2) == 2)    // 'a', 'bc' — the dash is stripped, not a separator
  }
}
