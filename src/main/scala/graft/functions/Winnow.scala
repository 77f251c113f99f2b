package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
  * SIGMOD '03) as ONE compiled pass: tokenize → md5 each word 3-gram →
  * rightmost-min per 4-window (encoded as the lexicographic min of
  * `md5hex#(9999999-pos)` so any SQL engine reproduces the choice) →
  * distinct, sorted. Returns the selected key array; empty for docs
  * under 6 words (no full window).
  *
  * Exists because the same computation phrased as chained higher-order
  * functions is catastrophically slower: CollapseProject inlines each
  * intermediate array into every downstream lambda, so the tokenizer
  * regex and the md5s re-evaluate per element per stage — O(m²)-O(m³)
  * interpreted work per row (measured: minutes per 50-doc partition).
  * The compiled pass is O(total k-gram bytes) with a thread-local
  * digest. */
case class WinnowFps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.compute($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Winnow {
  private val K = 3 // k-gram width (words)
  private val W = 4 // winnowing window (k-grams)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val d = md5.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** static entry point shared by interpreted and generated code;
    * tokenization delegates to WordShingles.tokens so the word stream
    * can never disagree with word_tokens on the same document */
  def compute(text: UTF8String): ArrayData = {
    val toks = WordShingles.tokens(text)
    val n = toks.numElements()
    if (n < W + K - 1) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](n)
    var i = 0
    while (i < n) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val m = n - K + 1
    // position-tagged keys: md5(3-gram) + '#' + zero-padded (9999999 - pos),
    // pos 1-based — the descending pad makes lexicographic min pick the
    // RIGHTMOST minimal hash, the paper's tie rule
    val keys = new Array[String](m)
    i = 0
    while (i < m) {
      val h = md5hex(words(i) + " " + words(i + 1) + " " + words(i + 2))
      val p = (9999999 - (i + 1)).toString
      val b = new java.lang.StringBuilder(40)
      b.append(h).append('#')
      var z = p.length
      while (z < 7) { b.append('0'); z += 1 }
      keys(i) = b.append(p).toString
      i += 1
    }
    // window minima, deduped and sorted
    val sel = new java.util.TreeSet[String]()
    var j = 0
    while (j <= m - W) {
      var best = keys(j)
      var t = j + 1
      while (t < j + W) {
        if (keys(t).compareTo(best) < 0) best = keys(t)
        t += 1
      }
      sel.add(best)
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}
