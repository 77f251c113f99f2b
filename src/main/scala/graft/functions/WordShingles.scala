package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the distinct n-word shingles
  * of a document in one compiled pass (lowercase → strip non [a-z ] →
  * split → sliding-n → distinct).
  *
  * Replaces a chain of interpreted higher-order functions
  * (filter/transform/element_at lambdas) that evaluated per-element
  * through the expression interpreter — ~100× slower per row. The
  * generated code calls a static helper, so the operator stays inside
  * WholeStageCodegen.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native tokenizer: lowercase a-z words (all occurrences, in order) —
  * the compiled twin of filter(split(regexp_replace(...)), _ != ''). */
case class WordTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tokens"
  override protected def nullSafeEval(input: Any): Any =
    WordShingles.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.tokens($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Karp-Rabin rolling fingerprint of the normalized text: polynomial
  * hash acc = acc*B + c (mod 2^61-1) over the lowercase a-z/space
  * stream. One compiled pass; order-sensitive (unlike the bag-of-words
  * fingerprint), so it distinguishes reorderings while ignoring
  * punctuation/case noise. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    WordShingles.rollingHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingles {
  // two independent 31-bit polynomial rolls packed into one long —
  // stays in plain long arithmetic (no 128-bit ops) with 62 effective bits
  private val P1 = 2147483647L // 2^31 - 1
  private val P2 = 2147483629L
  private val B1 = 131L
  private val B2 = 137L

  def rollingHash(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var a1 = 0L
    var a2 = 0L
    var i = 0
    var lastSpace = true
    while (i < s.length) {
      val c = s.charAt(i)
      val keep = (c >= 'a' && c <= 'z') || c == ' '
      if (keep && !(c == ' ' && lastSpace)) { // collapse space runs
        a1 = (a1 * B1 + c.toLong) % P1
        a2 = (a2 * B2 + c.toLong) % P2
        lastSpace = c == ' '
      }
      i += 1
    }
    (a1 << 32) | a2
  }

  def tokens(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || c == ' ') sb.append(c)
      i += 1
    }
    val words = sb.toString.split(" ")
    var n = 0
    i = 0
    while (i < words.length) { if (words(i).nonEmpty) n += 1; i += 1 }
    val out = new Array[Any](n)
    var k = 0
    i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) { out(k) = UTF8String.fromString(words(i)); k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** static entry point shared by interpreted and generated code;
    * tokenization delegates to tokens() so word_tokens and
    * word_shingles can never disagree on the same document */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](m)
    var i = 0
    while (i < m) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    i = 0
    while (i <= words.length - n) {
      val b = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) b.append(' ')
        b.append(words(i + j))
        j += 1
      }
      seen.add(b.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

}
