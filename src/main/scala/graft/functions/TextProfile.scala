package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused document-statistics scan: (n_chars, n_words, n_punct, n_stop)
  * in ONE compiled pass over the text.
  *
  * Replaces the 4-regex formulation (`length` + `regexp_replace` strip
  * + `split`/`filter` + `replace`-length stopword count) that made
  * `quality`/`c4Filter` the heaviest per-row text operators — each
  * regex is its own full scan plus intermediate string materialization;
  * this is one pass and zero allocations beyond the result row. The
  * semantics are BIT-IDENTICAL to the column formulation (spec-pinned
  * field-by-field over the corpus):
  *  - n_chars: codepoints of the original text (`length(text)`);
  *  - n_words: space-separated segments of lower(text) containing ≥ 1
  *    letter — exactly the non-empty splits of the `[^a-z ]`-stripped
  *    string ("a-b" is ONE word: the dash deletes, not separates);
  *  - n_punct: codepoints of lower(text) outside [a-z0-9 ];
  *  - n_stop: non-overlapping left-to-right " the " occurrences in
  *    lower(text) (= the replace()-length-difference count). */
case class TextProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "text_profile"

  override protected def nullSafeEval(input: Any): Any =
    TextProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfile.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextProfile {
  /** static entry point shared by interpreted and generated code */
  def compute(s: UTF8String): InternalRow = {
    val nChars = s.numChars().toLong
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    var nWords = 0L
    var nPunct = 0L
    var sawLetter = false
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        if (sawLetter) nWords += 1
        sawLetter = false
      } else if (cp >= 'a' && cp <= 'z') {
        sawLetter = true
      } else if (cp < '0' || cp > '9') {
        nPunct += 1
      }
      i += Character.charCount(cp)
    }
    if (sawLetter) nWords += 1
    var nStop = 0L
    var idx = str.indexOf(" the ")
    while (idx >= 0) {
      nStop += 1
      idx = str.indexOf(" the ", idx + 5)
    }
    InternalRow(nChars, nWords, nPunct, nStop)
  }
}
