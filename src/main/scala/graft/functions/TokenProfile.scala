package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused token-counting scan: (n_chars, n_ws_tokens, n_re_tokens) in
  * ONE compiled pass — replaces a split+filter plus a full
  * regexp_extract_all with alternation (which materializes every match
  * as a string only to count them). Semantics bit-identical to the
  * column formulation (spec-pinned):
  *  - n_chars: codepoints of the text;
  *  - n_ws_tokens: non-empty segments of split(text, ' ') — single
  *    SPACE separators only, tabs/newlines do not split;
  *  - n_re_tokens: first-match-wins scan of lower(text) with
  *    `[a-z]+|[0-9]+|[^a-z0-9 ]` — one token per maximal letter run,
  *    one per maximal digit run, one per any other non-space char. */
case class TokenProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_ws_tokens", LongType, nullable = false),
    StructField("n_re_tokens", LongType, nullable = false)))
  override def prettyName: String = "token_profile"

  override protected def nullSafeEval(input: Any): Any =
    TokenProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenProfile.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenProfile {
  /** static entry point shared by interpreted and generated code */
  def compute(s: UTF8String): InternalRow = {
    val nChars = s.numChars().toLong
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    var ws = 0L
    var re = 0L
    var inWsToken = false
    var runKind = 0 // 0 = none, 1 = letters, 2 = digits
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        if (inWsToken) ws += 1
        inWsToken = false
        runKind = 0
      } else {
        inWsToken = true
        if (cp >= 'a' && cp <= 'z') {
          if (runKind != 1) { re += 1; runKind = 1 }
        } else if (cp >= '0' && cp <= '9') {
          if (runKind != 2) { re += 1; runKind = 2 }
        } else {
          re += 1 // every other non-space char is its own token
          runKind = 0
        }
      }
      i += Character.charCount(cp)
    }
    if (inWsToken) ws += 1
    InternalRow(nChars, ws, re)
  }
}
