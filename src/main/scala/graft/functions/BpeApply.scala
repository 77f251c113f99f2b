package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE merge application as ONE codegen'd expression: for each
  * learned merge (a, b) IN LEARN ORDER, scan the symbol array left to
  * right and collapse adjacent (a, b) non-overlapping — exactly the
  * `aggregate(...)` fold chain `CorpusOps.bpeEncode` used to build
  * column-by-column (one nested interpreted lambda per merge, so round
  * k's plan carried k nested folds and Catalyst re-planned the growing
  * tree every round: measured 2.5 s of planning vs 0.3 s of execution
  * per text_bpe_encode pass at sf0.1). The kernel is the same fold —
  * append x, unless the accumulator's last symbol equals a and x
  * equals b, in which case replace the last symbol with a+b — applied
  * per merge sequentially, so outputs are identical by construction
  * (spec-pinned against the lambda chain, overlap cases included). */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = s"bpe_apply_${merges.size}"

  // UTF8String pairs precomputed once per expression instance
  @transient private lazy val mergeBytes: Array[Array[UTF8String]] =
    merges.map { case (a, b) =>
      Array(UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray

  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.applyMerges(v.asInstanceOf[ArrayData], mergeBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeBytes,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeKernels.applyMerges($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeKernels {
  /** the fold, per merge in order: acc += x unless (last(acc)==a and
    * x==b), which replaces last(acc) with ab — left-to-right
    * non-overlapping, identical to the SQL aggregate chain. */
  def applyMerges(in: ArrayData, merges: Array[Array[UTF8String]]): ArrayData = {
    val n = in.numElements()
    var cur = new Array[UTF8String](n)
    var curLen = n
    var i = 0
    // isNullAt BEFORE getUTF8String: UnsafeArrayData surfaces a null
    // element as a non-null empty string while GenericArrayData yields
    // null — reading through isNullAt makes both representations carry
    // null, matching the lambda chain (a null symbol is appended and
    // never merges: a/b are non-null, so equals(null) is false below).
    while (i < n) {
      cur(i) = if (in.isNullAt(i)) null else in.getUTF8String(i)
      i += 1
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0); val b = merges(m)(1); val ab = merges(m)(2)
      val out = new Array[UTF8String](curLen)
      var o = 0
      var j = 0
      while (j < curLen) {
        val x = cur(j)
        if (o > 0 && a.equals(out(o - 1)) && b.equals(x)) out(o - 1) = ab
        else { out(o) = x; o += 1 }
        j += 1
      }
      cur = out
      curLen = o
      m += 1
    }
    val res = new Array[Any](curLen)
    var r = 0
    while (r < curLen) { res(r) = cur(r); r += 1 }
    new GenericArrayData(res)
  }
}
