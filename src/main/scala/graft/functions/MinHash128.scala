package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All 128 MinHash signature slots in ONE compiled pass over a
  * document's shingle array: h = xxhash64(shingle) mod p once per
  * shingle, then 128 fused (a·h + b) mod p min-updates.
  *
  * Replaces the explode + 128-column min-aggregate formulation — same
  * parameter stream (LCG seed 42), bit-identical signatures — but the
  * per-document work happens in a single tight loop inside
  * WholeStageCodegen instead of 128 aggregate buffers over an exploded
  * (doc, shingle) relation: no explode blow-up, no aggregate machinery,
  * no shuffle of 490k intermediate rows at sf0.1.
  */
case class MinHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash128"

  override protected def nullSafeEval(input: Any): Any =
    MinHash128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash128.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHash128 {
  val Prime = 2147483647L // 2^31 - 1 (Mersenne)

  // identical parameter stream to the original 128-column aggregate:
  // one LCG (seed 42), a then b per permutation
  private val (as, bs) = {
    var s = 42L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33 }
    val a = new Array[Long](128)
    val b = new Array[Long](128)
    var i = 0
    while (i < 128) { a(i) = next() % (Prime - 1) + 1; b(i) = next() % Prime; i += 1 }
    (a, b)
  }

  /** static entry point shared by interpreted and generated code */
  def compute(shingles: ArrayData): ArrayData = {
    val mins = new Array[Long](128)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h64 = XxHash64Function.hash(shingles.getUTF8String(i), StringType, 42L)
      val h = ((h64 % Prime) + Prime) % Prime // pmod, matches pmod(xxhash64(sh), p)
      var j = 0
      while (j < 128) {
        val v = (as(j) * h + bs(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
