package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss ±1 projection of a micro-int vector as ONE
  * Catalyst expression: comp_i = Σ_j sign(j, i) · v_j over the md5-hex
  * -parity sign matrix (sign(j,i) = +1 iff the first hex char of
  * md5("j_i") is odd — the exact formula the DuckDB oracles derive
  * inline and VectorOps.rpSignOf used to expand COLUMN BY COLUMN).
  *
  * Why an expression and not the k×dim column expansion it replaces:
  * the expanded form is a ~17k-node expression tree (k=16 components ×
  * 64 signed element_at terms, built per side of the rp_eval join),
  * and Catalyst re-optimizes that tree on EVERY pass — measured ~3.5 s
  * of driver planning per vec_rp_eval pass at sf0.1 against ~0.1 s of
  * actual 20k-row execution. One opaque node makes planning O(plan),
  * not O(k·dim), and the kernel is the same sequential signed long
  * sum — integer addition is associative and exact, so every emitted
  * component is bit-identical to the expanded form (spec-pinned).
  *
  * Null mirror of the expanded chain (never hit by the non-null
  * embeddings tables, pinned anyway): a null input array or any null
  * element made every expanded component null — array(c0..ck) was a
  * non-null ARRAY of k nulls — so this expression returns exactly
  * that, and is itself never null. */
case class RpProject(child: Expression, k: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rp_project requires array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = s"rp_project_${k}x$dim"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) RpKernels.nullComps(k)
    else RpKernels.project(v.asInstanceOf[ArrayData], k, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, FalseLiteral, JavaCode}
    val c = child.genCode(ctx)
    val out = ctx.freshName("rpComps")
    val jt = CodeGenerator.javaType(dataType)
    val code =
      code"""
        ${c.code}
        $jt $out = ${c.isNull} ? graft.functions.RpKernels.nullComps($k)
          : graft.functions.RpKernels.project(${c.value}, $k, $dim);
      """
    ev.copy(code = code, isNull = FalseLiteral, value = JavaCode.variable(out, dataType))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RpKernels {
  /** sign matrix rows[j](i), cached per (k, dim) — a pure function of
    * the indices, so executors and the driver derive the same matrix
    * with zero coordination. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()

  private def signs(k: Int, dim: Int): Array[Array[Byte]] =
    signCache.computeIfAbsent((k, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { j =>
        Array.tabulate(k) { i =>
          val h = md.digest(s"${j}_${i}".getBytes("UTF-8"))
          if (((h(0) >> 4) & 1) == 1) 1.toByte else -1.toByte
        }
      }
    })

  def nullComps(k: Int): ArrayData =
    new GenericArrayData(new Array[Any](k))

  def project(v: ArrayData, k: Int, dim: Int): ArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"rp_project dimension mismatch: ${v.numElements()} vs $dim")
    val sg = signs(k, dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return nullComps(k)
      j += 1
    }
    val acc = new Array[Long](k)
    j = 0
    while (j < dim) {
      val x = v.getLong(j)
      val row = sg(j)
      var i = 0
      while (i < k) { acc(i) += (if (row(i) > 0) x else -x); i += 1 }
      j += 1
    }
    new GenericArrayData(acc)
  }
}
