package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-stage-codegen expressions over embedding / hash arrays (guide §4:
  * prefer codegen expressions over interpreted higher-order-function
  * chains in hot paths). Numerics are bit-identical to the HOF forms they
  * replace — see the [[VecKernels]] floating-point contract.
  */

private object VecExprUtil {
  def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"expected array<float|double>, got $t")
  }
}

/** cosine(a, b) — one fused loop; replaces dot/norm aggregate chains. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private lazy val aF = VecExprUtil.isFloatArray(left)
  private lazy val bF = VecExprUtil.isFloatArray(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aF, bF)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.cosine($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** Sign-random-projection LSH bucket with a constant hyperplane matrix
  * (flattened, attached as a codegen reference object — not a literal
  * tree of planes × dims constants).
  */
case class LshBucket(child: Expression, planes: Int, dims: Int,
                     matrix: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  private lazy val isF = VecExprUtil.isFloatArray(child)
  override def nullSafeEval(a: Any): Any =
    VecKernels.lshBucket(a.asInstanceOf[ArrayData], matrix, planes, dims, isF)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lshMatrix", matrix, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecKernels.lshBucket($a, $m, $planes, $dims, $isF)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature (k rotate-xor permutation minima) from the
  * per-shingle hash array.
  */
case class MinhashFromHashes(child: Expression, rots: Array[Int],
                             xors: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(a: Any): Any =
    VecKernels.minhashSig(a.asInstanceOf[ArrayData], rots, xors)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("mhRots", rots, "int[]")
    val x = ctx.addReferenceObj("mhXors", xors, "long[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecKernels.minhashSig($a, $r, $x)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One-pass Jaccard coefficient of two distinct string arrays —
  * |I| / (|a| + |b| - |I|), bit-identical to the intersect/union size
  * ratio for distinct inputs.
  */
case class JaccardCoeff(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.jaccard($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** xxhash64 (seed 42) of every element of a string array. */
case class HashStringArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.hashStrings(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.hashStrings($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
