package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, FloatType}

/**
 * Native Catalyst expressions for embedding math — preference (b) of the
 * build contract: a codegen'd `Expression` beats a Scala UDF (no
 * ser/deser, stays inside whole-stage codegen) and beats higher-order
 * `aggregate`/`zip_with` chains (no per-element lambda dispatch).
 * Both generate a single static call into [[VecOps]]' tight loops.
 */
abstract class FloatVecBinary extends BinaryExpression with Serializable {
  override def dataType: DataType = FloatType
  override def nullable: Boolean = left.nullable || right.nullable

  /** fully-qualified static kernel, e.g. "graft.functions.VecOps.dotF" */
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel($a, $b);")
}

/** Float32 dot product of two array<float> columns. */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "graft.functions.VecOps.dotF"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotF(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Float32 cosine similarity of two array<float> columns. */
case class FloatVecCosine(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "graft.functions.VecOps.cosineF"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosineF(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** h-bit sign-random-projection LSH bucket of an array<float> column —
  * one codegen'd kernel pass (see [[VecOps.lshBucketF]]). */
case class FloatVecLshBucket(child: Expression, h: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(a: Any): Any =
    VecOps.lshBucketF(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.lshBucketF($a, $h)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points (and SQL registration) for the vector kernels. */
object VectorFunctions {
  import org.apache.spark.sql.GraftInternals.{column, expression}

  def vec_dot(a: Column, b: Column): Column = column(FloatVecDot(expression(a), expression(b)))
  def vec_cosine(a: Column, b: Column): Column = column(FloatVecCosine(expression(a), expression(b)))
  def vec_lsh_bucket(a: Column, h: Int): Column = column(FloatVecLshBucket(expression(a), h))

  /** Register `vec_dot` / `vec_cosine` / `vec_lsh_bucket` for spark.sql use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => FloatVecCosine(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_lsh_bucket", exprs => FloatVecLshBucket(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Int]
      }), "scala_udf")
  }
}
